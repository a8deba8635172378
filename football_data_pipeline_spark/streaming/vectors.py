"""Streaming embedding ingest — the VECTOR twin of the document
dedup and substring-trim batch writers (`streaming/pipeline.py`):
per micro-batch, hyperplane-LSH near-dup screening of arriving
vectors against the accepted vector corpus, with the same
exactly-once batch_id layout and rejects-audited-never-silent
contract the text funnel follows.

The reference has no vector surface at all (its nearest analogue is
the fixture-upsert freshness loop, `data_pipeline.py` collect →
upsert); this module exists for the LLM-curation side of the
engine: an embedding stream (new crawl shards run through an
encoder) must be screened against what the corpus already holds
before the vectors — and the documents they represent — are
admitted.

Screening = the q_dedup_embed plan (operators/embedsearch.py:183)
run incrementally: sign-bit band signatures against the SAME
md5-derived hyperplanes, candidates only from band-bucket equi
joins, exact cosine verification at ``VECTOR_DUP_TAU``. The batch
probes history; history is never re-paired with itself — per-batch
cost is arrival-rate × bucket occupancy, the incremental-dedup
asymptote, not corpus².

Band-width knob (the honest 100 TB caveat): with the default
4 bands × 8 bits the signature space is 4·2⁸ = 1024 buckets, so
history buckets grow ~linearly with the accepted corpus and the
probe degrades toward arrival × corpus/1024. The writer therefore
takes (n_bands, bits_per_band) — at real scale 16-24 bits per band
keeps bucket occupancy bounded (more planes, same md5 generator);
the defaults stay at embedsearch's constants so the batch and
streaming passes stay one family with one recall yardstick
(q_lsh_recall / q_knn_bruteforce).

Exactly-once: accepted/sig-index/rejected writes are all
batchId-keyed partition overwrites and every history read prunes to
``batch_id < this`` — a crash-restart re-running batch N never sees
its own partial output (which would reject every one of its vectors
as already-accepted).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: cosine threshold above which an arriving vector is a near-dup of
#: an accepted one and is rejected. Deliberately far above
#: embedsearch.COSINE_VERIFY (0.3, a candidate-report floor): an
#: ingest gate drops only near-copies, not merely-related content.
VECTOR_DUP_TAU = 0.92


def band_signatures(
    vectors: DataFrame,
    n_bands: int | None = None,
    bits_per_band: int | None = None,
) -> DataFrame:
    """(vec_id, embedding, nrm, sig): one row per (vector, band) —
    the q_dedup_embed signature assembly over the shared md5
    hyperplanes (embedsearch._hyperplane), parameterized on band
    geometry. A narrow no-shuffle projection: n_bands·bits_per_band
    dot products per vector, evaluated in the scan stage."""
    from ..operators.embedsearch import (
        BITS_PER_BAND,
        N_BANDS,
        _hyperplane,
        dot,
        norm,
    )

    n_bands = N_BANDS if n_bands is None else n_bands
    bits_per_band = BITS_PER_BAND if bits_per_band is None else bits_per_band
    e = vectors.select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    for k in range(n_bands * bits_per_band):
        plane = F.array(*[F.lit(x) for x in _hyperplane(k)])
        e = e.withColumn(
            f"b{k}",
            F.when(dot(F.col("embedding"), plane) >= 0, "1").otherwise("0"),
        )
    bands = F.array(
        *[
            F.concat(
                F.lit(f"{band}|"),
                *[
                    F.col(f"b{bits_per_band * band + r}")
                    for r in range(bits_per_band)
                ],
            )
            for band in range(n_bands)
        ]
    )
    return e.select(
        "vec_id", "embedding", "nrm", F.explode(bands).alias("sig")
    )


def vector_ingest_batch_writer(
    corpus_root: str,
    tau: float = VECTOR_DUP_TAU,
    n_bands: int | None = None,
    bits_per_band: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body for an EMBEDDING stream of
    (vec_id, embedding) rows. Per micro-batch:

    1. collapse same-vec_id re-collections (deterministically: min
       array wins — the analogue of the trim writer's min-text rule);
    2. within-batch near-dups: band-bucket candidate pairs, cosine
       ≥ tau, smaller vec_id owns (chains collapse toward the min id,
       the same star-ownership convention as the doc-level drops);
    3. history near-dups: batch signatures probe
       ``{root}/sig_index`` (accepted vectors only) by ONE sig-keyed
       equi join + cosine verify;
    4. survivors land in ``{root}/accepted/batch_id=N`` and their
       signatures in ``{root}/sig_index/batch_id=N`` — only ACCEPTED
       vectors are indexed, so a rejected near-copy can never evict
       future arrivals (the surviving-text invariant, vector form);
    5. every rejection is written to ``{root}/rejected/batch_id=N``
       with its owning vector and cosine — audited, never silent.
    """

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        _ingest_one_batch(
            batch, batch_id, corpus_root, tau, n_bands, bits_per_band
        )

    return write_batch


def _ingest_one_batch(
    batch: DataFrame,
    batch_id: int,
    corpus_root: str,
    tau: float,
    n_bands: int | None,
    bits_per_band: int | None,
) -> None:
    from .pipeline import _read_history

    spark = batch.sparkSession
    idw = Window.partitionBy("vec_id").orderBy("embedding")
    batch = (
        batch.withColumn("__rn", F.row_number().over(idw))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    sigs = band_signatures(batch, n_bands, bits_per_band).cache()
    try:
        cos = lambda a, b: _pair_cosine(a, b)  # noqa: E731

        a, b = sigs.alias("a"), sigs.alias("b")
        within = (
            a.join(
                b,
                (F.col("a.sig") == F.col("b.sig"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select(
                F.col("b.vec_id").alias("vec_id"),
                F.col("a.vec_id").alias("dup_of"),
                cos("a", "b").alias("cosine_sim"),
                F.lit("batch").alias("scope"),
            )
            .filter(F.col("cosine_sim") >= tau)
        )

        hist = _read_history(spark, corpus_root, "sig_index", batch_id)
        if hist is not None:
            h = hist.alias("h")
            against_hist = (
                sigs.alias("a")
                .join(h, F.col("a.sig") == F.col("h.sig"))
                .select(
                    F.col("a.vec_id").alias("vec_id"),
                    F.col("h.vec_id").alias("dup_of"),
                    cos("a", "h").alias("cosine_sim"),
                    F.lit("history").alias("scope"),
                )
                .filter(F.col("cosine_sim") >= tau)
            )
        else:
            against_hist = within.limit(0)

        # one audit row per rejected vector: its strongest owner,
        # history before batch on ties (history is the canonical
        # corpus), then min owner id — fully deterministic
        rejected = (
            within.unionByName(against_hist)
            .withColumn(
                "__rk",
                F.row_number().over(
                    Window.partitionBy("vec_id").orderBy(
                        F.col("cosine_sim").desc(),
                        F.when(F.col("scope") == "history", 0).otherwise(1),
                        F.col("dup_of"),
                    )
                ),
            )
            .filter(F.col("__rk") == 1)
            .drop("__rk")
        )
        rejected.write.mode("overwrite").parquet(
            f"{corpus_root}/rejected/batch_id={batch_id}"
        )

        rej = spark.read.parquet(
            f"{corpus_root}/rejected/batch_id={batch_id}"
        ).select("vec_id")
        accepted = batch.join(rej, "vec_id", "left_anti")
        accepted.write.mode("overwrite").parquet(
            f"{corpus_root}/accepted/batch_id={batch_id}"
        )
        band_signatures(
            spark.read.parquet(f"{corpus_root}/accepted/batch_id={batch_id}"),
            n_bands,
            bits_per_band,
        ).write.mode("overwrite").parquet(
            f"{corpus_root}/sig_index/batch_id={batch_id}"
        )
    finally:
        sigs.unpersist()


def _pair_cosine(left: str, right: str):
    from ..operators.embedsearch import dot

    return dot(F.col(f"{left}.embedding"), F.col(f"{right}.embedding")) / (
        F.col(f"{left}.nrm") * F.col(f"{right}.nrm")
    )
