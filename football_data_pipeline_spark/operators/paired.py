"""Paired image-text curation — the VLM-training join of the text
and media funnels. Reference parity: none — LLM-data-pipeline
extension (SURVEY.md §2 scale extensions).

A multimodal training corpus is a PAIR table (doc_id, asset_id):
caption/document text keyed to its image (or audio/video clip). A
pair is trainable only when BOTH sides survive their own curation:
the text side's release pipeline (quality gate → redaction → exact
dedup — release.release_frames, the q_release_drops surface) and the
media side's tier gate (streaming/media.gate_media_batch, the
q_media_gate surface). This operator joins those two verdicts over
the pair table and emits the full dual-attributed accounting — for
every pair, WHICH side (or both) killed it and why, because a VLM
data audit that says only "dropped" is useless for diagnosing
whether the text or the vision pipeline is shedding the data.

Output, one row per pair::

    (doc_id, asset_id, text_reason, media_reason, keep)

``text_reason`` NULL = the doc survived the text release;
``media_reason`` NULL = the asset passed its tier gate; a pair whose
asset_id has NO row in the asset table gets ``media_reason =
'missing_asset'`` and a pair whose doc_id has NO row in the document
table gets ``text_reason = 'missing_doc'`` — a dangling pair is a
drop on EITHER side, never a silent keep (the NULL-kind lesson of
VERDICT r9, applied symmetrically: under a bare left join an absent
doc row and a surviving doc row are both NULL, and the absent one
would silently count as kept text). ``keep`` = both NULL. Neither
side's machinery is re-implemented — drifts in either funnel surface
here through composition.

100 TB shape: both inputs are the funnels' own plans (each
documented at its definition); this module adds two doc_id/asset_id
equi joins over the pair table — broadcast-or-shuffle hash joins on
the pair keys, no new shuffle structure, no driver-side anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query
from .release import _release_drops_oracle, release_frames


def curate_pairs(
    docs: DataFrame, assets: DataFrame, pairs: DataFrame
) -> DataFrame:
    """(doc_id, asset_id, text_reason, media_reason, keep) for every
    row of ``pairs`` — module docstring has the contract. ``docs`` is
    a documents table (doc_id, text, lang, source), ``assets`` a
    media table (asset_id, kind, payload)."""
    from ..streaming.media import gate_media_batch

    drops, _final = release_frames(docs)
    text_r = docs.select("doc_id", F.lit(True).alias("__doc_present")).join(
        drops.select("doc_id", F.col("reason").alias("text_reason")),
        "doc_id",
        "left",
    )
    media_r = gate_media_batch(assets).select(
        "asset_id",
        F.col("reason").alias("media_reason"),
        F.lit(True).alias("__present"),
    )
    return (
        pairs.select("doc_id", "asset_id")
        .join(text_r, "doc_id", "left")
        .join(media_r, "asset_id", "left")
        .select(
            "doc_id",
            "asset_id",
            F.when(~F.coalesce("__doc_present", F.lit(False)), "missing_doc")
            .otherwise(F.col("text_reason"))
            .alias("text_reason"),
            F.when(~F.coalesce("__present", F.lit(False)), "missing_asset")
            .otherwise(F.col("media_reason"))
            .alias("media_reason"),
        )
        .withColumn(
            "keep",
            F.col("text_reason").isNull() & F.col("media_reason").isNull(),
        )
    )


def pair_curation_batch_writer(root: str):
    """foreachBatch body for a PAIR stream — rows of (doc_id, text,
    lang, source, asset_id, kind, payload), one row per pair (a doc
    or asset repeated across pairs is deduplicated by key before the
    funnels run). Per micro-batch N::

        {root}/pair_drops/batch_id=N  (doc_id, asset_id,
                                       text_reason, media_reason)
        {root}/pairs/batch_id=N       (doc_id, asset_id)

    curate_pairs over the batch (text release verdicts + media tier
    gates + missing-asset rule), split by ``keep`` — every pair of
    every batch lands in exactly one side. Exactly-once: both writes
    are overwrite-mode batch_id=N partition writes with no state
    read-back (the media-gate writer's argument verbatim); history-
    based near-dup screening of each SIDE belongs to the existing
    single-modality funnels (streaming/pipeline.py text,
    streaming/mediadedup.py media) — this writer is the pair-level
    gate between them."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        # a pair row whose DOC side never arrived carries NULL text
        # AND lang AND source — an absent document (missing_doc),
        # not a present empty document, so it must not reach the
        # release gate (the asset-side rule below, mirrored)
        docs = (
            batch.filter(
                F.col("text").isNotNull()
                | F.col("lang").isNotNull()
                | F.col("source").isNotNull()
            )
            .select("doc_id", "text", "lang", "source")
            .dropDuplicates(["doc_id"])
        )
        # a pair row whose asset side never arrived carries NULL
        # kind AND payload — that's an absent asset (missing_asset),
        # not a present asset of unknown kind, so it must not reach
        # the gate
        assets = (
            batch.filter(
                F.col("kind").isNotNull() | F.col("payload").isNotNull()
            )
            .select("asset_id", "kind", "payload")
            .dropDuplicates(["asset_id"])
        )
        pairs = batch.select("doc_id", "asset_id")
        out = curate_pairs(docs, assets, pairs).localCheckpoint()
        out.filter(~F.col("keep")).select(
            "doc_id", "asset_id", "text_reason", "media_reason"
        ).write.mode("overwrite").parquet(
            f"{root}/pair_drops/batch_id={batch_id}"
        )
        out.filter(F.col("keep")).select("doc_id", "asset_id").write.mode(
            "overwrite"
        ).parquet(f"{root}/pairs/batch_id={batch_id}")

    return write_batch


def _pair_curation_oracle() -> str:
    # text side = the q_release_drops oracle verbatim (composed, not
    # re-derived); media side = the image tier's closed-form gate
    # verdicts from the q_media_gate synth (too_small doc%5==0, flat
    # doc%3==0); pairs = (doc_id, doc_id*4), every 11th doc's pair
    # points at a MISSING asset id (doc*4+3 with doc%10 not in
    # {0,5} guarantees no synth row exists there for doc%11==0,
    # doc%10∉{0,5} — simpler: we point those pairs at -doc_id-1,
    # an id no synth branch ever produces)
    return f"""
    WITH text_drops AS (
      SELECT doc_id, reason AS text_reason
      FROM ({_release_drops_oracle()})
    ),
    pairs AS (
      SELECT doc_id, FALSE AS doc_missing,
             CASE WHEN doc_id % 11 = 0
                  THEN CAST(-doc_id - 1 AS BIGINT)
                  ELSE CAST(doc_id * 4 AS BIGINT) END AS asset_id
      FROM documents
      UNION ALL
      -- planted DANGLING-DOC pairs: a doc_id no document row
      -- carries, pointing at an EXISTING asset — must be audited
      -- as missing_doc, never silently kept
      SELECT CAST(-doc_id - 1 AS BIGINT) AS doc_id, TRUE AS doc_missing,
             CAST(doc_id * 4 AS BIGINT) AS asset_id
      FROM documents WHERE doc_id % 13 = 0
    ),
    media AS (
      SELECT CAST(doc_id * 4 AS BIGINT) AS asset_id,
             CASE WHEN doc_id % 5 = 0 THEN 'too_small'
                  WHEN doc_id % 3 = 0 THEN 'flat' END AS media_reason
      FROM documents
    )
    SELECT p.doc_id, p.asset_id,
           CASE WHEN p.doc_missing THEN 'missing_doc'
                ELSE t.text_reason END AS text_reason,
           CASE WHEN m.asset_id IS NULL THEN 'missing_asset'
                ELSE m.media_reason END AS media_reason,
           NOT p.doc_missing
             AND t.text_reason IS NULL
             AND m.asset_id IS NOT NULL
             AND m.media_reason IS NULL AS keep
    FROM pairs p
    LEFT JOIN text_drops t ON t.doc_id = p.doc_id
    LEFT JOIN media m ON m.asset_id = p.asset_id
    """


@query("q_pair_curation", oracle=_pair_curation_oracle())
def q_pair_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired image-text curation end-to-end: every document paired
    with its synth image asset (every 11th doc deliberately paired
    with a nonexistent asset id, and every 13th doc contributing an
    extra pair under a nonexistent DOC id), the REAL text release
    pipeline and the REAL image gate each contributing their
    verdict, the pair kept only when both sides survive. The oracle
    recomposes the text side with the q_release_drops SQL and the
    media side from the synth's closed forms — a drift in either
    funnel, the join glue, or the missing-asset / missing-doc rules
    breaks the value hash."""
    from ..streaming.media import synth_gate_assets

    docs = load(spark, sf_dir, "documents")
    assets = synth_gate_assets(docs).filter(F.col("kind") == "image")
    pairs = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 11 == 0, -F.col("doc_id") - 1
        )
        .otherwise(F.col("doc_id") * 4)
        .cast("long")
        .alias("asset_id"),
    ).unionByName(
        # planted dangling-DOC pairs (the missing_doc twin of the
        # missing-asset plant): a doc id no document carries, paired
        # with an existing asset
        docs.filter(F.col("doc_id") % 13 == 0).select(
            (-F.col("doc_id") - 1).cast("long").alias("doc_id"),
            (F.col("doc_id") * 4).cast("long").alias("asset_id"),
        )
    )
    return curate_pairs(docs, assets, pairs)
