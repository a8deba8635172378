#!/usr/bin/env python
"""10× dedup-density scale probe (VERDICT r3 item 5).

Builds the probe corpus the r3 docstring describes — 10 perturbed
copies of every sf0.1 document, so every doc gains ~10 near-copies
and the TRUE pair count grows ~19.5× — then times the dedup family
at 1× and 10× with interleaved trials and prints one JSON line.

Why this corpus: a plain 10× scale-up keeps pair density constant
and only proves linear scan cost. Duplicating every doc 10× is
deliberately HARSHER — it makes every LSH bucket ~10× heavier, which
is exactly the failure mode (template mega-buckets) the salted
banded plan exists to survive. Cost tracking OUTPUT pairs — not
candidate pairs or the doc count squared — is the pass criterion.

Perturbation: copy i of doc d gets ``doc_id = d*16 + i`` and one
extra distinct token appended (" probecopyN"). The word-set Jaccard
between copies of a doc with W distinct words is ≥ (W-1)/(W+1), so
for typical W≥40 every copy pair verifies as a near-dup at the 0.9
threshold, while cross-doc pairs stay dissimilar.

Usage: python tools/scale_probe.py [--trials 3] [--queries a,b,...]
       [--corpus DIR]
Writes the probe corpus under $TMPDIR (scratch, removed on exit)
unless --corpus names a directory to build-once/reuse across runs.
Per-run timings stream to stderr so a pathological query is
identifiable mid-flight.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import football_data_pipeline_spark.all_queries  # noqa: F401
from football_data_pipeline_spark.registry import QUERIES
from football_data_pipeline_spark.session import get_spark

PROBED = [
    "q_dedup_minhash",
    "q_ngram_jaccard",
    "q_dedup_components",
    "q_dedup_incremental",
    "q_containment",
    "q_line_dedup",
    # r9 media-dedup probes: both synthesize assets from documents
    # (doc_id arithmetic spreads unchanged under the probe's
    # doc_id*16+copy_i re-spread), fingerprint in one Arrow pass, and
    # pair through the shared banded hash_near_dup — star pairs grow
    # linearly with the corpus, rep-level near pairs stay bounded by
    # the class count, so the pass criterion is plain linearity
    "q_video_frame_dedup",
    "q_audio_near_dup",
]

#: vector-side probes (round 4) — need the 10× embeddings build too.
#: Labels are re-spread as label·COPIES + copy_i, so the cluster
#: count grows with the corpus (k ∝ N, the SemDeDup contract) and
#: expected cluster size stays constant: a linear-time result at 10×
#: is the PASS criterion for q_semdedup. q_pq_encode has no pair
#: stage at all — it must be plainly linear.
VEC_PROBED = [
    "q_semdedup",
    "q_pq_encode",
    "q_semantic_decontam",
    "q_knn_ivfpq",
    # r7 mining family: q_hard_negatives scans the corpus once per
    # broadcast panel (linear); q_diverse_sample = bounded training +
    # one assignment pass + per-cell bounded-output window (linear)
    "q_hard_negatives",
    "q_diverse_sample",
]

#: document-side mixture probes (round 5): both are one count
#: aggregate + a broadcast-rate scan pass — the pass criterion is
#: plain linearity (report size is constant: one row per stratum).
#: They need only the always-built documents corpus; reachable via
#: --queries all (or by name) like every list here.
MIX_PROBED = ["q_mixture_epochs", "q_temperature_sample"]

#: retrieval + lakehouse-audit probes (round 11). Pass criteria:
#: q_bm25_batch is postings-linear (map-side term filter, shared
#: corpus stats); q_bm25_indexed adds the full-vocabulary index
#: build (token-linear) + the O(delta) fold — the probe times the
#: whole build+fold+serve composition, so ~linear is the pass;
#: q_cow_update is one file-keyed aggregate; q_snapshot_diff is two
#: except-alls over the changed-row mix (change set grows with the
#: corpus here, so linear). q_hybrid_topk (HYB) needs the embeddings
#: build: its dense half scans vectors once per broadcast query —
#: linear — and the fusion is k-bounded constant work.
RETR_PROBED = ["q_bm25_batch", "q_bm25_indexed", "q_cow_update", "q_snapshot_diff"]
HYB_PROBED = ["q_hybrid_topk"]

#: orders-side probes (late round 10): q_incremental_view's refresh
#: cost must track delta + state, so under a 10× orders build with
#: 10× customers (constant orders per customer) both the delta agg
#: and the state join grow linearly — plain linearity is the pass.
#: q_merge_cow / q_gopher_repetition ride the documents corpus:
#: merge planning is file-count bounded (10× files → linear), the
#: repetition fold is map-only (scan-bound).
ORD_PROBED = ["q_incremental_view"]

#: events-side probes (late round 4): the 10× events build spreads
#: user_id over COPIES distinct users per source user (10× users,
#: constant per-user activity), the contract under which session
#: assembly must scale linearly — per-user window partitions stay
#: constant-sized while their count grows with the corpus.
#: NOTE on q_semantic_decontam in VEC_PROBED: the probe's hash
#: holdout grows the EVAL side 10× along with the corpus, so the
#: scoring join does ~100× work at 10× — expected and correct for
#: this build; production decontamination holds |eval| fixed
#: (benchmarks don't grow with the crawl), where the pass is plainly
#: linear in the pool.
EVT_PROBED = [
    "q_ewma",
    "q_sessionize",
    "q_retention_cohorts",
    "q_funnel",
    "q_scd2_history",
    "q_moving_avg",
    "q_anomaly",
    "q_rollup_report",
]

BASE_SF = "/root/testdata/sf0.1"
COPIES = 10


def _materialize(df, out_dir: str, name: str) -> None:
    """Write df as a handful of part files laid out like the
    testdata (<out_dir>/<name>.parquet/ directory of parts)."""
    tmp = f"{out_dir}/_{name}_build"
    df.coalesce(4).write.mode("overwrite").parquet(tmp)
    os.makedirs(f"{out_dir}/{name}.parquet", exist_ok=True)
    for f in os.listdir(tmp):
        if f.endswith(".parquet"):
            shutil.move(f"{tmp}/{f}", f"{out_dir}/{name}.parquet/{f}")
    shutil.rmtree(tmp)


def build_probe_corpus(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{BASE_SF}/documents.parquet")
    copies = spark.range(COPIES).select(F.col("id").alias("copy_i"))
    perturbed = (
        docs.crossJoin(F.broadcast(copies))
        .select(
            (F.col("doc_id") * 16 + F.col("copy_i")).alias("doc_id"),
            F.when(F.col("copy_i") == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" probecopy"), F.col("copy_i")))
            .alias("text"),
            "lang",
            "source",
            (F.length(F.col("text")) + F.when(F.col("copy_i") == 0, F.lit(0)).otherwise(F.lit(11))).alias("n_chars"),
        )
    )
    _materialize(perturbed, out_dir, "documents")


def build_probe_embeddings(spark, out_dir: str) -> None:
    """10× embeddings: copy i of vector v gets vec_id = v·16 + i, a
    tiny deterministic per-copy rotation of the first component
    (keeps copies near-identical — realistic near-dup families), and
    label = label·COPIES + i, so each copy family spreads across
    COPIES distinct clusters: cluster count ∝ corpus size (k ∝ N),
    expected cluster size constant — the contract under which the
    within-cluster pass must stay linear."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{BASE_SF}/embeddings.parquet")
    copies = spark.range(COPIES).select(F.col("id").alias("copy_i"))
    jiggled = F.zip_with(
        "embedding",
        F.transform(
            F.sequence(F.lit(1), F.size("embedding")),
            lambda i: F.when(i == 1, F.col("copy_i").cast("float") * 0.001)
            .otherwise(F.lit(0.0))
            .cast("float"),
        ),
        lambda x, d: (x + d).cast("float"),
    )
    perturbed = emb.crossJoin(F.broadcast(copies)).select(
        (F.col("vec_id") * 16 + F.col("copy_i")).alias("vec_id"),
        jiggled.alias("embedding"),
        (F.col("label") * COPIES + F.col("copy_i")).cast("int").alias("label"),
    )
    _materialize(perturbed, out_dir, "embeddings")


def build_probe_events(spark, out_dir: str) -> None:
    """10× events: copy i of event e gets event_id = e·16 + i and
    user_id = u·COPIES + i — ten users per source user, each with the
    source user's full event sequence (ts unchanged). Session counts
    and retention cohorts must scale exactly 10× in rows and close to
    10× in time; a super-linear time says per-user state leaked
    across users."""
    from pyspark.sql import functions as F

    from football_data_pipeline_spark.catalog import load as cat_load

    ev = cat_load(spark, BASE_SF, "events")
    copies = spark.range(COPIES).select(F.col("id").alias("copy_i"))
    perturbed = ev.crossJoin(F.broadcast(copies)).select(
        (F.col("event_id") * 16 + F.col("copy_i")).alias("event_id"),
        "ts",
        (F.col("user_id") * COPIES + F.col("copy_i")).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    _materialize(perturbed, out_dir, "events")


def build_probe_orders(spark, out_dir: str) -> None:
    """10× orders: copy i of order o gets o_orderkey = o·16 + i and
    o_custkey = c·COPIES + i — ten customers per source customer,
    each with the source customer's order set. View groups (one per
    customer) grow 10× while per-group size stays constant — the
    contract under which an incremental refresh must stay linear."""
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{BASE_SF}/orders.parquet")
    copies = spark.range(COPIES).select(F.col("id").alias("copy_i"))
    perturbed = orders.crossJoin(F.broadcast(copies)).select(
        (F.col("o_orderkey") * 16 + F.col("copy_i")).alias("o_orderkey"),
        (F.col("o_custkey") * COPIES + F.col("copy_i")).alias("o_custkey"),
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    _materialize(perturbed, out_dir, "orders")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument(
        "--queries",
        default=",".join(PROBED),
        help="comma list of query names, or 'all' for every probed family",
    )
    ap.add_argument("--corpus", default=None, help="build-once/reuse dir")
    args = ap.parse_args()
    if args.queries.strip() == "all":
        probed = (
            PROBED + VEC_PROBED + EVT_PROBED + MIX_PROBED + ORD_PROBED
            + RETR_PROBED + HYB_PROBED
        )
    else:
        probed = [q.strip() for q in args.queries.split(",") if q.strip()]

    spark = get_spark(app_name="fdps-scale-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    keep = args.corpus is not None
    probe_dir = args.corpus or tempfile.mkdtemp(prefix="fdps-probe-")
    try:
        if not os.path.isdir(f"{probe_dir}/documents.parquet"):
            os.makedirs(probe_dir, exist_ok=True)
            build_probe_corpus(spark, probe_dir)
        if any(q in VEC_PROBED + HYB_PROBED for q in probed) and not os.path.isdir(
            f"{probe_dir}/embeddings.parquet"
        ):
            build_probe_embeddings(spark, probe_dir)
        if any(q in EVT_PROBED for q in probed) and not os.path.isdir(
            f"{probe_dir}/events.parquet"
        ):
            build_probe_events(spark, probe_dir)
        if any(q in ORD_PROBED for q in probed) and not os.path.isdir(
            f"{probe_dir}/orders.parquet"
        ):
            build_probe_orders(spark, probe_dir)
        n10 = spark.read.parquet(f"{probe_dir}/documents.parquet").count()
        print(f"probe corpus: {n10} docs at {probe_dir}", file=sys.stderr, flush=True)

        # warm codegen on the tiny SF first
        for name in probed:
            QUERIES[name].fn(spark, "/root/testdata/sf0.001").write.mode(
                "overwrite"
            ).format("noop").save()

        samples: dict[str, dict[str, list[float]]] = {
            n: {"1x": [], "10x": []} for n in probed
        }
        rows: dict[str, dict[str, int]] = {n: {} for n in probed}
        for t in range(args.trials):
            for name in probed:
                for label, d in (("1x", BASE_SF), ("10x", probe_dir)):
                    t0 = time.perf_counter()
                    QUERIES[name].fn(spark, d).write.mode("overwrite").format(
                        "noop"
                    ).save()
                    dt = time.perf_counter() - t0
                    samples[name][label].append(dt)
                    print(
                        f"trial {t} {name} {label}: {dt:.2f}s",
                        file=sys.stderr,
                        flush=True,
                    )
        for name in probed:
            for label, d in (("1x", BASE_SF), ("10x", probe_dir)):
                rows[name][label] = QUERIES[name].fn(spark, d).count()

        out = {
            name: {
                "sec_1x": round(statistics.median(s["1x"]), 2),
                "sec_10x": round(statistics.median(s["10x"]), 2),
                "rows_1x": rows[name]["1x"],
                "rows_10x": rows[name]["10x"],
            }
            for name, s in samples.items()
        }
        print(json.dumps({"probe": "dedup10x", "copies": COPIES, "trials": args.trials, "queries": out}))
    finally:
        if not keep:
            shutil.rmtree(probe_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
