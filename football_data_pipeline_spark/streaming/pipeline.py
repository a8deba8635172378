"""T1: the drivable streaming ingest pipeline — ProcessingTime
trigger + ``foreachBatch`` into the silver writers.

The reference's "stream" is a GitHub Actions cron: collect every 30
minutes, fan each document out to 8 tables
(.github/workflows/football-data-pipeline.yml:5-10 triggers,
database_integration.py:75-119 fan-out). Structured-Streaming-native
form:

    bronze file source (readStream + declared schema)
      → foreachBatch: run the REAL batch flatteners on the micro-batch
      → dims merged (replace / insert-if-absent), facts appended
         date-partitioned

The trigger IS the cron cadence: ``ProcessingTime("30 minutes")`` in
production, ``availableNow`` for drain-and-stop runs (tests, backfill).
Because each micro-batch calls the same pure batch transforms the
oracle gate already checks, stream and batch cannot drift.

Delivery semantics: exactly-once end-to-end on plain Parquet.
- Dim merges are naturally idempotent (replaying a batch re-derives
  the same keyed state).
- Fact writes are batchId-keyed: each micro-batch OVERWRITES its own
  ``batch_id=<n>`` partition directory, so a crash-restart that
  re-runs the batch replaces its own partial output instead of
  appending a duplicate. Readers scan the table root; ``batch_id``
  surfaces as an ordinary partition column (and date partitioning
  nests inside it, so time-range pruning still works). A
  transactional format (Delta/Iceberg) makes this implicit; this is
  the portable equivalent.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators.flatten import (
    derive_players,
    extract_fixtures,
    extract_leagues,
    extract_team_statistics,
    extract_teams,
    flatten_head_to_head,
    flatten_lineups,
    flatten_odds,
)
from ..operators.upsert import insert_if_absent, upsert_replace
from ..sources.ingest import COLLECTION_SCHEMA, with_collected_ts
from ..sources.sinks import write_silver

DEFAULT_TRIGGER = "30 minutes"  # yml:8 — the reference's cron cadence


def stream_collections(spark: SparkSession, path: str) -> DataFrame:
    """S1/S2 as a stream: the bronze file source with the declared
    schema (new JSON documents appear under ``path``; schema-on-read
    never infers). Timestamp normalization is shared with the batch
    reader (ingest.with_collected_ts) so the paths cannot drift."""
    df = (
        spark.readStream.schema(COLLECTION_SCHEMA)
        .option("multiLine", "true")
        .option("maxFilesPerTrigger", 1000)
        .json(path)
    )
    return with_collected_ts(df)


def _merge_dim(
    spark: SparkSession,
    delta: DataFrame,
    path: str,
    keys: list[str],
    order_cols: list[str],
    replace: bool,
) -> None:
    """Merge a dim delta into its Parquet table: U1 replace or U3
    insert-if-absent. The merged state is materialized (dims are
    KB-to-MB-sized by construction) before the overwrite so the write
    never scans the files it replaces."""
    merge = upsert_replace if replace else insert_if_absent
    # Probe for existing state with a read attempt, not os.path — the
    # silver root may be s3://, hdfs://, or any Hadoop-FS URI, where a
    # driver-local listdir would silently report "absent" and the
    # merge would destroy prior dim state by replacing it with the
    # delta alone. AnalysisException covers both path-not-found and
    # empty-dir (schema-inference) probes.
    try:
        base = spark.read.parquet(path)
        merged = merge(base, delta, keys=keys, order_cols=order_cols)
    except AnalysisException:
        merged = delta
    # two-phase write: land the merged state in a side path FIRST,
    # then rewrite the live path from it. A cache()+count() barrier
    # is NOT durable on a real cluster — losing a cached block after
    # the live files are deleted would recompute the plan from the
    # now-missing source and silently rebuild the dim from the delta
    # alone. With the tmp copy on disk, a crash at any point leaves a
    # recoverable full state (same contract as compact_partitions).
    tmp = f"{path}__staging"
    merged.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(path)


def silver_batch_writer(silver_root: str) -> Callable[[DataFrame, int], None]:
    """The foreachBatch body: one micro-batch of bronze documents →
    the 8-table fan-out, reusing the oracle-checked batch flatteners.

    Write order mirrors the reference's dims-before-facts sequence
    (database_integration.py:85-113) so a reader joining facts to
    dims mid-batch sees at worst a missing fact, never a dangling FK.
    """

    def write_fact(df: DataFrame, path: str, batch_id: int, ts_col: str) -> None:
        # idempotent fact write: this batch's rows live under their
        # own batch_id partition and a re-run overwrites exactly it
        write_silver(
            df, f"{path}/batch_id={batch_id}", ts_col=ts_col, mode="overwrite"
        )

    def write_batch(bronze: DataFrame, batch_id: int) -> None:
        spark = bronze.sparkSession
        bronze = bronze.cache()  # consumed by 8 flatteners
        try:
            _merge_dim(
                spark,
                extract_teams(bronze),
                f"{silver_root}/teams",
                keys=["id"],
                order_cols=["updated_at"],
                replace=True,
            )
            _merge_dim(
                spark,
                extract_leagues(bronze),
                f"{silver_root}/leagues",
                keys=["id", "season"],
                order_cols=["created_at"],
                replace=False,
            )
            _merge_dim(
                spark,
                extract_fixtures(bronze),
                f"{silver_root}/fixtures",
                keys=["id"],
                order_cols=["created_at"],
                replace=False,
            )
            lineups = flatten_lineups(bronze)
            _merge_dim(
                spark,
                derive_players(lineups),
                f"{silver_root}/players",
                keys=["id"],
                order_cols=["created_at"],
                replace=False,
            )
            write_fact(flatten_odds(bronze), f"{silver_root}/odds_history", batch_id, "collected_at")
            write_fact(
                extract_team_statistics(bronze),
                f"{silver_root}/team_statistics",
                batch_id,
                "created_at",
            )
            write_fact(
                flatten_head_to_head(bronze),
                f"{silver_root}/head_to_head",
                batch_id,
                "created_at",
            )
            write_fact(lineups, f"{silver_root}/lineups", batch_id, "collected_at")
        finally:
            bronze.unpersist()

    return write_batch


def start_pipeline(
    spark: SparkSession,
    source_path: str,
    silver_root: str,
    checkpoint: str,
    trigger: str | None = DEFAULT_TRIGGER,
):
    """Wire and start the T1 stream. ``trigger=None`` → availableNow
    (drain everything, then stop — tests and backfills); a duration
    string → ProcessingTime micro-batches at that cadence (the
    reference's 30-minute cron)."""
    writer = (
        stream_collections(spark, source_path)
        .writeStream.foreachBatch(silver_batch_writer(silver_root))
        .option("checkpointLocation", checkpoint)
    )
    if trigger is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger)
    return writer.start()


def dedup_stream(events: DataFrame, id_cols: list[str], ts_col: str = "ts",
                 watermark: str = "45 minutes") -> DataFrame:
    """Streaming exact dedup: keep the first arrival per id, with
    state bounded by the watermark — the streaming form of the batch
    dedup family (operators/dedup.py) and of the job queue's
    anti-join merge (jobs.py merge_jobs).

    ``dropDuplicatesWithinWatermark`` evicts seen-id state once the
    watermark passes, so memory is bounded by the late-data window
    (the same 45-minute rule as job expiry, yml:420-424) instead of
    the whole stream history — mandatory at 100 TB/day. Batch inputs
    fall back to plain dropDuplicates (same result set for in-window
    duplicates; batch has no state to bound).
    """
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(id_cols)
    return events.dropDuplicates(id_cols)



#: fold the history dirs into their compacted base once this many
#: live batch_id partitions accumulate (the LSM level-0 cadence the
#: CDC stream uses; VERDICT r6 #5's lesson applied to the OTHER
#: unbounded-partition readers — accepted/gram_index/sig_index grew
#: one directory per batch forever, so every history probe listed
#: and unioned the whole stream's lifetime of small files)
HIST_COMPACT_EVERY = 32


def _hist_base(root: str, sub: str) -> str:
    return f"{root}/{sub}.__hist_base__"


def _hist_fs(spark, path: str):
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path
    return jvm, hpath, hpath(path).getFileSystem(hconf)


def _write_base_max(spark, base_path: str, base_max: int) -> None:
    """Persist the base's max batch_id in a ``_base_max`` marker file
    INSIDE the base directory (ADVICE r7: the reader ran a
    max-aggregate Spark job on EVERY micro-batch once a base existed
    — a per-batch scan growing with base size). Underscore-prefixed,
    so Spark's parquet FileIndex ignores it. Living inside the dir
    makes a STALE marker structurally impossible: _swap_rewrite
    replaces the whole directory, so the marker dies with the data it
    describes; the only crash state is marker-MISSING (written after
    the swap), which the reader heals via the old aggregate."""
    jvm, hpath, fs = _hist_fs(spark, base_path)
    out = fs.create(hpath(f"{base_path}/_base_max"), True)
    try:
        out.write(bytearray(str(int(base_max)).encode("ascii")))
    finally:
        out.close()


def _read_base_max(spark, base_path: str) -> int | None:
    """The marker's value, or None when absent/unparseable (first
    write crashed mid-stream) — caller falls back to the aggregate."""
    jvm, hpath, fs = _hist_fs(spark, base_path)
    marker = hpath(f"{base_path}/_base_max")
    if not fs.exists(marker):
        return None
    stream = fs.open(marker)
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        line = reader.readLine()
    finally:
        stream.close()
    try:
        return int(line)
    except (TypeError, ValueError):
        return None


def _base_max_of(spark, base, base_path: str, heal: bool = True) -> int:
    """max(batch_id) of the compacted base: one tiny marker-file read
    on the steady path; the Spark aggregate only when the marker is
    missing (legacy base / crashed marker write), after which the
    marker is rewritten so the next batch is cheap again."""
    from pyspark.sql import functions as F

    got = _read_base_max(spark, base_path)
    if got is not None:
        return got
    agg = base.agg(F.max("batch_id")).collect()[0][0]
    base_max = -1 if agg is None else int(agg)
    if heal:
        _write_base_max(spark, base_path, base_max)
    return base_max


def _read_history(spark, root: str, sub: str, batch_id: int):
    """Batch-pruned history read shared by the incremental dedup,
    substring-trim and vector-ingest writers: rows of ``{root}/{sub}``
    from batches BEFORE ``batch_id`` (a crash-restart re-running
    batch N must never see its own partial output as history), or
    None when no history exists yet (first batch).

    History lives in TWO places once compaction has run: the live
    ``batch_id=N`` partition dirs and the compacted base (which keeps
    ``batch_id`` as an ordinary column, so the replay pruning applies
    to it unchanged). Live partitions at or below the base's max
    batch_id are EXCLUDED — after a crash between the base swap and
    the partition cleanup both copies exist, and this predicate makes
    the reader correct at every intermediate state (the bounded
    base-max lookup is one scalar aggregate)."""
    from pyspark.sql import functions as F

    from ..sources.delta_merge import recover_swap_orphan

    base_path = _hist_base(root, sub)
    recover_swap_orphan(spark, base_path)  # crashed compaction swap
    parts, base_max = [], -1
    try:
        base = spark.read.parquet(base_path)
        base_max = _base_max_of(spark, base, base_path)
        parts.append(base.filter(F.col("batch_id") < batch_id))
    except AnalysisException:
        pass
    try:
        parts.append(
            spark.read.option("basePath", f"{root}/{sub}")
            .parquet(f"{root}/{sub}")
            .filter(
                (F.col("batch_id") < batch_id)
                & (F.col("batch_id") > base_max)
            )
        )
    except AnalysisException:
        pass
    if not parts:
        return None
    out = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    return out.drop("batch_id")


def _list_batch_partitions(spark, root: str, sub: str) -> list[int]:
    """batch_id values of the committed live partition dirs."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path
    path = hpath(f"{root}/{sub}")
    fs = path.getFileSystem(hconf)
    if not fs.exists(path):
        return []
    out = []
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("batch_id="):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def compact_history(spark, root: str, sub: str, upto_exclusive: int) -> int:
    """Fold the live ``batch_id < upto_exclusive`` partitions of
    ``{root}/{sub}`` into the compacted base (batch_id preserved as a
    column), then delete exactly the covered partition dirs. Returns
    how many partitions were folded.

    ``upto_exclusive`` must be the CURRENT batch id: the one batch
    that can legally be replayed after a crash is the in-flight one,
    so it must stay a live partition the reader can prune by
    ``batch_id < N``; everything below it is checkpoint-committed and
    safe to fold. Idempotent: the fold takes only partitions above
    the base's max batch_id, and a crash between the swap and the
    cleanup leaves duplicates that the reader's base-max predicate
    already hides (and that the next call deletes)."""
    from pyspark.sql import functions as F

    from ..sources.delta_merge import _swap_rewrite, recover_swap_orphan

    base_path = _hist_base(root, sub)
    recover_swap_orphan(spark, base_path)
    names = _list_batch_partitions(spark, root, sub)
    base, base_max = None, -1
    try:
        base = spark.read.parquet(base_path)
        base_max = _base_max_of(spark, base, base_path, heal=False)
    except AnalysisException:
        pass
    fold = [n for n in names if base_max < n < upto_exclusive]
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(f"{root}/{sub}").getFileSystem(hconf)
    if fold:
        live = (
            spark.read.option("basePath", f"{root}/{sub}")
            .parquet(f"{root}/{sub}")
            .filter(
                (F.col("batch_id") > base_max)
                & (F.col("batch_id") < upto_exclusive)
            )
        )
        if base is not None:
            _swap_rewrite(spark, base_path, base.unionByName(live))
        else:
            tmp = base_path + ".__compact_tmp__"
            if fs.exists(hpath(tmp)):
                fs.delete(hpath(tmp), True)
            live.write.mode("overwrite").parquet(tmp)
            if not fs.rename(hpath(tmp), hpath(base_path)):
                raise RuntimeError(
                    f"history compaction: could not move {tmp} into place"
                )
        # marker AFTER the swap: the rename removed any old marker
        # with its directory, so a crash right here leaves the marker
        # missing (reader falls back to the aggregate and heals) —
        # never stale
        _write_base_max(spark, base_path, max(fold))
    # delete every live dir the base now covers — including leftovers
    # from a previous crashed cleanup (n <= old base_max)
    for n in names:
        if n < upto_exclusive and (n in fold or n <= base_max):
            fs.delete(hpath(f"{root}/{sub}/batch_id={n}"), True)
    return len(fold)


def _maybe_compact_history(
    spark, root: str, sub: str, batch_id: int, compact_every: int | None
) -> None:
    """Post-write hook for the stream writers: fold once the live
    partition count reaches the cadence."""
    if compact_every is None:
        return
    if len(_list_batch_partitions(spark, root, sub)) >= compact_every:
        compact_history(spark, root, sub, upto_exclusive=batch_id)

def dedup_batch_writer(
    corpus_root: str, compact_every: int | None = HIST_COMPACT_EVERY
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body for a DOCUMENT stream: classify each
    micro-batch against the accumulated accepted corpus
    (operators.dedup.dedup_against_corpus — exact fingerprint probe,
    then banded near probe), persist the classification, and append
    only unique documents to the corpus. The streaming form of
    incremental dedup: history grows batch by batch and is probed,
    never re-paired with itself.

    Exactly-once: both outputs are batchId-keyed partition
    overwrites, and the history read PRUNES to ``batch_id < this``
    so a crash-restart re-running batch N never sees its own partial
    output as 'history' (which would classify the whole batch as
    duplicate of itself).

    Within-batch duplicates are collapsed first — EXACT copies by
    canonical fingerprint (min doc_id wins), then NEAR copies by the
    same minhash-band + Jaccard-verify + min-per-component pass the
    batch path uses (dedup.batch_near_dup_drops) — so two copies of
    a document arriving in one micro-batch cannot both be accepted,
    whether or not they are byte-identical. The near pass runs over
    one micro-batch, so its component loop is bounded by arrival
    rate, not corpus size.

    ``compact_every``: once the accepted-history dirs reach this many
    live partitions, they fold into the compacted base (ON by
    default; the unbounded one-dir-per-batch growth was the same
    read-amplification CDC fixed in r6/r7 — see compact_history).
    """
    if compact_every is not None and compact_every < 1:
        raise ValueError("compact_every must be >= 1")

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        _dedup_one_batch(batch, batch_id, corpus_root)
        _maybe_compact_history(
            batch.sparkSession, corpus_root, "accepted", batch_id, compact_every
        )

    return write_batch


def _dedup_one_batch(batch: DataFrame, batch_id: int, corpus_root: str) -> None:
    """The dedup stage shared by dedup_batch_writer and
    curation_batch_writer — see dedup_batch_writer's docstring for
    semantics and the exactly-once argument."""
    from pyspark.sql import functions as F

    from ..operators.dedup import batch_near_dup_drops, dedup_against_corpus, fingerprint

    spark = batch.sparkSession
    fp = fingerprint(F.col("text"))
    w = Window.partitionBy("__fp").orderBy("doc_id")
    # cache the exact-collapsed batch BEFORE the near-dup pass: its
    # lineage (fingerprint projection + the __fp window shuffle) is
    # otherwise re-evaluated ~3× — both sides of the near pass's band
    # self-join plus the outer anti-join below
    collapsed = (
        batch.withColumn("__fp", fp)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
        .cache()
    )
    batch = collapsed.join(
        batch_near_dup_drops(collapsed), "doc_id", "left_anti"
    ).cache()
    try:
        history = _read_history(spark, corpus_root, "accepted", batch_id)
        if history is None:
            history = spark.createDataFrame([], batch.schema)
        classified = dedup_against_corpus(batch, history)
        classified.write.mode("overwrite").parquet(
            f"{corpus_root}/classification/batch_id={batch_id}"
        )
        accepted = batch.join(
            spark.read.parquet(
                f"{corpus_root}/classification/batch_id={batch_id}"
            )
            .filter(F.col("dup_kind") == "unique")
            .select("doc_id"),
            "doc_id",
        )
        accepted.write.mode("overwrite").parquet(
            f"{corpus_root}/accepted/batch_id={batch_id}"
        )
    finally:
        batch.unpersist()
        collapsed.unpersist()


def dedup_snapshot_writer(
    corpus_root: str,
) -> Callable[[DataFrame, int], None]:
    """dedup_batch_writer with the accepted corpus as a SNAPSHOT
    TABLE (``{root}/accepted_log`` + ``{root}/accepted_data``,
    sources/snapshots.snapshot_append_writer) instead of raw
    batch_id partition overwrites + the __hist_base__ fold — the
    base-funnel twin of supersede.keep_best_snapshot_writer,
    completing the unification the keep-best funnel started: one
    exactly-once mechanism (marker-last atomic commits), and the
    corpus history gains time travel / WAP / maintain() compaction
    for free. The probe's ``batch_id < N`` prune is
    snapshots.read_table_before_batch (a replay can never see its
    own commit as history); the classification stays a plain
    batchId-keyed audit partition. Decisions are IDENTICAL to
    dedup_batch_writer — pytest-locked by a twin run."""
    from ..sources.snapshots import (
        read_table_before_batch,
        snapshot_append_writer,
    )

    acc_write = snapshot_append_writer(
        f"{corpus_root}/accepted_log", f"{corpus_root}/accepted_data", []
    )

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        from ..operators.dedup import (
            batch_near_dup_drops,
            dedup_against_corpus,
            fingerprint,
        )

        spark = batch.sparkSession
        w = Window.partitionBy("__fp").orderBy("doc_id")
        collapsed = (
            batch.withColumn("__fp", fingerprint(F.col("text")))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__fp", "__rn")
            .cache()
        )
        rows = collapsed.join(
            batch_near_dup_drops(collapsed), "doc_id", "left_anti"
        ).cache()
        try:
            history = read_table_before_batch(
                spark, f"{corpus_root}/accepted_log", batch_id
            )
            if history is None:
                history = spark.createDataFrame([], rows.schema)
            classified = dedup_against_corpus(rows, history)
            classified.write.mode("overwrite").parquet(
                f"{corpus_root}/classification/batch_id={batch_id}"
            )
            accepted = rows.join(
                spark.read.parquet(
                    f"{corpus_root}/classification/batch_id={batch_id}"
                )
                .filter(F.col("dup_kind") == "unique")
                .select("doc_id"),
                "doc_id",
            )
            acc_write(accepted, batch_id)
        finally:
            rows.unpersist()
            collapsed.unpersist()

    return write_batch


def read_corpus_snapshot(spark: SparkSession, corpus_root: str) -> DataFrame:
    """The accepted corpus of a dedup_snapshot_writer funnel: the
    latest committed snapshot (every version before it remains one
    read_snapshot(version) away)."""
    from ..sources.snapshots import read_snapshot

    return read_snapshot(spark, f"{corpus_root}/accepted_log")


def curation_batch_writer(
    corpus_root: str, compact_every: int | None = HIST_COMPACT_EVERY
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body for the FULL curation funnel — the
    streaming form of the batch cleaning pass (prep.corpus_clean),
    run stage by stage per micro-batch:

    1. quality gate: ``quality.classify_quality``; rejects land in
       ``{root}/rejected/batch_id=N`` with their score (audit trail —
       a corpus release must account for what it dropped, not just
       what it kept);
    2. PII redaction: ``redact.redact_pii`` rewrites survivor text
       in place (emails before phones; pure projection);
    3. incremental dedup against the accepted corpus — the shared
       stage above, so accepted output is exactly the dedup
       pipeline's corpus layout and downstream consumers cannot tell
       which writer produced it.

    Exactly-once: every write (rejected, classification, accepted)
    is a batchId-keyed partition overwrite, and the dedup history
    read prunes to ``batch_id < this`` — a crash between ANY two
    stage writes replays to the identical state because each stage
    recomputes from the (deterministic) batch input, not from the
    partial outputs.
    """
    from pyspark.sql import functions as F

    from ..operators.quality import classify_quality
    from ..operators.redact import redact_pii

    if compact_every is not None and compact_every < 1:
        raise ValueError("compact_every must be >= 1")

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        scored = classify_quality(batch).select("doc_id", "score", "keep")
        batch = batch.join(scored, "doc_id", "left")
        # docs with no tokens never reach the classifier: reject them
        # too (keep NULL → false), with a NULL score
        batch.filter(~F.coalesce(F.col("keep"), F.lit(False))).select(
            "doc_id", "lang", "source", "score"
        ).write.mode("overwrite").parquet(
            f"{corpus_root}/rejected/batch_id={batch_id}"
        )
        survivors = batch.filter(
            F.coalesce(F.col("keep"), F.lit(False))
        ).drop("score", "keep")
        redacted = redact_pii(survivors).join(
            survivors.drop("text", "lang", "source"), "doc_id"
        )
        cleaned = redacted.select(
            "doc_id",
            F.col("redacted_text").alias("text"),
            "lang",
            "source",
            *[
                c
                for c in survivors.columns
                if c not in ("doc_id", "text", "lang", "source", "n_chars")
            ],
        )
        if "n_chars" in survivors.columns:
            # redaction changes the text; keep the metadata honest
            cleaned = cleaned.withColumn("n_chars", F.length("text").cast("long"))
        _dedup_one_batch(cleaned, batch_id, corpus_root)
        _maybe_compact_history(
            batch.sparkSession, corpus_root, "accepted", batch_id, compact_every
        )

    return write_batch


def start_dedup_pipeline(
    spark: SparkSession,
    source_path: str,
    corpus_root: str,
    checkpoint: str,
    trigger: str | None = None,
    backend: str = "snapshot",
):
    """Wire the streaming incremental-dedup ingest: a parquet file
    source of documents → per-micro-batch classification against the
    accumulated accepted corpus. ``trigger=None`` → availableNow.
    ``backend``: 'snapshot' (DEFAULT — the accepted corpus as a
    snapshot table, dedup_snapshot_writer; read it with
    read_corpus_snapshot) or 'partitions' (the raw batch_id-partition
    twin, kept as the compaction-comparison baseline)."""
    from ..catalog import load  # noqa: F401 (schema doc: documents table shape)

    if backend == "snapshot":
        batch_writer = dedup_snapshot_writer(corpus_root)
    elif backend == "partitions":
        batch_writer = dedup_batch_writer(corpus_root)
    else:
        raise ValueError(f"unknown backend {backend!r}")
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    writer = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_path)
        .writeStream.foreachBatch(batch_writer)
        .option("checkpointLocation", checkpoint)
    )
    if trigger is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger)
    return writer.start()


def substring_trim_batch_writer(
    corpus_root: str, compact_every: int | None = HIST_COMPACT_EVERY
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body for streaming EXACT-SUBSTRING dedup — the
    micro-batch form of operators.substring.strip_dup_spans: every
    ≥ k-word run a new document shares with the ACCEPTED HISTORY (or
    with a smaller-id doc in the same batch) is cut before the doc
    lands, preserving the corpus-wide one-canonical-occurrence
    invariant batch strip gives a static corpus.

    Per micro-batch:

    1. within-batch foreign offsets — the batch's own gram index,
       min-doc_id owner rule (identical to the batch strip);
    2. history foreign offsets — batch gram offsets whose gram exists
       in ``{root}/gram_index`` (history always owns what it holds;
       offsets only, the history TEXT is never read);
    3. the union merges to cut spans (substring.apply_cuts) →
       trimmed docs land in ``{root}/trimmed/batch_id=N``;
    4. the TRIMMED text's grams (what actually survived — indexing
       pre-trim grams would let a cut run evict future copies of
       text nobody carries anymore) append to
       ``{root}/gram_index/batch_id=N``.

    Exactly-once: both writes are batchId-keyed partition overwrites
    and the history read prunes to ``batch_id < this`` — a
    crash-restart re-running batch N never sees its own partial
    index (which would cut every one of its runs as 'already seen').

    Scale shape: the history index is probed by ONE gram-keyed semi
    join per batch (combine-reduced distinct grams on the history
    side); nothing re-pairs history with itself and the per-batch
    cost is bounded by arrival rate × history-index lookup, the same
    asymptote as the incremental doc-level dedup.
    """

    if compact_every is not None and compact_every < 1:
        raise ValueError("compact_every must be >= 1")

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        _trim_one_batch(batch, batch_id, corpus_root)
        _maybe_compact_history(
            batch.sparkSession, corpus_root, "gram_index", batch_id, compact_every
        )

    return write_batch


def _trim_one_batch(
    batch: DataFrame,
    batch_id: int,
    corpus_root: str,
    read_hist: Callable | None = None,
    write_grams: Callable[[DataFrame, int], None] | None = None,
) -> None:
    """The trim stage shared by the partition-backed and snapshot-
    backed writers: ``read_hist(spark, batch_id)`` supplies the gram
    history (defaults to the raw-partition fold) and
    ``write_grams(df, batch_id)`` lands the surviving grams (defaults
    to the batchId-keyed partition overwrite) — decisions depend on
    neither mechanism, which the twin-run pytest locks."""
    from pyspark.sql import functions as F

    from ..operators.substring import (
        MIN_MATCH_WORDS,
        _doc_grams,
        _merge_offsets,
        apply_cuts,
        foreign_offsets,
    )

    spark = batch.sparkSession
    k = MIN_MATCH_WORDS
    # collapse same-id re-collections first (deterministically: min
    # text wins) — duplicate doc_ids would fan out the metadata
    # re-attach join and defeat the within-batch owner rule
    # (countDistinct(doc_id) = 1 across copies of one id)
    idw = Window.partitionBy("doc_id").orderBy("text")
    batch = (
        batch.withColumn("__rn", F.row_number().over(idw))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    grams = _doc_grams(batch, k).cache()
    try:
        within = foreign_offsets(grams)
        if read_hist is None:
            hist = _read_history(spark, corpus_root, "gram_index", batch_id)
        else:
            hist = read_hist(spark, batch_id)
        if hist is not None:
            against_hist = grams.join(
                hist.select("g").distinct(), "g", "left_semi"
            ).select("doc_id", "pos")
        else:
            against_hist = within.limit(0)
        foreign = within.unionByName(against_hist).dropDuplicates(["doc_id", "pos"])
        trimmed = apply_cuts(batch, _merge_offsets(foreign, k)).join(
            batch.drop("text"), "doc_id"
        )
        # keep text-derived metadata honest after the cut (the same
        # convention curation_batch_writer follows post-redaction)
        if "n_chars" in trimmed.columns:
            trimmed = trimmed.withColumn("n_chars", F.length("text").cast("long"))
        trimmed.write.mode("overwrite").parquet(
            f"{corpus_root}/trimmed/batch_id={batch_id}"
        )
        new_grams = _doc_grams(
            spark.read.parquet(f"{corpus_root}/trimmed/batch_id={batch_id}"), k
        ).select("g").distinct()
        if write_grams is None:
            new_grams.write.mode("overwrite").parquet(
                f"{corpus_root}/gram_index/batch_id={batch_id}"
            )
        else:
            write_grams(new_grams, batch_id)
    finally:
        grams.unpersist()


def substring_trim_snapshot_writer(
    corpus_root: str,
) -> Callable[[DataFrame, int], None]:
    """substring_trim_batch_writer with the gram index as a SNAPSHOT
    TABLE (``{root}/gram_log`` + ``{root}/gram_data``,
    sources/snapshots.snapshot_append_writer) — the DEFAULT going
    forward (VERDICT r11 item 4; the partition-backed twin stays as
    the compaction-comparison baseline): one exactly-once mechanism
    (marker-last atomic commits with the batch_id replay guard), and
    the gram history gains time travel / WAP / maintain() compaction
    for free. The history probe's ``batch_id < N`` prune is
    snapshots.read_table_before_batch — a replay of batch N can never
    see its own gram commit as history. Trimmed docs stay plain
    batchId-keyed audit partitions (deterministically recomputed on
    replay). Trim decisions are IDENTICAL to the partition-backed
    writer — pytest-locked by a twin run."""
    from ..sources.snapshots import (
        read_table_before_batch,
        snapshot_append_writer,
    )

    gram_w = snapshot_append_writer(
        f"{corpus_root}/gram_log", f"{corpus_root}/gram_data", []
    )

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        def read_hist(spark, bid):
            return read_table_before_batch(spark, f"{corpus_root}/gram_log", bid)

        _trim_one_batch(
            batch, batch_id, corpus_root,
            read_hist=read_hist, write_grams=gram_w,
        )

    return write_batch
