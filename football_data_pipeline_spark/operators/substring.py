"""Exact-substring deduplication — the suffix-array dedup family
(Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better": any substring of ≥ k tokens shared verbatim between two
documents is a duplicate span), re-expressed Spark-first.

The published implementation builds one giant suffix array of the
concatenated corpus and scans it for repeated runs. That is a
single-node, memory-resident design. The distributed equivalent used
here is a **shingled doc-offset index + min-length match merge**:

1. every document emits its ``MIN_MATCH_WORDS``-gram hash at every
   word offset — the same information a suffix array holds at depth
   k, as a flat (gram, doc, pos) relation;
2. a gram whose postings span ≥ 2 distinct documents marks every one
   of its offsets as duplicated — exactly the suffix-array criterion
   "this k-prefix repeats elsewhere";
3. per document, matched offsets that overlap or touch
   (``pos ≤ prev_pos + k``) merge into maximal spans — a shared run
   of R ≥ k words produces matched offsets p, p+1, …, p+R−k, which
   merge back to one span of exactly R words, recovering the maximal
   repeated substring the suffix-array scan reports.

Why this scales where the suffix array cannot: every step is LINEAR
in corpus size — there is no doc×doc pair generation anywhere (a
boilerplate gram shared by a million documents contributes a million
postings, not 10¹² pairs, because postings only flow back to their
own document). The big shuffle is the gram-keyed index build —
md5-spread, the same shuffle any distributed suffix-array
construction (e.g. the DC3/pDC3 line of work) pays per round, and
AQE can reuse the exchange between the posting-count aggregate and
the semi-join probe. The span merge shuffles once more on doc_id
(high-cardinality) and every later aggregate rides that partitioning.

Documents shorter than ``MIN_MATCH_WORDS`` cannot contain a
qualifying span and are filtered at the scan (the reference
implementation likewise skips sequences shorter than the threshold).

10× probe (tools/scale_probe.py, 10 perturbed copies per doc, so
every copy's ENTIRE text matches its 9 siblings — near worst-case
duplicated-offset density): sf0.1 2.51 s / 477 report rows → 10×
15.5 s / 50 000 rows. Time grows 6× for a 10× input whose OUTPUT
grew 105× — cost tracks the matched-offset volume, never input².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.sliding import sliding_join
from ..functions.stable import rnd
from ..registry import query
from .textstats import _WORDS_SQL, _words

#: minimum verbatim run length (words) that counts as a duplicated
#: span — the engine-wide analogue of the reference recipe's 50-BPE
#: threshold, scaled to the ~50-word documents of the test corpus
MIN_MATCH_WORDS = 8


def _doc_grams(docs: DataFrame, k: int) -> DataFrame:
    """(doc_id, pos, g): the k-gram hash at every word offset of every
    doc long enough to hold one — the shingled doc-offset index all
    three operators share."""
    words = docs.filter(F.size(_words()) >= k).select(
        "doc_id", _words().alias("words")
    )
    return words.select(
        "doc_id",
        F.posexplode(
            F.transform(sliding_join(F.col("words"), k), lambda g: F.md5(g))
        ).alias("pos", "g"),
    )


def _merge_offsets(matched: DataFrame, k: int) -> DataFrame:
    """(doc_id, span_start, span_len): min-length match merge of
    matched offsets. Offsets p and q (p < q) belong to one span iff
    q ≤ p + k (their k-windows overlap or touch); equal window
    lengths make LAG sufficient — the nearest preceding offset
    always carries the running max end. One doc_id-keyed shuffle
    (high cardinality); the span aggregate rides the window's
    partitioning."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    islands = matched.select(
        "doc_id",
        "pos",
        F.when(
            F.lag("pos").over(w).isNull() | (F.col("pos") > F.lag("pos").over(w) + k),
            1,
        )
        .otherwise(0)
        .alias("new_span"),
    ).select(
        "doc_id",
        "pos",
        F.sum("new_span").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("span"),
    )
    return (
        islands.groupBy("doc_id", "span")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") - F.min("pos") + k).alias("span_len"),
        )
        .select("doc_id", "span_start", "span_len")
    )


def _span_report(
    spans: DataFrame, docs: DataFrame, n_col: str, words_col: str, frac_col: str
) -> DataFrame:
    """Per-doc span accounting shared by the report and decontam
    forms: (doc_id, n_words, <n_col>, <words_col>, max_span_len,
    <frac_col>) for docs with ≥ 1 span."""
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").cast("long").alias(n_col),
        F.sum("span_len").cast("long").alias(words_col),
        F.max("span_len").cast("long").alias("max_span_len"),
    )
    sizes = docs.select("doc_id", F.size(_words()).cast("long").alias("n_words"))
    return per_doc.join(sizes, "doc_id").select(
        "doc_id",
        "n_words",
        n_col,
        words_col,
        "max_span_len",
        rnd(F.col(words_col) / F.col("n_words"), 4).alias(frac_col),
    )


def apply_cuts(docs: DataFrame, spans: DataFrame) -> DataFrame:
    """Cut ``spans`` ((doc_id, span_start, span_len)) out of
    ``docs``'s text: one doc_id join attaches each doc's span list
    (array column, bounded by doc length), then a per-row
    (word, index) filter drops covered words. Cut docs are rebuilt
    word-joined (single-spaced — the engine's canonical text form);
    UNCUT docs keep their original bytes verbatim, NULL text
    included. Returns (doc_id, text) for EVERY input doc."""
    cuts = spans.groupBy("doc_id").agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"),
                (F.col("span_start") + F.col("span_len")).alias("e"),
            )
        ).alias("cuts")
    )
    cut = docs.select("doc_id", "text").join(cuts, "doc_id", "left")
    words = F.coalesce(F.array_remove(F.split("text", " "), ""), F.array())
    kept = F.filter(
        F.zip_with(
            words,
            F.sequence(F.lit(0), F.size(words) - 1),
            lambda wd, i: F.struct(wd.alias("w"), i.alias("i")),
        ),
        lambda p: ~F.exists(
            F.col("cuts"), lambda c: (p["i"] >= c["s"]) & (p["i"] < c["e"])
        ),
    )
    return cut.select(
        "doc_id",
        F.when(F.col("cuts").isNull(), F.col("text"))
        .otherwise(F.concat_ws(" ", F.transform(kept, lambda p: p["w"])))
        .alias("text"),
    )



def foreign_offsets(grams: DataFrame) -> DataFrame:
    """(doc_id, pos): offsets whose gram exists in a SMALLER doc —
    the canonical-owner rule (min doc_id holding a gram owns it)
    shared by the batch strip and the streaming trim writer."""
    owners = grams.groupBy("g").agg(
        F.min("doc_id").alias("owner"), F.countDistinct("doc_id").alias("nd")
    )
    return (
        grams.join(owners, "g")
        .filter((F.col("nd") >= 2) & (F.col("doc_id") != F.col("owner")))
        .select("doc_id", "pos")
    )


def _gram_set(docs: DataFrame, k: int, key: str | None = "source") -> DataFrame:
    """Distinct (<key>, g) pairs — or bare distinct grams when
    ``key`` is None — the position-free gram-set projection shared
    by the decontam probe and the source-overlap matrix. ONE
    definition of the k-gram recipe feeds every operator here
    (offsets come from _doc_grams, sets from this)."""
    cols = [key] if key else []
    return (
        docs.filter(F.size(_words()) >= k)
        .select(
            *cols,
            F.explode(
                F.transform(sliding_join(_words(), k), lambda g: F.md5(g))
            ).alias("g"),
        )
        .distinct()
    )


def substring_dup_spans(docs: DataFrame, k: int = MIN_MATCH_WORDS) -> DataFrame:
    """(doc_id, span_start, span_len): every maximal span of ≥ ``k``
    consecutive words that appears verbatim in at least one OTHER
    document. ``docs`` needs (doc_id, text); offsets are 0-based
    word positions.
    """
    grams = _doc_grams(docs, k)
    # suffix-array criterion at depth k: the gram repeats in ≥ 2 docs
    dup = (
        grams.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g")
    )
    return _merge_offsets(grams.join(dup, "g", "left_semi"), k)


def substring_dedup_report(docs: DataFrame, k: int = MIN_MATCH_WORDS) -> DataFrame:
    """Per-document duplicated-text accounting over the spans: token
    total, span count, duplicated-token count and fraction — the
    numbers the ExactSubstr recipe cuts on (drop or trim documents
    whose duplicated fraction crosses a budget). Only documents with
    at least one span appear (the clean majority would dominate the
    output with zeros at corpus scale)."""
    return _span_report(
        substring_dup_spans(docs, k), docs, "n_dup_spans", "dup_words", "dup_fraction"
    )


_K = MIN_MATCH_WORDS


@query(
    "q_substring_dedup",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, {_WORDS_SQL} AS words FROM documents
    ),
    g AS (
      SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(words[i:i+{_K - 1}], ' ')) AS g
      FROM w CROSS JOIN UNNEST(range(1, greatest(len(words) - {_K} + 1, 1) + 1)) t(i)
      WHERE len(words) >= {_K}
    ),
    dup AS (
      SELECT g FROM g GROUP BY g HAVING count(DISTINCT doc_id) >= 2
    ),
    m AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (g)),
    s AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                    OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + {_K}
                  THEN 1 ELSE 0 END AS new_span
      FROM m
    ),
    isl AS (
      SELECT doc_id, pos,
             sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos) AS span
      FROM s
    ),
    spans AS (
      SELECT doc_id, min(pos) AS span_start,
             max(pos) - min(pos) + {_K} AS span_len
      FROM isl GROUP BY doc_id, span
    ),
    per_doc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
             CAST(sum(span_len) AS BIGINT) AS dup_words,
             CAST(max(span_len) AS BIGINT) AS max_span_len
      FROM spans GROUP BY doc_id
    )
    SELECT p.doc_id, CAST(len(w.words) AS BIGINT) AS n_words,
           p.n_dup_spans, p.dup_words, p.max_span_len,
           floor(p.dup_words * 1.0 / len(w.words) * 10000 + 0.5) / 10000
             AS dup_fraction
    FROM per_doc p JOIN w ON p.doc_id = w.doc_id
    """,
)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup over ``documents``: per-document maximal
    verbatim-shared spans of ≥ 8 words and the duplicated-token
    accounting (the suffix-array ExactSubstr family; VERDICT r4
    item 4).

    What the hash proves: the gram index finds every cross-document
    repeat at depth k (47 of 500 docs at sf0.01 — non-vacuous), the
    overlap-or-touch merge reconstructs MAXIMAL spans (span_len and
    max_span_len pin the merge arithmetic, not just membership), and
    the short-document filter keeps sub-k docs out on both sides.
    """
    return substring_dedup_report(load(spark, sf_dir, "documents"))


def strip_dup_spans(docs: DataFrame, k: int = MIN_MATCH_WORDS) -> DataFrame:
    """The dedup ACTION the report family measures: cut every
    duplicated span from all but one occurrence, keeping exactly one
    canonical copy of each repeated substring in the corpus (the
    ExactSubstr recipe's second half — Lee et al. remove the repeated
    bytes in place rather than dropping whole documents).

    Canonical-owner rule, deterministic at any scale: each gram's
    owner is the SMALLEST doc_id holding it; an offset is *foreign*
    (cut) where its doc is not the owner. The min-id doc of a
    repeated run keeps its text; every later doc loses the run.
    Mixed-ownership spans cut exactly the foreign windows — the merge
    happens over foreign offsets only, so owned words survive.

    Returns (doc_id, text) for EVERY input doc. Uncut docs (clean,
    sub-k, NULL-text) pass through byte-verbatim — a drop-in
    replacement corpus; cut docs are rebuilt word-joined, so their
    whitespace is single-space-normalized (the engine's canonical
    text form — unavoidable when reassembling from word offsets).

    Scale shape: the same linear gram index as the report (one
    gram-keyed shuffle, min aggregate instead of distinct-count),
    foreign spans merge per doc, then ONE doc_id join attaches the
    span list (array column, bounded by doc length) and the cut is a
    per-row filter over (word, index) pairs — no extra shuffle
    beyond the index build and the per-doc attach.

    10× probe (same worst-case perturbed corpus as the report form):
    sf0.1 2.23 s / 5 000 docs → 21.7 s / 50 000 docs with matched
    offsets ~100× denser — linear in corpus size.
    """
    return apply_cuts(docs, _merge_offsets(foreign_offsets(_doc_grams(docs, k)), k))


@query(
    "q_substring_strip",
    oracle=f"""
    WITH w0 AS (
      SELECT doc_id, coalesce({_WORDS_SQL}, []) AS words FROM documents
    ),
    g AS (
      SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(words[i:i+{_K - 1}], ' ')) AS g
      FROM w0 CROSS JOIN UNNEST(range(1, greatest(len(words) - {_K} + 1, 1) + 1)) t(i)
      WHERE len(words) >= {_K}
    ),
    own AS (
      SELECT g, min(doc_id) AS owner, count(DISTINCT doc_id) AS nd
      FROM g GROUP BY g
    ),
    fo AS (
      SELECT g.doc_id, g.pos FROM g JOIN own USING (g)
      WHERE own.nd >= 2 AND g.doc_id <> own.owner
    ),
    s AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                    OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + {_K}
                  THEN 1 ELSE 0 END AS new_span
      FROM fo
    ),
    isl AS (
      SELECT doc_id, pos,
             sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos) AS span
      FROM s
    ),
    spans AS (
      SELECT doc_id, list({{'s': s, 'e': e}}) AS cuts FROM (
        SELECT doc_id, min(pos) AS s, max(pos) + {_K} AS e
        FROM isl GROUP BY doc_id, span
      ) GROUP BY doc_id
    ),
    stripped AS (
      -- uncut docs pass through VERBATIM (original bytes, NULLs
      -- included); only cut docs are rebuilt word-joined. coalesce:
      -- DuckDB array_to_string([]) is NULL where Spark concat_ws of
      -- an empty array is '' (fully-cut docs hit this)
      SELECT d.doc_id,
             CASE WHEN spans.cuts IS NULL THEN d.text
             ELSE coalesce(array_to_string(
               list_transform(
                 list_filter(
                   list_transform(range(1, len(w0.words) + 1),
                                  i -> {{'w': w0.words[i], 'i': i - 1}}),
                   p -> len(list_filter(
                        spans.cuts, c -> p.i >= c.s AND p.i < c.e)) = 0
                 ),
                 p -> p.w), ' '), '') END AS text
      FROM documents d
      JOIN w0 ON d.doc_id = w0.doc_id
      LEFT JOIN spans ON d.doc_id = spans.doc_id
    )
    SELECT doc_id, md5(text) AS text_md5,
           CAST(len({_WORDS_SQL.replace("text", "text")}) AS BIGINT) AS n_words_after
    FROM stripped
    """,
)
def q_substring_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry for :func:`strip_dup_spans`: the cleaned corpus
    after cutting every ≥ 8-word repeated run from all but its
    min-doc_id owner, pinned by per-doc md5 of the reassembled text
    plus the post-cut word count (the md5 makes every kept/cut word
    decision hash-visible; the count makes the cut volume visible).
    """
    out = strip_dup_spans(load(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.size(F.array_remove(F.split("text", " "), "")).cast("long").alias(
            "n_words_after"
        ),
    )


# --- exact n-gram decontamination (the GPT-3/PaLM recipe) ------------

#: eval-holdout assignment for the driver query: docs whose hash
#: bucket is 0 of DECON_MOD play the benchmark, the rest are train
DECON_SALT = "xdecon-v1"
DECON_MOD = 20


def eval_gram_leaks(
    train: DataFrame, eval_docs: DataFrame, k: int = MIN_MATCH_WORDS
) -> DataFrame:
    """Exact n-gram benchmark decontamination — the published recipe
    (GPT-3's 13-gram collision scrub, PaLM/Llama variants): a train
    document is contaminated where any ``k`` consecutive words
    appear verbatim in ANY eval/benchmark document. Completes the
    decontamination family: prep.contamination_overlap measures
    3-gram Jaccard mass, embedsearch.q_semantic_decontam catches
    paraphrases; this pass is the exact-collision criterion the
    published scrubs actually apply, with span accounting so the
    leak can be CUT (the spans align with strip_dup_spans's merge).

    Returns (doc_id, n_words, n_leaked_spans, leaked_words,
    max_span_len, leak_fraction) for flagged train docs only.

    Scale shape: train pays the same linear gram index as the dedup
    family; the eval side of any decontamination scan is tiny
    (benchmarks are thousands of docs) so its DISTINCT gram set
    auto-broadcasts under the join threshold and the probe is a
    broadcast semi-join — the big side never shuffles on gram at
    all; only the per-doc span merge shuffles (doc_id-keyed). With
    an oversized eval set the planner (deliberately un-hinted) falls
    back to a shuffled semi-join and the plan is the dedup
    report's — still linear.

    10× probe (perturbed corpus: the eval holdout grows 10× with the
    corpus, a harsher shape than production's fixed benchmark):
    sf0.1 1.22 s / 24 flagged docs → 6.1 s / 18 757 flagged — 5×
    time for 780× output; cost tracks the leaked-offset volume.
    """
    eg = _gram_set(eval_docs, k, key=None)
    # no explicit broadcast hint: the planner auto-broadcasts eg
    # under the threshold (the production case — benchmarks are
    # small) and an oversized eval set degrades to a shuffled
    # semi-join instead of a broadcast OOM
    matched = _doc_grams(train, k).join(eg, "g", "left_semi")
    return _span_report(
        _merge_offsets(matched, k),
        train,
        "n_leaked_spans",
        "leaked_words",
        "leak_fraction",
    )


@query(
    "q_exact_decontam",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_WORDS_SQL} AS words,
             CAST(('0x' || substr(md5('{DECON_SALT}:' || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 10000 % {DECON_MOD} AS b
      FROM documents
    ),
    tg AS (
      SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(words[i:i+{_K - 1}], ' ')) AS g
      FROM base CROSS JOIN UNNEST(range(1, greatest(len(words) - {_K} + 1, 1) + 1)) t(i)
      WHERE b <> 0 AND len(words) >= {_K}
    ),
    eg AS (
      SELECT DISTINCT md5(array_to_string(words[i:i+{_K - 1}], ' ')) AS g
      FROM base CROSS JOIN UNNEST(range(1, greatest(len(words) - {_K} + 1, 1) + 1)) t(i)
      WHERE b = 0 AND len(words) >= {_K}
    ),
    m AS (SELECT tg.doc_id, tg.pos FROM tg JOIN eg USING (g)),
    s AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                    OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + {_K}
                  THEN 1 ELSE 0 END AS new_span
      FROM m
    ),
    isl AS (
      SELECT doc_id, pos,
             sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos) AS span
      FROM s
    ),
    spans AS (
      SELECT doc_id, min(pos) AS s, max(pos) + {_K} - min(pos) AS l
      FROM isl GROUP BY doc_id, span
    ),
    per_doc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_leaked_spans,
             CAST(sum(l) AS BIGINT) AS leaked_words,
             CAST(max(l) AS BIGINT) AS max_span_len
      FROM spans GROUP BY doc_id
    )
    SELECT p.doc_id, CAST(len(b.words) AS BIGINT) AS n_words,
           p.n_leaked_spans, p.leaked_words, p.max_span_len,
           floor(p.leaked_words * 1.0 / len(b.words) * 10000 + 0.5) / 10000
             AS leak_fraction
    FROM per_doc p JOIN base b ON p.doc_id = b.doc_id
    """,
)
def q_exact_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram decontamination over ``documents``: hash bucket 0
    of 20 plays the benchmark (same deterministic-holdout device as
    q_semantic_decontam), the rest is the train pool; flagged train
    docs report their leaked spans.

    What the hash proves: the broadcast gram probe finds exactly the
    train offsets colliding with the eval gram set, the span merge
    and accounting agree with the dedup family's arithmetic, and the
    train/eval split is disjoint (an eval doc can never flag
    itself — it is excluded from the train side by the bucket
    predicate on both engines).
    """
    from .sampling import sample_bucket

    docs = load(spark, sf_dir, "documents")
    b = F.pmod(sample_bucket(F.col("doc_id"), DECON_SALT), F.lit(DECON_MOD))
    train = docs.filter(b != 0)
    ev = docs.filter(b == 0)
    return eval_gram_leaks(train, ev)


def source_substring_overlap(docs: DataFrame, k: int = MIN_MATCH_WORDS) -> DataFrame:
    """Verbatim-span contamination between sources — the exact-match
    twin of dedup's minhash source-overlap matrix: for every source
    pair, how many DISTINCT ``k``-grams they share verbatim, with
    each side's gram-set size and the containment of the smaller
    side. Where the minhash matrix ESTIMATES whole-doc set overlap,
    this measures literal shared text — the provenance signal behind
    "source B is a scrape of source A" audits.

    Scale shape: one distinct (source, gram) projection (the gram
    shuffle, combine-reduced to one row per source×gram), then a
    gram-keyed self-join whose per-gram cost is bounded by the
    SOURCE count squared — sources are a dim (tens), so a
    boilerplate gram shared by every source yields |S|² pair rows,
    never doc². The pair rollup is a tiny aggregate.
    """
    gs = _gram_set(docs, k)
    totals = gs.groupBy("source").agg(F.count("*").cast("long").alias("n_grams"))
    a = gs.select(F.col("source").alias("source_a"), "g")
    b = gs.select(F.col("source").alias("source_b"), "g")
    shared = (
        a.join(b, "g")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("shared_grams"))
    )
    ta = totals.select(
        F.col("source").alias("__sa"), F.col("n_grams").alias("grams_a")
    )
    tb = totals.select(
        F.col("source").alias("__sb"), F.col("n_grams").alias("grams_b")
    )
    return (
        shared.join(F.broadcast(ta), shared.source_a == ta.__sa)
        .join(F.broadcast(tb), shared.source_b == tb.__sb)
        .select(
            "source_a",
            "source_b",
            "shared_grams",
            "grams_a",
            "grams_b",
            rnd(
                F.col("shared_grams") / F.least("grams_a", "grams_b"), 4
            ).alias("containment"),
        )
    )


@query(
    "q_source_substring_overlap",
    oracle=f"""
    WITH w AS (
      SELECT source, {_WORDS_SQL} AS words FROM documents
    ),
    gs AS (
      SELECT DISTINCT source,
             md5(array_to_string(words[i:i+{_K - 1}], ' ')) AS g
      FROM w CROSS JOIN UNNEST(range(1, greatest(len(words) - {_K} + 1, 1) + 1)) t(i)
      WHERE len(words) >= {_K}
    ),
    totals AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_grams FROM gs GROUP BY source
    ),
    shared AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(*) AS BIGINT) AS shared_grams
      FROM gs a JOIN gs b ON a.g = b.g AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT s.source_a, s.source_b, s.shared_grams,
           ta.n_grams AS grams_a, tb.n_grams AS grams_b,
           floor(s.shared_grams * 1.0 / least(ta.n_grams, tb.n_grams)
                 * 10000 + 0.5) / 10000 AS containment
    FROM shared s
    JOIN totals ta ON s.source_a = ta.source
    JOIN totals tb ON s.source_b = tb.source
    """,
)
def q_source_substring_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry for :func:`source_substring_overlap` over
    ``documents``: which source pairs share verbatim 8-gram text,
    with gram-set sizes and smaller-side containment.

    What the hash proves: the distinct (source, gram) projection
    (within-source repeats collapse), the pair self-join's ordering
    predicate (each pair counted once, a < b), and the containment
    arithmetic against both sides' totals.
    """
    return source_substring_overlap(load(spark, sf_dir, "documents"))
