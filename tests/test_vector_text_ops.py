"""Crafted-input tests for the round-4 vector/text operators:
SemDeDup keep/drop semantics, PQ code correctness on a hand-checkable
codebook, chunk-window geometry edges, and classifier determinism —
plus the scale-guard plan asserts (broadcasts where broadcasts
belong, no stray shuffles)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from football_data_pipeline_spark.operators.chunking import (
    CHUNK_WORDS,
    STRIDE_WORDS,
    chunk_documents,
)
from football_data_pipeline_spark.operators.quality import classify_quality
from football_data_pipeline_spark.operators.semdedup import (
    PQ_K,
    PQ_M,
    PQ_SUB,
    pq_encode,
    semdedup_report,
)

EMB_SCHEMA = "vec_id long, label int, embedding array<float>"
DOC_SCHEMA = "doc_id long, lang string, source string, text string"


def _vec(*front):
    """64-dim float vector with the given leading components."""
    v = list(front) + [0.0] * (64 - len(front))
    return [float(x) for x in v]


def test_semdedup_greedy_keep_lowest_id(spark):
    rows = [
        # cluster 0: 1 and 2 are near-identical; 3 is orthogonal.
        (1, 0, _vec(1.0, 0.0)),
        (2, 0, _vec(0.99, 0.01)),
        (3, 0, _vec(0.0, 1.0)),
        # cluster 1: a COPY of vector 1 — different cluster, so it
        # must NOT pair with it.
        (4, 1, _vec(1.0, 0.0)),
        # chain a~b, b~c with a!~c: greedy drops BOTH b and c
        (10, 2, _vec(1.0, 0.0, 0.0)),
        (11, 2, _vec(0.8, 0.6, 0.0)),  # cos(10,11)=0.8, cos(11,12)≈0.83
        (12, 2, _vec(0.4, 0.9, 0.0)),  # cos(10,12)≈0.41 ≥ τ=0.3 too
    ]
    out = {
        r.vec_id: r
        for r in semdedup_report(
            spark.createDataFrame(rows, EMB_SCHEMA), tau=0.7
        ).collect()
    }
    assert out[1].kept and out[1].n_near == 0
    assert not out[2].kept and out[2].n_near == 1
    assert out[3].kept  # orthogonal survives
    assert out[4].kept  # same vector, different cluster → no pair
    # the chain at tau=0.7: 10~11 (0.8), 11~12 (~0.834), 10!~12 (~0.41)
    assert out[10].kept
    assert not out[11].kept
    assert not out[12].kept and out[12].n_near == 1  # near 11 only


def test_semdedup_guard_trips_on_hot_cluster(spark):
    import football_data_pipeline_spark.operators.semdedup as sd

    rows = [(i, 0, _vec(1.0)) for i in range(5)]
    df = semdedup_report(spark.createDataFrame(rows, EMB_SCHEMA))
    orig = sd.MAX_CLUSTER
    sd.MAX_CLUSTER = 3
    try:
        small = semdedup_report(spark.createDataFrame(rows, EMB_SCHEMA))
        with pytest.raises(Exception, match="MAX_CLUSTER"):
            small.collect()
    finally:
        sd.MAX_CLUSTER = orig
    assert df.count() == 5  # default cap untouched


def test_pq_encode_matches_hand_computation(spark):
    # codebook = vec_ids 0..PQ_K-1. Vector 100 is an exact copy of
    # codebook entry 7 → every subspace code 7, sq_dist 0. Vector 101
    # copies entry 3 in its first subspace only.
    base = [
        (i, 0, [float(i)] * 64) for i in range(PQ_K)
    ]
    v101 = [3.0] * PQ_SUB + [2.2] * (64 - PQ_SUB)
    rows = base + [(100, 0, [7.0] * 64), (101, 0, v101)]
    out = pq_encode(spark.createDataFrame(rows, EMB_SCHEMA))
    r100 = {r.sub_idx: r for r in out.filter(F.col("vec_id") == 100).collect()}
    assert len(r100) == PQ_M
    assert all(r.code == 7 and r.sq_dist == 0.0 for r in r100.values())
    r101 = {r.sub_idx: r for r in out.filter(F.col("vec_id") == 101).collect()}
    assert r101[0].code == 3 and r101[0].sq_dist == 0.0
    # 2.2 is nearest to codebook entry 2 (0.2² vs 0.8² per dim)
    assert all(r101[m].code == 2 for m in range(1, PQ_M))
    assert r101[1].sq_dist == pytest.approx(PQ_SUB * 0.2**2, abs=1e-4)


def test_chunking_geometry_edges(spark):
    n_long = CHUNK_WORDS + STRIDE_WORDS + 5  # → 3 chunks
    rows = [
        (1, "en", "w", " ".join(f"w{i}" for i in range(n_long))),
        (2, "en", "w", " ".join(f"w{i}" for i in range(CHUNK_WORDS))),  # 1 chunk
        (3, "en", "w", "solo"),  # 1 tiny chunk
        (4, "en", "w", "   "),  # whitespace only → no chunks
    ]
    out = chunk_documents(spark.createDataFrame(rows, DOC_SCHEMA)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 3
    chunks = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [c.start_word for c in chunks] == [0, STRIDE_WORDS, 2 * STRIDE_WORDS]
    assert chunks[0].n_words == CHUNK_WORDS
    # the last window reaches the final word
    assert chunks[-1].chunk_text.endswith(f"w{n_long - 1}")
    assert chunks[-1].n_words == n_long - 2 * STRIDE_WORDS
    # overlap: stride < chunk ⇒ consecutive windows share words
    assert chunks[0].chunk_text.split()[-1] in chunks[1].chunk_text.split()
    assert [r.n_words for r in by_doc[2]] == [CHUNK_WORDS]
    assert by_doc[3][0].chunk_text == "solo" and by_doc[3][0].n_words == 1
    assert 4 not in by_doc


def test_quality_classifier_deterministic_and_balanced(spark):
    rows = [
        (1, "en", "w", "alpha beta gamma delta epsilon"),
        (2, "en", "w", "alpha beta gamma delta epsilon"),  # same text
        (3, "en", "w", "alpha"),
    ]
    out = classify_quality(spark.createDataFrame(rows, DOC_SCHEMA)).collect()
    by_doc = {r.doc_id: r for r in out}
    # identical text → identical score and decision
    assert by_doc[1].score == by_doc[2].score
    assert by_doc[1].keep == by_doc[2].keep
    assert by_doc[1].n_tokens == 5
    # single-token doc: score is that token's weight, in [-1, 1]
    assert -1.0 <= by_doc[3].score <= 1.0
    # keep is exactly (score sign) — decision thresholds the sum
    for r in out:
        assert r.keep == (r.score > 0) or r.score == 0


def test_round4_vector_text_plan_shapes(spark):
    """pq_encode: codebook reaches the vector stream via BROADCAST,
    argmin is a HashAggregate (no sort-based fallback, no window).
    chunking: no exchange at all. classifier: exactly one
    aggregation-induced exchange, no join."""
    import football_data_pipeline_spark.all_queries  # noqa: F401
    from football_data_pipeline_spark.registry import QUERIES

    from .conftest import SF_DIR

    pq = QUERIES["q_pq_encode"].fn(spark, SF_DIR)
    plan = pq._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "SortAggregate" not in plan
    assert "Window" not in plan

    ch = QUERIES["q_chunking"].fn(spark, SF_DIR)
    plan2 = ch._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan2 and "Join" not in plan2

    qc = QUERIES["q_quality_classifier"].fn(spark, SF_DIR)
    plan3 = qc._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan3
    assert plan3.count("Exchange hashpartitioning") == 1

    sd = QUERIES["q_semdedup"].fn(spark, SF_DIR)
    plan4 = sd._jdf.queryExecution().executedPlan().toString()
    # the only broadcasts are the 1-row guard and the per-vector
    # near-aggregate join; pair generation must be the cluster-keyed
    # equi-join (shuffle or broadcast — never a cartesian product)
    assert "CartesianProduct" not in plan4


def test_dataset_card_dup_attribution_and_totals(spark):
    from football_data_pipeline_spark.operators.datacard import dataset_card

    rows = [
        (1, "en", "a", "alpha beta gamma"),
        (2, "en", "a", "alpha beta gamma"),  # exact dup of 1 → is_dup
        (3, "en", "a", "gamma beta alpha"),  # same word SET → dup of 1 too
        (4, "fr", "b", "un deux trois quatre"),
    ]
    out = {(r.source, r.lang): r for r in dataset_card(
        spark.createDataFrame(rows, DOC_SCHEMA)
    ).collect()}
    a = out[("a", "en")]
    assert a.n_docs == 3
    # canonical keeps doc 1; docs 2 and 3 are attributed as dups
    assert a.exact_dup_docs == 2 and a.dup_rate == pytest.approx(0.6667)
    assert a.total_tokens == 9 and a.avg_tokens == 3.0
    b = out[("b", "fr")]
    assert b.exact_dup_docs == 0 and b.n_docs == 1 and b.total_tokens == 4
    # classifier columns are populated and consistent
    assert 0 <= a.keep_rate <= 1 and -1 <= a.avg_score <= 1


def test_epoch_order_is_a_permutation_and_epoch_dependent(spark):
    from football_data_pipeline_spark.operators.ordering import (
        N_SHARDS,
        epoch_order,
    )

    rows = [(i, "en", "w", f"doc {i}") for i in range(50)]
    out = epoch_order(spark.createDataFrame(rows, DOC_SCHEMA), epochs=2).collect()
    by_epoch = {}
    for r in out:
        by_epoch.setdefault(r.epoch, []).append(r)
    assert set(by_epoch) == {0, 1}
    for e, rs in by_epoch.items():
        # every doc appears exactly once per epoch
        assert sorted(r.doc_id for r in rs) == list(range(50))
        # pos is 1..n contiguous within each shard
        shards = {}
        for r in rs:
            assert 0 <= r.shard < N_SHARDS
            shards.setdefault(r.shard, []).append(r.pos)
        for poss in shards.values():
            assert sorted(poss) == list(range(1, len(poss) + 1))
    # shard membership is epoch-stable; within-shard order is not
    shard_of = {(r.epoch, r.doc_id): r.shard for r in out}
    assert all(
        shard_of[(0, d)] == shard_of[(1, d)] for d in range(50)
    )
    order0 = sorted((r.shard, r.pos, r.doc_id) for r in by_epoch[0])
    order1 = sorted((r.shard, r.pos, r.doc_id) for r in by_epoch[1])
    assert order0 != order1  # the permutation actually changes
    # determinism: a re-run reproduces the identical order
    again = epoch_order(spark.createDataFrame(rows, DOC_SCHEMA), epochs=2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_epoch_order_and_datacard_plan_shapes(spark):
    """epoch_order must never global-sort: the only exchange is the
    (epoch, shard) hash partitioning feeding shard-local sorts. The
    dataset card's stitching joins run on doc_id — no cartesian
    products, no broadcast of fact-sized sides."""
    import football_data_pipeline_spark.all_queries  # noqa: F401
    from football_data_pipeline_spark.registry import QUERIES

    from .conftest import SF_DIR

    eo = QUERIES["q_epoch_order"].fn(spark, SF_DIR)
    plan = eo._jdf.queryExecution().executedPlan().toString()
    assert "Exchange rangepartitioning" not in plan  # no global sort
    assert "Exchange hashpartitioning" in plan
    assert "CartesianProduct" not in plan

    dc = QUERIES["q_dataset_card"].fn(spark, SF_DIR)
    plan2 = dc._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan2
    assert "Exchange rangepartitioning" not in plan2


def test_lm_score_prefers_corpus_like_documents(spark):
    from football_data_pipeline_spark.operators.lm import lm_score

    # 'common' appears in every doc; 'rare*' tokens once each. A doc
    # of corpus-frequent words must out-score a doc of hapaxes.
    rows = [
        (1, "en", "w", "common common common common"),
        (2, "en", "w", "rareA rareB rareC rareD"),
        (3, "en", "w", "common rareE common rareF"),
        (4, "en", "w", "common common common common"),  # identical to 1
    ]
    out = {r.doc_id: r for r in lm_score(
        spark.createDataFrame(rows, DOC_SCHEMA)
    ).collect()}
    assert out[1].avg_logp == out[4].avg_logp  # deterministic
    assert out[1].avg_logp > out[3].avg_logp > out[2].avg_logp
    assert all(r.avg_logp < 0 for r in out.values())  # log-probs
    assert out[1].n_tokens == 4


def test_fluency_buckets_tercile_semantics(spark):
    import football_data_pipeline_spark.all_queries  # noqa: F401
    from football_data_pipeline_spark.registry import QUERIES

    from .conftest import SF_DIR

    rows = QUERIES["q_fluency_buckets"].fn(spark, SF_DIR).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    assert by_lang
    for lang, rs in by_lang.items():
        heads = [r.avg_logp for r in rs if r.bucket == "head"]
        tails = [r.avg_logp for r in rs if r.bucket == "tail"]
        if heads and tails:
            # every head doc is at least as fluent as every tail doc
            assert min(heads) >= max(tails)
        # tercile sizes differ by at most 1
        sizes = [sum(1 for r in rs if r.bucket == b) for b in ("head", "middle", "tail")]
        assert max(sizes) - min(x for x in sizes if x or len(rs) < 3) <= 1 or len(rs) < 3


def test_bpe_merges_learn_expected_pairs(spark):
    from football_data_pipeline_spark.operators.bpe import bpe_merges

    # 'aaab' ×5, 'ab' ×3: pair counts round 1 — (a,a): 2 per 'aaab'
    # word-type (BPE counts per word TYPE weighted by frequency:
    # greedy left-to-right finds 'aa' twice in 'aaab'? No — pairs are
    # ADJACENT SYMBOL pairs, so 'a a a b </w>' has (a,a) twice,
    # weighted 5 → 10), (a,b): 5+3=8, (b,</w>): 8. Tie (a,b) vs
    # (b,</w>) broken lexicographically DESC → (b,</w>) wins ties,
    # but (a,a)=10 wins round 1.
    rows = [
        (1, "en", "w", " ".join(["aaab"] * 5 + ["ab"] * 3)),
    ]
    out = bpe_merges(
        spark.createDataFrame(rows, DOC_SCHEMA), rounds=2
    ).collect()
    by_round = {r.round: r for r in out}
    assert (by_round[1].lhs, by_round[1].rhs) == ("a", "a")
    assert by_round[1].merged == "aa" and by_round[1].pair_count == 10
    # after merging: 'aaab' → 'aa a b </w>' (greedy leftmost), so
    # round 2 pairs: (aa,a):5, (a,b):5+3=8, (b,</w>):8 — tie broken
    # lexicographically DESC: (b,</w>) > (a,b)
    assert (by_round[2].lhs, by_round[2].rhs) == ("b", "</w>")
    assert by_round[2].pair_count == 8


def test_bpe_tokenize_fertility_decreases_with_merges(spark):
    from football_data_pipeline_spark.operators.bpe import bpe_tokenize_stats

    rows = [(1, "en", "w", "aaab aaab ab")]
    no_merges = {r.doc_id: r for r in bpe_tokenize_stats(
        spark.createDataFrame(rows, DOC_SCHEMA), rounds=0
    ).collect()}
    merged = {r.doc_id: r for r in bpe_tokenize_stats(
        spark.createDataFrame(rows, DOC_SCHEMA), rounds=2
    ).collect()}
    # chars+marker: 'aaab'→5 symbols ×2, 'ab'→3 → 13 subwords / 3 words
    assert no_merges[1].n_words == 3 and no_merges[1].n_subwords == 13
    # merges can only shrink the symbol stream
    assert merged[1].n_subwords < no_merges[1].n_subwords
    assert merged[1].fertility < no_merges[1].fertility
    assert merged[1].n_words == 3


def test_build_release_layout_and_consistency(spark, tmp_path):
    """End-to-end release build: every input doc is accounted for
    exactly once (shards + drops), the card describes the SHARD
    corpus, and PII never reaches a shard file."""
    import glob
    import json

    import pandas as pd

    from football_data_pipeline_spark.operators.release import build_release

    good = "alpha beta delta mango grape lime peach"
    rows = [
        (1, "en", "a", good + " reach user@example.com today"),
        (2, "en", "a", "gamma epsilon theta kiwi cherry contact"),  # low quality
        (3, "en", "a", good),  # kept
        (4, "en", "a", " ".join(reversed(good.split()))),  # word-set dup of 3
        (5, "fr", "b", "omega sigma plum lemon write totally novel"),
    ]
    out = str(tmp_path / "rel")
    build_release(spark.createDataFrame(rows, DOC_SCHEMA), out, epoch=2)

    drops = pd.concat(
        [pd.read_json(f, lines=True) for f in glob.glob(f"{out}/drops/*.json")]
    )
    by_reason = drops.groupby("reason")["doc_id"].apply(list).to_dict()
    assert by_reason["low_quality"] == [2]
    assert by_reason["exact_duplicate"] == [4]

    shard_files = glob.glob(f"{out}/shards/shard=*/*.parquet")
    shards = pd.concat([pd.read_parquet(f) for f in shard_files])
    assert sorted(shards["doc_id"]) == [1, 3, 5]
    t1 = shards.set_index("doc_id").loc[1, "text"]
    assert "<EMAIL>" in t1 and "user@example.com" not in t1

    card = pd.concat(
        [pd.read_json(f, lines=True) for f in glob.glob(f"{out}/card/*.json")]
    )
    totals = card.set_index(["source", "lang"])
    assert int(totals.loc[("a", "en"), "n_docs"]) == 2
    assert int(totals.loc[("b", "fr"), "n_docs"]) == 1
    # the card sees the POST-dedup corpus: zero residual dups
    assert int(card["exact_dup_docs"].sum()) == 0
    # accounting closes: inputs = shards + drops
    assert len(shards) + len(drops) == len(rows)
    # min-id policy: the dup row names its surviving canonical
    dup_row = drops[drops["reason"] == "exact_duplicate"].iloc[0]
    assert int(dup_row["dup_of"]) == 3


def test_build_release_best_quality_policy(spark, tmp_path):
    """keep='best_quality': the exact-dup group's survivor is its
    argmax-score member even when that is NOT the min id — the
    min-id copy lands in drops with dup_of = the better copy, and
    accounting still closes."""
    import glob

    import pandas as pd

    from football_data_pipeline_spark.operators.release import build_release

    base = "alpha beta delta mango grape lime peach"
    rows = [
        # doc 3 repeats a high-weight token ('lime', 0.887 > the
        # group's 0.498 mean): same word SET (one fingerprint group)
        # but a higher classifier mean than doc 1
        (1, "en", "a", base),
        (3, "en", "a", base + " lime lime lime"),
        (5, "fr", "b", "omega sigma plum lemon write totally novel"),
    ]
    out = str(tmp_path / "rel")
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    build_release(df, out, keep="best_quality")

    drops = pd.concat(
        [pd.read_json(f, lines=True) for f in glob.glob(f"{out}/drops/*.json")]
    )
    shard_files = glob.glob(f"{out}/shards/shard=*/*.parquet")
    shards = pd.concat([pd.read_parquet(f) for f in shard_files])
    assert len(shards) + len(drops) == len(rows)

    # which member actually scores higher, per the engine's own
    # classifier (the test pins policy, not the weight table)
    from football_data_pipeline_spark.operators.quality import classify_quality

    scores = {
        r.doc_id: r.score
        for r in classify_quality(df).select("doc_id", "score").collect()
    }
    best = 1 if scores[1] >= scores[3] else 3
    worst = 3 if best == 1 else 1
    assert best == 3, "fixture must make the non-min-id copy win"
    dup = drops[drops["reason"] == "exact_duplicate"]
    assert list(dup["doc_id"]) == [worst]
    assert int(dup.iloc[0]["dup_of"]) == best
    assert set(shards["doc_id"]) == {best, 5}


def test_bpe_canonical_run_merging(spark):
    """Back-to-back runs must merge canonically (Sennrich/HF order):
    'aaaa' with merge (a,a) becomes [aa][aa], not [aa][a][a] — the
    divergence the sentinel framing exists to prevent."""
    from football_data_pipeline_spark.operators.bpe import bpe_tokenize_stats

    rows = [(1, "en", "w", "aaaa")]
    out = bpe_tokenize_stats(
        spark.createDataFrame(rows, DOC_SCHEMA), rounds=1
    ).collect()[0]
    # [aa, aa, </w>] = 3 subwords (the buggy space-framed form gave 4)
    assert out.n_subwords == 3 and out.n_words == 1


def test_semdedup_empty_input_returns_empty(spark):
    """Empty embeddings: the hot-cluster guard must NOT trip (max
    over zero rows is NULL, which once fell through to raise_error);
    the correct result is an empty frame."""
    out = semdedup_report(spark.createDataFrame([], EMB_SCHEMA))
    assert out.count() == 0


def test_lm_bigram_prefers_seen_transitions(spark):
    from football_data_pipeline_spark.operators.lm import lm_score_bigram

    rows = [
        (1, "en", "w", "the cat sat"),
        (2, "en", "w", "the cat sat"),
        (3, "en", "w", "sat cat the"),  # reversed transitions: unseen order
        (4, "en", "w", "solo"),  # < 2 tokens → no transitions → no row
    ]
    out = {r.doc_id: r for r in lm_score_bigram(
        spark.createDataFrame(rows, DOC_SCHEMA)
    ).collect()}
    assert 4 not in out
    assert out[1].avg_logp == out[2].avg_logp
    assert out[1].n_bigrams == 2
    # docs 1/2 use transitions seen twice; doc 3's are singletons
    assert out[1].avg_logp > out[3].avg_logp


def test_pq_recall_bounded_and_deterministic(spark):
    """ADC recall@k is a well-defined [0, 1] measurement and two runs
    agree exactly (fixed-point integer distances leave no room for
    float drift)."""
    import football_data_pipeline_spark.all_queries  # noqa: F401
    from football_data_pipeline_spark.registry import QUERIES

    from .conftest import SF_DIR

    # driver-table run: recall is defined (0..1) and deterministic
    out = QUERIES["q_pq_recall"].fn(spark, SF_DIR).collect()
    assert out and all(0.0 <= r.recall_at_k <= 1.0 for r in out)
    run2 = QUERIES["q_pq_recall"].fn(spark, SF_DIR).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, run2))
