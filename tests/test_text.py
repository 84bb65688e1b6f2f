"""Semantic tests for curation operators the oracle check can't see:
sampling monotonicity/determinism and decontamination recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from tv_event_streaming_spark.domain import load_table
from tv_event_streaming_spark.operators import dedup as D
from tv_event_streaming_spark.operators import text as TX


def test_stratified_sample_deterministic_and_monotone(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % 2 == 0).cast("string").alias("stratum")
    )
    lo = TX.stratified_sample(docs, "stratum", {"true": 0.3, "false": 0.3})
    hi = TX.stratified_sample(docs, "stratum", {"true": 0.6, "false": 0.6})
    lo_ids = {r.doc_id for r in lo.collect()}
    hi_ids = {r.doc_id for r in hi.collect()}
    # deterministic: same call, same rows
    assert lo_ids == {r.doc_id for r in lo.collect()}
    # monotone: raising the rate only ADDS rows
    assert lo_ids <= hi_ids
    # rate is approximately honored (hash uniformity; generous bounds)
    n = docs.count()
    assert 0.15 * n < len(lo_ids) < 0.45 * n
    assert 0.45 * n < len(hi_ids) < 0.75 * n
    # an unlisted stratum defaults to rate 0
    none = TX.stratified_sample(docs, "stratum", {"true": 0.5})
    assert all(r.stratum == "true" for r in none.collect())
    # a different salt draws a (near-certainly) different sample
    other = TX.stratified_sample(
        docs, "stratum", {"true": 0.3, "false": 0.3}, salt="other"
    )
    assert {r.doc_id for r in other.collect()} != lo_ids


def test_decontaminate_flags_eval_overlap(spark, sf_dir):
    """Docs sharing n-grams with the eval set are flagged (including the
    eval members themselves — they live in the corpus); disjoint docs
    are not. Production xxhash64 path."""
    docs = load_table(spark, sf_dir, "documents").limit(50).cache()
    ev = docs.filter(F.col("doc_id") < 5)
    hits = D.decontaminate(docs, ev, n=3)
    flagged = {r.doc_id for r in hits.collect()}
    assert set(range(5)) <= flagged  # eval members always collide fully
    # a synthetic doc with no token overlap must NOT be flagged
    clean = spark.createDataFrame(
        [(999_999, "zzz qqq xxx yyy www vvv uuu")], "doc_id long, text string"
    )
    corpus = docs.select("doc_id", "text").unionAll(clean)
    hits2 = {r.doc_id for r in D.decontaminate(corpus, ev, n=3).collect()}
    assert 999_999 not in hits2


def test_top_terms_ranking(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple apple banana cherry"),
            (2, "banana banana cherry cherry date"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.rank): (r.term, r.tf, r.df)
        for r in TX.top_terms(docs, k=2).collect()
    }
    assert out[(1, 1)] == ("apple", 3, 1)  # highest tf wins
    # doc 2: banana and cherry tie at tf=2, df=2 — term asc breaks it
    assert out[(2, 1)] == ("banana", 2, 2)
    assert out[(2, 2)] == ("cherry", 2, 2)


def test_pack_sequences_semantics(spark):
    """Pack assignment follows the documented contract: docs ordered by
    key within their group; pack_id = which budget window the doc's
    first token starts in; first doc of every group is in pack 0."""
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (10 + i % 7))) for i in range(100)],
        "doc_id long, text string",
    )
    out = TX.pack_sequences(docs, budget_tokens=32).collect()
    by_group = {}
    for r in sorted(out, key=lambda r: (r.pack_group, r.doc_id)):
        by_group.setdefault(r.pack_group, []).append(r)
    assert sum(len(v) for v in by_group.values()) == 100
    for rows in by_group.values():
        cum = 0
        prev_pack = 0
        for r in rows:
            assert r.pack_id == cum // 32  # first-token window
            assert r.pack_id >= prev_pack  # packs monotone in key order
            prev_pack = r.pack_id
            cum += r.n_tokens
        assert rows[0].pack_id == 0


def test_pack_sequences_single_group_is_global_cumsum(spark):
    """n_groups=1 is the true global concat-then-chunk semantics: one
    group, every doc in it, pack_id = global prefix-sum // budget in
    doc_id order — checked against a pure-Python global cumsum. Also
    pins the contract that grouping is a pure function of the key:
    re-running under a different input partitioning is identical."""
    rows = [(i, " ".join(["w"] * (5 + (i * 13) % 11))) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = TX.pack_sequences(docs, budget_tokens=64, n_groups=1).collect()
    assert {r.pack_group for r in out} == {0}  # packs never span groups
    got = {r.doc_id: (r.pack_id, r.n_tokens) for r in out}
    cum = 0
    for doc_id, text in rows:  # already in doc_id order
        n = len(text.split())
        assert got[doc_id] == (cum // 64, n)
        cum += n
    repartitioned = TX.pack_sequences(
        docs.repartition(7, "text"), budget_tokens=64, n_groups=1
    ).collect()
    assert {r.doc_id: (r.pack_group, r.pack_id) for r in repartitioned} == {
        r.doc_id: (r.pack_group, r.pack_id) for r in out
    }


def test_table_profile_approx_error_bound(spark, sf_dir):
    """The HLL path (the documented 100 TB swap) stays within ±5% of the
    exact distinct counts at rsd=0.01."""
    from tv_event_streaming_spark.operators import analytics as A

    ev = load_table(spark, sf_dir, "events")
    exact = {r.col_name: r.n_distinct for r in A.table_profile(ev).collect()}
    approx = {
        r.col_name: r.n_distinct
        for r in A.table_profile(ev, approx=True).collect()
    }
    assert set(exact) == set(approx)
    for c, n in exact.items():
        assert abs(approx[c] - n) <= max(1, 0.05 * n), (c, n, approx[c])


def test_token_fluency_gates(spark):
    """Docs made of corpus-common tokens gate as fluent; a doc of
    tokens nowhere in the reference slice is all-OOV and gated out."""
    common = "data table query row column value " * 10
    rows = [(i, common.strip()) for i in range(20)]
    rows.append((99, "zzqx wvut qqqq plmn zzzz xyxy"))  # garbage doc
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in TX.token_fluency(docs, ref_frac=0.5).collect()}
    garbage = out[99]
    # all-OOV unless doc 99 itself landed in the reference slice; in
    # either case its mean frequency sits far below the common docs'
    assert garbage.n_oov in (0, garbage.n_tokens)
    fluent_docs = [r for i, r in out.items() if i != 99]
    assert all(r.fluent and r.oov_ok for r in fluent_docs)
    assert garbage.mean_freq < min(r.mean_freq for r in fluent_docs)
    assert not garbage.fluent
    # deterministic: same salt → identical verdicts
    again = {r.doc_id: r.fluent for r in TX.token_fluency(docs).collect()}
    assert again == {i: r.fluent for i, r in out.items()}


def test_mixture_plan_and_materialize(spark):
    """Plan targets decompose exactly (target = repeats·avail +
    frac-epoch remainder); materialization hits the target tokens
    within one partial-epoch draw's tolerance and is deterministic."""
    rows = [(i, "tok " * 10, "web") for i in range(50)] + [
        (100 + i, "tok " * 10, "books") for i in range(10)
    ]
    docs = spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows],
        "doc_id long, text string, source string",
    )
    # web: 50 docs x 10 tok = 500 avail; books: 10 x 10 = 100 avail
    plan = TX.mixture_plan(
        docs, {"web": 0.25, "books": 0.75}, budget_tokens=1000
    )
    p = {r.source: r for r in plan.collect()}
    assert p["web"].avail_tokens == 500 and p["books"].avail_tokens == 100
    # web target 250 = 0 full epochs + 50% partial; books 750 = 7 full + 50%
    assert p["web"].n_repeats == 0 and p["web"].frac_ppm == 500000
    assert p["books"].n_repeats == 7 and p["books"].frac_ppm == 500000
    # decomposition identity holds exactly
    for r in p.values():
        assert (
            r.n_repeats * r.avail_tokens
            + (r.frac_ppm * r.avail_tokens) // 1_000_000
            <= r.target_tokens
        )
    out = TX.materialize_mixture(docs, plan).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append((r.doc_id, r.epoch))
    # every books doc appears in epochs 0..6 unconditionally
    books = by_src["books"]
    for e in range(7):
        assert sum(1 for _, ep in books if ep == e) == 10
    # realized tokens within half the target for the 50%-partial draws
    web_tokens = 10 * len(by_src["web"])
    assert 100 <= web_tokens <= 400  # target 250, hash-gate half of 500
    # deterministic
    again = sorted((r.doc_id, r.epoch) for r in
                   TX.materialize_mixture(docs, plan).collect())
    assert again == sorted((r.doc_id, r.epoch) for r in out)


def test_curation_report_counts_are_additive(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rep = {r.source: r for r in TX.curation_report(docs).collect()}
    qf = TX.quality_filter(docs)
    total_keep = qf.filter(F.col("keep")).count()
    assert sum(r.keep_n for r in rep.values()) == total_keep
    assert sum(r.n_docs for r in rep.values()) == docs.count()
    for r in rep.values():
        assert 0 <= r.keep_n <= r.n_docs
        assert abs(r.keep_rate - r.keep_n / r.n_docs) < 1e-12


def test_vocab_coverage_curve(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = TX.vocab_coverage(docs, top_k=20).orderBy("rank").collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) >= 6  # vocab must be at least this deep for the checks
    # counts non-increasing, coverage strictly increasing and <= 1
    assert all(a.n_occ >= b.n_occ for a, b in zip(rows, rows[1:]))
    assert all(a.coverage < b.coverage for a, b in zip(rows, rows[1:]))
    assert rows[-1].coverage <= 1.0
    # cum_count telescopes
    assert rows[0].cum_count == rows[0].n_occ
    assert rows[5].cum_count == sum(r.n_occ for r in rows[:6])


def test_bpe_merge_candidates_counts_positions(spark):
    """BPE statistic: every adjacent position counts ("aaa" has "aa"
    twice), weighted by corpus word frequency; 1-char words contribute
    nothing; ties rank by pair string."""
    docs = spark.createDataFrame(
        [(1, "aaa bb a"), (2, "aaa aaa cc bb"), (3, "dd a")],
        "doc_id long, text string",
    )
    out = TX.bpe_merge_candidates(docs, top_k=10).collect()
    got = [(r.rank, r.pair, r.weight, r.n_types) for r in out]
    # aaa freq 3 -> "aa" weight 6; bb freq 2 -> "bb" 2; cc/dd freq 1
    assert got == [(1, "aa", 6, 1), (2, "bb", 2, 1), (3, "cc", 1, 1), (4, "dd", 1, 1)]


def test_bpe_merge_candidates_top_k_cut(spark):
    docs = spark.createDataFrame([(1, "abc abc xyz")], "doc_id long, text string")
    out = TX.bpe_merge_candidates(docs, top_k=2).collect()
    # ab/bc weight 2 each beat xy/yz weight 1; tie ab < bc
    assert [(r.rank, r.pair, r.weight) for r in out] == [(1, "ab", 2), (2, "bc", 2)]


def test_importance_weights_ranks_target_like_above_off_domain(spark):
    """DSIR semantics on a planted corpus: docs sharing the target
    domain's vocabulary score ratio>1 and survive any u; docs fully
    outside it score ratio 0 and can never be selected."""
    rows = [(i, "apple banana cherry", "tgt") for i in range(10)]
    rows += [(100 + i, "apple banana cherry", "web") for i in range(5)]
    rows += [(200 + i, "xyzzy quux plugh", "web") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r.doc_id: r
        for r in TX.importance_weights(
            docs, F.col("source") == "tgt", alpha=1.0
        ).collect()
    }
    for i in range(5):
        assert out[100 + i].ratio > 1.0
        assert out[100 + i].selected  # u/1e6 < 1 <= ratio
        assert out[200 + i].ratio == 0.0
        assert out[200 + i].sum_t == 0
        assert not out[200 + i].selected


def test_importance_weights_alpha_monotone_and_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    tgt = F.col("source") == "src0"
    lo = {r.doc_id for r in TX.importance_weights(docs, tgt, alpha=0.3).collect() if r.selected}
    hi = {r.doc_id for r in TX.importance_weights(docs, tgt, alpha=0.9).collect() if r.selected}
    again = {r.doc_id for r in TX.importance_weights(docs, tgt, alpha=0.3).collect() if r.selected}
    assert lo == again
    assert lo <= hi
    assert len(lo) < len(hi)


def test_bpe_apply_hierarchical_and_greedy(spark):
    """Merge-table application: later rules consume earlier rules'
    outputs; overlapping runs merge leftmost-non-overlapping."""
    docs = spark.createDataFrame(
        [(1, "filter window aaaa aaa")], "doc_id long, text string"
    )
    seg = {
        r.word: (r.segments, r.n_symbols)
        for r in TX.bpe_apply(docs).collect()
    }
    assert seg["filter"] == ("f i l ter", 4)  # (t,er) consumed (e,r)'s output
    assert seg["window"] == ("w i n d ow", 5)
    out = {
        r.word: r.segments
        for r in TX.bpe_apply(docs, merges=(("a", "a"),)).collect()
    }
    assert out["aaaa"] == "aa aa"
    assert out["aaa"] == "aa a"


def test_char_stats_degenerate_and_edge_cases(spark):
    """Gini 0 for a single repeated char (gate fails), balanced text
    passes, empty text yields zeros with a vacuously-true gate."""
    docs = spark.createDataFrame(
        [(1, "aaaaaa"), (2, "abcdef"), (3, ""), (4, "aab")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in TX.char_stats(docs).collect()}
    assert out[1].gini_diversity == 0.0 and not out[1].top_char_ok
    assert out[2].distinct_chars == 6 and out[2].top_char_ok
    assert abs(out[2].gini_diversity - (1 - 6 / 36)) < 1e-12
    assert out[3].n_chars == 0 and out[3].distinct_chars == 0 and out[3].top_char_ok
    assert out[4].top_char_count == 2 and not out[4].top_char_ok  # 2*2 > 3


def test_winnowing_guarantee_and_sharing(spark):
    """The winnowing guarantee: any shared run of window+n-1 = 6 tokens
    yields at least one shared fingerprint; identical docs share ALL
    fingerprints; sub-n docs yield none."""
    shared_run = "s1 s2 s3 s4 s5 s6"
    docs = spark.createDataFrame(
        [
            (1, f"a b c {shared_run} d e"),
            (2, f"p q {shared_run} r s t"),
            (3, f"a b c {shared_run} d e"),
            (4, "x y"),
        ],
        "doc_id long, text string",
    )
    out = TX.winnow_fingerprints(docs).collect()
    fps = {}
    for r in out:
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[1] == fps[3]  # identical docs
    assert fps[1] & fps[2]   # shared 6-token run => >=1 common fingerprint
    assert 4 not in fps      # 2 tokens < n: no shingles, no rows
    # selection is sparse: fewer fingerprints than shingles
    n_shingles_doc1 = len(f"a b c {shared_run} d e".split()) - 2
    assert 1 <= len(fps[1]) < n_shingles_doc1


def test_winnow_overlap_detects_copied_passage(spark):
    """Two docs sharing a long verbatim passage pair up with a high
    shared-fingerprint count; unrelated docs don't pair at all."""
    passage = " ".join(f"p{i}" for i in range(30))
    docs = spark.createDataFrame(
        [
            (1, f"intro one two {passage} outro"),
            (2, f"other start {passage} different end"),
            (3, "completely unrelated words here nothing shared at all"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r.doc_a, r.doc_b): r.shared_fps
        for r in TX.winnow_overlap_pairs(docs, min_shared=2).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 5
    assert not any(3 in p for p in pairs)
