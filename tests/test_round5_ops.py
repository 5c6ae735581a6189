"""Round-5 operator tests: exact substring-span dedup (planted
cross-document passages), the copurchase pack-range guard, and the
portable SimHash hash equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# substring_dedup: planted duplicated passages
# ---------------------------------------------------------------------------
def _words(prefix: str, n: int) -> list[str]:
    return [f"{prefix}{i}" for i in range(n)]


def test_substring_dedup_strips_planted_passage(spark):
    """Two documents share a planted 25-token passage (k=20 → 6 dup
    span starts each, 25 covered positions); their unique text must
    survive verbatim and the passage must vanish from both. A third
    fully-unique document passes through untouched."""
    from mi_inbound_pulsar_spark.operators.dedup import substring_dedup

    passage = _words("dup", 25)
    a_unique = _words("alpha", 30)
    b_unique = _words("beta", 30)
    c_text = _words("gamma", 40)
    rows = [
        (1, " ".join(a_unique + passage)),
        (2, " ".join(passage + b_unique)),
        (3, " ".join(c_text)),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in substring_dedup(docs, k=20).collect()}

    assert out[1]["dup_span_starts"] == 6  # 25 - 20 + 1
    assert out[2]["dup_span_starts"] == 6
    assert out[1]["removed_tokens"] == 25
    assert out[2]["removed_tokens"] == 25
    assert out[1]["clean_text"] == " ".join(a_unique)
    assert out[2]["clean_text"] == " ".join(b_unique)
    assert out[3]["dup_span_starts"] == 0
    assert out[3]["removed_tokens"] == 0
    assert out[3]["clean_text"] == " ".join(c_text)


def test_substring_dedup_short_docs_pass_through(spark):
    """Documents shorter than k tokens produce no spans (the sequence
    guard: no descending 1..0 artifact) and round-trip unchanged, even
    when byte-identical to each other."""
    from mi_inbound_pulsar_spark.operators.dedup import substring_dedup

    rows = [(1, "tiny doc"), (2, "tiny doc"), (3, " ".join(_words("w", 19)))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in substring_dedup(docs, k=20).collect()}
    for i, text in [(1, "tiny doc"), (2, "tiny doc"), (3, " ".join(_words("w", 19)))]:
        assert out[i]["removed_tokens"] == 0
        assert out[i]["clean_text"] == text


def test_substring_dedup_mid_document_overlap(spark):
    """Overlapping shared spans merge their covered positions (the
    array_distinct(flatten(...)) fold), so a shared passage embedded
    mid-document leaves exactly the flanking text."""
    from mi_inbound_pulsar_spark.operators.dedup import substring_dedup

    shared = _words("s", 22)
    pre, post = _words("pre", 10), _words("post", 10)
    rows = [
        (1, " ".join(pre + shared + post)),
        (2, " ".join(shared)),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in substring_dedup(docs, k=20).collect()}
    assert out[1]["clean_text"] == " ".join(pre + post)
    assert out[1]["removed_tokens"] == 22
    # doc 2 is nothing but the shared passage: fully stripped
    assert out[2]["clean_text"] == ""
    assert out[2]["removed_tokens"] == 22


# ---------------------------------------------------------------------------
# copurchase_pairs: packable-range guard
# ---------------------------------------------------------------------------
def test_copurchase_pack_guard_raises_on_wide_ids(spark):
    """Ids at or above 2^32 would silently corrupt the packed 64-bit
    pair key; the guard must fail the job loudly instead."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from mi_inbound_pulsar_spark.operators.graph import copurchase_pairs

    ok = spark.createDataFrame(
        [(1, [1, 2]), (2, [1, 2])], "part long, custs array<long>"
    )
    got = {
        (r["cust_a"], r["cust_b"]): r["c"]
        for r in copurchase_pairs(ok, min_common=2).collect()
    }
    assert got == {(1, 2): 2}

    bad = spark.createDataFrame(
        [(1, [1, 2**32]), (2, [1, 2**32])], "part long, custs array<long>"
    )
    with pytest.raises(SparkRuntimeException, match="id outside"):
        copurchase_pairs(bad, min_common=2).collect()


# ---------------------------------------------------------------------------
# portable SimHash: Spark-side hash equals the oracle's parse rule
# ---------------------------------------------------------------------------
def test_portable_token_hash_matches_md5_prefix(spark):
    """conv(substr(md5(t),1,15),16,10) must equal Python's
    int(md5hex[:15], 16) — the exact value DuckDB's '0x…'::BIGINT cast
    produces — and is always non-negative (60 bits)."""
    import hashlib

    from mi_inbound_pulsar_spark.operators.dedup import portable_token_hash

    toks = ["hello", "world", "", "a b", "ünïcödé"]
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    got = {
        r["tok"]: r["h"]
        for r in df.select("tok", portable_token_hash(F.col("tok")).alias("h")).collect()
    }
    for t in toks:
        expected = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        assert got[t] == expected
        assert got[t] >= 0


def test_simhash_portable_and_production_agree_on_duplicates(spark):
    """Both hash tiers must give byte-identical documents identical
    signatures, and distinct-token documents distinct signatures."""
    from mi_inbound_pulsar_spark.operators.dedup import (
        portable_token_hash,
        simhash_signatures,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "entirely different content with other words here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for kwargs in (
        {},  # production: xxhash64 / 64-bit
        {"token_hash": portable_token_hash, "n_bits": 60},  # oracle tier
    ):
        sigs = {
            r["doc_id"]: r["simhash"]
            for r in simhash_signatures(docs, **kwargs).collect()
        }
        assert sigs[1] == sigs[2]
        assert sigs[1] != sigs[3]


# ---------------------------------------------------------------------------
# round-5 second phase: invariants on any data regeneration
# ---------------------------------------------------------------------------
def test_mutual_knn_reciprocity(spark, sf_dir):
    """Every emitted pair must be reciprocal: each endpoint appears in
    the other's exact top-k — checked against the raw kNN edge list."""
    from mi_inbound_pulsar_spark.operators.similarity import (
        MUTUAL_KNN_K,
        knn_self_join,
        q_mutual_knn,
    )
    from mi_inbound_pulsar_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    knn_edges = {
        (r["vec_id"], r["neighbor_id"])
        for r in knn_self_join(e, k=MUTUAL_KNN_K).collect()
    }
    mutual = [(r["id_a"], r["id_b"]) for r in q_mutual_knn(spark, sf_dir).collect()]
    assert mutual, "no mutual pairs found"
    for a, b in mutual:
        assert (a, b) in knn_edges and (b, a) in knn_edges, (a, b)


def test_span_corruption_roundtrip(spark):
    """Interleaving target spans back into the input at the sentinel
    positions must reconstruct the original text exactly."""
    import re

    import mi_inbound_pulsar_spark.operators.sampling as sampling_mod
    from mi_inbound_pulsar_spark.operators.sampling import SPAN_LEN

    text = " ".join(f"w{i}" for i in range(47))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")

    # drive the registered query over the synthetic frame
    orig = sampling_mod.load_table
    sampling_mod.load_table = lambda s, d, t: docs
    try:
        out = sampling_mod.q_span_corruption(spark, "ignored").collect()[0]
    finally:
        sampling_mod.load_table = orig

    spans = {}
    for m in re.finditer(r"<extra_id_(\d+)> ((?:\S+ ?){%d})" % SPAN_LEN, out["target_text"] + " "):
        spans[int(m.group(1))] = m.group(2).strip()
    rebuilt = re.sub(
        r"<extra_id_(\d+)>", lambda m: spans[int(m.group(1))], out["input_text"]
    )
    assert rebuilt == text
    assert out["n_masked"] == sum(len(v.split()) for v in spans.values())


def test_tfidf_cosine_separates_templates(spark):
    """Two docs sharing only boilerplate score below two docs sharing a
    rare payload — the property that distinguishes weighted cosine from
    Jaccard."""
    from mi_inbound_pulsar_spark.operators.dedup import TFIDF_MAX_DF  # noqa: F401
    import mi_inbound_pulsar_spark.operators.dedup as dedup_mod

    boiler = "terms of service apply all rights reserved contact us"
    rows = [
        (1, boiler + " unique alpha payload one"),
        (2, boiler + " unique alpha payload one"),
        (3, boiler + " different beta content here"),
        (4, "totally unrelated gamma text body"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    orig = dedup_mod.load_table
    dedup_mod.load_table = lambda s, d, t: docs
    try:
        got = {
            (r["doc_a"], r["doc_b"]): r["cosine"]
            for r in dedup_mod.q_tfidf_cosine_neardup(spark, "ignored").collect()
        }
    finally:
        dedup_mod.load_table = orig
    assert got.get((1, 2), 0.0) == 1.0  # identical docs → cosine 1
    # boilerplate-only overlap scores strictly below the identical pair
    assert got.get((1, 3), 0.0) < 1.0
    assert (1, 4) not in got or got[(1, 4)] < got[(1, 2)]


# ---------------------------------------------------------------------------
# violation-injection tests: each audit fires on planted bad data
# ---------------------------------------------------------------------------
def _with_table(mod, docs, fn, *args):
    """Run a registered query against a synthetic frame by swapping the
    module's load_table for the call."""
    orig = mod.load_table
    mod.load_table = lambda s, d, t: docs
    try:
        return fn(*args).collect()
    finally:
        mod.load_table = orig


def test_benford_digit_extraction_at_power_of_ten_boundaries(spark):
    """floor(log10) misbins exact powers of ten; the string-extraction
    path must not. 100.00 -> 1, 999.99 -> 9, 1000.00 -> 1."""
    import mi_inbound_pulsar_spark.operators.aggstats as aggstats_mod

    rows = [(1, 100.00), (2, 999.99), (3, 1000.00), (4, 0.50)]  # 0.50 excluded
    o = spark.createDataFrame(rows, "o_orderkey long, o_totalprice double")
    got = _with_table(
        aggstats_mod, o, aggstats_mod.q_benford_digits, spark, "ignored"
    )
    by_digit = {r["digit"]: r["n_obs"] for r in got}
    assert by_digit == {1: 2, 9: 1}  # 100.00+1000.00 -> 1; 999.99 -> 9;
    #                                  0.50 outside the integer-part domain


def test_k_anonymity_flags_small_classes(spark):
    import mi_inbound_pulsar_spark.operators.aggstats as aggstats_mod

    rows = [(i, 1, "SEG_A") for i in range(10)] + [(99, 2, "SEG_B")]
    c = spark.createDataFrame(
        rows, "c_custkey long, c_nationkey int, c_mktsegment string"
    )
    got = {
        (r["c_nationkey"], r["c_mktsegment"]): r
        for r in _with_table(
            aggstats_mod, c, aggstats_mod.q_k_anonymity, spark, "ignored"
        )
    }
    assert got[(1, "SEG_A")]["k_anonymous"] is True
    assert got[(2, "SEG_B")]["k_anonymous"] is False
    assert got[(2, "SEG_B")]["reident_risk"] == 1.0


def test_gopher_rules_fire_individually(spark):
    """Each planted violation flips exactly its own rule flag."""
    import mi_inbound_pulsar_spark.operators.text as text_mod

    good = "the cat and the dog sat in a field of green grass " * 6  # 60 words
    short = "the cat and a dog"
    symbols = ("the " * 50) + "# " * 20
    no_alpha = " ".join(["1234"] * 60) + " the of"  # mean len in [3,10]
    no_stops = " ".join(f"tok{i}" for i in range(60))
    rows = [
        (1, good.strip()),
        (2, short),
        (3, symbols.strip()),
        (4, no_alpha),
        (5, no_stops),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in _with_table(
            text_mod, docs, text_mod.q_gopher_quality_rules, spark, "ignored"
        )
    }
    assert got[1]["gopher_pass"] is True
    assert got[2]["pass_word_count"] is False
    assert got[3]["pass_symbol_ratio"] is False
    assert got[4]["pass_alpha_ratio"] is False and got[4]["pass_mean_len"] is True
    assert got[5]["pass_stopwords"] is False
    for i in (2, 3, 4, 5):
        assert got[i]["gopher_pass"] is False


def test_neyman_allocation_favors_high_variance_strata(spark):
    """Two strata, equal size: the one with higher char-count variance
    must receive the larger share, and shares must sum to ~1."""
    import mi_inbound_pulsar_spark.operators.sampling as sampling_mod

    rows = [(i, "lo", 100 + (i % 2)) for i in range(50)] + [
        (100 + i, "hi", 100 + 40 * (i % 5)) for i in range(50)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = {
        r["source"]: r
        for r in _with_table(
            sampling_mod, docs, sampling_mod.q_neyman_allocation, spark, "ignored"
        )
    }
    assert got["hi"]["alloc_frac"] > got["lo"]["alloc_frac"]
    assert abs(got["hi"]["alloc_frac"] + got["lo"]["alloc_frac"] - 1.0) < 1e-5
    # cap: no stratum is allocated more docs than it has
    for r in got.values():
        assert r["alloc_docs"] <= r["n_docs"]


def test_adamic_adar_weights_rare_parts_higher(spark):
    """Same common-part count: the pair sharing RARE parts must outscore
    the pair sharing popular parts."""
    from mi_inbound_pulsar_spark.operators.graph import copurchase_pairs  # noqa: F401
    import mi_inbound_pulsar_spark.operators.graph as graph_mod
    import math

    # posting lists: parts p1..p4 rare (df=2, custs 1&2); parts q1..q4
    # popular (df=4, custs 3,4,5,6)
    pl_rows = [(f"p{i}", [1, 2]) for i in range(4)] + [
        (f"q{i}", [3, 4, 5, 6]) for i in range(4)
    ]
    pl = spark.createDataFrame(pl_rows, "part string, custs array<long>")
    orig = graph_mod.part_posting_lists
    graph_mod.part_posting_lists = lambda s, d: pl
    try:
        got = {
            (r["cust_a"], r["cust_b"]): r["aa_score"]
            for r in graph_mod.q_adamic_adar(spark, "ignored").collect()
        }
    finally:
        graph_mod.part_posting_lists = orig
    assert got[(1, 2)] == round(4 / math.log(2), 6)
    assert got[(3, 4)] == round(4 / math.log(4), 6)
    assert got[(1, 2)] > got[(3, 4)]


def test_gini_closed_form(spark):
    """Gini of a known distribution matches the closed form: equal
    spend -> 0; one customer holding everything -> (n-1)/n."""
    import mi_inbound_pulsar_spark.operators.aggstats as aggstats_mod

    equal = spark.createDataFrame(
        [(i, i, 100.0) for i in range(1, 5)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    got = _with_table(aggstats_mod, equal, aggstats_mod.q_gini_spend, spark, "x")[0]
    assert got["gini"] == 0.0

    concentrated = spark.createDataFrame(
        [(1, 1, 400.0)] + [(i, i, 0.0) for i in range(2, 5)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    got = _with_table(
        aggstats_mod, concentrated, aggstats_mod.q_gini_spend, spark, "x"
    )[0]
    assert got["gini"] == 0.75  # (n-1)/n with n=4


def test_weighted_median_closed_form(spark):
    """Hand-checkable weighted median: prices 1,2,3 with weights 1,1,10
    -> the heavy item wins; equal weights -> middle item."""
    import mi_inbound_pulsar_spark.operators.aggstats as aggstats_mod

    rows = [
        ("A", 1, 1, 1.00, 1.0),
        ("A", 2, 1, 2.00, 1.0),
        ("A", 3, 1, 3.00, 10.0),
        ("B", 4, 1, 1.00, 1.0),
        ("B", 5, 1, 2.00, 1.0),
        ("B", 6, 1, 3.00, 1.0),
    ]
    li = spark.createDataFrame(
        rows,
        "l_returnflag string, l_orderkey long, l_linenumber int, "
        "l_extendedprice double, l_quantity double",
    )
    got = {
        r["l_returnflag"]: r["weighted_median_cents"]
        for r in _with_table(
            aggstats_mod, li, aggstats_mod.q_weighted_median, spark, "x"
        )
    }
    assert got["A"] == 300  # weight 10 at price 3.00 dominates
    assert got["B"] == 200  # equal weights -> middle price


def test_equidepth_histogram_bucket_sizes(spark):
    """ANSI ntile semantics: with 25 rows and 10 buckets the first 5
    buckets hold 3 rows, the rest 2; bucket ranges must be ordered and
    non-overlapping."""
    import mi_inbound_pulsar_spark.operators.aggstats as aggstats_mod

    rows = [(i, float(i * 7 % 100) + 1.0) for i in range(1, 26)]
    o = spark.createDataFrame(rows, "o_orderkey long, o_totalprice double")
    got = _with_table(
        aggstats_mod, o, aggstats_mod.q_equidepth_histogram, spark, "x"
    )
    sizes = [r["n_rows"] for r in got]
    assert sizes == [3] * 5 + [2] * 5
    for prev, cur in zip(got, got[1:]):
        assert prev["hi_cents"] <= cur["lo_cents"]


def test_cms_topk_audit_one_sided(spark, sf_dir):
    """Count-Min never underestimates: both overestimate bounds must be
    >= 0, and the top-k overlap is within [0, k]."""
    from mi_inbound_pulsar_spark.operators.aggstats import q_cms_topk_audit

    r = q_cms_topk_audit(spark, sf_dir).collect()[0]
    assert r["min_overestimate_topk"] >= 0
    assert r["max_overestimate_topk"] >= r["min_overestimate_topk"]
    assert 0 <= r["n_overlap"] <= r["k"]


def test_ngram_novelty_first_doc_is_fully_novel(spark):
    """The lowest-id document owns all its shingles; an exact copy that
    arrives later has novelty 0."""
    import mi_inbound_pulsar_spark.operators.dedup as dedup_mod

    text = " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in _with_table(
            dedup_mod, docs, dedup_mod.q_ngram_novelty, spark, "x"
        )
    }
    assert got[1]["novelty"] == 1.0
    assert got[2]["novelty"] == 0.0
    assert got[1]["n_shingles"] == 28  # 30 - 3 + 1


def test_retrieval_mrr_bounds_and_planted_hit(spark):
    """MRR lies in (0, 1]; a corpus where each query doc's rare terms
    are unique to it must score a perfect MRR of 1.0."""
    import mi_inbound_pulsar_spark.operators.text as text_mod

    common = "the quick brown fox jumps over lazy dogs again and again"
    rows = [
        (0, common + " zebraword0 xylophone0"),
        (1, common + " zebraword1 xylophone1"),
        (2, common + " zebraword2 xylophone2"),
        (3, common + " zebraword3 xylophone3"),
        (4, common + " zebraword4 xylophone4"),
        (5, common + " filler text body here"),
        (6, common + " other filler body too"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = _with_table(
        text_mod, docs, text_mod.q_retrieval_mrr, spark, "x"
    )[0]
    assert got["n_queries"] == 5
    assert got["mrr"] == 1.0  # unique rare terms -> source ranks first
    assert got["n_hits_top10"] == 5


def test_packed_pair_key_casts_narrow_ids_to_long(spark):
    """Regression: shiftleft on an INT (or string→INT coercion) is a
    32-bit shift, so ``<< 32`` silently no-ops and every pair collapses
    onto doc_b's key. The helper must cast to LONG first."""
    import pyspark.sql.functions as F

    from mi_inbound_pulsar_spark.operators.dedup import packed_pair_key

    df = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "a int, b int"
    ).union(spark.createDataFrame([(1, 2)], "a string, b string").selectExpr(
        "cast(a as int) a", "cast(b as int) b"))
    keys = [
        r["pk"]
        for r in df.select(
            packed_pair_key(F.col("a"), F.col("b")).alias("pk")
        ).collect()
    ]
    assert sorted(set(keys)) == [(1 << 32) | 2, (1 << 32) | 3, (2 << 32) | 3]
