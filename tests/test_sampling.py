"""Deterministic-sampling invariants: split ratios, growth stability,
chunk reconstruction, mixture monotonicity."""

from __future__ import annotations

from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.operators.sampling import (
    hash_bucket,
    q_doc_chunking,
    q_hash_split,
    q_quota_sample,
)
from mi_inbound_pulsar_spark.sources.tables import load_table


def test_hash_split_ratios_and_coverage(spark, sf_dir):
    rows = {r["split"]: r["n_docs"] for r in q_hash_split(spark, sf_dir).collect()}
    total = sum(rows.values())
    assert total == load_table(spark, sf_dir, "documents").count()
    # expected 80.1 / 9.8 / 10.2 — generous tolerance at small n
    assert 0.70 <= rows["train"] / total <= 0.90
    assert 0.03 <= rows["val"] / total <= 0.18
    assert 0.03 <= rows["test"] / total <= 0.18


def test_hash_split_stable_under_corpus_growth(spark, sf_dir):
    """A document's split assignment must not depend on what else is in
    the corpus — subset the corpus, assignments stay identical."""
    d = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"), "split-")
    tag = F.when(b < "cd", "train").when(b < "e6", "val").otherwise("test")
    full = {r["doc_id"]: r["s"] for r in d.select("doc_id", tag.alias("s")).collect()}
    sub = {
        r["doc_id"]: r["s"]
        for r in d.filter(F.col("doc_id") % 3 == 0).select("doc_id", tag.alias("s")).collect()
    }
    assert sub and all(full[k] == v for k, v in sub.items())


def test_doc_chunking_reconstructs_token_counts(spark, sf_dir):
    """Chunk sizes per doc must sum to the doc's token count, every chunk
    but the last must be exactly the budget."""
    chunks = q_doc_chunking(spark, sf_dir).collect()
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    truth = {
        r["doc_id"]: r["n"]
        for r in d.select("doc_id", F.size(F.split("text", " ")).alias("n")).collect()
    }
    per_doc: dict = {}
    for r in chunks:
        per_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["n_chunk_tokens"]))
    assert set(per_doc) == {k for k, n in truth.items() if n > 0}
    for doc, parts in per_doc.items():
        parts.sort()
        assert [c for c, _ in parts] == list(range(len(parts)))  # dense chunk ids
        assert sum(n for _, n in parts) == truth[doc]
        assert all(n == 50 for _, n in parts[:-1])  # full chunks before the ragged tail
        assert 1 <= parts[-1][1] <= 50


def test_quota_sample_is_deterministic_and_bounded(spark, sf_dir):
    a = {(r["lang"], r["rn"], r["doc_id"]) for r in q_quota_sample(spark, sf_dir).collect()}
    b = {(r["lang"], r["rn"], r["doc_id"]) for r in q_quota_sample(spark, sf_dir).collect()}
    assert a == b and a
    per_lang: dict = {}
    for lang, rn, _ in a:
        per_lang[lang] = max(per_lang.get(lang, 0), rn)
    assert all(v <= 10 for v in per_lang.values())


def test_mixture_rates_and_monotonicity(spark, sf_dir):
    """Kept fraction tracks the per-source rate; halving a rate only
    removes documents (hash thresholding is monotone)."""
    d = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"), "mix-")
    kept_50 = {r["doc_id"] for r in d.filter(b <= "80").select("doc_id").collect()}
    kept_25 = {r["doc_id"] for r in d.filter(b <= "40").select("doc_id").collect()}
    assert kept_25 < kept_50  # strictly nested: retuning never swaps docs
    n = d.count()
    assert 0.35 <= len(kept_50) / n <= 0.65
    assert 0.12 <= len(kept_25) / n <= 0.40


def test_sampling_ops_are_shuffle_free_before_aggregate(spark, sf_dir):
    """The split/chunk assignment itself must be a narrow projection —
    the only Exchange in the plan is the final (tiny) aggregate."""
    plan = q_doc_chunking(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    # chunking has no aggregate at all: the only exchange is the orderBy sort
    assert "Exchange hashpartitioning" not in plan


def test_sequence_packing_offsets_are_contiguous(spark, sf_dir):
    """Per source stream: offsets tile exactly (no gaps/overlaps) and
    pack ids match the 512-token window arithmetic."""
    from mi_inbound_pulsar_spark.operators.sampling import q_sequence_packing

    rows = q_sequence_packing(spark, sf_dir).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert by_src
    for src, docs in by_src.items():
        docs.sort(key=lambda r: r["doc_id"])
        expect = 0
        for r in docs:
            assert r["stream_offset"] == expect
            assert r["pack_start"] == r["stream_offset"] // 512
            assert r["pack_end"] == (r["stream_offset"] + r["n_tokens"] - 1) // 512
            assert r["pack_end"] >= r["pack_start"]
            expect += r["n_tokens"]


def test_training_pipeline_is_two_shuffles(spark, sf_dir):
    """Flagship E2E plan shape: quality gate and split fuse into the
    scan stage; the only hash shuffles are the dedup groupBy and the
    packing window (plus the presentation sort)."""
    from mi_inbound_pulsar_spark.operators.sampling import q_training_data_pipeline

    plan = (
        q_training_data_pipeline(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_feature_hashing_is_consistent_and_bounded(spark, sf_dir):
    import hashlib

    from mi_inbound_pulsar_spark.operators.sampling import q_feature_hashing
    from mi_inbound_pulsar_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    docs = {r.doc_id: r.text.split(" ") for r in d.collect()}
    rows = q_feature_hashing(spark, sf_dir).collect()
    by_doc: dict = {}
    for r in rows:
        assert 0 <= r.bucket < 64
        by_doc.setdefault(r.doc_id, {})[r.bucket] = r.cnt
    assert set(by_doc) == set(docs)
    for doc_id, w in docs.items():
        # counts partition the token stream
        assert sum(by_doc[doc_id].values()) == len(w)
        # same bucket function as hashlib md5 prefix
        expected: dict = {}
        for t in w:
            h = hashlib.md5(t.encode()).hexdigest()
            b = (int(h[0], 16) * 16 + int(h[1], 16)) % 64
            expected[b] = expected.get(b, 0) + 1
        assert by_doc[doc_id] == expected
