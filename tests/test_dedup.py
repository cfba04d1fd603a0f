"""MinHash-LSH dedup on crafted near-duplicates — proves the funnel
finds what it should (the driver corpus has no planted dups, so the
oracle parity alone can't show recall)."""

from __future__ import annotations

from pyspark.sql import functions as F

from synthetic_data_pipeline_spark.operators.dedup import (
    distinct_shingles,
    lsh_candidates,
    minhash_signatures,
    token_jaccard,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the river runs "
    "slowly past the quiet mill and the miller watches the water turn "
    "the old wheel beneath a pale morning sky"
)


def _corpus(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact duplicate of 0
        (2, BASE.replace("pale morning", "grey evening")),  # near-dup of 0
        (3, "completely different content about spark shuffles and "
            "partitions and adaptive query execution plans at scale"),
        (4, "yet another unrelated document mentioning embeddings "
            "vectors cosine similarity and approximate neighbors"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_finds_planted_dups(spark):
    docs = _corpus(spark)
    sig = minhash_signatures(docs)
    cands = lsh_candidates(sig)
    pairs = {(r.doc_a, r.doc_b) for r in cands.collect()}
    assert (0, 1) in pairs, "exact dup must collide in every band"
    assert (0, 2) in pairs or (1, 2) in pairs, "near-dup should collide"

    jac = token_jaccard(distinct_shingles(docs), cands).collect()
    by_pair = {(r.doc_a, r.doc_b): r.jaccard for r in jac}
    assert by_pair[(0, 1)] == 1.0
    if (0, 2) in by_pair:
        assert 0.5 < by_pair[(0, 2)] < 1.0
    # unrelated docs never become verified near-dups
    for (a, b), j in by_pair.items():
        if 3 in (a, b) or 4 in (a, b):
            assert j < 0.5


def test_signatures_deterministic(spark):
    docs = _corpus(spark)
    a = sorted(map(tuple, minhash_signatures(docs).collect()))
    b = sorted(map(tuple, minhash_signatures(docs.repartition(7)).collect()))
    assert a == b
