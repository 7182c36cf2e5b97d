"""Skew guards for the candidate-generating joins (SURVEY.md §2.2 B51):
shingle document-frequency cap (ngram_jaccard_pairs) and per-bucket size
caps (minhash_lsh_pairs / simhash_pairs). A group of k rows self-joins
into O(k²) candidates, so these caps are what keep the operators from
going quadratic on boilerplate-heavy corpora.
"""

from lookup_transform_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_ngram_cap_above_df_is_exact(spark):
    # no shingle reaches the cap → identical output with and without it
    rows = [
        (1, "the quick brown fox jumps high", "s"),
        (2, "the quick brown fox jumps low", "s"),
        (3, "an entirely different document here now", "s"),
    ]
    capped = ngram_jaccard_pairs(
        _docs(spark, rows), threshold=0.1, max_shingle_df=1000
    ).collect()
    uncapped = ngram_jaccard_pairs(
        _docs(spark, rows), threshold=0.1, max_shingle_df=None
    ).collect()
    assert sorted(map(tuple, capped)) == sorted(map(tuple, uncapped))
    assert len(capped) == 1  # only (1, 2) overlap


def test_ngram_cap_drops_stop_shingle_pairs(spark):
    # "lorem ipsum dolor" appears in every doc (DF=4 > cap=3); pairs that
    # share ONLY that boilerplate produce no join rows and disappear,
    # while the pair sharing rare shingles survives.
    boiler = "lorem ipsum dolor"
    rows = [
        (1, boiler + " alpha beta gamma delta", "s"),
        (2, boiler + " alpha beta gamma epsilon", "s"),
        (3, boiler + " zeta eta theta iota", "s"),
        (4, boiler + " kappa mu nu xi", "s"),
    ]
    got = ngram_jaccard_pairs(
        _docs(spark, rows), threshold=0.05, max_shingle_df=3
    ).collect()
    pairs = {(r.doc_id_a, r.doc_id_b) for r in got}
    assert pairs == {(1, 2)}
    # denominators keep FULL shingle counts: jaccard is a lower bound of
    # the uncapped value, never inflated by the exclusion
    uncapped = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            _docs(spark, rows), threshold=0.05, max_shingle_df=None
        ).collect()
    }
    for r in got:
        assert r.jaccard <= uncapped[(r.doc_id_a, r.doc_id_b)]


def test_minhash_bucket_cap_suppresses_degenerate_bucket(spark):
    # 6 identical docs collide in every band-bucket: cap=5 < 6 drops the
    # saturated buckets → no candidate survives; cap=None emits all 15.
    rows = [(i, "same exact text in every document", "s") for i in range(6)]
    capped = minhash_lsh_pairs(_docs(spark, rows), max_bucket_size=5).collect()
    assert capped == []
    full = minhash_lsh_pairs(_docs(spark, rows), max_bucket_size=None).collect()
    assert len(full) == 15


def test_minhash_cap_above_bucket_size_is_exact(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta", "s"),
        (2, "alpha beta gamma delta epsilon zeta eta iota", "s"),
        (3, "completely unrelated words occupy this entire doc", "s"),
    ]
    capped = minhash_lsh_pairs(
        _docs(spark, rows), threshold=0.3, max_bucket_size=1000
    ).collect()
    uncapped = minhash_lsh_pairs(
        _docs(spark, rows), threshold=0.3, max_bucket_size=None
    ).collect()
    assert sorted(map(tuple, capped)) == sorted(map(tuple, uncapped))
    assert {(r.doc_id_a, r.doc_id_b) for r in capped} == {(1, 2)}


def test_simhash_bucket_cap(spark):
    rows = [(i, "identical text for the simhash cap test", "s") for i in range(6)]
    capped = simhash_pairs(_docs(spark, rows), max_bucket_size=5).collect()
    assert capped == []
    full = simhash_pairs(_docs(spark, rows), max_bucket_size=None).collect()
    assert len(full) == 15
    # cap above the bucket size keeps every pair
    wide = simhash_pairs(_docs(spark, rows), max_bucket_size=1000).collect()
    assert len(wide) == 15
