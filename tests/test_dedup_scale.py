"""Scale guards on the dedup operators: the hot-shingle DF cap bounds
the jaccard self-join, and 64-bit banded SimHash finds planted
near-dups while capping boilerplate buckets."""

import pandas as pd
from pyspark.sql import functions as F

from movex_cdc_spark.operators.dedup import (
    connected_components,
    duplicate_groups_from_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash64_banded_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_hot_shingle_cap_bounds_pair_explosion(spark):
    """One boilerplate line shared by every doc (a license header at
    10^10 docs) must not explode the candidate self-join: with the DF
    cap the block is dropped entirely; without it the pair count is
    quadratic in corpus size."""
    boiler = "licensed under the apache license version two"
    n = 60
    rows = [(i, f"{boiler} unique{i}a unique{i}b unique{i}c unique{i}d") for i in range(n)]
    df = _docs(spark, rows)

    uncapped = ngram_jaccard_pairs(df, n=3, threshold=0.01, max_shingle_df=None)
    capped = ngram_jaccard_pairs(df, n=3, threshold=0.01, max_shingle_df=10)
    n_uncapped, n_capped = uncapped.count(), capped.count()
    # every pair of docs shares the boilerplate shingles -> full n*(n-1)/2
    assert n_uncapped == n * (n - 1) // 2
    # the boilerplate shingles all have df = n > cap -> no block survives
    assert n_capped == 0

    # a genuine near-dup (sharing RARE shingles) still surfaces under the cap
    df2 = _docs(spark, rows + [(999, "unique5a unique5b unique5c unique5d tail")])
    found = (
        ngram_jaccard_pairs(df2, n=3, threshold=0.05, max_shingle_df=10)
        .filter((F.col("id_a") == 5) & (F.col("id_b") == 999))
        .count()
    )
    assert found == 1


def test_connected_components_and_keeper_election(spark):
    # chain 1-2-3-4 (diameter 3), clique {10,11,12}, pair {20,21}
    pairs = spark.createDataFrame(
        pd.DataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21)],
            columns=["id_a", "id_b"],
        )
    )
    cc = {r["doc_id"]: r["component"] for r in connected_components(pairs).collect()}
    assert cc[1] == cc[2] == cc[3] == cc[4] == 1
    assert cc[10] == cc[11] == cc[12] == 10
    assert cc[20] == cc[21] == 20

    groups = {r["keeper_id"]: r for r in duplicate_groups_from_pairs(pairs).collect()}
    assert set(groups) == {1, 10, 20}
    assert groups[1]["members"] == [1, 2, 3, 4] and groups[1]["n_docs"] == 4
    assert groups[10]["members"] == [10, 11, 12]
    assert groups[20]["members"] == [20, 21]


def test_simhash64_banded_near_dups_and_bucket_cap(spark):
    base = " ".join(f"tok{i}word{i * 7 % 13}" for i in range(40))
    near = base.replace("tok3word8", "tok3word9")  # one-token edit
    rows = [(1, base), (2, near)]
    # unrelated docs with disjoint vocabularies
    rows += [(10 + j, " ".join(f"other{j}tok{i}" for i in range(40))) for j in range(8)]
    df = _docs(spark, rows)

    fp = {r["doc_id"]: r["simhash"] for r in simhash64(df).collect()}
    assert all(len(v) == 64 for v in fp.values())
    hamming = sum(a != b for a, b in zip(fp[1], fp[2]))
    assert hamming < 16  # one-token edit barely moves a 64-bit fingerprint

    pairs = {
        (r["id_a"], r["id_b"]): r["n_bands_equal"]
        for r in simhash64_banded_pairs(df, n_bands=4).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1

    # boilerplate cluster: many docs with IDENTICAL text share all 4
    # bands; a bucket cap below the cluster size drops the block
    clones = [(100 + j, "same same text for every clone doc") for j in range(12)]
    dfc = _docs(spark, clones)
    uncapped = simhash64_banded_pairs(dfc, n_bands=4).count()
    capped = simhash64_banded_pairs(dfc, n_bands=4, max_bucket_size=5).count()
    assert uncapped == 12 * 11 // 2
    assert capped == 0


def test_pairs_within_groups_singleton_guard(spark):
    """sequence(1, 0) DESCENDS in Spark, so an unguarded pair generator
    emits a bogus (null, id) pair for singleton id arrays — the guard
    lives INSIDE the expression, no caller pre-filter needed, and must
    not coerce the id type."""
    from movex_cdc_spark.operators.dedup import pairs_within_groups

    grouped = spark.createDataFrame(
        [([1],), ([10, 20, 30],)], "ids: array<bigint>"
    )
    got = pairs_within_groups(grouped).orderBy("id_a", "id_b").collect()
    assert [(r.id_a, r.id_b) for r in got] == [(10, 20), (10, 30), (20, 30)]
    assert got[0].id_a is not None
    # type preserved (a literal array() guard would coerce to string)
    assert dict(pairs_within_groups(grouped).dtypes)["id_a"] == "bigint"


def test_jaccard_lsh_verified_exact_on_candidates(spark):
    """The minhash-pregated path (VERDICT r5 item 7) must (a) emit a
    SUBSET of the uncapped exact pair set, (b) agree with the exact
    operator on every pair it emits (the verify stage is exact, only
    recall is probabilistic), and (c) find every pair the banding
    guarantees (identical docs share all bands)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from movex_cdc_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pregated,
    )

    base = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",   # near-dup of 0
        "one two three four five six seven eight nine",
        "one two three four five six seven eight nine",   # exact dup of 2
        "totally different words with no overlap at all",
    ]
    rows = [(i, t) for i, t in enumerate(base)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, n=3, threshold=0.05, max_shingle_df=None
        ).collect()
    }
    gated = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pregated(df, n=3, threshold=0.05).collect()
    }
    assert set(gated) <= set(exact)          # subset: pre-gate only removes
    for pair, j in gated.items():
        assert j == exact[pair]              # verify stage is exact
    assert gated[(2, 3)] == 1.0              # exact dups always band-collide
    assert (0, 1) in gated                   # 6/8 shared shingles: j=0.5 pair found
