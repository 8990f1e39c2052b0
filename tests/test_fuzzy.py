"""operators.fuzzy — blocked edit-distance matching invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from olympic_athletes_etl_spark.operators.fuzzy import (
    fuzzy_block_pairs,
    fuzzy_canonicalize,
)

def _block():
    # built lazily: pyspark 4 column functions need an active context
    return F.split(F.col("name"), " ").getItem(0)


def _dim(spark, names):
    return spark.createDataFrame([(n,) for n in names], ["name"])


def test_fuzzy_pairs_known_distances(spark):
    names = ["small ring", "small rings", "small bolt", "large ring"]
    pairs = {
        (r["name_a"], r["name_b"]): r["dist"]
        for r in fuzzy_block_pairs(_dim(spark, names), "name", _block(), 4).collect()
    }
    # one insertion
    assert pairs[("small ring", "small rings")] == 1
    # ring→bolt = 4 substitutions
    assert pairs[("small bolt", "small ring")] == 4
    # different block ("large ...") never pairs, even though dist("large
    # ring","small ring")=4 would pass the distance gate
    assert not any("large ring" in p for p in pairs)
    # a < b ordering, no self-pairs, no duplicates
    assert all(a < b for a, b in pairs)


def test_fuzzy_pairs_length_prefilter_consistent(spark):
    # length gap > max_dist implies dist > max_dist: the prefilter must
    # not change results, only skip work — verify no pair violates it
    names = ["abc x", "abc xxxxxxxxxx", "abc xy"]
    pairs = fuzzy_block_pairs(_dim(spark, names), "name", _block(), 3).collect()
    assert {(r["name_a"], r["name_b"]) for r in pairs} == {("abc x", "abc xy")}


def test_fuzzy_canonicalize_min_and_isolates(spark):
    names = ["small ring", "small rings", "small bolt", "zzz unique"]
    canon = {
        r["name"]: r["canonical"]
        for r in fuzzy_canonicalize(_dim(spark, names), "name", _block(), 2).collect()
    }
    assert canon["zzz unique"] == "zzz unique"  # isolate maps to itself
    assert canon["small rings"] == "small ring"  # dist 1 neighbor wins
    assert canon["small ring"] == "small ring"
    # bolt is 4 edits from ring: outside max_dist=2 → self
    assert canon["small bolt"] == "small bolt"
    assert set(canon) == set(names)  # total: every name assigned


def test_fuzzy_canonicalize_is_idempotent(spark):
    names = ["small ring", "small rings", "small ringz"]
    first = fuzzy_canonicalize(_dim(spark, names), "name", _block(), 2)
    canon_names = first.select(
        F.col("canonical").alias("name")
    ).dropDuplicates()
    second = {
        r["name"]: r["canonical"]
        for r in fuzzy_canonicalize(canon_names, "name", _block(), 2).collect()
    }
    # re-canonicalizing the canonical set is the identity
    assert all(k == v for k, v in second.items())


# ---------------------------------------------------------------------------
# hot-block cap — the skew guard for degenerate corpora
# ---------------------------------------------------------------------------
def test_fuzzy_pairs_block_cap_drops_hot_block_only(spark):
    # "the" block has 5 members (> cap 3) and is dropped wholesale;
    # the 2-member "small" block survives untouched.
    names = [f"the part {i}" for i in range(5)] + ["small ring", "small rings"]
    capped = fuzzy_block_pairs(
        _dim(spark, names), "name", _block(), 4, block_cap=3
    ).collect()
    got = {(r["name_a"], r["name_b"]) for r in capped}
    assert got == {("small ring", "small rings")}
    # uncapped finds the hot-block pairs too — the cap is the only delta
    uncapped = {
        (r["name_a"], r["name_b"])
        for r in fuzzy_block_pairs(
            _dim(spark, names), "name", _block(), 4
        ).collect()
    }
    assert got < uncapped
    assert all(a.startswith("the") and b.startswith("the")
               for a, b in uncapped - got)


def test_fuzzy_canonicalize_block_cap_keeps_total_assignment(spark):
    # every input name must still get a canonical; hot-block names map
    # to themselves (neighborhood search skipped, not the assignment)
    names = [f"the part {i}" for i in range(5)] + ["small ring", "small rings"]
    out = {
        r["name"]: r["canonical"]
        for r in fuzzy_canonicalize(
            _dim(spark, names), "name", _block(), 4, block_cap=3
        ).collect()
    }
    assert set(out) == set(names)
    for n in names:
        if n.startswith("the"):
            assert out[n] == n
    assert out["small ring"] == "small ring"
    assert out["small rings"] == "small ring"


def test_fuzzy_canonicalize_cap_none_unchanged(spark):
    # block_cap=None is the pre-cap behavior, bit for bit
    names = ["small ring", "small rings", "large bolt"]
    base = sorted(
        tuple(r)
        for r in fuzzy_canonicalize(
            _dim(spark, names), "name", _block(), 4
        ).collect()
    )
    capped = sorted(
        tuple(r)
        for r in fuzzy_canonicalize(
            _dim(spark, names), "name", _block(), 4, block_cap=None
        ).collect()
    )
    assert base == capped
