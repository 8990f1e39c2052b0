"""Fuzzy string matching (edit-distance) — blocked, never all-pairs.

Closes the one declared-but-unbuilt reference capability: the reference
ships ``rapidfuzz`` in pandas_based/requirements.txt:10 but never calls
it. Here fuzzy matching is a first-class operator pair, built on the
JVM-side ``levenshtein`` expression (whole-stage codegen; no Python in
the match path).

Scale shape (the record-linkage canon — Fellegi-Sunter blocking):

1. match the DISTINCT value dim, not fact rows — names grow sub-linearly
   (Heaps' law) while facts grow linearly, so the quadratic step runs on
   the small set;
2. BLOCK by a cheap deterministic key (first token here); candidate
   pairs come only from intra-block joins — an equi-join shuffle, never
   a cross join;
3. prefilter by length difference: ``|len(a)-len(b)| > k`` implies
   ``levenshtein > k``, so the O(len²) distance only runs on survivors;
4. fact rows join back to the canonicalized dim by exact key;
5. optionally CAP hot blocks (``block_cap``): a block key shared by more
   than ``block_cap`` distinct names is dropped before the intra-block
   self-join — the same skew guard as d_minhash_lsh's stop-shingles and
   m_image_neardup's hot bands. The first-token dim is Heaps-law
   sublinear so blocks are usually small, but a pathological corpus
   (every record starting "THE" / a constant filler token) would make
   one block quadratic; the cap bounds per-block work at
   ``block_cap²`` at the cost of recall inside degenerate blocks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cap_hot_blocks(dim: DataFrame, block_cap: int | None) -> DataFrame:
    """Drop rows whose ``__blk`` is shared by > block_cap distinct names.

    The hot-block dim is one row per distinct block key — tiny next to
    the name dim — so it broadcasts into the anti-join."""
    if block_cap is None:
        return dim
    hot = (
        dim.groupBy("__blk")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > block_cap)
        .select("__blk")
    )
    return dim.join(F.broadcast(hot), "__blk", "left_anti")


def fuzzy_block_pairs(
    names: DataFrame,
    name_col: str,
    block_col: Column,
    max_dist: int,
    block_cap: int | None = None,
) -> DataFrame:
    """Candidate near-match pairs (a < b lexicographically) among
    ``names`` rows sharing a block key, with edit distance ≤ max_dist.
    Returns (name_a, name_b, dist). ``names`` should already be the
    distinct value dim. ``block_cap`` drops blocks with more than that
    many distinct names before the self-join (see module docstring)."""
    dim = _cap_hot_blocks(
        names.select(
            F.col(name_col).alias("__name"), block_col.alias("__blk")
        ).dropDuplicates(["__name"]),
        block_cap,
    )
    a = dim.select(F.col("__name").alias("name_a"), F.col("__blk").alias("__blk"))
    b = dim.select(F.col("__name").alias("name_b"), F.col("__blk").alias("__blk"))
    return (
        a.join(b, on="__blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(
            F.abs(F.length("name_a") - F.length("name_b")) <= max_dist
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "dist")
    )


def fuzzy_canonicalize(
    names: DataFrame,
    name_col: str,
    block_col: Column,
    max_dist: int,
    block_cap: int | None = None,
) -> DataFrame:
    """One-hop fuzzy canonical assignment: every name maps to the
    lexicographic MIN over its ≤ max_dist in-block neighborhood
    (including itself). Returns (name, canonical). Deliberately one-hop
    — deterministic, single-join, and idempotent to re-runs; full
    transitive-closure clustering is d_dup_clusters' iterative CC,
    which composes on top via the pair list when chains matter.

    ``block_cap`` caps hot blocks (module docstring); names inside a
    dropped block still appear in the output — as their own canonical —
    because every name must get an assignment; only the quadratic
    neighborhood search is skipped for them."""
    dim = names.select(
        F.col(name_col).alias("__name"), block_col.alias("__blk")
    ).dropDuplicates(["__name"])
    capped = _cap_hot_blocks(dim, block_cap)
    left = capped.select(F.col("__name").alias("name"), "__blk")
    right = capped.select(F.col("__name").alias("cand"), "__blk")
    assigned = (
        left.join(right, on="__blk")
        .filter(F.abs(F.length("name") - F.length("cand")) <= max_dist)
        .filter(F.levenshtein("name", "cand") <= max_dist)
        .groupBy("name")
        .agg(F.min("cand").alias("canonical"))
    )
    if block_cap is None:
        return assigned
    # names in dropped blocks: self-canonical (total assignment contract)
    skipped = dim.join(capped, "__name", "left_anti").select(
        F.col("__name").alias("name"), F.col("__name").alias("canonical")
    )
    return assigned.unionByName(skipped)
