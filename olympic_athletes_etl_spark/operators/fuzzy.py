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
4. fact rows join back to the canonicalized dim by exact key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_block_pairs(
    names: DataFrame,
    name_col: str,
    block_col: Column,
    max_dist: int,
) -> DataFrame:
    """Candidate near-match pairs (a < b lexicographically) among
    ``names`` rows sharing a block key, with edit distance ≤ max_dist.
    Returns (name_a, name_b, dist). ``names`` should already be the
    distinct value dim."""
    dim = names.select(
        F.col(name_col).alias("__name"), block_col.alias("__blk")
    ).dropDuplicates(["__name"])
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
) -> DataFrame:
    """One-hop fuzzy canonical assignment: every name maps to the
    lexicographic MIN over its ≤ max_dist in-block neighborhood
    (including itself). Returns (name, canonical). Deliberately one-hop
    — deterministic, single-join, and idempotent to re-runs; full
    transitive-closure clustering is d_dup_clusters' iterative CC,
    which composes on top via the pair list when chains matter."""
    dim = names.select(
        F.col(name_col).alias("__name"), block_col.alias("__blk")
    ).dropDuplicates(["__name"])
    left = dim.select(F.col("__name").alias("name"), "__blk")
    right = dim.select(F.col("__name").alias("cand"), "__blk")
    return (
        left.join(right, on="__blk")
        .filter(F.abs(F.length("name") - F.length("cand")) <= max_dist)
        .filter(F.levenshtein("name", "cand") <= max_dist)
        .groupBy("name")
        .agg(F.min("cand").alias("canonical"))
    )
