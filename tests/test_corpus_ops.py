"""Semantic invariants for the late-round-3 training-pipeline operators:
incremental dedup, cluster canonicalization, unigram commonness, and
calendar-spine gap detection.

The DuckDB oracle (tools/check_parity.py) pins cross-engine value
equality; these pin the invariants an oracle that mirrored a bug could
not catch (disjointness, membership, mass conservation, span arithmetic).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from olympic_athletes_etl_spark.plans.dedup_q import (
    d_cluster_canonical,
    d_dup_clusters,
    d_incremental_dedup,
)
from olympic_athletes_etl_spark.plans.events_q import e_gap_days
from olympic_athletes_etl_spark.plans.tables import load
from olympic_athletes_etl_spark.plans.textstats import (
    t_token_count,
    t_unigram_commonness,
)


# ---------------------------------------------------------------------------
# d_incremental_dedup
# ---------------------------------------------------------------------------
def test_incremental_dedup_survivors_are_new_and_unique(spark, sf_dir):
    rows = d_incremental_dedup(spark, sf_dir).collect()
    assert rows, "incoming batch fully deduped away — fixture degenerate"
    # one survivor per content hash, all from the incoming batch
    hashes = [r["content_hash"] for r in rows]
    assert len(hashes) == len(set(hashes))
    assert all(r["doc_id"] >= 400 for r in rows)
    # survivors' hashes are disjoint from the corpus partition
    corpus_hashes = {
        r["h"]
        for r in load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 400)
        .select(F.md5("text").alias("h"))
        .collect()
    }
    assert not corpus_hashes.intersection(hashes)


def test_incremental_dedup_keeps_first_arrival(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") >= 400)
    first_per_hash = {
        r["h"]: r["first_id"]
        for r in docs.select("doc_id", F.md5("text").alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("first_id"))
        .collect()
    }
    for r in d_incremental_dedup(spark, sf_dir).collect():
        assert r["doc_id"] == first_per_hash[r["content_hash"]]


# ---------------------------------------------------------------------------
# d_cluster_canonical
# ---------------------------------------------------------------------------
def test_cluster_canonical_covers_all_docs_once(spark, sf_dir):
    canon = d_cluster_canonical(spark, sf_dir).collect()
    clusters = d_dup_clusters(spark, sf_dir).collect()
    n_docs = load(spark, sf_dir, "documents").count()
    # one canonical row per cluster; member counts partition the corpus
    assert len(canon) == len({r["cluster"] for r in clusters})
    assert sum(r["n_members"] for r in canon) == n_docs


def test_cluster_canonical_picks_longest_member(spark, sf_dir):
    chars = {
        r["doc_id"]: r["n_chars"]
        for r in load(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    }
    members: dict[int, list[int]] = {}
    for r in d_dup_clusters(spark, sf_dir).collect():
        members.setdefault(r["cluster"], []).append(r["doc_id"])
    for r in d_cluster_canonical(spark, sf_dir).collect():
        group = members[r["cluster"]]
        assert r["canonical_doc"] in group
        best = max(chars[d] for d in group)
        assert r["canonical_chars"] == best == chars[r["canonical_doc"]]
        # tie-break: lowest doc_id among maximal members
        assert r["canonical_doc"] == min(d for d in group if chars[d] == best)


# ---------------------------------------------------------------------------
# t_unigram_commonness
# ---------------------------------------------------------------------------
def test_unigram_commonness_token_counts_and_bounds(spark, sf_dir):
    rows = t_unigram_commonness(spark, sf_dir).collect()
    tok_counts = {
        r["doc_id"]: r["n_tokens"] for r in t_token_count(spark, sf_dir).collect()
    }
    assert len(rows) == len(tok_counts)
    for r in rows:
        # lower() doesn't change whitespace → same token count as t_token_count
        assert r["n_tokens"] == tok_counts[r["doc_id"]]
        # mean frequency is ≥ 1 (every token occurs at least once — itself)
        assert r["mean_token_freq"] >= 1.0
        assert r["freq_sum"] >= r["n_tokens"]
        assert abs(r["mean_token_freq"] - r["freq_sum"] / r["n_tokens"]) < 1e-9


# ---------------------------------------------------------------------------
# e_gap_days
# ---------------------------------------------------------------------------
def test_gap_days_span_arithmetic(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    act = events.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    span = {
        r["user_id"]: (r["d0"], r["d1"], r["nd"])
        for r in act.groupBy("user_id")
        .agg(
            F.min("d").alias("d0"),
            F.max("d").alias("d1"),
            F.count(F.lit(1)).alias("nd"),
        )
        .collect()
    }
    gaps: dict[int, int] = {}
    for r in e_gap_days(spark, sf_dir).collect():
        gaps[r["user_id"]] = gaps.get(r["user_id"], 0) + 1
    for uid, (d0, d1, nd) in span.items():
        span_days = (d1 - d0).days + 1
        assert gaps.get(uid, 0) == span_days - nd, uid


def test_bm25_scores_only_matching_docs_within_bounds(spark, sf_dir):
    from pyspark.sql import functions as F

    from olympic_athletes_etl_spark.plans.tables import load
    from olympic_athletes_etl_spark.plans.textstats import (
        _BM25_TERMS,
        _BM25_TOPN,
        t_bm25_rank,
    )

    rows = t_bm25_rank(spark, sf_dir).collect()
    assert 0 < len(rows) <= _BM25_TOPN
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    # every scored doc actually contains a query term, and the score
    # respects the analytic ceiling: tf saturation < (k1+1)*1000 = 2500
    # per term, idf <= bits(N), at most len(terms) terms contribute
    matching = {
        r["doc_id"]
        for r in docs.filter(
            " OR ".join(
                f"array_contains(split(text, '\\\\s+'), '{t}')"
                for t in _BM25_TERMS
            )
        ).collect()
    }
    ceiling = 2500 * len(_BM25_TERMS) * n_docs.bit_length()
    for r in rows:
        assert r["doc_id"] in matching
        assert 0 < r["score_x1000"] <= ceiling
    # descending by construction; ties broken by doc_id
    scores = [r["score_x1000"] for r in rows]
    assert scores == sorted(scores, reverse=True)
