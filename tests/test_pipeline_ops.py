"""Structural tests for the round-3 pipeline operators: chunking,
n-gram frequency, PII scrubbing, substring-window dedup, transition
matrix, and value histogram.

The DuckDB oracle (tools/check_parity.py) pins cross-engine value
equality; these tests pin the SEMANTIC invariants the oracle can't see
(reconstruction, row-stochasticity, mass conservation) since an oracle
that mirrors a bug would still hash-match.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olympic_athletes_etl_spark.plans.dedup_q import _SSW, d_substring_dup
from olympic_athletes_etl_spark.plans.events_q import (
    e_transition_matrix,
    e_value_histogram,
)
from olympic_athletes_etl_spark.plans.tables import load
from olympic_athletes_etl_spark.plans.textstats import (
    _CHUNK,
    t_chunk_split,
    t_ngram_freq,
    t_pii_scrub,
)


# ---------------------------------------------------------------------------
# t_chunk_split
# ---------------------------------------------------------------------------
def test_chunk_split_reconstructs_documents(spark, sf_dir):
    """Joining a doc's chunks back in chunk_idx order must reproduce the
    whitespace-normalized document; every chunk but the last is full."""
    chunks = t_chunk_split(spark, sf_dir)
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", "chunk_text"))
                    ),
                    lambda s: s["chunk_text"],
                ),
                " ",
            ).alias("rebuilt"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.max("chunk_idx").alias("max_idx"),
            F.sum("chunk_tokens").alias("tok_total"),
        )
    )
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_join(F.split("text", r"\s+"), " ").alias("norm_text"),
        F.size(F.split("text", r"\s+")).alias("n_tokens"),
    )
    bad = (
        rebuilt.join(docs, "doc_id")
        .where(
            (F.col("rebuilt") != F.col("norm_text"))
            | (F.col("tok_total") != F.col("n_tokens"))
            | (F.col("max_idx") != F.col("n_chunks") - 1)
        )
        .count()
    )
    assert bad == 0

    # all non-final chunks are exactly _CHUNK tokens
    short_non_final = (
        chunks.join(
            chunks.groupBy("doc_id").agg(F.max("chunk_idx").alias("mx")), "doc_id"
        )
        .where((F.col("chunk_idx") < F.col("mx")) & (F.col("chunk_tokens") != _CHUNK))
        .count()
    )
    assert short_non_final == 0


# ---------------------------------------------------------------------------
# t_ngram_freq
# ---------------------------------------------------------------------------
def test_ngram_freq_topk_is_sorted_and_bounded(spark, sf_dir):
    rows = t_ngram_freq(spark, sf_dir).collect()
    assert len(rows) == 50
    counts = [r["n"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(len(r["bigram"].split(" ")) == 2 for r in rows)
    # total bigram mass across the corpus bounds any single count
    n_bigrams = (
        load(spark, sf_dir, "documents")
        .select((F.size(F.split("text", r"\s+")) - 1).alias("b"))
        .agg(F.sum("b"))
        .collect()[0][0]
    )
    assert counts[0] <= n_bigrams


# ---------------------------------------------------------------------------
# t_pii_scrub
# ---------------------------------------------------------------------------
def test_pii_scrub_removes_planted_contacts(spark, sf_dir):
    out = t_pii_scrub(spark, sf_dir)
    n = out.count()
    # every doc had one planted email and one planted phone; after the
    # scrub neither survives in any scrubbed text
    leaked = out.where(
        F.col("scrubbed").rlike("@example\\.com")
        | F.col("scrubbed").rlike("\\+1-555-[0-9]")
    ).count()
    assert leaked == 0
    clean = out.where(
        (F.col("n_emails") >= 1)
        & (F.col("n_phones") >= 1)
        & F.col("scrubbed").contains("<EMAIL>")
        & F.col("scrubbed").contains("<PHONE>")
    ).count()
    assert clean == n


# ---------------------------------------------------------------------------
# d_substring_dup
# ---------------------------------------------------------------------------
def test_substring_dup_window_counts_and_symmetry(spark, sf_dir):
    out = d_substring_dup(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", r"\s+")).alias("n_tokens")
    )
    # stride-1 window count = n_tokens - _SSW + 1 for every emitted doc
    bad = (
        out.join(docs, "doc_id")
        .where(F.col("n_windows") != F.col("n_tokens") - _SSW + 1)
        .count()
    )
    assert bad == 0
    # a shared window needs >= 2 docs: dup evidence can never be singular
    n_dup_docs = out.where(F.col("n_dup_windows") > 0).count()
    assert n_dup_docs != 1
    # the synthetic corpus contains near-duplicate docs; the detector
    # must find them (guards against a silently-empty join)
    assert n_dup_docs >= 2


# ---------------------------------------------------------------------------
# e_transition_matrix
# ---------------------------------------------------------------------------
def test_transition_matrix_is_row_stochastic(spark, sf_dir):
    rows = e_transition_matrix(spark, sf_dir).collect()
    events = load(spark, sf_dir, "events")
    n_events = events.count()
    n_users = events.select("user_id").distinct().count()
    # each user's first event has no predecessor
    assert sum(r["n"] for r in rows) == n_events - n_users
    by_prev: dict[str, float] = {}
    for r in rows:
        assert 0.0 < r["p"] <= 1.0
        by_prev[r["prev_type"]] = by_prev.get(r["prev_type"], 0.0) + r["p"]
    for prev, total in by_prev.items():
        assert total == pytest.approx(1.0, abs=0.002), prev


# ---------------------------------------------------------------------------
# e_value_histogram
# ---------------------------------------------------------------------------
def test_value_histogram_conserves_mass(spark, sf_dir):
    rows = e_value_histogram(spark, sf_dir).collect()
    events = load(spark, sf_dir, "events")
    n_events = events.count()
    total_cents = (
        events.select(
            F.round(F.col("value") * 100).cast("long").alias("c")
        )
        .agg(F.sum("c"))
        .collect()[0][0]
    )
    assert sum(r["n"] for r in rows) == n_events
    assert sum(round(r["total_value"] * 100) for r in rows) == total_cents
    for r in rows:
        assert r["bucket_lo"] == r["bucket"] * 25.0
        assert r["n"] > 0


# ---------------------------------------------------------------------------
# a_grouping_sets / r_unpivot_metrics (relational completions)
# ---------------------------------------------------------------------------
def test_grouping_sets_emits_exactly_the_two_sets(spark, sf_dir):
    from olympic_athletes_etl_spark.plans.relational import a_grouping_sets

    rows = a_grouping_sets(spark, sf_dir).collect()
    li = load(spark, sf_dir, "lineitem")
    n_flags = li.select("l_returnflag").distinct().count()
    n_status = li.select("l_linestatus").distinct().count()
    # one row per flag (status='<all>') + one per status (flag='<all>'),
    # no combined cell and no grand total
    assert len(rows) == n_flags + n_status
    assert all((r["returnflag"] == "<all>") != (r["linestatus"] == "<all>") for r in rows)
    assert sum(r["n"] for r in rows) == 2 * li.count()


def test_unpivot_is_lossless_long_form(spark, sf_dir):
    from olympic_athletes_etl_spark.plans.relational import r_unpivot_metrics

    rows = r_unpivot_metrics(spark, sf_dir).collect()
    orders = load(spark, sf_dir, "orders")
    n_prio = orders.select("o_orderpriority").distinct().count()
    assert len(rows) == n_prio * 2
    n_total = sum(r["value"] for r in rows if r["metric"] == "n_orders")
    assert n_total == orders.count()
