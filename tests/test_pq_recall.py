"""Recall pin for s_ann_pq against the exact brute-force top-k.

Measured via the DuckDB oracles: check_parity.py already pins that the
Spark engine and oracle produce identical rows, so oracle-side recall IS
engine recall, and DuckDB evaluates the unrolled training CTEs in
seconds where a Spark run would pay session+job overhead per SF.

Uniform random embeddings are PQ's worst case (no cluster structure for
the codebooks to exploit) — the pinned floor is what the parameter sweep
measured there; real embedding distributions do better.
"""

from __future__ import annotations

import duckdb
import pytest

from olympic_athletes_etl_spark.plans import oracle_sql
from olympic_athletes_etl_spark.plans.similarity_q import _K, _PQ_SHORTLIST


@pytest.mark.parametrize(
    ("sf_dir", "floor"),
    [
        ("/root/testdata/sf0.001", 0.8),
        ("/root/testdata/sf0.01", 0.8),
    ],
)
def test_pq_recall_at_5_meets_measured_floor(sf_dir, floor):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    osql = oracle_sql()
    exact = {r[0] for r in con.sql(osql["s_knn_bruteforce"]).fetchall()}
    pq_rows = con.sql(osql["s_ann_pq"]).fetchall()
    pq = {r[0] for r in pq_rows}
    assert len(pq_rows) == _K
    assert len(exact & pq) / _K >= floor


@pytest.mark.parametrize(
    ("sf_dir", "floor"),
    [
        ("/root/testdata/sf0.001", 0.8),
        ("/root/testdata/sf0.01", 0.8),
    ],
)
def test_ivfpq_recall_at_5_meets_measured_floor(sf_dir, floor):
    """The composed IVF+PQ index keeps the PQ floor: at both test SFs the
    nprobe-list restriction drops no exact neighbor that plain PQ kept
    (measured recall 0.8 / 1.0, identical to s_ann_pq)."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    osql = oracle_sql()
    exact = {r[0] for r in con.sql(osql["s_knn_bruteforce"]).fetchall()}
    rows = con.sql(osql["s_ann_ivfpq"]).fetchall()
    got = {r[0] for r in rows}
    assert len(rows) == _K
    assert len(exact & got) / _K >= floor


def test_pq_shortlist_is_a_small_fraction():
    """The shortlist (rows that touch full vectors) stays constant as the
    table grows — the PQ scale contract."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.1/embeddings.parquet')"
    )
    n = con.sql("SELECT count(*) FROM embeddings").fetchone()[0]
    assert _PQ_SHORTLIST <= n * 0.05
