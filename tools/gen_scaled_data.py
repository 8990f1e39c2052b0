"""Deterministic scale-up of the driver testdata for out-of-gate sweeps.

The parity harness (tools/check_parity.py) compares Spark against DuckDB
ON THE SAME FILES, so sweep data does not need to match the driver's
generator — it needs the same schema and a realistic shape. This script
replicates a source SF directory K times with consistent key remapping:

* region/nation: fixed dimensions, copied as-is;
* customer/supplier/part/orders/lineitem: every key column is offset by
  ``replica * (max_key + 1)`` consistently across fact/dim so referential
  integrity holds within each replica;
* events: event_id/user_id offset per replica (same ts/value/props — the
  temporal shape repeats per replica's user population);
* documents: doc_id offset; replicas > 0 get a ``rK`` token appended so
  cross-replica copies are NEAR-duplicates (the realistic dedup shape),
  not byte-identical ones;
* embeddings: vec_id offset; replicas > 0 perturbed by a deterministic
  per-component float32 delta so ANN neighborhoods are dense but not
  degenerate ties. Replica 0 keeps the lowest vec_ids, so k-means
  ``vec_id < k`` inits select the same seed vectors as the source SF.

Usage:
    python tools/gen_scaled_data.py [SRC_SF_DIR] [OUT_DIR] [K]
    # defaults: /root/testdata/sf0.1  /root/repo/.scratch/sf1  10

The sweep run that consumes this is recorded in SWEEP_r{N}_sf1.json;
the generated directory is scratch (gitignored), regenerable bit-
identically from this script.
"""

from __future__ import annotations

import os
import sys

import duckdb


def generate(src: str, out: str, k: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE reps AS SELECT range AS rep FROM range({k})")

    def src_t(name: str) -> str:
        return f"read_parquet('{src}/{name}.parquet')"

    def copy(sql: str, name: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{name}.parquet')"
        ).fetchone()[0]
        print(f"{name}: {n} rows")

    def off(col: str, table: str) -> str:
        """replica offset stride: max key + 1 of the SOURCE table."""
        m = con.execute(
            f"SELECT max({col}) + 1 FROM {src_t(table)}"
        ).fetchone()[0]
        return str(int(m))

    # fixed dims
    for t in ("region", "nation"):
        copy(f"SELECT * FROM {src_t(t)}", t)

    c_off = off("c_custkey", "customer")
    s_off = off("s_suppkey", "supplier")
    p_off = off("p_partkey", "part")
    o_off = off("o_orderkey", "orders")

    copy(
        f"""SELECT c_custkey + rep * {c_off} AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM {src_t('customer')}, reps""",
        "customer",
    )
    copy(
        f"""SELECT s_suppkey + rep * {s_off} AS s_suppkey,
                   s_name, s_nationkey, s_acctbal
            FROM {src_t('supplier')}, reps""",
        "supplier",
    )
    copy(
        f"""SELECT p_partkey + rep * {p_off} AS p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice
            FROM {src_t('part')}, reps""",
        "part",
    )
    copy(
        f"""SELECT o_orderkey + rep * {o_off} AS o_orderkey,
                   o_custkey + rep * {c_off} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {src_t('orders')}, reps""",
        "orders",
    )
    copy(
        f"""SELECT l_orderkey + rep * {o_off} AS l_orderkey,
                   l_partkey + rep * {p_off} AS l_partkey,
                   l_suppkey + rep * {s_off} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {src_t('lineitem')}, reps""",
        "lineitem",
    )

    e_off = off("event_id", "events")
    u_off = off("user_id", "events")
    copy(
        f"""SELECT event_id + rep * {e_off} AS event_id, ts,
                   user_id + rep * {u_off} AS user_id,
                   event_type, value, props
            FROM {src_t('events')}, reps""",
        "events",
    )

    d_off = off("doc_id", "documents")
    copy(
        f"""SELECT doc_id + rep * {d_off} AS doc_id,
                   CASE WHEN rep = 0 THEN text
                        ELSE text || ' r' || CAST(rep AS VARCHAR) END AS text,
                   lang, source,
                   CAST(length(CASE WHEN rep = 0 THEN text
                        ELSE text || ' r' || CAST(rep AS VARCHAR) END)
                        AS BIGINT) AS n_chars
            FROM {src_t('documents')}, reps""",
        "documents",
    )

    v_off = off("vec_id", "embeddings")
    copy(
        f"""SELECT vec_id + rep * {v_off} AS vec_id,
                   CASE WHEN rep = 0 THEN embedding ELSE
                     CAST(list_transform(list_zip(embedding,
                            range(1, len(embedding) + 1)),
                       z -> CAST(z[1] + rep * 0.001 *
                            (((vec_id + z[2]) % 11) - 5) AS FLOAT))
                       AS FLOAT[])
                   END AS embedding,
                   label
            FROM {src_t('embeddings')}, reps""",
        "embeddings",
    )


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    generate(src, out, k)
