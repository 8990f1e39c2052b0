"""A/B probe: JVM HOF-expression PQ/KM assignment vs a bit-exact numpy
pandas-UDF kernel (guide §4.2 — vectorized native code inside the Python
boundary vs interpreted JVM lambdas).

The current `_km_argmax_col` / `_pq_code_col` expressions are built from
higher-order functions (zip_with + aggregate) which Spark evaluates
INTERPRETED (HigherOrderFunction is CodegenFallback): a km assignment
runs 16 centroids x 64 dims x 2 lambda closures per row; the PQ encode
16 subspaces x 16 entries x 4 dims more. The numpy twin reproduces the
exact IEEE operation sequence (left-fold dot, correctly-rounded sqrt,
one division, Spark's NaN-greatest / null->-inf argmax ordering) so
every assignment is bit-identical — this probe MEASURES that claim
(diff counts must be 0) and the speed contrast.

Usage: python tools/probe_annkernel.py [sf_dir] [iters]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from olympic_athletes_etl_spark.plans import similarity_q as sq


def _fold_dot(V: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Left-fold dot over the last axis: acc = ((0.0 + x0*c0) + x1*c1)...
    — the exact accumulation order of aggregate(zip_with(...)) and of
    DuckDB's list_dot_product. Elementwise numpy mul/add are the same
    correctly-rounded IEEE ops the JVM executes, so per row this is
    bit-identical to the engine expression."""
    acc = np.zeros(V.shape[0], dtype=np.float64)
    for d in range(V.shape[1]):
        acc = acc + V[:, d] * c[d]
    return acc


def _spark_gt(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Spark double ordering 'a > b' where NaN is GREATER than any
    non-NaN (structs compare with Spark's total ordering)."""
    return (a > b) | (np.isnan(a) & ~np.isnan(b))


def _argmax_sims(sims: list[np.ndarray], c_ids: list[int]) -> np.ndarray:
    """Row-wise argmax by (sim DESC, c_id ASC); entries ordered by c_id
    ascending so strict-greater keeps the lowest c_id on ties — exactly
    the array_max((sim, -c_id)) struct ordering."""
    best = sims[0].copy()
    best_id = np.full(best.shape, c_ids[0], dtype=np.int64)
    for s, cid in zip(sims[1:], c_ids[1:]):
        take = _spark_gt(s, best)
        best = np.where(take, s, best)
        best_id = np.where(take, cid, best_id)
    return best_id


def km_assign_np(V: np.ndarray, qnrm: np.ndarray, cents) -> np.ndarray:
    sims = []
    c_ids = []
    for c_id, comps in cents:
        c = np.asarray(comps, dtype=np.float64)
        cdot = sq._ieee_self_dot(comps)
        denom = qnrm * np.sqrt(cdot)
        dot = _fold_dot(V, c)
        with np.errstate(divide="ignore", invalid="ignore"):
            s = dot / denom
        # Spark Divide: divisor == 0 -> NULL; coalesced to -inf by
        # _argmax_cid_sql
        s = np.where(denom == 0.0, -np.inf, s)
        sims.append(s)
        c_ids.append(int(c_id))
    return _argmax_sims(sims, c_ids)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("probe_annkernel")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    n = sq._km_base(spark, sf_dir)
    cents = sq._km_fit_for(spark, sf_dir)
    books = sq._pq_fit_for(spark, sf_dir)

    # ---- numpy UDF twins --------------------------------------------
    @F.pandas_udf("integer")
    def km_udf(vq: pd.Series, qnrm: pd.Series) -> pd.Series:
        V = np.stack(vq.to_numpy())
        return pd.Series(km_assign_np(V, qnrm.to_numpy(), cents).astype("int32"))

    def pq_codes_np(V: np.ndarray) -> np.ndarray:
        m, sd = sq._PQ_M, sq._PQ_SUBDIM
        out = np.empty((V.shape[0], m), dtype=np.int32)
        for j in range(m):
            S = V[:, j * sd : (j + 1) * sd]
            # sqn_j = sqrt(left-fold of S·S)
            acc = np.zeros(V.shape[0])
            for d in range(sd):
                acc = acc + S[:, d] * S[:, d]
            sqn = np.sqrt(acc)
            sims, cids = [], []
            for c_id, comps in books[j]:
                c = np.asarray(comps, dtype=np.float64)
                cdot = sq._ieee_self_dot(comps)
                denom = sqn * np.sqrt(cdot)
                dot = _fold_dot(S, c)
                with np.errstate(divide="ignore", invalid="ignore"):
                    s = dot / denom
                s = np.where(denom == 0.0, -np.inf, s)
                sims.append(s)
                cids.append(int(c_id))
            out[:, j] = _argmax_sims(sims, cids).astype(np.int32)
        return out

    @F.pandas_udf("array<integer>")
    def pq_udf2(vq: pd.Series) -> pd.Series:
        V = np.stack(vq.to_numpy())
        return pd.Series(list(pq_codes_np(V)))

    # ---- value diff --------------------------------------------------
    old = (
        sq._with_pq_hoist(n.withColumn("list_id", sq._km_argmax_col(cents)))
        .withColumns(
            {f"code{j}": sq._pq_code_col(books[j], j) for j in range(sq._PQ_M)}
        )
        .select("vec_id", "list_id", *[f"code{j}" for j in range(sq._PQ_M)])
    )
    new = (
        n.withColumn("list_id", km_udf("vq", "qnrm"))
        .withColumn("codes", pq_udf2("vq"))
        .select(
            "vec_id",
            "list_id",
            *[
                F.element_at("codes", j + 1).alias(f"code{j}")
                for j in range(sq._PQ_M)
            ],
        )
    )
    diff = old.exceptAll(new).count() + new.exceptAll(old).count()
    print(f"VALUE DIFF rows: {diff} (must be 0)", flush=True)

    # ---- timing ------------------------------------------------------
    def bench(df, label):
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        print(f"{label}: med {statistics.median(ts):.3f}s  runs {[round(t,3) for t in ts]}", flush=True)

    for _ in range(2):  # interleave twice
        bench(old, "old JVM-HOF encode")
        bench(new, "new numpy-UDF encode")

    spark.stop()


if __name__ == "__main__":
    main()
