"""Interleaved A/B: km/pq Lloyd fits re-deriving the quantized base per
round (r13) vs fitting over ONE eager checkpoint of (vec_id, vq, qnrm)
(r14 candidate). Fits must be bit-identical.

Also probes variant C: km+pq round sums FUSED into one job per round
(only valid when both fits are wanted — the ivfpq lifecycle).

Run: python tools/probe_fitbase.py [n_pairs]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from olympic_athletes_etl_spark.operators.graph import (  # noqa: E402
    _release_checkpoint,
)
from olympic_athletes_etl_spark.plans.similarity_q import (  # noqa: E402
    _km_base,
    _km_fit,
    _km_round_sums,
    _KM_ITERS,
    _N_CENTROIDS,
    _pq_fit,
    _pq_round_sums,
    _PQ_ITERS,
    _PQ_KSUB,
    _PQ_M,
    _PQ_SUBDIM,
    _DIM,
)
from olympic_athletes_etl_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
spark = get_spark(app_name="probe_fitbase")


def fit_current():
    n = _km_base(spark, sf_dir)
    t0 = time.monotonic()
    cents = _km_fit(n)
    t1 = time.monotonic()
    books = _pq_fit(n)
    t2 = time.monotonic()
    return cents, books, t1 - t0, t2 - t1


def _km_fit_over(n):
    cent_rows = (
        n.filter(F.col("vec_id") < _N_CENTROIDS).select("vec_id", "vq").collect()
    )
    cents = sorted((int(r["vec_id"]), [int(x) for x in r["vq"]]) for r in cent_rows)
    for _ in range(_KM_ITERS):
        sums = _km_round_sums(n, cents)
        by_list = {}
        for r in sums:
            by_list.setdefault(int(r["list_id"]), {})[int(r["d"])] = int(r["s"])
        cents = sorted(
            (c_id, [comp[d] for d in range(_DIM)]) for c_id, comp in by_list.items()
        )
    return cents


def _pq_fit_over(n):
    init_rows = (
        n.filter(F.col("vec_id") < _PQ_KSUB).select("vec_id", "vq").collect()
    )
    init = sorted((int(r["vec_id"]), [int(x) for x in r["vq"]]) for r in init_rows)
    books = {
        j: [(vid, full[j * _PQ_SUBDIM : (j + 1) * _PQ_SUBDIM]) for vid, full in init]
        for j in range(_PQ_M)
    }
    for _ in range(_PQ_ITERS):
        sums = _pq_round_sums(n, books)
        by_j = {}
        for r in sums:
            by_j.setdefault(int(r["j"]), {}).setdefault(int(r["code"]), {})[
                int(r["d"])
            ] = int(r["s"])
        books = {
            j: sorted(
                (c_id, [comp[d] for d in range(_PQ_SUBDIM)])
                for c_id, comp in by_j[j].items()
            )
            for j in range(_PQ_M)
        }
    return books


def fit_ckpt():
    base = (
        _km_base(spark, sf_dir)
        .select("vec_id", "vq", "qnrm")
        .localCheckpoint(eager=True)
    )
    t0 = time.monotonic()
    cents = _km_fit_over(base)
    t1 = time.monotonic()
    books = _pq_fit_over(base)
    t2 = time.monotonic()
    _release_checkpoint(base)
    return cents, books, t1 - t0, t2 - t1


for i in range(n_pairs):
    order = [("cur", fit_current), ("ck", fit_ckpt)]
    if i % 2:
        order.reverse()
    res = {}
    for tag, fn in order:
        t0 = time.monotonic()
        cents, books, tk, tp = fn()
        res[tag] = (time.monotonic() - t0, tk, tp, cents, books)
    same = (
        res["cur"][3] == res["ck"][3] and res["cur"][4] == res["ck"][4]
    )
    print(
        f"pair{i}: cur total {res['cur'][0]:.3f}s (km {res['cur'][1]:.3f}"
        f" pq {res['cur'][2]:.3f})  ck total {res['ck'][0]:.3f}s"
        f" (km {res['ck'][1]:.3f} pq {res['ck'][2]:.3f})  identical={same}"
    )
