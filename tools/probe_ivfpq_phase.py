"""Interleaved A/B of the two phases that read slower after the numpy
kernel switch: km_fit (training) and the in-plan _ivfpq_search serve.
Old = retained expression forms, new = kernels; construct/exec split.

Usage: python tools/probe_ivfpq_phase.py [sf_dir] [pairs]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from olympic_athletes_etl_spark.plans import similarity_q as sq


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("probe_ivfpq_phase")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    n = sq._km_base(spark, sf_dir)
    cents = sq._km_fit_for(spark, sf_dir)
    books = sq._pq_fit_for(spark, sf_dir)

    # ---- km_fit A/B: one assignment+sum round, old vs new ------------
    def km_round(assign_col):
        return (
            n.withColumn("list_id", assign_col)
            .select("list_id", F.posexplode("vq").alias("d", "x"))
            .groupBy("list_id", "d")
            .agg(F.sum("x").alias("s"))
            .collect()
        )

    # ---- serve A/B: full _ivfpq_search plan, old expression twin -----
    def ivfpq_serve_old():
        assigned = n.withColumn("list_id", sq._km_argmax_col(cents))
        probe_lists = (
            assigned.filter(F.col("vec_id") == sq._QUERY_VEC_ID)
            .select(
                F.explode(sq._km_probe_slice_col(cents, sq._N_PROBE)).alias("e")
            )
            .select(F.col("e.c_id").alias("probe_list"))
        )
        probe_q = [
            int(x)
            for x in n.filter(F.col("vec_id") == sq._QUERY_VEC_ID)
            .select("vq")
            .collect()[0]["vq"]
        ]
        code_cols, num_expr, cn2_expr = sq._pq_adc_exprs(books, probe_q)
        scored = sq._with_pq_hoist(
            assigned.join(
                F.broadcast(probe_lists),
                F.col("list_id") == F.col("probe_list"),
                "left_semi",
            )
        ).withColumns(code_cols)
        probe_qnrm = float(sum(x * x for x in probe_q)) ** 0.5
        adc = num_expr / (F.lit(probe_qnrm) * F.sqrt(cn2_expr))
        shortlist = (
            scored.filter(F.col("vec_id") != sq._QUERY_VEC_ID)
            .select("vec_id", "v", "vnrm", adc.alias("score"))
            .orderBy(F.desc("score"), F.asc("vec_id"))
            .limit(sq._PQ_SHORTLIST)
        )
        probe = n.filter(F.col("vec_id") == sq._QUERY_VEC_ID).select(
            F.col("v").alias("pv"), F.col("vnrm").alias("pnrm")
        )
        cos = F.expr(sq._DOT.format(a="v", b="pv")) / (
            F.col("vnrm") * F.col("pnrm")
        )
        return shortlist.crossJoin(F.broadcast(probe)).select(
            "vec_id", cos.alias("cos_raw")
        )

    for i in range(pairs):
        t0 = time.perf_counter()
        km_round(sq._km_argmax_col(cents))
        t_old = time.perf_counter() - t0
        t0 = time.perf_counter()
        km_round(sq._km_assign_np_col(cents))
        t_new = time.perf_counter() - t0
        print(f"km_round pair {i}: old {t_old:.3f}s  new {t_new:.3f}s", flush=True)

    for i in range(pairs):
        t0 = time.perf_counter()
        df = ivfpq_serve_old()
        t_c = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        t_old = time.perf_counter() - t0
        t0 = time.perf_counter()
        df2 = sq._ivfpq_search(n, cents, books)
        t_c2 = time.perf_counter() - t0
        df2.write.format("noop").mode("overwrite").save()
        t_new = time.perf_counter() - t0
        print(
            f"ivfpq_serve pair {i}: old {t_old:.3f}s (construct {t_c:.3f})"
            f"  new {t_new:.3f}s (construct {t_c2:.3f})",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
