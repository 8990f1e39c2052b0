"""Headline benchmark — the driver's per-round performance gate.

Runs a representative slice of the engine (scan/filter/join/agg, window,
forward-fill, dedup LSH, ANN, sessionization) at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced with a noop sink (full pipeline runs, nothing
collected to the driver). One untimed warmup executes the flagship first
so JVM/codegen startup doesn't pollute per-query numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "flagship_region_top_customers",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_supplier_volume",
    "q7_nation_volume",
    "q18_large_orders",
    "q_order_share_window",
    "w_forward_fill",
    "a_mode_per_group",
    "e_tumbling_window",
    "e_sessionize",
    "d_minhash_lsh",
    "s_knn_bruteforce",
    "t_quality_score",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from olympic_athletes_etl_spark.plans import queries
    from olympic_athletes_etl_spark.session import get_spark

    spark = get_spark(app_name="bench")
    qs = queries()

    def run(name: str) -> float:
        df = qs[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run("flagship_region_top_customers")  # warmup (JVM + codegen + page cache)

    timings = {name: round(run(name), 3) for name in BENCH_QUERIES}
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
