"""A/B probe: time d_neardup_pipeline (label-CC consumer) at sf0.1.

Median-of-3, noop sink, timing includes DataFrame construction (the CC
rounds run eagerly at build time) — same methodology as bench.py's
extended section. Throwaway probe tool for OPTIMIZATION_r13.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from olympic_athletes_etl_spark.session import get_spark  # noqa: E402
from olympic_athletes_etl_spark.plans import queries  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
names = sys.argv[1:] or ["d_neardup_pipeline"]
spark = get_spark(app_name="probe")
qs = queries()
for name in names:
    fn = qs[name]
    # warmup (build + run: the CC rounds execute eagerly at build time)
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    ts = []
    for _ in range(3):
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts.append(time.monotonic() - t0)
    print(f"{name}: median {statistics.median(ts):.3f}s  runs {[round(t,3) for t in ts]}")
