"""Dump .explain('formatted') for the r14-touched queries.

Usage: python tools/dump_plans_r14.py OUTDIR SUFFIX [query ...]

Run once from the r13 tree (SUFFIX=before) and once from HEAD
(SUFFIX=after); iterative queries (CC consumers, stored lifecycles)
execute their eager phases during construction — the dump is the FINAL
frame's plan, and the loop-structure evidence lives in the job-count
probes (tools/probe_observe_ab.py, tools/probe_knnstored.py).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())

from olympic_athletes_etl_spark.plans import queries  # noqa: E402
from olympic_athletes_etl_spark.session import get_spark  # noqa: E402

outdir, suffix = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.makedirs(outdir, exist_ok=True)
spark = get_spark(app_name="dump_plans_r14")
qs = queries()
for name in names:
    df = qs[name](spark, sf_dir)
    txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(outdir, f"{name}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(txt)
    print(f"{path}: {len(txt)} bytes")
