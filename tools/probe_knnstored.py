"""Interleaved A/B: s_knn_graph_stored with two bucketed-corpus
checkpoints (r13) vs one shared checkpoint (r14). Results must match.

Run: python tools/probe_knnstored.py [n_pairs]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from olympic_athletes_etl_spark.plans.similarity_q import (  # noqa: E402
    _bucketed_corpus,
    _emb_double,
    _INCR_MOD,
    _N_PLANES,
    knn_graph,
    knn_graph_load,
    knn_graph_merge,
    knn_graph_store,
)
from olympic_athletes_etl_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
spark = get_spark(app_name="probe_knnstored")
sc = spark.sparkContext
is_new = F.col("vec_id") % _INCR_MOD == 0


def old_form():
    emb = _emb_double(spark, sf_dir)
    old = knn_graph(emb.filter(~is_new), raw_scores=True)
    path = os.path.join(tempfile.mkdtemp(prefix="probe_old_"), "graph")
    knn_graph_store(old, path)
    return knn_graph_merge(emb, is_new, old_graph=knn_graph_load(spark, path))


def new_form():
    emb = _emb_double(spark, sf_dir)
    n = _bucketed_corpus(emb, _N_PLANES)
    old = knn_graph(emb, raw_scores=True, bucketed=n.filter(~is_new))
    path = os.path.join(tempfile.mkdtemp(prefix="probe_new_"), "graph")
    knn_graph_store(old, path)
    return knn_graph_merge(
        emb, is_new, old_graph=knn_graph_load(spark, path), bucketed=n
    )


def run(tag, fn):
    grp = f"{tag}-{time.monotonic_ns()}"
    sc.setJobGroup(grp, tag)
    t0 = time.monotonic()
    out = fn()
    out.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    jobs = len(sc.statusTracker().getJobIdsForGroup(grp) or [])
    sc.setJobGroup(None, None)
    return dt, jobs, out


a = run("warm-old", old_form)[2]
b = run("warm-new", new_form)[2]
diff = a.exceptAll(b).count() + b.exceptAll(a).count()
print("result diff rows (must be 0):", diff)

for i in range(n_pairs):
    if i % 2 == 0:
        to, jo, _ = run("old", old_form)
        tn, jn, _ = run("new", new_form)
    else:
        tn, jn, _ = run("new", new_form)
        to, jo, _ = run("old", old_form)
    print(f"pair{i}: old {to:.3f}s/{jo}jobs  new {tn:.3f}s/{jn}jobs")
