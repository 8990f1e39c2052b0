"""Interleaved A/B of the kNN-graph pair-scoring dot product
(`_pair_edges`' cos): the current interpreted HOF fold vs (B) a
codegen-able unrolled element_at chain vs (C) an Arrow-batched numpy
kernel. All three are the same left-fold IEEE sequence per pair, so the
scores are bit-identical (verified per pair below); the contrast is
evaluation cost per candidate pair (guide §4/§1.2).

Usage: python tools/probe_pairdot.py [sf_dir] [pairs] [--multiprobe]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from olympic_athletes_etl_spark.plans import similarity_q as sq


def _unrolled_cos(dim: int) -> F.Column:
    terms = " + ".join(
        f"element_at(va, {i + 1}) * element_at(vb, {i + 1})"
        for i in range(dim)
    )
    # left-associated + — same fold order as aggregate(zip_with(...))
    return F.expr(f"(0.0D + {terms})") / (F.col("na") * F.col("nb"))


def _np_cos() -> F.Column:
    @F.pandas_udf("double")
    def _cos(va, vb, na, nb):  # type: ignore[no-untyped-def]
        import numpy as np
        import pandas as pd

        A = np.stack(va.to_numpy())
        B = np.stack(vb.to_numpy())
        acc = np.zeros(A.shape[0], dtype=np.float64)
        for d in range(A.shape[1]):
            acc = acc + A[:, d] * B[:, d]
        return pd.Series(acc / (na.to_numpy() * nb.to_numpy()))

    return _cos("va", "vb", "na", "nb")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    multiprobe = "--multiprobe" in sys.argv
    from olympic_athletes_etl_spark.session import get_spark

    spark = get_spark(app_name="probe_pairdot")
    spark.sparkContext.setLogLevel("ERROR")
    emb = sq._emb_double(spark, sf_dir)
    n = sq._bucketed_corpus(emb, sq._N_PLANES)
    t = sq._capped_targets(n, sq._GRAPH_BUCKET_CAP)
    probes = sq._graph_probes(n, sq._N_PLANES, multiprobe)
    joined = probes.join(
        F.broadcast(t),
        (F.col("pb") == F.col("bucket_b")) & (F.col("src") != F.col("dst")),
    )
    n_cand = joined.count()
    print(f"candidate pairs: {n_cand}", flush=True)
    dim = len(emb.select("v").first()["v"])

    variants = {
        "hof": F.expr(sq._DOT.format(a="va", b="vb"))
        / (F.col("na") * F.col("nb")),
        "unroll": _unrolled_cos(dim),
        "numpy": _np_cos(),
    }
    # bit-equality first (count of rows where scores differ AT ALL)
    base = joined.select(
        "src", "dst", variants["hof"].alias("c0")
    )
    for name in ("unroll", "numpy"):
        d = (
            joined.select("src", "dst", variants["hof"].alias("c0"),
                          variants[name].alias("c1"))
            .filter(
                ~(F.col("c0") == F.col("c1"))
                & ~(F.isnan("c0") & F.isnan("c1"))
            )
            .count()
        )
        print(f"bit-diff {name}: {d}", flush=True)

    for i in range(pairs):
        line = [f"pair {i}:"]
        for name, col in variants.items():
            t0 = time.perf_counter()
            joined.select("src", "dst", col.alias("cos_raw")).write.format(
                "noop"
            ).mode("overwrite").save()
            line.append(f"{name} {time.perf_counter() - t0:.3f}s")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
