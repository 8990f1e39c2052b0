"""Numpy assignment kernels == HOF-expression forms, bit-for-bit.

The r13 optimization replaced the interpreted higher-order-function
assignment expressions (aggregate(zip_with(...)) dots inside CASE /
array_max ladders) with Arrow-batched numpy kernels on every IVF/PQ
build, fit, serve, and drift path. Every oracle hash in the s_* family
rides on those assignments being IDENTICAL, so this file pins each
kernel against the retained expression form on real data — the
expression forms (_km_argmax_col, _pq_code_col, _km_probe_slice_col,
_pq_sim_sql) stay in the module as the executable spec."""

from __future__ import annotations

from pyspark.sql import functions as F

from olympic_athletes_etl_spark.plans.similarity_q import (
    _KM_SCALE,
    _N_PROBE,
    _PQ_M,
    _km_argmax_col,
    _km_assign_np_col,
    _km_base,
    _km_fit_for,
    _km_probe_ids_np_col,
    _km_sorted_sql,
    _pq_code_col,
    _pq_codes_np_col,
    _pq_drift_err_np_col,
    _pq_fit_for,
    _pq_sim_sql,
    _with_pq_hoist,
    ivfpq_index_build,
)


def _diff(a, b) -> int:
    return a.exceptAll(b).count() + b.exceptAll(a).count()


def test_km_assign_kernel_matches_expression(spark, sf_dir):
    n = _km_base(spark, sf_dir)
    cents = _km_fit_for(spark, sf_dir)
    old = n.select("vec_id", _km_argmax_col(cents).alias("list_id"))
    new = n.select("vec_id", _km_assign_np_col(cents).alias("list_id"))
    assert _diff(old, new) == 0


def test_pq_codes_kernel_matches_expression(spark, sf_dir):
    n = _km_base(spark, sf_dir)
    books = _pq_fit_for(spark, sf_dir)
    old = _with_pq_hoist(n).select(
        "vec_id",
        *[_pq_code_col(books[j], j).alias(f"code{j}") for j in range(_PQ_M)],
    )
    new = n.withColumn("codes", _pq_codes_np_col(books)).select(
        "vec_id",
        *[F.element_at("codes", j + 1).alias(f"code{j}") for j in range(_PQ_M)],
    )
    assert _diff(old, new) == 0


def test_km_probe_ids_kernel_matches_sorted_slice(spark, sf_dir):
    n = _km_base(spark, sf_dir)
    cents = _km_fit_for(spark, sf_dir)
    old = n.select(
        "vec_id",
        F.expr(
            f"transform(slice({_km_sorted_sql(cents)}, 1, {_N_PROBE}),"
            " e -> e.c_id)"
        ).alias("pls"),
    )
    new = n.select(
        "vec_id", _km_probe_ids_np_col(cents, _N_PROBE).alias("pls")
    )
    assert _diff(old, new) == 0


def test_drift_err_kernel_matches_case_ladder(spark, sf_dir):
    n = _km_base(spark, sf_dir)
    cents = _km_fit_for(spark, sf_dir)
    books = _pq_fit_for(spark, sf_dir)
    idx = ivfpq_index_build(n, cents, books).localCheckpoint(eager=True)
    # the pre-r13 expression form, reconstructed from the retained spec
    # pieces (per-code CASE arm = _pq_sim_sql; NULL on unknown code)
    d = _with_pq_hoist(
        idx.withColumn(
            "vq",
            F.expr(
                f"transform(v, x -> CAST(floor(x * {_KM_SCALE}) AS DOUBLE))"
            ),
        )
    )
    err = F.lit(0).cast("long")
    for j, book in sorted(books.items()):
        sim = None
        for c_id, comps in book:
            cos_c = F.expr(_pq_sim_sql(comps, j))
            cond = F.col(f"code{j}") == F.lit(c_id)
            sim = F.when(cond, cos_c) if sim is None else sim.when(cond, cos_c)
        err = err + (F.lit(10000).cast("long") - F.floor(F.lit(10000.0) * sim))
    old = d.select("vec_id", err.alias("err"))
    new = idx.withColumn("err", _pq_drift_err_np_col(books)).select(
        "vec_id", "err"
    )
    assert _diff(old, new) == 0


def test_km_fit_matches_expression_round(spark, sf_dir):
    """_km_fit (worker-fused assignment + scatter-add sums) reproduces
    the pre-r13 expression round (argmax projection + posexplode +
    groupBy sum) bit-for-bit across all _KM_ITERS rounds."""
    from olympic_athletes_etl_spark.plans.similarity_q import (
        _DIM,
        _KM_ITERS,
        _N_CENTROIDS,
        _km_fit,
    )

    n = _km_base(spark, sf_dir)
    cent_rows = (
        n.filter(F.col("vec_id") < _N_CENTROIDS).select("vec_id", "vq").collect()
    )
    cents = sorted(
        (int(r["vec_id"]), [int(x) for x in r["vq"]]) for r in cent_rows
    )
    for _ in range(_KM_ITERS):
        sums = (
            n.withColumn("list_id", _km_argmax_col(cents))
            .select("list_id", F.posexplode("vq").alias("d", "x"))
            .groupBy("list_id", "d")
            .agg(F.sum("x").alias("s"))
            .collect()
        )
        by_list: dict[int, dict[int, int]] = {}
        for r in sums:
            by_list.setdefault(int(r["list_id"]), {})[int(r["d"])] = int(r["s"])
        cents = sorted(
            (c_id, [comp[d] for d in range(_DIM)])
            for c_id, comp in by_list.items()
        )
    assert _km_fit(n) == cents


def test_pq_fit_matches_expression_round(spark, sf_dir):
    """_pq_fit's worker-fused rounds reproduce the pre-r13 combined
    struct-explode round bit-for-bit."""
    from olympic_athletes_etl_spark.plans.similarity_q import (
        _PQ_ITERS,
        _PQ_KSUB,
        _PQ_SUBDIM,
        _pq_fit,
        _pq_code_sql,
        _pq_sub_sql,
    )

    n = _km_base(spark, sf_dir)
    init_rows = (
        n.filter(F.col("vec_id") < _PQ_KSUB).select("vec_id", "vq").collect()
    )
    init = sorted((int(r["vec_id"]), [int(x) for x in r["vq"]]) for r in init_rows)
    books = {
        j: [
            (vid, full[j * _PQ_SUBDIM : (j + 1) * _PQ_SUBDIM])
            for vid, full in init
        ]
        for j in range(_PQ_M)
    }
    for _ in range(_PQ_ITERS):
        entries = [
            F.expr(
                f"named_struct('j', {j}, 'code', {_pq_code_sql(books[j], j)},"
                f" 'sq', {_pq_sub_sql(j)})"
            )
            for j in range(_PQ_M)
        ]
        sums = (
            _with_pq_hoist(n)
            .select(F.explode(F.array(*entries)).alias("e"))
            .select("e.j", "e.code", F.posexplode("e.sq").alias("d", "x"))
            .groupBy("j", "code", "d")
            .agg(F.sum("x").alias("s"))
            .collect()
        )
        by_j: dict[int, dict[int, dict[int, int]]] = {}
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
    assert _pq_fit(n) == books


def test_drift_err_kernel_nulls_unknown_codes(spark, sf_dir):
    """Books/index mismatch tripwire: an out-of-book code must yield a
    NULL err (the expression form's no-otherwise CASE semantics), so
    sum(err)-vs-count(1) reconciliation can catch a desynced index."""
    n = _km_base(spark, sf_dir)
    cents = _km_fit_for(spark, sf_dir)
    books = _pq_fit_for(spark, sf_dir)
    idx = ivfpq_index_build(n, cents, books).withColumn(
        "code0", F.lit(999)
    )
    rows = (
        idx.withColumn("err", _pq_drift_err_np_col(books))
        .select("err")
        .limit(5)
        .collect()
    )
    assert rows and all(r["err"] is None for r in rows)
