"""Deterministic k-means (similarity_q): structural properties the
DuckDB parity check can't express — full coverage, bounded cluster ids,
run-to-run determinism, and that training actually moved the centroids
off their init."""

from __future__ import annotations

from olympic_athletes_etl_spark.plans.similarity_q import (
    _KM_ITERS,
    _N_CENTROIDS,
    _km_base,
    _km_fit,
    s_kmeans_clusters,
)


def test_kmeans_clusters_cover_all_vectors(spark, sf_dir):
    from olympic_athletes_etl_spark.plans.tables import load

    n_vecs = load(spark, sf_dir, "embeddings").count()
    rows = s_kmeans_clusters(spark, sf_dir).collect()
    assert len(rows) == n_vecs
    assert {r["vec_id"] for r in rows} == set(range(n_vecs))
    clusters = {r["cluster"] for r in rows}
    assert clusters <= set(range(_N_CENTROIDS))
    assert len(clusters) > 1  # learning produced a non-degenerate partition
    # similarity-to-assigned-centroid is a cosine: bounded
    assert all(-1.0 <= r["centroid_sim"] <= 1.0 for r in rows)


def test_kmeans_fit_is_deterministic_and_learns(spark, sf_dir):
    n = _km_base(spark, sf_dir)
    a = _km_fit(n)
    b = _km_fit(n)
    assert a == b  # bit-identical across runs (integer-exact iteration)
    assert _KM_ITERS >= 1
    init = sorted(
        (int(r["vec_id"]), [int(x) for x in r["vq"]])
        for r in n.filter(n.vec_id < _N_CENTROIDS).select("vec_id", "vq").collect()
    )
    # after an update, centroids are member SUMS, not the init vectors
    assert a != init


def test_kmeans_fit_invariant_to_partitioning(spark, sf_dir):
    """The central determinism claim: centroids are integer sums of
    integer-valued doubles, so the result cannot depend on partition
    count or row order within partitions. Re-fit under different
    physical layouts and demand bit-identical centroids."""
    base = _km_base(spark, sf_dir)
    a = _km_fit(base.repartition(3))
    b = _km_fit(base.repartition(11, "vec_id"))
    assert a == b
