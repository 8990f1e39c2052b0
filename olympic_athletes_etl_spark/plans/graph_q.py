"""Graph analytics over the co-purchase graph — triangle counting with
degree orientation and the degree profile, both exact and oracle-hashable.

The iterative float algorithms (PageRank, connected components) live in
``operators/graph.py`` (tolerance-tested; CC is also oracle-gated via
d_dup_clusters' recursive-CTE twin). The queries here are the
SINGLE-PASS graph statistics a relational engine should answer without
an iteration loop, over the same edge list every basket-analysis
pipeline already derives (q_copurchase_pairs' within-order part pairs).

Graph: nodes = parts, undirected edge (a, b) when the pair is bought in
the same order at least _MIN_SUPPORT times (the support threshold keeps
the graph at the density basket analysis actually uses, and bounds the
hub degrees the triangle join touches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olympic_athletes_etl_spark.plans.registry import query
from olympic_athletes_etl_spark.plans.tables import load

_MIN_SUPPORT = 2

# Total orientation order: degree first, node id as tie-break, packed
# into one BIGINT so both engines compare identically (1e11 stride keeps
# ids and degrees disjoint up to 1e11 ids / 9e7 max degree).
_OKEY_STRIDE = 100_000_000_000

_EDGES_DUCK = f"""
    items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= {_MIN_SUPPORT}
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS deg
      FROM (SELECT pa AS node FROM edges
            UNION ALL SELECT pb AS node FROM edges)
      GROUP BY 1
    )
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(pa, pb) with pa < pb — the supported co-purchase edge list."""
    items = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = items.select(F.col("l_orderkey").alias("ok_b"), F.col("l_partkey").alias("pb"))
    return (
        a.join(b, (F.col("ok") == F.col("ok_b")) & (F.col("pa") < F.col("pb")))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _MIN_SUPPORT)
        .select("pa", "pb")
    )


def _degrees(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("pa").alias("node"))
        .unionByName(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


@query(
    "g_degree_histogram",
    oracle=f"""
    WITH {_EDGES_DUCK}
    SELECT deg, CAST(count(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY deg
    """,
)
def g_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph — the first profile
    run on any production graph (it is how you SIZE the triangle /
    neighborhood joins below before launching them: the max degree
    bounds the within-key quadratic work). Two aggregations, both
    map-side combinable; the histogram itself is bounded by max degree,
    not graph size."""
    return (
        _degrees(_edges(spark, sf_dir))
        .groupBy("deg")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


@query(
    "g_triangle_count",
    oracle=f"""
    WITH {_EDGES_DUCK},
    ek AS (
      SELECT e.pa, e.pb,
             da.deg * {_OKEY_STRIDE} + e.pa AS ka,
             db.deg * {_OKEY_STRIDE} + e.pb AS kb
      FROM edges e
      JOIN deg da ON da.node = e.pa
      JOIN deg db ON db.node = e.pb
    ),
    oriented AS (
      SELECT CASE WHEN ka < kb THEN pa ELSE pb END AS src,
             CASE WHEN ka < kb THEN pb ELSE pa END AS dst,
             CASE WHEN ka < kb THEN kb ELSE ka END AS kdst
      FROM ek
    ),
    wedges AS (
      SELECT o1.dst AS v, o2.dst AS w
      FROM oriented o1 JOIN oriented o2
        ON o1.src = o2.src AND o1.kdst < o2.kdst
    ),
    tri AS (
      SELECT count(*) AS n_triangles
      FROM wedges x JOIN oriented o ON o.src = x.v AND o.dst = x.w
    ),
    wtot AS (
      SELECT sum(deg * (deg - 1) // 2) AS n_wedges FROM deg
    )
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
           CAST(tri.n_triangles AS BIGINT) AS n_triangles,
           round(CASE WHEN wtot.n_wedges = 0 THEN 0.0
                 ELSE 3.0 * tri.n_triangles / wtot.n_wedges END, 4)
             AS global_clustering
    FROM tri, wtot
    """,
)
def g_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count + global clustering coefficient via DEGREE
    ORIENTATION (Schank–Wagner / Cohen's MapReduce formulation): orient
    every undirected edge from its lower-(degree, id) endpoint to the
    higher one, enumerate wedges only from each node's OUT-edges, and
    close them against the oriented edge list. Each triangle is counted
    exactly once (its minimum-order vertex is the only wedge apex).

    Why this survives 100 TB where the naive 3-way self-join dies:
    orientation bounds every node's out-degree by O(sqrt(m)) — a
    hub with a million neighbors contributes wedges only through the
    few higher-order nodes above it, not its million^2 neighbor pairs —
    so the wedge join's within-key quadratic work is capped at
    out-deg^2 <= m per node and the whole plan is three equi-join
    shuffles keyed on node ids. The clustering coefficient divides by
    the exact wedge total sum(d*(d-1)/2), computed in the same pass.

    The edge-list-in, stats-out core lives in
    ``operators.graph.triangle_stats`` so synthetic adversarial shapes
    (complete graph, star hub, degree ties) pin the orientation logic
    independently of this query's co-purchase edge derivation."""
    from olympic_athletes_etl_spark.operators.graph import triangle_stats

    return triangle_stats(
        _edges(spark, sf_dir), src="pa", dst="pb", normalized=True
    )
