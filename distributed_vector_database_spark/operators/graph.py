"""Graph operators over derived entity graphs: co-occurrence edge
extraction and fixed-iteration PageRank.

The reference engine has no graph surface; these cover the iterative-
algorithm rubric (SURVEY §2.2 "custom operators") the Spark way: each
PageRank iteration is ONE shuffle (edges ⋈ ranks keyed by src, then a
groupBy dst), the loop lives on the driver, and the iteration count is
fixed so the whole computation stays a deterministic DAG — checkpoint/
AQE-friendly, and oracle-expressible as unrolled CTEs.

Plan-shape notes (100 TB discipline):
- co-occurrence edges reuse the apriori discipline from
  operators/mining.py: infrequent items are pruned BEFORE the basket
  self-join and pathological baskets are capped, so the edge builder
  never emits |basket|² rows for a skewed basket.
- pagerank pre-partitions edges and ranks on the join key once;
  every iteration then reuses that partitioning (no re-shuffle of the
  static edge relation — only the small rank relation moves).
- ranks are node-sized, edges are edge-sized; nothing is collected to
  the driver and nothing grows with iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.mining import (
    _frequent_basket_items,
)


def cooccurrence_edges(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket: int = 256,
) -> DataFrame:
    """Undirected co-occurrence graph as a symmetric directed edge
    list (src, dst): items co-appearing in >= min_support baskets,
    apriori-pruned and basket-capped exactly like
    mining.frequent_pairs (same `_frequent_basket_items` input so the
    two cannot drift)."""
    bi = _frequent_basket_items(
        baskets, basket_col, item_col, min_support, max_basket
    )
    a = bi.select(F.col(basket_col).alias("__b"), F.col(item_col).alias("src"))
    b = bi.select(F.col(basket_col).alias("__b"), F.col(item_col).alias("dst"))
    und = (
        a.join(b, "__b")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("__sup"))
        .filter(F.col("__sup") >= min_support)
        .select("src", "dst")
    )
    return und.union(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    partitions: int | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a symmetric edge list.

    Contract: nodes = distinct src of `edges` (symmetric edges → every
    node has out- and in-degree >= 1, so there is no dangling-mass
    term); rank_0 = 1/N; rank_{t+1}(v) = (1-d)/N + d * Σ_{(u,v)}
    rank_t(u)/deg(u). Returns (node, rank_rel) with rank_rel =
    rank_T * N rounded to 6 — scaling by N keeps the value O(1) so a
    fixed decimal rounding is oracle-stable at any graph size.

    Each iteration is exactly one shuffle: edges ⋈ ranks on src
    (both sides pre-partitioned on the key once, reused every round),
    then groupBy dst with map-side partial sums.
    """
    nparts = partitions or edges.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    nparts = int(nparts)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # static relation: partition once on the iteration join key, cache
    adj = (
        edges.join(deg, "src")
        .repartition(nparts, "src")
        .persist()
    )
    n = adj.select("src").distinct().count()
    if n == 0:
        raise ValueError("pagerank: empty edge list (no nodes)")
    ranks = (
        adj.select("src")
        .distinct()
        .select(F.col("src").alias("node"), (F.lit(1.0) / n).alias("rank"))
        .repartition(nparts, "node")
    )
    for _ in range(iterations):
        contrib = (
            adj.join(ranks, adj["src"] == ranks["node"])
            .select(
                F.col("dst"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = contrib.select(
            F.col("dst").alias("node"),
            (F.lit((1.0 - damping) / n) + F.lit(damping) * F.col("in_mass")).alias(
                "rank"
            ),
        ).repartition(nparts, "node")
    # The returned plan references adj once per iteration, so the cache
    # must outlive plan execution — but leaving it persisted leaks a
    # MEMORY_AND_DISK relation per call for the life of the session.
    # Materialize the node-sized result eagerly (severing the lineage),
    # then release the edge cache before returning.
    out = ranks.select(
        "node", F.round(F.col("rank") * n, 6).alias("rank_rel")
    ).localCheckpoint(eager=True)
    adj.unpersist()
    return out


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact triangle count over a symmetric edge list, via
    degree-ordered edge orientation — the shape that survives hubs.

    Every undirected edge is oriented from its (degree, id)-smaller
    endpoint to the larger; each triangle then has exactly ONE node
    with out-edges to the other two, so counting wedges (u->v, u->w)
    whose closing edge (v->w) is also oriented counts each triangle
    exactly once. Orientation bounds out-degree by O(sqrt(m)) on any
    graph, so the wedge self-join never explodes on a hub the way a
    naive adjacency join does. Returns one row (nodes, edges,
    triangles).
    """
    # the undirected edge list is read by THREE actions (triangle,
    # node and edge counts) and is tiny next to whatever pipeline
    # derived it (e.g. the basket self-join) — persist it so the
    # upstream is computed once, not three times
    und = edges.filter(F.col("src") < F.col("dst")).persist()
    deg = (
        und.select(F.col("src").alias("n"))
        .unionAll(und.select(F.col("dst").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
        .withColumnRenamed("n", "src")
    )
    a_deg = deg.select(F.col("src").alias("__a"), F.col("deg").alias("__da"))
    b_deg = deg.select(F.col("src").alias("__b"), F.col("deg").alias("__db"))
    ranked = (
        und.select(F.col("src").alias("__a"), F.col("dst").alias("__b"))
        .join(a_deg, "__a")
        .join(b_deg, "__b")
    )
    a_first = (F.col("__da") < F.col("__db")) | (
        (F.col("__da") == F.col("__db")) & (F.col("__a") < F.col("__b"))
    )
    oriented = ranked.select(
        F.when(a_first, F.col("__a")).otherwise(F.col("__b")).alias("s"),
        F.when(a_first, F.col("__b")).otherwise(F.col("__a")).alias("d"),
        F.when(a_first, F.col("__da")).otherwise(F.col("__db")).alias("ds"),
        F.when(a_first, F.col("__db")).otherwise(F.col("__da")).alias("dd"),
    )
    e1 = oriented.select(
        F.col("s"), F.col("d").alias("v"), F.col("dd").alias("dv")
    )
    e2 = oriented.select(
        F.col("s"), F.col("d").alias("w"), F.col("dd").alias("dw")
    )
    v_first = (F.col("dv") < F.col("dw")) | (
        (F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w"))
    )
    wedges = e1.join(e2, "s").filter(v_first).select("v", "w")
    closing = oriented.select(F.col("s").alias("v"), F.col("d").alias("w"))
    tri = wedges.join(closing, ["v", "w"], "left_semi").count()
    n_nodes = deg.count()
    n_edges = und.count()
    und.unpersist()
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(n_nodes, n_edges, tri)], "nodes long, edges long, triangles long"
    )
