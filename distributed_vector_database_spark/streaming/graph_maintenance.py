"""Maintained co-occurrence graph — the streaming form of
operators/graph.cooccurrence_edges over continual basket ingest.

A 100 TB fact table cannot re-run the basket self-join per question;
it maintains (src, dst, sup) pair supports and (item, sup) item
supports ADDITIVELY and serves the graph from the snapshot. The
reference has no graph surface at all (its query model is put/get/
k-NN, src/datanode/handler.py); this completes the graph family's
maintenance story at the INGEST level, below graph.graph_update's
edge-delta level: raw baskets stream in, the served edge set follows.

Contract: a basket NEVER spans micro-batches (complete-basket
delivery — the natural unit of an order/session log, the same
batch-shape contract the transitions fold documents for per-user
ordering). Pair and item supports are then additive per batch, so
folding in any batch split is exactly equal to the one-shot fold
over the union — pinned by tests/test_graph_stream.py.

Fold semantics (documented, deliberately different from the batch
operator in two places where incrementality forces it):
- the max_basket skew cap applies to a basket's RAW distinct-item
  count at ingest (a streaming fold cannot re-cap historical baskets
  when item frequencies later change);
- frequent-item pruning (item support >= min_support) applies at
  READ time from the accumulated item supports — so an item that
  crosses the support bar in a later batch correctly brings its
  HISTORICAL pairs with it, which the batch operator's
  prune-then-join cannot do incrementally.
On corpora where the cap never binds (TPC-H order baskets max out
far below 256) the served edges are identical to cooccurrence_edges.

Replay safety: the same write-audit-publish versioned fold as the
transitions / BM25 / rollup states — the batch_id marker makes
at-least-once foreachBatch delivery exactly-once.

State layout:
  {state_dir}/pairs/v=N  (src, dst, sup)  one-directional (src < dst)
  {state_dir}/items/v=N  (item, sup)      distinct-basket supports
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_vector_database_spark.streaming.compaction import latest_version
from distributed_vector_database_spark.streaming.lexical_stats import (
    _applied_batch,
    _write_marker,
)


def _batch_supports(
    batch: DataFrame, basket_col: str, item_col: str, max_basket: int
) -> tuple[DataFrame, DataFrame]:
    """(pair supports, item supports) for ONE batch of complete
    baskets: distinct (basket, item), raw-size cap, within-basket
    self-join — the classic shape, bounded per batch."""
    bi = batch.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    ok = (
        bi.groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__sz"))
        .filter(F.col("__sz") <= max_basket)
        .select("__b")
    )
    pruned = bi.join(ok, "__b", "left_semi")
    a = pruned.select("__b", F.col("__i").alias("src"))
    b = pruned.select("__b", F.col("__i").alias("dst"))
    pairs = (
        a.join(b, "__b")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("sup"))
    )
    items = pruned.groupBy(F.col("__i").alias("item")).agg(
        F.count(F.lit(1)).alias("sup")
    )
    return pairs, items


def _merge_supports(base: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    return (
        base.unionByName(delta)
        .groupBy(*keys)
        .agg(F.sum("sup").alias("sup"))
    )


def build_graph_fold(
    state_dir: str,
    basket_col: str,
    item_col: str,
    max_basket: int = 256,
):
    """foreachBatch body: fold one micro-batch of complete baskets
    into {state_dir}/pairs/v=N and /items/v=N, skipping at-least-once
    replays via the batch_id marker (kept on the pairs dir)."""

    def fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark_ = batch.sparkSession
        pdir, idir = f"{state_dir}/pairs", f"{state_dir}/items"
        v = latest_version(pdir)
        if v >= 0:
            applied = _applied_batch(pdir, v)
            if applied == batch_id:
                return
            if applied is None:
                v -= 1
        pairs, items = _batch_supports(batch, basket_col, item_col, max_basket)
        if v >= 0:
            pairs = _merge_supports(
                spark_.read.parquet(f"{pdir}/v={v}"), pairs, ["src", "dst"]
            )
            items = _merge_supports(
                spark_.read.parquet(f"{idir}/v={v}"), items, ["item"]
            )
        items.write.mode("overwrite").parquet(f"{idir}/v={v + 1}")
        pairs.write.mode("overwrite").parquet(f"{pdir}/v={v + 1}")
        _write_marker(pdir, v + 1, batch_id)

    return fold


def read_cooccurrence_graph(
    spark: SparkSession,
    state_dir: str,
    min_support: int = 2,
    symmetric: bool = False,
) -> DataFrame:
    """Serve the co-occurrence edges from the newest fully-published
    snapshot: pairs with sup >= min_support whose BOTH endpoints are
    frequent (item support >= min_support, applied here at read time
    from the accumulated item state). Returns one-directional
    (src, dst, sup) rows, or the symmetric (src, dst, sup) edge list
    ready for the graph operators / graph_write when symmetric=True —
    sup rides along as the edge weight (pagerank weight_col)."""
    pdir, idir = f"{state_dir}/pairs", f"{state_dir}/items"
    v = latest_version(pdir)
    if v >= 0 and _applied_batch(pdir, v) is None:
        v -= 1
    if v < 0:
        raise FileNotFoundError(f"no graph state under {state_dir}")
    pairs = spark.read.parquet(f"{pdir}/v={v}")
    freq = (
        spark.read.parquet(f"{idir}/v={v}")
        .filter(F.col("sup") >= min_support)
        .select(F.col("item"))
    )
    und = (
        pairs.filter(F.col("sup") >= min_support)
        .join(freq.withColumnRenamed("item", "src"), "src", "left_semi")
        .join(freq.withColumnRenamed("item", "dst"), "dst", "left_semi")
        .select("src", "dst", "sup")
    )
    if not symmetric:
        return und
    return und.union(
        und.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "sup"
        )
    )


def run_graph_stream(
    spark: SparkSession,
    baskets_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    schema: str,
    basket_col: str,
    item_col: str,
    max_basket: int = 256,
    max_files_per_trigger: int | None = None,
):
    """Continuously maintain the co-occurrence supports over arriving
    JSON basket rows. Returns the StreamingQuery."""
    fold = build_graph_fold(state_dir, basket_col, item_col, max_basket)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.json(baskets_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
