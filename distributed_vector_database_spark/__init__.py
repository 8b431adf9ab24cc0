"""PySpark-native analytics engine with the query/data-processing
capabilities of f1ybaozii/Distributed-Vector-Database (reference at
/root/reference, read-only), re-expressed Spark-first.

The reference is a ZooKeeper-coordinated vector database (HNSW + LevelDB
per node, Thrift RPC, CLIP embeddings). This package collapses that
architecture into declarative DataFrame plans:

- the one vector collection      -> a DataFrame (key, vector, metadata, ts)
- scatter-gather k-NN search     -> per-partition top-k + shuffle merge
- WAL + checkpoint + replay      -> change-log DataFrame + compaction
- shard routing (md5 % N)        -> derived shard column / hash partitioning
- coordinator/health-check/RPC   -> Spark's own scheduler (not reproduced)

Plus the LLM-data-pipeline extensions (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.
"""

from distributed_vector_database_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
