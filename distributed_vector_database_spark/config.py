"""Engine constants mirroring the reference's declared configuration.

Reference citations:
- VECTOR_DIM: reference uses 512 (CLIP ViT-B/32), Config/storage_config.py:2.
  The fixture `embeddings` table uses 64-d vectors; dim is a parameter
  everywhere, validated at write like src/datanode/handler.py:228-232.
- SHARD_COUNT=4, REPLICA_COUNT=2: Config/storage_config.py:3-4. Shard of a
  key = int(md5(key),16) % SHARD_COUNT (src/utils/shared_utils.py:4-7).
  In Spark, sharding degenerates to a derived column / hash partitioning;
  REPLICA_COUNT is storage-layer and not reproduced.
- DEFAULT_TOP_K=5: SearchRequest default (src/vector_db.thrift:24) and the
  top_k<=0 fallback (src/datanode/handler.py:346).
- OVERFETCH=2: per-node knn_query fetches 2*k before post-filtering
  deleted rows (src/datanode/handler.py:364).
"""

VECTOR_DIM_REFERENCE = 512
FIXTURE_DIM = 64
SHARD_COUNT = 4
DEFAULT_TOP_K = 5
OVERFETCH = 2

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
