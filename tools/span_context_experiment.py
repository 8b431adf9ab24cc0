"""Reproduce the session-garbage degradation that motivated bench.py's
_reset_session (r14): times span_fold cold/warm, then after a batch of
headline queries, then after an explicit JVM GC. Expected shape:
warm << after_context, after_jvm_gc ~= warm.
"""

import sys, os, json, time, shutil, tempfile
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
import __spark_entry__ as entrymod
from distributed_vector_database_spark.session import get_spark
from distributed_vector_database_spark.sources.fixtures import load_table
from distributed_vector_database_spark.streaming.span_state import build_span_fold

sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="span-context")
tmp = tempfile.mkdtemp(prefix="spanctx_")
docs = load_table(spark, sf_dir, "documents")

def time_span(tag):
    shutil.rmtree(f"{tmp}/span_state", ignore_errors=True)
    shutil.rmtree(f"{tmp}/span_out", ignore_errors=True)
    t0 = time.time()
    build_span_fold(f"{tmp}/span_state", f"{tmp}/span_out")(docs, 1)
    print(json.dumps({tag: round(time.time() - t0, 3)}))

time_span("cold")
time_span("warm")
# simulate bench context: run a batch of headline queries (checkpoint-heavy ones included)
qs = entrymod.queries()
names = ["token_budget_select","source_token_caps","curriculum_order","training_pipeline",
         "near_dup_clusters_incremental","pagerank_parts","ppr_parts","part_communities",
         "kcore_parts","minhash_lsh_dedup","simhash_dedup","canonical_selection",
         "length_batches","epoch_mixture","record_link","tri_hybrid_topk"]
for n in names:
    try: qs[n](spark, sf_dir).count()
    except Exception as e: print("#", n, "fail", e, file=sys.stderr)
    spark.catalog.clearCache()
time_span("after_context")
spark._jvm.System.gc()
time.sleep(2)
time_span("after_jvm_gc")
shutil.rmtree(tmp, ignore_errors=True)
spark.stop()
