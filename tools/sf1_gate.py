"""sf1 headline correctness gate (VERDICT r12 #7).

The driver fixtures stop at sf0.1; this gate scales them 10x to sf1
(~6M lineitem rows) and runs the 20 headline queries Spark-vs-DuckDB
on the SAME generated parquet — catching any driver-side constant,
overflow, or plan assumption that only bites at 10x the bench scale.

Generation (DuckDB, no Spark needed): 10 copies of every sf0.1 fact
table with per-copy key-space shifts that preserve referential
integrity (customer/orders share the custkey shift, orders/lineitem
the orderkey shift, part/supplier/lineitem the part/supp shifts), and
a tiny deterministic multiplicative jitter (1 + copy*1e-6) on measure
columns and embedding components so copied rows do not create
million-way order ties that would make ranking queries vacuous.
Document texts in copies 1..9 get every word PREFIXED with the copy
tag — a per-copy token bijection (w -> qNw), so within-copy token
frequencies, shingle sets, and near-dup structure mirror sf0.1
exactly while cross-copy similarity is zero. Two rejected designs,
kept as a warning: verbatim copies make every doc a 10-way
near-duplicate (the minhash/jaccard oracles go quadratic in the copy
count — 43 CPU-minutes in one oracle), and INTERLEAVING a filler
token between words makes that filler dominate every simhash
fingerprint (simhash_dedup returned 112M pairs) and every shared
word a shared shingle. Dimension tables (region, nation) stay fixed,
as in TPC-H scaling.
The oracle reads the generated parquet too, so the gate is pure
engine-vs-SQL semantics at scale — the data's provenance is
irrelevant to what it checks.

Usage:  python tools/sf1_gate.py [out_json]
Writes CORRECTNESS_SF1.json (default) with the driver-style per-query
record {rows_match, schema_match, hash_match, spark_rows,
oracle_rows, err}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(__file__))

from check_correctness import canon, row_multiset  # noqa: E402

SF1_DIR = "/tmp/sf1"
SRC = "/root/testdata/sf0.1"
COPIES = 10

# ngram_jaccard_SCALE, not ngram_jaccard_dedup: the exact tier's
# oracle is an all-pairs cross join (O(n^2) list_intersects — by
# design, it IS the brute-force anchor), which is 1.25e9 pairs at
# sf1's 50k docs; the scale tier verifies minhash candidates instead,
# which is the path that must hold at 10x anyway.
HEADLINE_20 = [
    "flagship_knn", "knn_exact", "knn_sharded", "knn_join",
    "pricing_summary", "top_orders_by_segment", "regional_revenue",
    "customer_order_ranks", "changelog_compact", "doc_stats",
    "lang_profile", "exact_dedup", "minhash_lsh_dedup", "simhash_dedup",
    "ngram_jaccard_scale", "embedding_near_dup_scale", "events_tumbling",
    "events_sliding", "events_sessions", "knn_filtered",
]
# embedding_near_dup_SCALE for the same reason as ngram: the exact
# tier's oracle is all-pairs (400M list dot products at sf1's 20k
# vectors). The scale tier has no SQL oracle, but its single result
# row IS the evidence — in-plan recall vs the Spark-side exact join
# computed at sf1 — and the gate records those row values verbatim.

# Second set: the ANN family's self-evidencing queries. Each carries
# an in-plan recall-vs-exact column; running them here records the
# whole approximate family's quality AT 10x (the scale where fixed
# probe budgets decay — exactly what this gate caught in
# embedding_near_dup_scale). Rows-only by design; the evidence is the
# recorded recall value.
ANN_EVIDENCE = [
    "ann_lsh_topk", "ann_ivf_topk", "ann_sq_topk", "ann_pq_topk",
    "ann_ivfpq_topk", "ann_hnsw_topk", "ann_bq_topk", "ann_ivfbq_topk",
    "ann_ivf_filtered", "ann_ivf_knn_join", "ann_lsh_similarity_join",
]


def generate(force: bool = False) -> None:
    marker = os.path.join(SF1_DIR, ".complete")
    if os.path.exists(marker) and not force:
        return
    os.makedirs(SF1_DIR, exist_ok=True)
    con = duckdb.connect()
    shifts = {}
    for key, table, col in [
        ("CK", "customer", "c_custkey"),
        ("OK", "orders", "o_orderkey"),
        ("PK", "part", "p_partkey"),
        ("SK", "supplier", "s_suppkey"),
        ("EK", "events", "event_id"),
        ("UK", "events", "user_id"),
        ("DK", "documents", "doc_id"),
        ("VK", "embeddings", "vec_id"),
    ]:
        shifts[key] = (
            con.sql(
                f"SELECT max({col}) + 1 FROM '{SRC}/{table}.parquet'"
            ).fetchone()[0]
        )

    def copies(select_tmpl: str, table: str) -> str:
        return " UNION ALL ".join(
            select_tmpl.format(i=i, j=f"(1 + {i} * 1e-6)")
            + f" FROM '{SRC}/{table}.parquet'"
            for i in range(COPIES)
        )

    jobs = {
        # dims: fixed, straight copy
        "region": f"SELECT * FROM '{SRC}/region.parquet'",
        "nation": f"SELECT * FROM '{SRC}/nation.parquet'",
        "customer": copies(
            "SELECT c_custkey + {i} * %(CK)d AS c_custkey, c_name,"
            " c_nationkey, c_acctbal * {j} AS c_acctbal, c_mktsegment",
            "customer",
        ),
        "supplier": copies(
            "SELECT s_suppkey + {i} * %(SK)d AS s_suppkey, s_name,"
            " s_nationkey, s_acctbal * {j} AS s_acctbal",
            "supplier",
        ),
        "part": copies(
            "SELECT p_partkey + {i} * %(PK)d AS p_partkey, p_name,"
            " p_brand, p_type, p_size,"
            " p_retailprice * {j} AS p_retailprice",
            "part",
        ),
        "orders": copies(
            "SELECT o_orderkey + {i} * %(OK)d AS o_orderkey,"
            " o_custkey + {i} * %(CK)d AS o_custkey, o_orderstatus,"
            " o_totalprice * {j} AS o_totalprice, o_orderdate,"
            " o_orderpriority",
            "orders",
        ),
        "lineitem": copies(
            "SELECT l_orderkey + {i} * %(OK)d AS l_orderkey,"
            " l_partkey + {i} * %(PK)d AS l_partkey,"
            " l_suppkey + {i} * %(SK)d AS l_suppkey, l_linenumber,"
            " l_quantity, l_extendedprice * {j} AS l_extendedprice,"
            " l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate",
            "lineitem",
        ),
        "events": copies(
            "SELECT event_id + {i} * %(EK)d AS event_id, ts,"
            " user_id + {i} * %(UK)d AS user_id, event_type,"
            " value * {j} AS value, props",
            "events",
        ),
        "documents": copies(
            "SELECT doc_id + {i} * %(DK)d AS doc_id,"
            " CASE WHEN {i} = 0 THEN text"
            " ELSE 'q{i}' || replace(text, ' ', ' q{i}') END AS text,"
            " lang, source,"
            " CAST(length(CASE WHEN {i} = 0 THEN text"
            " ELSE 'q{i}' || replace(text, ' ', ' q{i}') END)"
            " AS BIGINT) AS n_chars",
            "documents",
        ),
        "embeddings": copies(
            "SELECT vec_id + {i} * %(VK)d AS vec_id,"
            " list_transform(embedding,"
            " x -> CAST(x * {j} AS FLOAT)) AS embedding, label",
            "embeddings",
        ),
    }
    for table, sql in jobs.items():
        sql = sql % shifts
        con.sql(
            f"COPY ({sql}) TO '{SF1_DIR}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(
            f"SELECT count(*) FROM '{SF1_DIR}/{table}.parquet'"
        ).fetchone()[0]
        print(f"generated {table}: {n} rows", flush=True)
    with open(marker, "w") as f:
        f.write("ok")


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_SF1.json"
    generate()

    import __spark_entry__ as entrymod
    from distributed_vector_database_spark.config import FIXTURE_TABLES
    from distributed_vector_database_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF1_DIR}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results, n_fail = {}, 0
    for name in HEADLINE_20 + ANN_EVIDENCE:
        t0 = time.time()
        rec = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            df = qs[name](spark, SF1_DIR)
            cols = df.columns
            rows = df.collect()
            rec["spark_rows"] = len(rows)
            if name not in oracles:
                rec["err"] = "no_oracle"
                # a no-oracle entry's self-evidence lives in its row
                # values (in-plan recall / error columns) — keep them
                ev_cols = [
                    c for c in cols
                    if c in ("recall", "false_pos", "score_err",
                             "topk_margin", "norm_err", "nondet_rows",
                             "cov_identity_err", "recon_err",
                             "roundtrip_fail", "dim_err_rows")
                ]
                if len(rows) == 1:
                    rec["row"] = {
                        k: (round(v, 6) if isinstance(v, float) else v)
                        for k, v in rows[0].asDict().items()
                    }
                elif rows and ev_cols:
                    rec["row"] = {
                        c: (round(v, 6) if isinstance(v, float) else v)
                        for c, v in zip(
                            ev_cols,
                            (rows[0][c] for c in ev_cols),
                        )
                    }
            else:
                ores = con.sql(oracles[name])
                ocols = list(ores.columns)
                orows = ores.fetchall()
                rec["oracle_rows"] = len(orows)
                rec["rows_match"] = len(rows) == len(orows)
                rec["schema_match"] = sorted(cols) == sorted(ocols)
                rec["hash_match"] = row_multiset(
                    cols, rows
                ) == row_multiset(ocols, orows)
                if not (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and rec["hash_match"]
                ):
                    n_fail += 1
        except Exception as e:
            rec["err"] = str(e)[:300]
            n_fail += 1
        status = (
            "pass" if rec["hash_match"]
            else ("rows" if rec["err"] == "no_oracle" else "FAIL")
        )
        print(
            f"{status:<5} {name}: spark={rec['spark_rows']}"
            f" oracle={rec['oracle_rows']} ({time.time() - t0:.1f}s)",
            flush=True,
        )
        results[name] = rec
    with open(out_path, "w") as f:
        json.dump({"sf": 1, "sf_dir": SF1_DIR, "queries": results}, f,
                  indent=1)
    total = len(HEADLINE_20) + len(ANN_EVIDENCE)
    print(f"\n{total - n_fail}/{total} clean -> {out_path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
