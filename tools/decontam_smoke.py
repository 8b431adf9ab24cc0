"""Scale smoke for decontamination + budgeted selection: 2M synthetic
docs vs a 10k-doc 'benchmark', and a quality-ordered token-budget
selection over the same corpus. Data generated JVM-side (spark.range),
so the numbers measure the operator plans, not ingestion.

Planted ground truth: eval doc e reuses the text of corpus doc
e*200, so exactly n/200 corpus docs are 100%-contaminated; everything
else is hash-mixed over a 1000-word vocabulary (natural 3-gram
collisions exist but full-overlap is only the planted set).

Usage: python tools/decontam_smoke.py [n_docs]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.decontam import (
    contamination_report,
    decontaminate,
)
from distributed_vector_database_spark.operators.sampling import (
    select_by_token_budget,
)
from distributed_vector_database_spark.functions.text import (
    quality_score,
    token_count,
)
from distributed_vector_database_spark.session import get_spark
from tools.scale_smoke import synth_docs


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    every = 200
    spark = get_spark(app_name="decontam-smoke")

    corpus = synth_docs(spark, n).persist()
    corpus.count()
    # eval set: 10k docs, each a verbatim copy of corpus doc id*every
    evals = (
        spark.range(n // every)
        .select((F.col("id") * every).alias("doc_id"))
        .join(corpus, "doc_id")
        .select((F.col("doc_id") + n).alias("doc_id"), "text")
    )

    t0 = time.time()
    kept = decontaminate(corpus, evals, n=3).count()
    t_filter = time.time() - t0
    planted = n // every
    print(
        f"decontaminate: {n} docs vs {planted} eval docs -> kept {kept} "
        f"({n - kept} dropped, >= {planted} planted) in {t_filter:.1f}s"
    )
    assert n - kept >= planted, "planted contamination must all be caught"

    t0 = time.time()
    rep = contamination_report(corpus, evals, n=3)
    n_cont = rep.filter("contaminated").count()
    t_rep = time.time() - t0
    print(f"contamination_report: {n_cont} contaminated docs in {t_rep:.1f}s")

    # span-level variant: excise the contaminated windows, keep the
    # docs — planted copies are fully covered by eval 8-grams, so each
    # planted doc must lose ALL its tokens; everyone else is intact
    # except natural collisions (printed, not asserted)
    from distributed_vector_database_spark.operators.decontam import (
        decontaminate_spans,
    )

    t0 = time.time()
    spans = decontaminate_spans(corpus, evals, k=8).persist()
    n_stripped, n_emptied = spans.agg(
        F.count(F.when(F.col("n_removed_tokens") > 0, 1)),
        F.count(F.when(F.col("clean_text") == "", 1)),
    ).first()
    t_spans = time.time() - t0
    print(
        f"decontaminate_spans: {n_stripped} docs lost spans, "
        f"{n_emptied} fully emptied (>= {planted} planted) in {t_spans:.1f}s"
    )
    assert n_emptied >= planted
    spans.unpersist()

    ann = corpus.select(
        "doc_id",
        quality_score("text").alias("quality"),
        token_count("text").alias("n_tokens"),
    )
    budget = 10_000_000  # ~ an eighth of the ~80M-token corpus
    t0 = time.time()
    sel = select_by_token_budget(ann, budget, partitions=64)
    n_sel, max_cum = sel.agg(
        F.count(F.lit(1)), F.max("cum_tokens")
    ).first()
    t_sel = time.time() - t0
    print(
        f"select_by_token_budget: {n_sel} docs, {max_cum} tokens "
        f"(budget {budget}) in {t_sel:.1f}s"
    )
    assert max_cum <= budget

    corpus.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
