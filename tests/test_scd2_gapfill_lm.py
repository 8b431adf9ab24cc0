"""Round-6 additions: SCD2 history intervals, time-series gap-fill
LOCF, and the bigram-LM perplexity quality signal.

Semantics pinned on hand-built inputs (the fixture-scale hash oracles
live in __spark_entry__/check_correctness): interval closure by both
PUT-overwrite and DELETE, point-in-time lookup through deleted spans,
LOCF across multi-bucket gaps, per-series grid bounds, and LM scores
against an independent pure-Python recomputation.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest


def _log(spark, rows):
    return spark.createDataFrame(rows, "key string, op string, value double, ts long, seq long")


# ---------------------------------------------------------------------------
# scd2_history
# ---------------------------------------------------------------------------


def test_scd2_versions_closed_by_put_and_delete(spark):
    from distributed_vector_database_spark.operators.changelog import scd2_history

    log = _log(
        spark,
        [
            ("a", "PUT", 1.0, 10, 1),   # closed by the ts=20 PUT
            ("a", "PUT", 2.0, 20, 2),   # closed by the DELETE
            ("a", "DELETE", None, 30, 3),
            ("a", "PUT", 3.0, 40, 4),   # still open
            ("b", "PUT", 9.0, 15, 5),   # never touched again
        ],
    )
    h = scd2_history(log, seq_col="seq", value_cols=["value"])
    got = {
        (r["key"], r["valid_from"]): (r["value"], r["valid_to"], r["is_current"])
        for r in h.collect()
    }
    assert got == {
        ("a", 10): (1.0, 20, False),
        ("a", 20): (2.0, 30, False),
        ("a", 40): (3.0, None, True),
        ("b", 15): (9.0, None, True),
    }
    # DELETE emits no row of its own
    assert h.count() == 4


def test_scd2_point_in_time_lookup_skips_deleted_span(spark):
    from distributed_vector_database_spark.operators.changelog import scd2_history

    log = _log(
        spark,
        [
            ("a", "PUT", 1.0, 10, 1),
            ("a", "DELETE", None, 20, 2),
            ("a", "PUT", 2.0, 30, 3),
        ],
    )
    h = scd2_history(log, seq_col="seq", value_cols=["value"])

    def as_of(t):
        return h.filter(
            (F.col("valid_from") <= t)
            & (F.col("valid_to").isNull() | (F.lit(t) < F.col("valid_to")))
        ).collect()

    assert [r["value"] for r in as_of(15)] == [1.0]
    assert as_of(25) == []  # inside the deleted span: no covering row
    assert [r["value"] for r in as_of(35)] == [2.0]


def test_scd2_same_ts_ties_broken_by_seq(spark):
    from distributed_vector_database_spark.operators.changelog import scd2_history

    log = _log(spark, [("a", "PUT", 1.0, 10, 1), ("a", "PUT", 2.0, 10, 2)])
    h = scd2_history(log, seq_col="seq", value_cols=["value"]).collect()
    by_val = {r["value"]: r for r in h}
    assert by_val[1.0]["valid_to"] == 10 and not by_val[1.0]["is_current"]
    assert by_val[2.0]["valid_to"] is None and by_val[2.0]["is_current"]


def test_scd2_current_rows_equal_compact(spark):
    from distributed_vector_database_spark.operators.changelog import (
        compact,
        scd2_history,
    )

    log = _log(
        spark,
        [
            ("a", "PUT", 1.0, 10, 1),
            ("a", "PUT", 2.0, 20, 2),
            ("b", "PUT", 3.0, 10, 3),
            ("b", "DELETE", None, 30, 4),
            ("c", "PUT", 4.0, 5, 5),
        ],
    )
    cur = (
        scd2_history(log, seq_col="seq", value_cols=["value"])
        .filter("is_current")
        .select("key", "value")
    )
    state = compact(log, seq_col="seq").select("key", "value")
    assert sorted(map(tuple, cur.collect())) == sorted(map(tuple, state.collect()))


# ---------------------------------------------------------------------------
# gapfill_locf
# ---------------------------------------------------------------------------


def _events(spark, rows):
    df = spark.createDataFrame(rows, "event_type string, ts string, value double")
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def test_gapfill_locf_carries_across_multi_bucket_gap(spark):
    from distributed_vector_database_spark.operators.relational import gapfill_locf

    ev = _events(
        spark,
        [
            ("x", "2024-01-01 00:10:00", 1.0),
            ("x", "2024-01-01 00:50:00", 2.0),  # same bucket as above
            ("x", "2024-01-01 04:05:00", 7.0),  # 3-hour gap before this
        ],
    )
    out = {r["bucket"].hour: r for r in gapfill_locf(ev).collect()}
    assert sorted(out) == [0, 1, 2, 3, 4]  # densified onto the full grid
    assert out[0]["n"] == 2 and out[0]["sum_value"] == 3.0 and not out[0]["is_gap"]
    for h in (1, 2, 3):
        assert out[h]["is_gap"] and out[h]["n"] == 0
        assert out[h]["sum_value"] is None
        assert out[h]["sum_value_locf"] == 3.0  # carried forward
    assert out[4]["sum_value_locf"] == 7.0


def test_gapfill_grid_is_per_series(spark):
    from distributed_vector_database_spark.operators.relational import gapfill_locf

    ev = _events(
        spark,
        [
            ("x", "2024-01-01 00:00:00", 1.0),
            ("x", "2024-01-01 05:00:00", 1.0),
            ("y", "2024-01-01 02:00:00", 5.0),  # y's grid starts at 02
        ],
    )
    got = gapfill_locf(ev).groupBy("event_type").agg(
        F.count("*").alias("n"), F.min("bucket").alias("lo")
    )
    by = {r["event_type"]: r for r in got.collect()}
    assert by["x"]["n"] == 6 and by["x"]["lo"].hour == 0
    assert by["y"]["n"] == 1 and by["y"]["lo"].hour == 2


def test_gapfill_no_gaps_is_identity_on_sums(spark):
    from distributed_vector_database_spark.operators.relational import gapfill_locf

    ev = _events(
        spark,
        [
            ("x", "2024-01-01 00:00:00", 1.0),
            ("x", "2024-01-01 01:00:00", 2.0),
        ],
    )
    rows = gapfill_locf(ev).collect()
    assert all(not r["is_gap"] for r in rows)
    assert all(r["sum_value_locf"] == r["sum_value"] for r in rows)


def test_gapfill_day_step(spark):
    from distributed_vector_database_spark.operators.relational import gapfill_locf

    ev = _events(
        spark,
        [
            ("x", "2024-01-01 09:00:00", 1.0),
            ("x", "2024-01-04 09:00:00", 2.0),
        ],
    )
    rows = sorted(gapfill_locf(ev, step="day").collect(), key=lambda r: r["bucket"])
    assert len(rows) == 4
    assert [r["is_gap"] for r in rows] == [False, True, True, False]
    assert [r["sum_value_locf"] for r in rows] == [1.0, 1.0, 1.0, 2.0]


# ---------------------------------------------------------------------------
# bigram LM perplexity
# ---------------------------------------------------------------------------


def _lm_py(texts, k=0.5):
    """Independent pure-Python recomputation of the add-k bigram LM."""
    toks = [t.strip().lower().split() for t in texts if t.strip()]
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    for ts in toks:
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    V = len(uni)
    out = {}
    for i, ts in enumerate(toks):
        pairs = list(zip(ts, ts[1:]))
        if not pairs:
            continue
        s = sum(
            -math.log((bi.get(p, 0) + k) / (uni.get(p[0], 0) + k * V)) for p in pairs
        )
        out[i] = s / len(pairs)
    return out


def test_lm_cross_entropy_matches_python(spark):
    from distributed_vector_database_spark.operators.textops import (
        bigram_lm_counts,
        lm_cross_entropy,
    )

    texts = [
        "the cat sat on the mat",
        "the cat sat",
        "zebra quantum flux",  # unseen-ish combos -> high CE
        "the the the the",     # repeated bigram -> low CE
        "one",                 # single token: no row
        "   ",                 # blank: no row
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    uni, bi, vocab = bigram_lm_counts(docs)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["cross_entropy"])
        for r in lm_cross_entropy(docs, uni, bi, vocab, k=0.5).collect()
    }
    want = _lm_py(texts)
    assert set(got) == set(want) == {0, 1, 2, 3}
    for i, ce in want.items():
        assert got[i][1] == pytest.approx(ce, abs=1e-9)
    # the repeated-bigram doc is most predictable under the corpus LM
    assert got[3][1] == min(ce for _, ce in got.values())


def test_lm_vocab_and_counts(spark):
    from distributed_vector_database_spark.operators.textops import bigram_lm_counts

    docs = spark.createDataFrame(
        [(0, "a b a"), (1, "b a")], "doc_id long, text string"
    )
    uni, bi, vocab = bigram_lm_counts(docs)
    assert vocab.first()["vocab_size"] == 2
    assert {(r["w"], r["c1"]) for r in uni.collect()} == {("a", 3), ("b", 2)}
    assert {(r["w1"], r["w2"], r["c2"]) for r in bi.collect()} == {
        ("a", "b", 1),
        ("b", "a", 2),
    }


# ---------------------------------------------------------------------------
# user_rolling_window (time-RANGE frame)
# ---------------------------------------------------------------------------


def test_rolling_window_is_time_bounded_not_row_bounded(spark):
    from distributed_vector_database_spark.operators.relational import (
        user_rolling_window,
    )

    rows = [
        (1, 1, "2024-01-01 00:00:00", 1.0),
        (1, 2, "2024-01-03 00:00:00", 2.0),   # within 7d of #1
        (1, 3, "2024-01-20 00:00:00", 4.0),   # alone: #1/#2 aged out
        (1, 4, "2024-01-27 00:00:00", 8.0),   # exactly 7d after #3: included
        (2, 5, "2024-01-02 00:00:00", 16.0),  # other user, own frame
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["event_id"]: (r["n_7d"], r["sum_7d"])
        for r in user_rolling_window(ev, days=7).collect()
    }
    assert got == {
        1: (1, 1.0),
        2: (2, 3.0),
        3: (1, 4.0),
        4: (2, 12.0),  # RANGE bound is inclusive at exactly -7d
        5: (1, 16.0),
    }


def test_rolling_window_equal_timestamps_share_frame(spark):
    from distributed_vector_database_spark.operators.relational import (
        user_rolling_window,
    )

    rows = [
        (1, 1, "2024-01-01 00:00:00", 1.0),
        (1, 2, "2024-01-01 00:00:00", 2.0),  # same instant: RANGE peers
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["event_id"]: r["sum_7d"] for r in user_rolling_window(ev).collect()}
    # both rows see the full peer group (a ROWS frame would not)
    assert got == {1: 3.0, 2: 3.0}


# ---------------------------------------------------------------------------
# quality_deciles (rank-window family)
# ---------------------------------------------------------------------------


def test_quality_deciles_buckets_and_ranks(spark):
    from distributed_vector_database_spark.operators.textops import quality_deciles

    docs = spark.createDataFrame(
        [(i, f"word{i} " * (i + 1), "en") for i in range(20)]
        + [(100, "uno dos tres", "es")],
        "doc_id long, text string, lang string",
    )
    out = quality_deciles(docs, n_buckets=10).collect()
    en = sorted((r for r in out if r["lang"] == "en"), key=lambda r: r["doc_id"])
    # 20 docs over 10 buckets: every decile holds exactly 2
    sizes = {}
    for r in en:
        sizes[r["decile"]] = sizes.get(r["decile"], 0) + 1
    assert sizes == {d: 2 for d in range(1, 11)}
    # ranks are per-language: the lone es doc is its own partition
    es = [r for r in out if r["lang"] == "es"]
    assert len(es) == 1 and es[0]["decile"] == 1
    assert es[0]["pct_rank"] == 0.0 and es[0]["cum_dist"] == 1.0
    # cume_dist is monotone in quality order and tops out at 1.0
    by_rank = sorted(en, key=lambda r: (r["quality"], r["doc_id"]))
    cds = [r["cum_dist"] for r in by_rank]
    assert cds == sorted(cds) and cds[-1] == 1.0
