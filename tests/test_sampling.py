"""Deterministic sampling/splitting: reproducible, disjoint, exhaustive."""

from distributed_vector_database_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
    train_test_split,
)


def test_hash_sample_deterministic(tables):
    docs = tables["documents"]
    a = {r["doc_id"] for r in hash_sample(docs, "doc_id", 10).collect()}
    b = {r["doc_id"] for r in hash_sample(docs, "doc_id", 10).collect()}
    assert a == b and 0 < len(a) < docs.count()


def test_split_disjoint_exhaustive(tables):
    docs = tables["documents"]
    train, test = train_test_split(docs, "doc_id", test_pct=20)
    tr = {r["doc_id"] for r in train.collect()}
    te = {r["doc_id"] for r in test.collect()}
    assert tr.isdisjoint(te)
    assert len(tr) + len(te) == docs.count()
    # sample rate in a sane band around 20%
    assert 0.1 < len(te) / docs.count() < 0.3


def test_split_is_content_stable(tables):
    # membership is a function of the key alone — subsetting the corpus
    # must not move any key across the split
    docs = tables["documents"]
    _, test_full = train_test_split(docs, "doc_id", test_pct=20)
    subset = docs.filter("doc_id < 100")
    _, test_sub = train_test_split(subset, "doc_id", test_pct=20)
    full_ids = {r["doc_id"] for r in test_full.collect() if r["doc_id"] < 100}
    sub_ids = {r["doc_id"] for r in test_sub.collect()}
    assert full_ids == sub_ids


def test_stratified_cap_per_stratum(tables):
    docs = tables["documents"]
    out = stratified_sample(docs, "lang", "doc_id", 5)
    counts = out.groupBy("lang").count().collect()
    assert all(r["count"] <= 5 for r in counts)
    langs_in = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert {r["lang"] for r in counts} == langs_in


def test_mixture_sample_rates_and_determinism(spark, tables):
    from distributed_vector_database_spark.operators.sampling import (
        hash_sample,
        mixture_sample,
    )

    docs = tables["documents"]
    mixed = mixture_sample(
        docs, "lang", "doc_id", {"en": 80, "de": 40}, default_pct=10
    )
    rows1 = {(r["doc_id"], r["lang"]) for r in mixed.select("doc_id", "lang").collect()}
    rows2 = {(r["doc_id"], r["lang"]) for r in mixed.select("doc_id", "lang").collect()}
    assert rows1 == rows2  # deterministic

    # per-stratum membership must equal hash_sample at that stratum's rate
    for lang, pct in [("en", 80), ("de", 40)]:
        want = {
            r["doc_id"]
            for r in hash_sample(
                docs.filter(f"lang = '{lang}'"), "doc_id", pct
            ).collect()
        }
        got = {d for d, lg in rows1 if lg == lang}
        assert got == want

    # higher-rate stratum keeps a larger fraction
    import pyspark.sql.functions as F

    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {}
    for d, lg in rows1:
        kept[lg] = kept.get(lg, 0) + 1
    assert kept.get("en", 0) / totals["en"] > kept.get("de", 0) / totals["de"]


def test_mixture_sample_rejects_bad_rate(spark, tables):
    import pytest as _pytest

    from distributed_vector_database_spark.operators.sampling import mixture_sample

    with _pytest.raises(ValueError):
        mixture_sample(tables["documents"], "lang", "doc_id", {"en": 101})


def test_temperature_rates_and_sample(spark):
    from distributed_vector_database_spark.operators.sampling import (
        temperature_rates,
        temperature_sample,
    )

    # 900 'en' vs 100 'de': alpha=0.5 keeps all of the rare stratum and
    # sqrt(100/900)=1/3 of the head
    rows = [(i, "en" if i < 900 else "de") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = {r["lang"]: r["rate"] for r in temperature_rates(df, "lang").collect()}
    assert rates == {"de": 1000, "en": 333}

    out = temperature_sample(df, "lang", "doc_id")
    kept = {k: 0 for k in rates}
    for r in out.collect():
        kept[r["lang"]] += 1
    assert kept["de"] == 100                  # rarest stratum intact
    assert 250 <= kept["en"] <= 420           # ~1/3 of 900, hash-binomial

    # alpha=1 is natural proportions: everything kept
    assert temperature_sample(df, "lang", "doc_id", alpha=1.0).count() == 1000


def test_sample_negatives_uniform_and_anchor_free(spark):
    from distributed_vector_database_spark.operators.sampling import (
        sample_negatives,
    )

    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(100)], "doc_id long, text string"
    )
    out = sample_negatives(df, k=3, partitions=4).collect()
    assert len(out) == 300  # every anchor gets exactly k slots
    for r in out:
        assert r["neg_id"] != r["anchor_id"]  # never self-paired
    # reproducible; a new seed re-draws
    again = sample_negatives(df, k=3, partitions=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    other = sample_negatives(df, k=3, seed="epoch1", partitions=4).collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, other))
    # degenerate single-row corpus emits nothing
    one = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    assert sample_negatives(one, k=3, partitions=2).count() == 0


def test_temperature_rates_never_floor_a_stratum_to_zero(spark):
    from distributed_vector_database_spark.operators.sampling import (
        temperature_rates,
    )

    # one stray doc in a rare stratum + a huge head: without the clamp
    # the head's rate floors to 0 and the corpus majority vanishes
    rows = [(0, "stray")] + [(i, "head") for i in range(1, 5001)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = {
        r["lang"]: r["rate"]
        for r in temperature_rates(df, "lang", alpha=0.5, partition_count=50).collect()
    }
    # sqrt(1/5000)*50 = 0.707 -> floor 0 -> clamped to 1
    assert rates == {"stray": 50, "head": 1}


def test_leakage_safe_split_keeps_clusters_together(spark):
    """Near-dup cluster members must land in the SAME split; a plain
    per-doc hash split would separate them."""
    from distributed_vector_database_spark.operators.sampling import (
        leakage_safe_split,
    )

    members = spark.createDataFrame(
        # cluster 1 = {1, 7, 42}, cluster 2 = {2}, ... across many reps
        [(i, 1) for i in (1, 7, 42)]
        + [(i, i) for i in range(100, 160)],
        "id long, rep_id long",
    )
    got = leakage_safe_split(members, test_pct=30).collect()
    by_id = {r["id"]: r["split"] for r in got}
    assert len({by_id[1], by_id[7], by_id[42]}) == 1  # co-assigned
    splits = set(by_id.values())
    assert splits == {"train", "test"}  # 30% of 60 singletons hits both
    # deterministic: a second run is bit-identical
    again = {r["id"]: r["split"] for r in leakage_safe_split(
        members, test_pct=30
    ).collect()}
    assert again == by_id


def test_epoch_mixture_caps_and_weights(spark):
    from distributed_vector_database_spark.operators.sampling import (
        epoch_mixture,
    )

    docs = spark.createDataFrame(
        [(i, "hq", 100) for i in range(5)]
        + [(100 + i, "lq", 100) for i in range(50)]
        + [(900 + i, "zero", 100) for i in range(3)],
        "doc_id long, source string, n_tokens long",
    )
    # hq mass 500, lq mass 5000; weights 1:1 over budget 4000 ->
    # hq target 2000 -> 4 epochs (capped from 4.0); lq target 2000 ->
    # 0.4 epochs (fractional only); zero weight -> dropped
    out = epoch_mixture(
        docs, {"hq": 1.0, "lq": 1.0}, budget_tokens=4000, max_epochs=4
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert "zero" not in by_src
    hq_epochs = {r["epoch"] for r in by_src["hq"]}
    assert hq_epochs == {1, 2, 3, 4}
    assert len(by_src["hq"]) == 20  # 5 docs x 4 epochs, no fraction
    # lq: only fractional epoch-1 members, ~40% by content-stable hash
    assert all(r["epoch"] == 1 for r in by_src["lq"])
    assert 0 < len(by_src["lq"]) < 50

    # re-run is bit-identical (content-stable hash draw)
    again = epoch_mixture(
        docs, {"hq": 1.0, "lq": 1.0}, budget_tokens=4000, max_epochs=4
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_epoch_mixture_validates_inputs(spark):
    import pytest

    from distributed_vector_database_spark.operators.sampling import (
        epoch_mixture,
    )

    docs = spark.createDataFrame(
        [(1, "a", 10)], "doc_id long, source string, n_tokens long"
    )
    with pytest.raises(ValueError):
        epoch_mixture(docs, {"a": 1.0}, budget_tokens=0)
    with pytest.raises(ValueError):
        epoch_mixture(docs, {"a": 1.0}, budget_tokens=10, max_epochs=0)
    with pytest.raises(ValueError):
        epoch_mixture(docs, {"a": -1.0}, budget_tokens=10)


def test_curriculum_order_stages_and_intra_stage_shuffle(spark):
    """Stages partition by score cutpoints (stage 1 = lowest), the
    global position is contiguous by stage, intra-stage order is the
    md5(key||seed) shuffle (re-seedable), and n_stages=1 degenerates
    to a pure deterministic shuffle."""
    import hashlib

    from distributed_vector_database_spark.operators.sampling import (
        curriculum_order,
        deterministic_shuffle,
    )

    rows = [(i, float(i)) for i in range(20)]  # scores 0..19
    df = spark.createDataFrame(rows, ["doc_id", "difficulty"])

    got = curriculum_order(
        df, "difficulty", n_stages=4, seed="s1", partitions=3
    ).collect()
    by_id = {r["doc_id"]: r for r in got}
    # quartile cutpoints of 0..19: 4.75 / 9.5 / 14.25
    for i in range(20):
        expect = 1 + (i > 4.75) + (i > 9.5) + (i > 14.25)
        assert by_id[i]["stage"] == expect, (i, by_id[i]["stage"])
    # positions are a bijection onto 1..20 and contiguous by stage
    pos = sorted((r["curriculum_pos"], r["stage"]) for r in got)
    assert [p for p, _ in pos] == list(range(1, 21))
    stages_in_order = [s for _, s in pos]
    assert stages_in_order == sorted(stages_in_order)
    # intra-stage order matches the md5 shuffle contract
    s1 = sorted(
        (r for r in got if r["stage"] == 1),
        key=lambda r: r["curriculum_pos"],
    )
    expect_order = sorted(
        (r["doc_id"] for r in s1),
        key=lambda d: (
            hashlib.md5(f"{d}s1".encode()).hexdigest(), d
        ),
    )
    assert [r["doc_id"] for r in s1] == expect_order

    # different seed -> different intra-stage permutation, same stages
    other = curriculum_order(
        df, "difficulty", n_stages=4, seed="s2", partitions=3
    ).collect()
    assert {r["doc_id"]: r["stage"] for r in other} == {
        r["doc_id"]: r["stage"] for r in got
    }

    # n_stages=1 == deterministic_shuffle positions
    one = curriculum_order(df, "difficulty", n_stages=1, seed="z").collect()
    ds = deterministic_shuffle(df, "doc_id", seed="z").collect()
    assert {r["doc_id"]: r["curriculum_pos"] for r in one} == {
        r["doc_id"]: r["shuffle_pos"] for r in ds
    }

    import pytest

    with pytest.raises(ValueError):
        curriculum_order(df, "difficulty", n_stages=0)


def test_curriculum_order_empty_input(spark):
    """An empty corpus yields an empty ordered frame (percentile over
    zero rows is NULL; previously this crashed building cutpoints)."""
    from distributed_vector_database_spark.operators.sampling import (
        curriculum_order,
    )

    df = spark.createDataFrame([], "doc_id long, difficulty double")
    got = curriculum_order(df, "difficulty", n_stages=4)
    assert got.count() == 0
    assert "curriculum_pos" in got.columns and "stage" in got.columns
