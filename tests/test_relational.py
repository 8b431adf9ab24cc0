


def test_funnel_strict_ordering_semantics(spark):
    import datetime

    from distributed_vector_database_spark.operators.relational import (
        funnel,
        funnel_report,
    )

    b = datetime.datetime(2024, 1, 1)

    def ev(i, u, t, minutes):
        return (i, b + datetime.timedelta(minutes=minutes), u, t, 0.0)

    rows = [
        # user 1: full ordered funnel
        ev(1, 1, "view", 0), ev(2, 1, "click", 5), ev(3, 1, "purchase", 9),
        # user 2: purchase BEFORE view/click -> only 2 ordered steps
        ev(4, 2, "purchase", 0), ev(5, 2, "view", 1), ev(6, 2, "click", 2),
        # user 3: click and purchase at the SAME instant as view ->
        # strictly-increasing rule counts only the view
        ev(7, 3, "view", 0), ev(8, 3, "click", 0), ev(9, 3, "purchase", 0),
        # user 4: never views
        ev(10, 4, "click", 0), ev(11, 4, "purchase", 1),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {r["user_id"]: r["steps_completed"] for r in funnel(
        events, ["view", "click", "purchase"]
    ).collect()}
    assert got == {1: 3, 2: 2, 3: 1, 4: 0}
    rep = {r["step"]: (r["step_name"], r["n_users"]) for r in funnel_report(
        events, ["view", "click", "purchase"]
    ).collect()}
    assert rep == {1: ("view", 3), 2: ("click", 2), 3: ("purchase", 1)}


def test_funnel_report_emits_zero_rows_for_unreached_steps(spark):
    # nobody purchases: the report must still carry all 3 steps, with
    # n_users=0 for the unreached one (matches the DuckDB oracle shape)
    import datetime

    from distributed_vector_database_spark.operators.relational import funnel_report

    b = datetime.datetime(2024, 1, 1)
    rows = [
        (1, b, 1, "view", 0.0),
        (2, b + datetime.timedelta(minutes=1), 1, "click", 0.0),
        (3, b, 2, "view", 0.0),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    rep = funnel_report(events, ["view", "click", "purchase"]).orderBy("step").collect()
    assert [(r["step"], r["step_name"], r["n_users"]) for r in rep] == [
        (1, "view", 2), (2, "click", 1), (3, "purchase", 0)
    ]
    # fully-empty input: still 3 rows, all zero
    rep0 = funnel_report(events.limit(0), ["view", "click", "purchase"]).collect()
    assert sorted((r["step"], r["n_users"]) for r in rep0) == [(1, 0), (2, 0), (3, 0)]


def test_assign_sessions_gap_semantics(spark):
    import datetime

    from distributed_vector_database_spark.operators.relational import (
        assign_sessions,
    )

    b = datetime.datetime(2024, 1, 1)
    rows = [
        (1, b, 1, "view", 0.0),
        (2, b + datetime.timedelta(minutes=10), 1, "click", 0.0),   # same session
        (3, b + datetime.timedelta(minutes=50), 1, "view", 0.0),    # 40-min gap -> new
        (4, b, 2, "view", 0.0),                                     # other user
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {r["event_id"]: r["session_id"] for r in assign_sessions(ev, 30).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_retention_cohorts_shape(spark, tables):
    from distributed_vector_database_spark.operators.relational import (
        retention_cohorts,
    )

    rows = retention_cohorts(tables["events"]).collect()
    assert rows
    for r in rows:
        assert 0 <= r["week_offset"] <= 8
        assert 0 < r["n_active"] <= r["n_cohort"]
        assert r["retention"] <= 1.0
    # offset 0 is full by definition: every user is active in their
    # own first week
    assert all(r["retention"] == 1.0 for r in rows if r["week_offset"] == 0)


def test_customer_order_distribution_includes_zero_order_customers(spark):
    from distributed_vector_database_spark.operators.relational import (
        customer_order_distribution,
    )

    customer = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "c_custkey long, c_name string"
    )
    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2)], "o_orderkey long, o_custkey long"
    )
    got = {
        r["c_count"]: r["custdist"]
        for r in customer_order_distribution(customer, orders).collect()
    }
    # customer 3 has zero orders and must appear in the 0 bucket
    assert got == {2: 1, 1: 1, 0: 1}


def test_top_supplier_returns_all_tied_maxima(spark):
    import datetime

    from distributed_vector_database_spark.operators.relational import (
        top_supplier,
    )

    d = datetime.datetime(1996, 2, 1)
    supplier = spark.createDataFrame(
        [(1, "s1"), (2, "s2"), (3, "s3")], "s_suppkey long, s_name string"
    )
    lineitem = spark.createDataFrame(
        [
            (1, d, 100.0, 0.0),
            (2, d, 50.0, 0.0),
            (2, d, 50.0, 0.0),   # supplier 2 ties supplier 1 at 100
            (3, d, 10.0, 0.0),
            (3, datetime.datetime(1997, 1, 1), 500.0, 0.0),  # outside window
        ],
        "l_suppkey long, l_shipdate timestamp, l_extendedprice double, "
        "l_discount double",
    )
    got = [
        (r["s_suppkey"], r["total_revenue"])
        for r in top_supplier(supplier, lineitem).collect()
    ]
    assert got == [(1, 100.0), (2, 100.0)]


def test_small_quantity_revenue_threshold_is_per_part(spark):
    from distributed_vector_database_spark.operators.relational import (
        small_quantity_revenue,
    )

    part = spark.createDataFrame(
        [(1, "Brand#2"), (2, "Brand#2")], "p_partkey long, p_brand string"
    )
    lineitem = spark.createDataFrame(
        [
            # part 1: avg qty 10 -> threshold 2; only the qty-1 row counts
            (1, 1.0, 70.0), (1, 10.0, 999.0), (1, 19.0, 999.0),
            # part 2: avg qty 100 -> threshold 20; qty 19 counts HERE
            (2, 19.0, 140.0), (2, 181.0, 999.0),
        ],
        "l_partkey long, l_quantity double, l_extendedprice double",
    )
    got = small_quantity_revenue(lineitem, part).first()["avg_yearly"]
    assert got == round((70.0 + 140.0) / 7.0, 2)


def test_discount_revenue_single_row(tables):
    from distributed_vector_database_spark.operators.relational import (
        discount_revenue,
    )

    rows = discount_revenue(tables["lineitem"]).collect()
    assert len(rows) == 1
    assert rows[0]["revenue"] is None or rows[0]["revenue"] >= 0


def test_priority_shipping_mix_counts_partition(tables):
    from pyspark.sql import functions as F

    from distributed_vector_database_spark.operators.relational import (
        priority_shipping_mix,
    )

    li, orders = tables["lineitem"], tables["orders"]
    rows = priority_shipping_mix(li, orders).collect()
    total = sum(r["high_line_count"] + r["low_line_count"] for r in rows)
    joined = li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    ).join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    assert total == joined.count()


def test_idle_rich_customers_excludes_order_placers(tables):
    from pyspark.sql import functions as F

    from distributed_vector_database_spark.operators.relational import (
        idle_rich_customers,
    )

    segs = idle_rich_customers(tables["customer"], tables["orders"]).collect()
    # every counted customer is above the positive-balance average and
    # orderless; spot-check via recomputation
    cust, orders = tables["customer"], tables["orders"]
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal")
    ).first()[0]
    manual = (
        cust.filter(F.col("c_acctbal") > avg_bal)
        .join(
            orders.select("o_custkey").distinct(),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .count()
    )
    assert sum(r["num_custs"] for r in segs) == manual


def test_corpus_profile_nulls_and_distincts(spark):
    from distributed_vector_database_spark.operators.relational import (
        corpus_profile,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None)], "id long, tag string"
    )
    prof = {r["col_name"]: r for r in corpus_profile(df).collect()}
    assert prof["id"]["n_rows"] == 3
    assert prof["id"]["n_nulls"] == 0
    assert prof["id"]["n_distinct"] == 3
    assert prof["tag"]["n_nulls"] == 1
    assert prof["tag"]["n_distinct"] == 1
    assert prof["tag"]["min_val"] == "a"

    approx = {r["col_name"]: r for r in corpus_profile(df, approx=True).collect()}
    assert approx["id"]["n_distinct"] >= 2  # HLL estimate, small-n exact-ish


def _dt(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


def test_late_shipment_priority_exists_semantics(spark):
    from distributed_vector_database_spark.operators.relational import (
        late_shipment_priority,
    )

    orders = spark.createDataFrame(
        [
            (1, _dt("1996-02-01"), "1-URGENT"),   # has a late item
            (2, _dt("1996-02-01"), "1-URGENT"),   # on-time only
            (3, _dt("1996-02-01"), "3-MEDIUM"),   # two late items -> 1 order
            (4, _dt("1995-06-01"), "1-URGENT"),   # outside window, late item
        ],
        "o_orderkey long, o_orderdate timestamp, o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        [
            (1, _dt("1996-05-01")),  # 90 days late
            (1, _dt("1996-02-10")),  # on time
            (2, _dt("1996-02-20")),
            (3, _dt("1996-06-01")),
            (3, _dt("1996-07-01")),
            (4, _dt("1995-12-01")),
        ],
        "l_orderkey long, l_shipdate timestamp",
    )
    got = {
        r["o_orderpriority"]: r["order_count"]
        for r in late_shipment_priority(orders, lineitem).collect()
    }
    assert got == {"1-URGENT": 1, "3-MEDIUM": 1}


def test_waiting_suppliers_only_sole_late_on_multisupplier_orders(spark):
    from distributed_vector_database_spark.operators.relational import (
        waiting_suppliers,
    )

    orders = spark.createDataFrame(
        [
            (1, _dt("1996-01-01"), "F"),  # 2 supps, only supp 10 late
            (2, _dt("1996-01-01"), "F"),  # 2 supps, both late -> excluded
            (3, _dt("1996-01-01"), "F"),  # 1 supp late -> single-supplier, excluded
            (4, _dt("1996-01-01"), "O"),  # not finished -> excluded
        ],
        "o_orderkey long, o_orderdate timestamp, o_orderstatus string",
    )
    late, ontime = _dt("1996-06-01"), _dt("1996-02-01")
    lineitem = spark.createDataFrame(
        [
            (1, 10, late), (1, 20, ontime),
            (2, 10, late), (2, 20, late),
            (3, 10, late),
            (4, 10, late), (4, 20, ontime),
        ],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp",
    )
    supplier = spark.createDataFrame(
        [(10, "Supp#10"), (20, "Supp#20")], "s_suppkey long, s_name string"
    )
    rows = waiting_suppliers(lineitem, orders, supplier).collect()
    assert [(r["s_name"], r["numwait"]) for r in rows] == [("Supp#10", 1)]


def test_nation_market_share_fraction(spark):
    from distributed_vector_database_spark.operators.relational import (
        nation_market_share,
    )

    region = spark.createDataFrame(
        [(0, "ASIA"), (1, "EUROPE")], "r_regionkey long, r_name string"
    )
    nation = spark.createDataFrame(
        [(0, "N_A", 0), (1, "N_B", 0), (2, "N_C", 1)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    customer = spark.createDataFrame(
        [(1, 0), (2, 2)], "c_custkey long, c_nationkey long"
    )
    supplier = spark.createDataFrame(
        [(10, 0), (20, 1)], "s_suppkey long, s_nationkey long"
    )
    orders = spark.createDataFrame(
        [(100, 1, _dt("1996-03-01")), (200, 2, _dt("1996-03-01"))],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    # order 100 (ASIA customer): 30.0 from N_A supplier, 10.0 from N_B
    # order 200 (EUROPE customer): excluded entirely
    lineitem = spark.createDataFrame(
        [
            (100, 10, 30.0, 0.0),
            (100, 20, 10.0, 0.0),
            (200, 10, 99.0, 0.0),
        ],
        "l_orderkey long, l_suppkey long, l_extendedprice double, l_discount double",
    )
    rows = nation_market_share(
        lineitem, orders, customer, supplier, nation, region,
        target_nation="N_A", target_region="ASIA",
    ).collect()
    assert [(r["order_year"], r["mkt_share"]) for r in rows] == [(1996, 0.75)]


def test_product_profit_cost_proxy_and_filter(spark):
    from distributed_vector_database_spark.operators.relational import (
        product_profit,
    )

    part = spark.createDataFrame(
        [(1, "red widget", 10.0), (2, "blue bolt", 10.0)],
        "p_partkey long, p_name string, p_retailprice double",
    )
    nation = spark.createDataFrame(
        [(0, "N_A")], "n_nationkey long, n_name string"
    )
    supplier = spark.createDataFrame([(10, 0)], "s_suppkey long, s_nationkey long")
    orders = spark.createDataFrame(
        [(100, _dt("1996-03-01"))], "o_orderkey long, o_orderdate timestamp"
    )
    lineitem = spark.createDataFrame(
        [
            (100, 1, 10, 2.0, 50.0, 0.1),   # red: 50*0.9 - 0.6*10*2 = 33.0
            (100, 2, 10, 2.0, 50.0, 0.1),   # blue: name-filtered out
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_quantity double, l_extendedprice double, l_discount double",
    )
    rows = product_profit(lineitem, orders, supplier, nation, part).collect()
    assert [(r["supp_nation"], r["order_year"], r["profit"]) for r in rows] == [
        ("N_A", 1996, 33.0)
    ]


def test_min_cost_supplier_argmin_with_tiebreak(spark):
    """Per part: the in-region supplier with the lowest derived unit
    cost wins; cost ties break on the lower suppkey; parts outside the
    size/type filter and suppliers outside the region never appear."""
    from distributed_vector_database_spark.operators.relational import (
        min_cost_supplier,
    )

    region = spark.createDataFrame(
        [(0, "EUROPE"), (1, "ASIA")], "r_regionkey long, r_name string"
    )
    nation = spark.createDataFrame(
        [(0, "N_EU", 0), (1, "N_AS", 1)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    supplier = spark.createDataFrame(
        [(10, "S10", 5.0, 0), (20, "S20", 9.0, 0), (30, "S30", 1.0, 1)],
        "s_suppkey long, s_name string, s_acctbal double, s_nationkey long",
    )
    part = spark.createDataFrame(
        [(1, "p1", "LARGE", 15), (2, "p2", "LARGE", 15),
         (3, "p3", "SMALL", 15), (4, "p4", "LARGE", 99)],
        "p_partkey long, p_name string, p_type string, p_size int",
    )
    # part 1: S10 at cost 2.0 (min over two shipments), S20 at 3.0
    # part 2: tie at 4.0 -> lower suppkey (10) wins
    # part 3/4: filtered out by type/size; S30 out-of-region lines ignored
    lineitem = spark.createDataFrame(
        [
            (1, 10, 8.0, 4.0), (1, 10, 2.0, 1.0), (1, 20, 3.0, 1.0),
            (1, 30, 0.5, 1.0),
            (2, 20, 4.0, 1.0), (2, 10, 8.0, 2.0),
            (3, 10, 1.0, 1.0), (4, 10, 1.0, 1.0),
        ],
        "l_partkey long, l_suppkey long, l_extendedprice double, "
        "l_quantity double",
    )
    rows = min_cost_supplier(lineitem, part, supplier, nation, region).collect()
    got = {r["p_partkey"]: (r["s_name"], r["unit_cost"]) for r in rows}
    assert got == {1: ("S10", 2.0), 2: ("S10", 4.0)}
    assert all(r["n_name"] == "N_EU" for r in rows)


def test_important_part_values_threshold_vs_average(spark):
    """Only parts above mult x the average part value survive; lines
    from out-of-nation suppliers never count toward any part."""
    from distributed_vector_database_spark.operators.relational import (
        important_part_values,
    )

    nation = spark.createDataFrame(
        [(0, "NATION_7"), (1, "OTHER")], "n_nationkey long, n_name string"
    )
    supplier = spark.createDataFrame(
        [(10, 0), (20, 1)], "s_suppkey long, s_nationkey long"
    )
    # in-nation values: part 1 = 100, part 2 = 10, part 3 = 10
    # avg = 40 -> with mult=2 threshold is 80: only part 1 survives
    lineitem = spark.createDataFrame(
        [
            (1, 10, 100.0, 0.0),
            (2, 10, 10.0, 0.0),
            (3, 10, 10.0, 0.0),
            (1, 20, 1000.0, 0.0),  # out-of-nation: ignored
        ],
        "l_partkey long, l_suppkey long, l_extendedprice double, "
        "l_discount double",
    )
    rows = important_part_values(
        lineitem, supplier, nation, nations=("NATION_7",), mult=2.0
    ).collect()
    assert [(r["partkey"], r["part_value"]) for r in rows] == [(1, 100.0)]


def test_supplier_part_counts_exclusions(spark):
    """Negative-balance suppliers are anti-joined out, excluded
    brand/type/size parts never reach the distinct, and the count is
    distinct suppliers (repeat shipments collapse)."""
    from distributed_vector_database_spark.operators.relational import (
        supplier_part_counts,
    )

    part = spark.createDataFrame(
        [
            (1, "Brand#1", "LARGE", 5),
            (2, "Brand#15", "LARGE", 5),   # excluded brand
            (3, "Brand#1", "PROMO", 5),    # excluded type
            (4, "Brand#1", "LARGE", 7),    # size not in set
        ],
        "p_partkey long, p_brand string, p_type string, p_size int",
    )
    supplier = spark.createDataFrame(
        [(10, 1.0), (20, -5.0), (30, 0.0)],
        "s_suppkey long, s_acctbal double",
    )
    lineitem = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 20), (1, 30),
         (2, 10), (3, 10), (4, 10)],
        "l_partkey long, l_suppkey long",
    )
    rows = supplier_part_counts(lineitem, part, supplier).collect()
    assert [
        (r["p_brand"], r["p_type"], r["p_size"], r["supplier_cnt"])
        for r in rows
    ] == [("Brand#1", "LARGE", 5, 2)]  # supp 10 + 30; 20 excluded


def test_excess_stock_suppliers_share_and_window(spark):
    """A supplier qualifies iff it shipped > share of some matching
    part's total quantity inside the date window; out-of-window and
    non-matching-part lines count toward nothing."""
    from distributed_vector_database_spark.operators.relational import (
        excess_stock_suppliers,
    )

    part = spark.createDataFrame(
        [(1, "red bolt"), (2, "blue bolt")], "p_partkey long, p_name string"
    )
    nation = spark.createDataFrame(
        [(0, "NATION_5"), (1, "OTHER")], "n_nationkey long, n_name string"
    )
    supplier = spark.createDataFrame(
        [(10, "S10", 7.0, 0), (20, "S20", 3.0, 0), (30, "S30", 1.0, 1)],
        "s_suppkey long, s_name string, s_acctbal double, s_nationkey long",
    )
    inside, outside = _dt("1997-06-01"), _dt("1996-06-01")
    # part 1 in-window: S10 ships 70, S20 ships 30 -> only S10 > 50%
    # S20's huge out-of-window line must not help it
    # part 2 (non-matching name): S20 dominates but it counts nothing
    # S30 dominates part 1? no - keep S30 out-of-nation AND minor
    lineitem = spark.createDataFrame(
        [
            (1, 10, 70.0, inside), (1, 20, 30.0, inside),
            (1, 20, 500.0, outside),
            (2, 20, 100.0, inside),
        ],
        "l_partkey long, l_suppkey long, l_quantity double, "
        "l_shipdate timestamp",
    )
    rows = excess_stock_suppliers(
        lineitem, part, supplier, nation,
        name_prefix="red", share=0.5,
        date_from="1997-01-01", date_to="1998-01-01",
        nations=("NATION_5",),
    ).collect()
    assert [(r["s_name"], r["s_acctbal"]) for r in rows] == [("S10", 7.0)]


def test_grouped_percentiles_interpolation(spark):
    """Exact linear interpolation: for values 1..5, p50 = 3 and
    p90 = 4.6; a single-value group returns that value everywhere."""
    from distributed_vector_database_spark.operators.relational import (
        grouped_percentiles,
    )

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 6)] + [("b", 7.0)],
        "g string, v double",
    )
    rows = {r["g"]: r for r in grouped_percentiles(df, "g", "v").collect()}
    assert rows["a"]["p50"] == 3.0 and rows["a"]["p90"] == 4.6
    assert rows["b"]["p50"] == rows["b"]["p90"] == rows["b"]["p99"] == 7.0

    # labels derive from the VALUE: 0.05 and 0.5 no longer collide,
    # fractional percents keep their digits, duplicates fail fast
    import pytest

    got = grouped_percentiles(df, "g", "v", quantiles=(0.05, 0.5, 0.999))
    assert got.columns == ["g", "p05", "p50", "p99_9"]
    with pytest.raises(ValueError, match="colliding"):
        grouped_percentiles(df, "g", "v", quantiles=(0.5, 0.50))
