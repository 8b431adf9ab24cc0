


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
