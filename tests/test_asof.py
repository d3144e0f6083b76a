"""As-of join semantics: latest right row at-or-before each left row, per
key; null when none; exact-time right rows are visible."""

from pyspark.sql import functions as F

from couch_to_postgres_spark.operators.asof import asof_join


def test_asof_join_hand_cases(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", 100),  # before any right -> null
            (2, "u1", 200),  # exactly at right(200) -> 200 visible
            (3, "u1", 450),  # latest right <= 450 is 400
            (4, "u2", 500),  # u2 has no right rows -> null
        ],
        "event_id long, user_id string, ts_us long",
    )
    right = spark.createDataFrame(
        [("u1", 200, "a"), ("u1", 400, "b"), ("u1", 900, "z"), ("u3", 1, "x")],
        "user_id string, ts_us long, tag string",
    )
    out = {
        r["event_id"]: r
        for r in asof_join(
            left, right, ["user_id"], "ts_us", ["tag"], suffix="_r"
        ).collect()
    }
    assert out[1]["tag_r"] is None
    assert out[2]["tag_r"] == "a"   # at-or-before includes the exact tie
    assert out[3]["tag_r"] == "b"   # latest wins, not first
    assert out[4]["tag_r"] is None  # key with no right side
    assert len(out) == 4            # left rows all kept, right rows dropped


def test_asof_join_single_shuffle(spark):
    from couch_to_postgres_spark.plans.inspect import executed_plan

    left = spark.createDataFrame([(1, "u", 5)], "event_id long, user_id string, ts_us long")
    right = spark.createDataFrame([("u", 3, 9.0)], "user_id string, ts_us long, v double")
    plan = executed_plan(asof_join(left, right, ["user_id"], "ts_us", ["v"]))
    shuffles = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    # one hash shuffle on the key for the window — no range-join explosion
    assert len(shuffles) == 1, plan


def test_range_join_bucket_boundaries_and_uniqueness(spark):
    """Pairs straddling bucket boundaries are found; |d| == tolerance is
    inclusive; each qualifying pair appears exactly once. Cross-checked
    against the naive O(n*m) join on the same data."""
    left = spark.createDataFrame(
        [(i, "u", 100 * i) for i in range(20)],
        "lid long, user_id string, ts_us long",
    )
    right = spark.createDataFrame(
        [(100 + j, "u", 100 * j + 50) for j in range(20)],
        "rid long, user_id string, ts_us long",
    )
    from couch_to_postgres_spark.operators.asof import range_join

    got = sorted(
        (r["lid"], r["rid_r"])
        for r in range_join(left, right, ["user_id"], "ts_us", 150).collect()
    )
    naive = sorted(
        (r["lid"], r["rid"])
        for r in left.alias("l")
        .join(right.alias("r"), F.expr("l.user_id = r.user_id"))
        .filter(F.expr("abs(l.ts_us - r.ts_us) <= 150"))
        .select(F.col("l.lid").alias("lid"), F.col("r.rid").alias("rid"))
        .collect()
    )
    assert got == naive and len(got) == len(set(got)) > 0
    # inclusive boundary: lid=0 (t=0) pairs with rid=101 (t=150)? |d|=150
    assert (0, 101) in got


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

row_st = st.tuples(
    st.sampled_from(["u1", "u2", "u3"]),     # key
    st.integers(min_value=0, max_value=50),  # time
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lrows=st.lists(row_st, min_size=1, max_size=8),
    rrows=st.lists(row_st, min_size=0, max_size=8),
)
def test_asof_join_matches_model(spark, lrows, rrows):
    """Property: asof_join ≡ the obvious per-row model (max right time
    <= left time within the key)."""
    from couch_to_postgres_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)],
        "lid long, k string, t long",
    )
    right = spark.createDataFrame(
        [(k, t, t) for (k, t) in rrows], "k string, t long, v long"
    )
    got = {
        r["lid"]: r["v_asof"]
        for r in asof_join(left, right, ["k"], "t", ["v"]).collect()
    }
    for i, (k, t) in enumerate(lrows):
        cands = [rt for (rk, rt) in rrows if rk == k and rt <= t]
        assert got[i] == (max(cands) if cands else None), (i, k, t)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lrows=st.lists(row_st, min_size=1, max_size=8),
    rrows=st.lists(row_st, min_size=0, max_size=8),
    tol=st.integers(min_value=1, max_value=20),
)
def test_range_join_matches_model(spark, lrows, rrows, tol):
    """Property: range_join ≡ the naive all-pairs filter, pair-exact
    (no misses across bucket boundaries, no duplicates)."""
    from couch_to_postgres_spark.operators.asof import range_join

    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)],
        "lid long, k string, t long",
    )
    right = spark.createDataFrame(
        [(100 + j, k, t) for j, (k, t) in enumerate(rrows)],
        "rid long, k string, t long",
    )
    got = sorted(
        (r["lid"], r["rid_r"])
        for r in range_join(left, right, ["k"], "t", tol).collect()
    )
    want = sorted(
        (i, 100 + j)
        for i, (lk, lt) in enumerate(lrows)
        for j, (rk, rt) in enumerate(rrows)
        if lk == rk and abs(lt - rt) <= tol
    )
    assert got == want


def test_range_join_zero_tolerance_rejected(spark):
    import pytest

    from couch_to_postgres_spark.operators.asof import range_join

    df = spark.createDataFrame([(1, "u", 5)], "lid long, user_id string, ts_us long")
    with pytest.raises(ValueError, match="tolerance"):
        range_join(df, df, ["user_id"], "ts_us", 0)


def test_asof_forward_and_tolerance_match_naive(spark):
    left = spark.createDataFrame(
        [(1, 10.0), (1, 25.0), (1, 100.0), (2, 5.0), (3, 7.0)],
        "k long, t double",
    )
    right = spark.createDataFrame(
        [(1, 12.0, "a"), (1, 30.0, "b"), (2, 1.0, "c"), (2, 50.0, "d")],
        "k long, t double, v string",
    )
    fwd = {
        (r["k"], r["t"]): r["v_asof"]
        for r in asof_join(
            left, right, ["k"], "t", ["v"], direction="forward"
        ).collect()
    }
    # nearest following right row per key
    assert fwd[(1, 10.0)] == "a"
    assert fwd[(1, 25.0)] == "b"
    assert fwd[(1, 100.0)] is None  # nothing after
    assert fwd[(2, 5.0)] == "d"
    assert fwd[(3, 7.0)] is None    # no right rows for key
    # tolerance: matches farther than the bound null out
    tol = {
        (r["k"], r["t"]): r["v_asof"]
        for r in asof_join(
            left, right, ["k"], "t", ["v"], direction="forward", tolerance=10.0
        ).collect()
    }
    assert tol[(1, 10.0)] == "a"     # delta 2 <= 10
    assert tol[(1, 25.0)] == "b"     # delta 5 <= 10
    assert tol[(2, 5.0)] is None     # delta 45 > 10
    # backward with tolerance
    back = {
        (r["k"], r["t"]): r["v_asof"]
        for r in asof_join(
            left, right, ["k"], "t", ["v"], tolerance=10.0
        ).collect()
    }
    assert back[(1, 25.0)] is None   # nearest prior is 12, delta 13 > 10
    assert back[(1, 100.0)] is None  # delta 70 > 10
    no_tol = {
        (r["k"], r["t"]): r["v_asof"]
        for r in asof_join(left, right, ["k"], "t", ["v"]).collect()
    }
    assert no_tol[(1, 25.0)] == "a"  # same match survives without the bound


def test_asof_match_is_row_atomic_with_null_values(spark):
    # the nearest right row has a NULL value: the match must yield NULL,
    # not smuggle in an older row's value (which would also bypass the
    # tolerance bound on the matched row's time)
    left = spark.createDataFrame([(1, 105.0)], "k long, t double")
    right = spark.createDataFrame(
        [(1, 10.0, 5.0), (1, 100.0, None)], "k long, t double, v double"
    )
    plain = asof_join(left, right, ["k"], "t", ["v"]).collect()[0]
    assert plain["v_asof"] is None  # nearest row (t=100) carries NULL
    tol = asof_join(left, right, ["k"], "t", ["v"], tolerance=10.0).collect()[0]
    assert tol["v_asof"] is None    # and certainly not 5.0 from t=10 (delta 95)


def test_asof_tolerance_on_date_column(spark):
    # DATE time columns cast('double') to NULL in Spark: before the
    # explicit date branch the tolerance filter silently nulled EVERY
    # match; tolerance stays in seconds (dates are midnight instants)
    import datetime as dt

    left = spark.createDataFrame(
        [(1, dt.date(2024, 1, 10)), (2, dt.date(2024, 3, 1))],
        "k long, d date",
    )
    right = spark.createDataFrame(
        [(1, dt.date(2024, 1, 8), "a"), (2, dt.date(2024, 1, 1), "b")],
        "k long, d date, v string",
    )
    out = {
        r["k"]: r["v_asof"]
        for r in asof_join(
            left, right, ["k"], "d", ["v"], tolerance=3 * 86400.0
        ).collect()
    }
    assert out[1] == "a"    # 2 days back, inside the 3-day bound
    assert out[2] is None   # 60 days back, outside

    import pytest

    with pytest.raises(ValueError, match="tolerance is not supported"):
        asof_join(
            left.withColumn("d", F.col("d").cast("string")),
            right.withColumn("d", F.col("d").cast("string")),
            ["k"], "d", ["v"], tolerance=1.0,
        )
