"""Salted-join correctness: result must equal the plain join, with the hot
key spread over salt buckets."""

from __future__ import annotations

from pyspark.sql import Row

from data_engineering_challenge_spark.operators.skew import key_histogram, salted_join


def test_salted_join_equals_plain_join(spark):
    # one hot user (80% of rows) + long tail
    big = spark.createDataFrame(
        [Row(user_id="hot", v=i) for i in range(400)]
        + [Row(user_id=f"u{i}", v=i) for i in range(100)]
    )
    small = spark.createDataFrame(
        [Row(user_id="hot", name="H")]
        + [Row(user_id=f"u{i}", name=f"N{i}") for i in range(0, 100, 2)]
    )
    plain = {(r.user_id, r.v, r.name) for r in big.join(small, "user_id").collect()}
    salted = {
        (r.user_id, r.v, r.name)
        for r in salted_join(big, small, "user_id", num_salts=4).collect()
    }
    assert salted == plain
    assert len(plain) == 400 + 50


def test_salted_left_join_preserves_unmatched(spark):
    big = spark.createDataFrame([Row(k="a", v=1), Row(k="b", v=2)])
    small = spark.createDataFrame([Row(k="a", name="A")])
    got = {(r.k, r.name) for r in salted_join(big, small, "k", 4, "left").collect()}
    assert got == {("a", "A"), ("b", None)}


def test_key_histogram_finds_hot_key(spark):
    big = spark.createDataFrame(
        [Row(user_id="hot", v=i) for i in range(50)]
        + [Row(user_id=f"u{i}", v=i) for i in range(10)]
    )
    top = key_histogram(big, "user_id", top=1).collect()
    assert top[0].user_id == "hot" and top[0].n_rows == 50


def test_partitioned_write_prunes(spark, tmp_path):
    """Date-partitioned parquet layout -> partition pruning for the
    reference's date-range re-runs (SURVEY.md §4 physical strategies)."""
    from pyspark.sql import functions as F

    from data_engineering_challenge_spark import roles
    from data_engineering_challenge_spark.sources import io as eio

    events = roles.load_events(spark, "/root/testdata/sf0.001")
    daily = events.withColumn("date", F.to_date("ts"))
    eio.write_parquet(daily, str(tmp_path / "by_date"), partition_by=["date"])
    back = spark.read.parquet(str(tmp_path / "by_date"))
    picked = back.filter(F.col("date") == "2024-01-05")
    plan = picked._jdf.queryExecution().executedPlan().toString()
    # partition filter, not a data filter: pruning happened at planning
    assert "PartitionFilters: [isnotnull(date" in plan
    assert picked.count() == daily.filter(F.col("date") == "2024-01-05").count()


def test_build_journeys_salted_parity_under_power_user_skew(spark):
    """The opt-in salt_buckets knob on the journey as-of join: under a
    fixture where ONE user owns half of all sessions (the hot key AQE
    can't split when the equi-key itself is the skew), the salted join
    must produce row-for-row identical journeys, and spread the hot
    user's sessions across the salt buckets."""
    import datetime as dt

    from pyspark.sql import functions as F

    from data_engineering_challenge_spark.operators import journeys as jny

    t0 = dt.datetime(2024, 1, 1)
    sessions = spark.createDataFrame(
        # the power user: half of all session rows
        [
            Row(
                session_id=f"hot-s{i}",
                user_id="hot",
                ts=t0 + dt.timedelta(minutes=i),
                channel_name=f"ch{i % 5}",
                holder_engagement=i % 2,
                closer_engagement=(i + 1) % 2,
                impression_interaction=i % 3,
            )
            for i in range(300)
        ]
        + [
            Row(
                session_id=f"u{i}-s",
                user_id=f"u{i}",
                ts=t0 + dt.timedelta(minutes=i),
                channel_name=f"ch{i % 5}",
                holder_engagement=0,
                closer_engagement=1,
                impression_interaction=0,
            )
            for i in range(300)
        ]
    )
    conversions = spark.createDataFrame(
        [
            Row(
                conv_id=f"hot-c{j}",
                user_id="hot",
                conv_ts=t0 + dt.timedelta(hours=2 + j),
                revenue=10.0,
            )
            for j in range(4)
        ]
        + [
            Row(
                conv_id=f"u{i}-c",
                user_id=f"u{i}",
                conv_ts=t0 + dt.timedelta(hours=6),
                revenue=1.0,
            )
            for i in range(0, 300, 3)
        ]
    )

    def key(r):
        return (
            r.conversion_id,
            r.session_id,
            r.timestamp,
            r.channel_label,
            r.holder_engagement,
            r.closer_engagement,
            r.conversion,
            r.impression_interaction,
            r.conv_ts,
        )

    plain = sorted(
        key(r) for r in jny.build_journeys(conversions, sessions).collect()
    )
    salted = sorted(
        key(r)
        for r in jny.build_journeys(
            conversions, sessions, salt_buckets=8
        ).collect()
    )
    assert salted == plain
    # the hot user really dominates the join: 843 of 943 rows are theirs
    assert len(plain) == 943

    # the salt really fans the hot key out: its sessions occupy >1 bucket
    n_buckets = (
        sessions.filter(F.col("user_id") == "hot")
        .select(
            F.pmod(
                F.xxhash64(*[F.col(c) for c in sessions.columns]), F.lit(8)
            ).alias("b")
        )
        .distinct()
        .count()
    )
    assert n_buckets > 1


def test_recommend_salt_probes_hot_key(spark):
    """recommend_salt wires the histogram probe to the salt knob: the
    1-user-owns-half fixture recommends a bucket count sized to the hot
    key, uniform data recommends nothing (salting uniform data multiplies
    shuffle volume for no benefit)."""
    from data_engineering_challenge_spark.operators.skew import recommend_salt

    skewed = spark.createDataFrame(
        [Row(user_id="power", v=i) for i in range(500)]
        + [Row(user_id=f"u{i % 50}", v=i) for i in range(500)]
    )
    # hot key owns 500 rows; at 100 rows/task that is 5 buckets
    assert recommend_salt(skewed, "user_id", rows_per_task=100) == 5
    # cap respected
    assert recommend_salt(skewed, "user_id", rows_per_task=100, max_buckets=3) == 3
    # uniform: heaviest key ~10 rows, under threshold -> no salt
    uniform = spark.createDataFrame(
        [Row(user_id=f"u{i % 100}", v=i) for i in range(1000)]
    )
    assert recommend_salt(uniform, "user_id", rows_per_task=100) is None
    # empty probe side
    assert recommend_salt(uniform.limit(0), "user_id", rows_per_task=100) is None
