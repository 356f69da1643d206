import datetime

import pytest

from govgis_nov2023_slim_spatial_server_spark.operators.asof import as_of_join


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(10), 7),
            (2, _ts(30), 7),
            (3, _ts(5), 8),   # before any right row for user 8
            (4, _ts(20), 9),  # user with no right rows at all
        ],
        "event_id: long, ts: timestamp, user_id: long",
    )
    right = spark.createDataFrame(
        [
            (100, _ts(0), 7, 1.0),
            (101, _ts(25), 7, 2.0),
            (102, _ts(10), 8, 3.0),
        ],
        "event_id: long, ts: timestamp, user_id: long, price: double",
    )
    return left, right


def test_asof_basic(spark, sides):
    left, right = sides
    out = as_of_join(left, right, on="user_id", right_cols=["event_id", "price"])
    got = {r["event_id"]: (r["event_id_right"], r["price_right"]) for r in out.collect()}
    assert got[1] == (100, 1.0)   # latest right at-or-before 0:10 is 0:00
    assert got[2] == (101, 2.0)   # 0:25 row wins at 0:30
    assert got[3] == (None, None)  # right row is AFTER the left ts
    assert got[4] == (None, None)  # no right rows for the user
    assert out.count() == left.count()  # left join: every left row survives


def test_asof_inclusive_equal_ts(spark):
    left = spark.createDataFrame([(1, _ts(10), 7)], "event_id: long, ts: timestamp, user_id: long")
    right = spark.createDataFrame(
        [(200, _ts(10), 7, 9.0)], "event_id: long, ts: timestamp, user_id: long, price: double"
    )
    out = as_of_join(left, right, on="user_id", right_cols=["price"]).first()
    assert out["price_right"] == 9.0  # r.ts <= l.ts is inclusive


def test_asof_tolerance(spark, sides):
    left, right = sides
    out = as_of_join(
        left, right, on="user_id", right_cols=["price"], tolerance_seconds=301
    )
    got = {r["event_id"]: r["price_right"] for r in out.collect()}
    assert got[2] == 2.0   # 5-minute gap within tolerance
    assert got[1] is None  # 10-minute gap voided


def test_asof_null_payload_from_latest_row(spark):
    """A NULL payload field in the LATEST matching right row must be kept
    (not skipped for an older non-null value), and all output columns must
    come from the same right row — merge_asof/DuckDB ASOF semantics."""
    left = spark.createDataFrame(
        [(1, _ts(30), 7)], "event_id: long, ts: timestamp, user_id: long"
    )
    right = spark.createDataFrame(
        [
            (100, _ts(0), 7, 1.0, "old"),
            (101, _ts(20), 7, None, "new"),  # latest match: price is NULL
        ],
        "event_id: long, ts: timestamp, user_id: long, price: double, tag: string",
    )
    row = as_of_join(
        left, right, on="user_id", right_cols=["event_id", "price", "tag"]
    ).first()
    assert row["event_id_right"] == 101
    assert row["price_right"] is None   # NOT 1.0 from the older row
    assert row["tag_right"] == "new"
    assert row["ts_right"] == _ts(20)
