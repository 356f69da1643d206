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


def test_asof_nearest_subsecond_direction_ties_match_oracle(spark, tmp_path):
    """ADVICE r13 (medium): `asof_join_nearest` declares SECOND
    granularity end-to-end, so the oracle must classify direction with
    FLOOR(epoch(...)) like the engine's ts.cast('long') — a raw-ts
    comparison diverges exactly here: a purchase with two signups tying
    at the same second-granularity adiff, one raw-BEFORE and one
    raw-AFTER within the purchase's own second. Both are "backward" at
    second granularity, so the winner is the max-sid signup; a raw
    comparison would have called the raw-after one "forward" and picked
    the raw-before signup instead. All driver testdata carries
    sub-second components, so this is the
    latent-against-regenerated-driver-data class (r5 q5 lesson)."""
    import duckdb
    import pandas as pd

    from govgis_nov2023_slim_spatial_server_spark.catalog import ORACLES, QUERIES

    base = pd.Timestamp("2024-03-01 10:00:05")
    us = pd.Timedelta(microseconds=1)
    rows = [
        # user 7: purchase at .700; signups at .200 (raw-before, sid 100)
        # and .900 (raw-after, SAME truncated second, sid 200)
        (1, base + 700_000 * us, 7, "purchase"),
        (100, base + 200_000 * us, 7, "signup"),
        (200, base + 900_000 * us, 7, "signup"),
        # user 8: equal one-second gaps on both sides at sub-second raw
        # offsets — backward must win the adiff tie on both engines
        (2, base + pd.Timedelta(seconds=10) + 500_000 * us, 8, "purchase"),
        (300, base + pd.Timedelta(seconds=9) + 900_000 * us, 8, "signup"),
        (400, base + pd.Timedelta(seconds=11) + 100_000 * us, 8, "signup"),
    ]
    df = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.Series([r[1] for r in rows], dtype="datetime64[us]"),
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [1.0] * len(rows),
            "props": ['{"k": 1}'] * len(rows),
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = sorted(
        tuple(r) for r in QUERIES["asof_join_nearest"](spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(ORACLES["asof_join_nearest"]).fetchall())
    con.close()
    assert got == want
    by_pid = {r[0]: r for r in got}
    # user 7: the raw-after same-second signup (sid 200) wins on BOTH
    # engines — second-classified backward, max sid
    assert by_pid[1][2] == 200 and by_pid[1][3] == 0
    # user 8: one-second tie resolves backward (sid 300)
    assert by_pid[2][2] == 300 and by_pid[2][3] == 1 and by_pid[2][4] == 1
