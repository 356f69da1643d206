import datetime

import pytest
from pyspark.sql import functions as F

from govgis_nov2023_slim_spatial_server_spark.operators.multimodal import (
    decode_image,
    extract_byte_stats,
    with_binary_payload,
)
from govgis_nov2023_slim_spatial_server_spark.operators.topk import top_k
from govgis_nov2023_slim_spatial_server_spark.operators.windows import (
    session_window_agg,
    sessionize,
    sliding_window_agg,
    tumbling_window_agg,
)


def test_top_k_offset(spark):
    df = spark.createDataFrame([(i, i % 3) for i in range(20)], "id: long, grp: long")
    order = [F.col("grp").asc(), F.col("id").asc()]
    full = [(r["grp"], r["id"]) for r in df.orderBy(*order).collect()]
    got = [(r["grp"], r["id"]) for r in top_k(df, order, k=5, skip=3).collect()]
    assert got == full[3:8]
    got0 = [(r["grp"], r["id"]) for r in top_k(df, order, k=5).collect()]
    assert got0 == full[:5]


def _ts(h, m=0, s=0):
    return datetime.datetime(2024, 1, 1, h, m, s)


@pytest.fixture(scope="module")
def events_df(spark):
    rows = [
        (1, _ts(0, 5), 10, "a", 1.0),
        (2, _ts(0, 20), 10, "a", 2.0),
        (3, _ts(1, 10), 10, "b", 3.0),  # >30min gap → new session
        (4, _ts(0, 45), 20, "a", 4.0),
        (5, _ts(2, 0), 20, "a", 5.0),
    ]
    return spark.createDataFrame(
        rows, "event_id: long, ts: timestamp, user_id: long, event_type: string, value: double"
    )


def test_tumbling_window(spark, events_df):
    out = tumbling_window_agg(events_df, "1 hour")
    got = {r["window_start"].hour: r["n_events"] for r in out.collect()}
    assert got == {0: 3, 1: 1, 2: 1}


def test_sliding_window(spark, events_df):
    out = sliding_window_agg(events_df, "1 hour", "30 minutes")
    # event at 0:05 belongs to windows starting 23:30 (prev day) and 0:00
    n = {(r["window_start"].day, r["window_start"].hour, r["window_start"].minute): r["n_events"] for r in out.collect()}
    assert n[(1, 0, 0)] == 3  # 0:05, 0:20, 0:45
    assert n[(1, 0, 30)] == 2  # 0:45, 1:10
    assert sum(n.values()) == 10  # every event in exactly 2 windows


def test_sessionize(spark, events_df):
    out = sessionize(events_df, gap_minutes=30)
    got = {r["event_id"]: r["session_id"] for r in out.collect()}
    assert got[1] == 1 and got[2] == 1 and got[3] == 2  # 50-min gap splits
    assert got[4] == 1 and got[5] == 2


def test_session_agg(spark, events_df):
    out = session_window_agg(events_df, gap_minutes=30)
    rows = {(r["user_id"], r["session_id"]): r["n_events"] for r in out.collect()}
    assert rows == {(10, 1): 2, (10, 2): 1, (20, 1): 1, (20, 2): 1}


def test_multimodal_byte_stats(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "hello")], "doc_id: long, text: string")
    out = extract_byte_stats(with_binary_payload(df)).collect()
    got = {r["doc_id"]: r for r in out}
    assert got[1]["n_bytes"] == 3 and got[1]["first_byte"] == ord("a")
    assert got[2]["n_bytes"] == 5 and got[2]["width"] == 5 and got[2]["height"] == 35


def test_decode_image_is_stubbed(spark):
    df = spark.createDataFrame([(1, b"notanimage")], "id: long, payload: binary")
    with pytest.raises(NotImplementedError):
        decode_image(df)
