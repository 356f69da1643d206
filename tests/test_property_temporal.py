"""Property tests for the events-based temporal entries (SURVEY.md §5.2,
extended): generate RANDOM event tables — timestamp ties, single-event
users, value edge cases — write them through the same parquet shape the
driver ships, and require the catalog entry and its own DuckDB oracle to
agree row-for-row. This exercises the entry+oracle pair on adversarial
inputs the fixed sf corpora can't contain (the catalog's cross-engine
arithmetic claims are exactly the kind of thing a tie in `ts` or an
8-deep EWMA frame would falsify).
"""

from __future__ import annotations

import os
import tempfile

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from govgis_nov2023_slim_spatial_server_spark.catalog import ORACLES, QUERIES

ENTRIES = [
    "ewma_value_by_user",
    "attribution_last_touch",
    "scd2_intervals_user_type",
    "wilson_ctr_bound",
    "recursive_cte_chain_totals",
    "udaf_cents_total_by_type",
    "user_event_sequences",
    "markov_transition_matrix",
    "approx_topk_event_types",
    "variant_props_stats",
    # wider events family (r1-r4 entries): window/session/funnel semantics
    # on adversarial streams — ts ties, single-event users, sparse types
    "event_type_change_log",
    "cumulative_distinct_users",
    "dedup_first_event_per_key",
    "window_lag_lead_events",
    "funnel_view_click_purchase",
    "tumbling_window_1h",
    "session_windows_30m",
    "rolling_1h_user_stats",
    "json_extract_events",
    "map_funcs_events",
    "user_retention_cohorts",
    "dp_noisy_type_counts",
    "ab_test_two_proportions",
    # ml_eval wave: rank-statistic AUC (midrank ties ⇒ value collisions are
    # the adversarial case), NTILE calibration, rank-trimmed means,
    # integer-count entropy, basket lift, gaps-and-islands
    "roc_auc_purchase_vs_view",
    "calibration_bins_decile",
    "trimmed_stats_by_type",
    "user_behavior_entropy",
    "assoc_rules_event_pairs",
    "activity_islands_daily",
    "chi2_type_by_arm",
    # r6 coverage expansion: remaining events-only oracle entries
    "sliding_window_1h_30m",
    "asof_join_purchase_signup",
    # r13: the nearest-direction variant — random ts collisions force
    # equal-gap ties (backward preference) and same-second signup
    # groups (direction-signed sid tie-break)
    "asof_join_nearest",
    "time_hierarchy_rollup",
    "resample_ffill_15m",
    "approx_stats_events",
    "join_range_events_orders",
    # r9 catalog growth: continuous-time interval union (merged-coverage
    # seconds — ts ties and touching intervals are the adversarial case)
    # and the LOCF time-weighted average (zero-span users, same-second
    # runs, single-event users must yield NULL/absent rows identically)
    "interval_union_seconds",
    "time_weighted_avg_value",
    # r9: streaming foreachBatch CDC apply — random ts offsets are
    # decorrelated from the sequential event_ids, so the staged
    # ingestion-order micro-batches deliver genuinely out-of-order
    # version arrivals
    "stream_cdc_apply",
    # r9: stream-stream LEFT OUTER interval join — random corpora hit
    # ts ties at the file boundary, purchase-heavy/click-free users
    # (null-side emission), and single-event streams
    "stream_left_outer_join",
    # r13: the FULL outer form — random corpora additionally exercise
    # click-only users (right-null emission) and the both-sides-empty
    # type mixes
    "stream_full_outer_join",
    # r10: dropDuplicatesWithinWatermark re-emission across occurrence
    # islands — derives its synthetic islands from the random corpus's
    # DISTINCT user_id set, so key collisions / single-user corpora vary
    "stream_dedup_reemit_islands",
    # r10: pinned-hash HLL registers — tiny random user sets exercise the
    # near-empty-register regime (w = 0 sentinel, (m − seen)·2^49 spine
    # arithmetic) the fixed corpora never reach
    "sketch_hll_distinct_users",
    # r12: register-MAX union + inclusion-exclusion — few users force
    # real overlaps; single-type corpora exercise the empty pair set
    "sketch_hll_merge_union",
]

TYPES = ["view", "click", "purchase", "signup", "error"]

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # user_id (few users ⇒ deep chains)
        st.integers(min_value=0, max_value=7200),  # seconds offset (forces ties)
        st.sampled_from(TYPES),
        st.integers(min_value=1, max_value=49999),  # cents (2-decimal doubles)
    ),
    min_size=1,
    max_size=60,
)


def _write_events(rows, dirname: str) -> None:
    base = pd.Timestamp("2024-03-01 00:00:00")
    df = pd.DataFrame(
        {
            "event_id": range(1, len(rows) + 1),
            "ts": [base + pd.Timedelta(seconds=s) for _, s, _, _ in rows],
            "user_id": [u for u, _, _, _ in rows],
            "event_type": [t for _, _, t, _ in rows],
            "value": [c / 100.0 for _, _, _, c in rows],
            "props": ['{"k": 1}'] * len(rows),
        }
    )
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(os.path.join(dirname, "events.parquet"), index=False)
    # static dim for stream_static_enrich (a PARTIAL dim on purpose — only
    # 6 of the 25 possible user_id%25 keys — so the inner join's dropped
    # rows are exercised; invisible to other entries: the stream source's
    # pathGlobFilter reads events.parquet only)
    nation = pd.DataFrame(
        {
            "n_nationkey": pd.array(range(6), dtype="int32"),
            "n_name": [f"NATION_{i}" for i in range(6)],
        }
    )
    nation.to_parquet(os.path.join(dirname, "nation.parquet"), index=False)


def _normalize(rows):
    out = []
    for r in rows:
        out.append(
            tuple(
                round(v, 6) if isinstance(v, float) else v
                for v in (tuple(r) if not isinstance(r, tuple) else r)
            )
        )
    return sorted(out, key=repr)


@pytest.mark.parametrize("entry", ENTRIES)
@settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(rows=events_strategy)
def test_entry_matches_its_oracle_on_random_events(spark, entry, rows):
    with tempfile.TemporaryDirectory() as d:
        _write_events(rows, d)
        got = _normalize(
            [tuple(r) for r in QUERIES[entry](spark, d).collect()]
        )
        con = duckdb.connect()
        for t in ("events", "nation"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
            )
        want = _normalize(con.execute(ORACLES[entry]).fetchall())
        con.close()
        assert got == want


@st.composite
def late_stream(draw):
    """Event stream satisfying stream_late_data_drop's documented data
    contract — the earliest 100 events (the stragglers) sit a full time
    regime (≥ 5 h) below the bulk, so the batch-0 watermark provably
    exceeds every straggler even through the one-trigger filter lag —
    while everything else (user spread, ts ties, window occupancy, bulk
    size, event_id/ts correlation) is adversarially random. Recent span
    is capped at 2 h so no nonempty window's end can ever EQUAL the
    final watermark (end == wm needs span > 2 h), keeping the emission
    boundary away from engine-specific tie semantics the entry does not
    claim."""
    ev = st.tuples(
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=0, max_value=3600),
        st.sampled_from(TYPES),
        st.integers(min_value=1, max_value=49999),
    )
    old = draw(st.lists(ev, min_size=100, max_size=100))
    recent_ev = st.tuples(
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=21600, max_value=28800),
        st.sampled_from(TYPES),
        st.integers(min_value=1, max_value=49999),
    )
    recent = draw(st.lists(recent_ev, min_size=51, max_size=120))
    rows = old + recent
    if draw(st.booleans()):  # decorrelate event_id from ts
        rows = rows[::-1]
    return rows


@settings(
    max_examples=3, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(rows=late_stream())
def test_stream_late_data_drop_matches_oracle_on_random_streams(spark, rows):
    """REAL 3-micro-batch execution with genuinely late stragglers on a
    random stream: the watermark must drop all 100 earliest events and
    append mode must emit exactly the windows finalized below the final
    watermark — matching the entry's own batch-SQL oracle row-for-row."""
    with tempfile.TemporaryDirectory() as d:
        _write_events(rows, d)
        got = _normalize(
            [tuple(r) for r in QUERIES["stream_late_data_drop"](spark, d).collect()]
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
        )
        want = _normalize(
            con.execute(ORACLES["stream_late_data_drop"]).fetchall()
        )
        con.close()
        assert got == want


STREAM_ENTRIES = [
    "stream_static_enrich",
    # r12: sketch-bounded streaming distinct — few users per random
    # window exercise tiny register sets; ts ties land in one window
    "stream_hll_distinct_windows",
    "stream_tumbling_event_counts",
    "stream_sliding_event_counts",
    "stream_session_user_totals",
    "stream_dedup_user_type",
    "stream_interval_join_pairs",
    "stream_topk_types_per_window",
    "stream_stateful_running_totals",
]


@pytest.mark.parametrize("entry", STREAM_ENTRIES)
@settings(
    max_examples=3, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(rows=events_strategy)
def test_streaming_entry_matches_its_oracle_on_random_events(spark, entry, rows):
    """REAL availableNow streaming executions against the batch oracle on
    random streams — timestamp ties, single-event sessions, empty types.
    This is the watermark/session/interval semantics check the fixed
    corpus can't vary."""
    with tempfile.TemporaryDirectory() as d:
        _write_events(rows, d)
        got = _normalize(
            [tuple(r) for r in QUERIES[entry](spark, d).collect()]
        )
        con = duckdb.connect()
        for t in ("events", "nation"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
            )
        want = _normalize(con.execute(ORACLES[entry]).fetchall())
        con.close()
        assert got == want
