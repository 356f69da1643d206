"""Property tests for orders-based entries on random order tables:
duplicate totalprice values (the argmax tie trap the fixed corpora only
contain one instance of), skewed priorities, single-row categories (the
m-estimate shrink edge), and tiny tables. Entry vs its own oracle,
row-for-row, through the driver's parquet shape.
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
    "target_encoding_smoothed",
    "psi_split_drift",
    "argmax_order_per_status",
    "grouping_sets_status_priority",
    "topk_offset_orders",
    # wider orders family: grouping/window/sampling semantics under
    # forced duplicate keys and tiny categories
    "pivot_status_priority",
    "agg_cube_status_priority",
    "distinct_multi_agg_orders",
    "window_rank_orders_per_customer",
    "window_ntile_quartiles",
    "window_percent_rank_prices",
    "window_running_total",
    "bitwise_aggs_orders",
    "mad_totalprice_by_status",
    "percentiles_by_status",
    "rank_with_ties_topk",
    "sample_deterministic_orders",
    "date_funcs_orders",
    "order_date_spine_counts",
    # r6 coverage expansion: remaining orders-only oracle entries
    "collect_sorted_priorities",
    "split_train_val_test",
    "skewed_agg_salted",
    "table_checksum_orders",
    "column_profile_orders",
    "set_ops_all_variants",
    "revenue_share_window",
    "sketch_cms_priority_counts",
    # r8: the MERGE INTO scorecard — full-outer coalesce on random key
    # sets (incl. empty orders, batch-only keys, snapshot-only keys)
    "cdc_upsert_snapshot",
    # r13: snapshot diff — random key sets vary which modulo classes are
    # populated (empty diff classes, all-removed, single-key tables)
    "snapshot_diff_keys",
    # r11: largest-remainder quota apportionment — random stratum counts
    # hit every deficit value 0..4 and remainder ties (the key tie-break)
    "quota_stratified_split",
    # r12: two-pass histogram quantiles — the tight cents range forces
    # heavy duplicate values (rank ties) and the all-in-one-bin regime;
    # single-row groups hit the r50 = r90 = 1 path
    "exact_quantiles_histogram",
]

STATUSES = ["O", "F", "P"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

orders_strategy = st.lists(
    st.tuples(
        st.sampled_from(STATUSES),
        st.sampled_from(PRIORITIES),
        # cents; small range forces DUPLICATE totalprice values (tie-break paths)
        st.integers(min_value=100, max_value=5000),
        st.integers(min_value=0, max_value=364),  # orderdate day offset
        st.integers(min_value=0, max_value=20),  # custkey
    ),
    min_size=3,
    max_size=80,
)


def _write_orders(rows, dirname: str) -> None:
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "o_orderkey": range(1, len(rows) + 1),
            "o_custkey": [c for *_, c in rows],
            "o_orderstatus": [s for s, *_ in rows],
            "o_totalprice": [cents / 100.0 for _, _, cents, _, _ in rows],
            "o_orderdate": [base + pd.Timedelta(days=d) for *_, d, _ in rows],
            "o_orderpriority": [p for _, p, *_ in rows],
        }
    )
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[us]")
    df.to_parquet(os.path.join(dirname, "orders.parquet"), index=False)


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
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(rows=orders_strategy)
def test_orders_entry_matches_its_oracle_on_random_orders(spark, entry, rows):
    with tempfile.TemporaryDirectory() as d:
        _write_orders(rows, d)
        got = _normalize(
            [tuple(r) for r in QUERIES[entry](spark, d).collect()]
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM read_parquet('{d}/orders.parquet')"
        )
        want = _normalize(con.execute(ORACLES[entry]).fetchall())
        con.close()
        assert got == want
