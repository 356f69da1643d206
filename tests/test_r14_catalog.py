"""r14 catalog entries and scale-knob coverage.

Covers weighted_median_histogram's scale knobs (VERDICT r13 #3 — the
entry previously ASSERTED at the histogram guard while the unweighted
sibling auto-widened): both entries now share `_qh_hist_collect`
(auto-widen ×16 under the LIMIT-guarded collect) and the weighted entry
grew its own recursion-within-bin path (oversized by ROW count, located
by cumulative WEIGHT, width-1 direct driver-side resolution). Every
patched run must equal the default-constants run AND the DuckDB oracle
bit-for-bit.
"""

from __future__ import annotations

import duckdb
import pytest

from govgis_nov2023_slim_spatial_server_spark.catalog import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _oracle_rows(name: str, sf_dir: str):
    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer", "nation", "region"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    rows = con.execute(ORACLES[name]).fetchall()
    con.close()
    return sorted(rows, key=repr)


def _spark_rows(spark, name: str, sf_dir: str):
    return sorted(
        [tuple(r) for r in QUERIES[name](spark, sf_dir).collect()], key=repr
    )


class TestWeightedQuantileKnobs:
    def test_default_path_matches_oracle(self, spark):
        assert _spark_rows(spark, "weighted_median_histogram", SF_DIR) == (
            _oracle_rows("weighted_median_histogram", SF_DIR)
        )

    def test_auto_widen_from_narrow_width(self, spark, monkeypatch):
        """_QH_W = 256 cents puts sf0.001's ~1e7-cent lineitem price
        range into ~40k (flag × bin) rows — the r13 assert died exactly
        here; the shared widen loop must recover and produce the
        identical result."""
        from govgis_nov2023_slim_spatial_server_spark.catalog import advanced

        monkeypatch.setattr(advanced, "_QH_W", 256)
        assert _spark_rows(spark, "weighted_median_histogram", SF_DIR) == (
            _oracle_rows("weighted_median_histogram", SF_DIR)
        )

    @pytest.mark.parametrize("bin_max", [50, 1])
    def test_recursion_within_bin(self, spark, monkeypatch, bin_max):
        """bin_max=50 forces at least one weighted refine level at
        sf0.001 (each return flag holds thousands of rows per coarse
        bin); bin_max=1 refines to width-1 bins, where every target
        resolves DRIVER-SIDE (the all-direct no-scan path)."""
        from govgis_nov2023_slim_spatial_server_spark.catalog import advanced

        monkeypatch.setattr(advanced, "_QH_BIN_ROWS_MAX", bin_max)
        assert _spark_rows(spark, "weighted_median_histogram", SF_DIR) == (
            _oracle_rows("weighted_median_histogram", SF_DIR)
        )

    def test_both_knobs_together(self, spark, monkeypatch):
        from govgis_nov2023_slim_spatial_server_spark.catalog import advanced

        monkeypatch.setattr(advanced, "_QH_W", 512)
        monkeypatch.setattr(advanced, "_QH_BIN_ROWS_MAX", 25)
        assert _spark_rows(spark, "weighted_median_histogram", SF_DIR) == (
            _oracle_rows("weighted_median_histogram", SF_DIR)
        )
