"""r13 catalog entries and scale-knob coverage.

Covers the exact_quantiles_histogram recursion knobs (VERDICT r12 #6):
the auto-widen loop (narrow _QH_W → too many bins → width ×16 until the
collect fits) and the recursion-within-bin path (tiny _QH_BIN_ROWS_MAX →
targets re-histogrammed at 128× finer width, down to width-1 direct
resolution). Both patched runs must equal the default-constants run AND
the DuckDB oracle bit-for-bit.
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


class TestQuantileRecursionKnobs:
    def test_default_path_matches_oracle(self, spark):
        assert _spark_rows(spark, "exact_quantiles_histogram", SF_DIR) == (
            _oracle_rows("exact_quantiles_histogram", SF_DIR)
        )

    def test_auto_widen_from_narrow_width(self, spark, monkeypatch):
        """_QH_W = 256 cents would put sf0.001's ~6e7-cent range into
        ~200k bins — the old assert died here; the widen loop must
        recover (256 → 4096 → 65536 → ... until ≤ _QH_GUARD bins) and
        produce the identical result."""
        from govgis_nov2023_slim_spatial_server_spark.catalog import advanced

        monkeypatch.setattr(advanced, "_QH_W", 256)
        assert _spark_rows(spark, "exact_quantiles_histogram", SF_DIR) == (
            _oracle_rows("exact_quantiles_histogram", SF_DIR)
        )

    @pytest.mark.parametrize("bin_max", [50, 1])
    def test_recursion_within_bin(self, spark, monkeypatch, bin_max):
        """bin_max=50 forces at least one refine level at sf0.001
        (statuses hold hundreds of rows per coarse bin); bin_max=1
        forces refinement all the way to width-1 bins, where every
        target resolves DRIVER-SIDE (the no-scan direct path)."""
        from govgis_nov2023_slim_spatial_server_spark.catalog import advanced

        monkeypatch.setattr(advanced, "_QH_BIN_ROWS_MAX", bin_max)
        assert _spark_rows(spark, "exact_quantiles_histogram", SF_DIR) == (
            _oracle_rows("exact_quantiles_histogram", SF_DIR)
        )

    def test_both_knobs_together(self, spark, monkeypatch):
        from govgis_nov2023_slim_spatial_server_spark.catalog import advanced

        monkeypatch.setattr(advanced, "_QH_W", 512)
        monkeypatch.setattr(advanced, "_QH_BIN_ROWS_MAX", 25)
        assert _spark_rows(spark, "exact_quantiles_histogram", SF_DIR) == (
            _oracle_rows("exact_quantiles_histogram", SF_DIR)
        )
