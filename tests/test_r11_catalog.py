"""Targeted fixtures for the r11 catalog entries."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from govgis_nov2023_slim_spatial_server_spark.catalog import QUERIES


def _write_docs(rows, tmp_path):
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": ["s"] * len(rows),
            "n_chars": [len(r[1]) for r in rows],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)


def test_pps_systematic_sample_invariants_and_multipick(spark, tmp_path):
    """Systematic PPS: every pick position ⌊(2j+1)W/2k⌋ lies in [0, W),
    so the total pick count is EXACTLY k=10 on any corpus, and a document
    with w > W/k must be picked at least twice (here one 60-token doc
    against 4 one-token docs: w=60, W=64, W/k=6.4 → ⌈w·k/W⌉ ≥ 9 picks)."""
    heavy = " ".join(["tok"] * 60)
    _write_docs(
        [(1, "a"), (2, heavy), (3, "b"), (4, "c"), (5, "d")], tmp_path
    )
    got = {
        r["doc_id"]: (r["w"], r["n_picks"])
        for r in QUERIES["pps_systematic_sample"](spark, str(tmp_path)).collect()
    }
    assert sum(n for _, n in got.values()) == 10
    assert got[2][0] == 60 and got[2][1] >= 9
    # deterministic: a second run returns the identical multiset
    again = {
        r["doc_id"]: (r["w"], r["n_picks"])
        for r in QUERIES["pps_systematic_sample"](spark, str(tmp_path)).collect()
    }
    assert again == got


def test_pps_systematic_sample_plan_broadcasts_points(spark, tmp_path):
    """The k-point probe side must broadcast — the corpus side never
    shuffles for the pick join (only the documented test-scale global
    cumsum window sorts)."""
    _write_docs([(1, "a b c"), (2, "d e"), (3, "f")], tmp_path)
    plan = (
        QUERIES["pps_systematic_sample"](spark, str(tmp_path))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
