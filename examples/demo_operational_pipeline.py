"""End-to-end operational-analytics pipeline demo — the r9 wave composed
the way a warehouse ingest + serving stack chains it:

  1. streaming CDC apply — the change feed drains through foreachBatch
     and every micro-batch MERGEs into the keyed snapshot (last-writer
     by (ts, event_id) version, never arrival order)
  2. batch MERGE scorecard — the same upsert shape as a nightly job
  3. enrichment-with-absence — the stream-stream LEFT OUTER interval
     join: purchases with their attribution click, or a NULL row once
     the watermark PROVES no click can still arrive
  4. engagement rollups over the snapshot's source — continuous-time
     interval union (true active seconds, overlaps merged) and the LOCF
     time-weighted value average
  5. multi-criteria shortlist — the Pareto frontier over parts
  6. compressed ANN serving — PQ codes + asymmetric-distance top-10

    python examples/demo_operational_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from govgis_nov2023_slim_spatial_server_spark.catalog import QUERIES
from govgis_nov2023_slim_spatial_server_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="operational-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. streaming CDC apply: 3 micro-batches merged into the snapshot
    snap = QUERIES["stream_cdc_apply"](spark, sf_dir).collect()
    n_users = sum(r["n_users"] for r in snap)

    # 2. the batch MERGE reconciliation scorecard
    merge = {r["action"]: r["n_rows"] for r in QUERIES["cdc_upsert_snapshot"](spark, sf_dir).collect()}

    # 3. purchases with attribution click — or a proven absence
    louter = QUERIES["stream_left_outer_join"](spark, sf_dir)
    matched = louter.where(F.col("click_id").isNotNull()).count()
    absent = louter.where(F.col("click_id").isNull()).count()

    # 4. engagement: merged active time + time-weighted value
    iu = QUERIES["interval_union_seconds"](spark, sf_dir)
    covered = iu.agg(F.sum("covered_seconds")).first()[0]
    naive = iu.agg(F.sum("n_islands")).first()[0]  # islands, for context
    twa = QUERIES["time_weighted_avg_value"](spark, sf_dir)
    twa_rows = twa.where(F.col("twa_value").isNotNull()).count()

    # 5. the non-dominated shortlist
    frontier = QUERIES["pareto_frontier_parts"](spark, sf_dir).collect()

    # 6. compressed ANN: PQ codes + ADC distances
    pq = QUERIES["pq_adc_topk"](spark, sf_dir).collect()

    print(f"CDC snapshot users      : {n_users} (streamed in 3 merge batches)")
    print(
        "batch MERGE scorecard   : "
        + ", ".join(f"{a}={merge.get(a, 0)}" for a in ("insert", "update", "carry"))
    )
    print(f"purchase attribution    : {matched} matched, {absent} proven-absent")
    print(f"active coverage         : {covered}s across {naive} islands (overlaps merged)")
    print(f"time-weighted features  : {twa_rows} users with a finite TWA")
    print(
        "pareto frontier         : "
        + ", ".join(f"p{r['p_partkey']}(${r['p_retailprice']:.0f},sz{r['p_size']})" for r in frontier[:4])
    )
    print(
        "PQ top-1                : "
        f"vec {pq[0]['vec_id']} codes=({pq[0]['code0']},{pq[0]['code1']},"
        f"{pq[0]['code2']},{pq[0]['code3']}) adc={pq[0]['adc_dist']:.4f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
