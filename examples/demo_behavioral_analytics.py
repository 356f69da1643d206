"""End-to-end behavioral-analytics pipeline demo over the events table.

The temporal counterpart of demo_training_pipeline: composes the engine's
event-stream operators in the order a product-analytics warehouse chains
them, everything on ONE hash-partitioning of user_id where possible:

  1. SCD-2 state build — each user's event_type validity intervals
  2. last-touch attribution (union trick, join-free) → conversion credits
  3. funnel + Wilson-bound conversion ranking (small-sample-safe)
  4. EWMA engagement features (bounded-frame fold) → feature-store rows
  5. Markov transition matrix → next-event model + instrumentation QA
  6. behavior sequences → the sequence-model corpus
  7. PSI drift check between a reference and current hash-split — the
     monitor that pages before a model silently degrades

    python examples/demo_behavioral_analytics.py [sf_dir]
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
    spark = get_spark(app_name="behavioral-analytics-demo")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. SCD-2 user-state dimension
    scd2 = QUERIES["scd2_intervals_user_type"](spark, sf_dir)
    n_intervals = scd2.count()
    n_current = scd2.where(F.col("is_current") == 1).count()

    # 2. attribution: which clicks get credit for purchases
    attr = QUERIES["attribution_last_touch"](spark, sf_dir)
    credited = attr.where(F.col("click_id").isNotNull()).count()
    total_purchases = attr.count()

    # 3. conversion quality ranking that small samples can't game
    wilson = QUERIES["wilson_ctr_bound"](spark, sf_dir)
    top = wilson.orderBy(F.col("wilson_lb").desc(), "user_id").limit(3).collect()

    # 4. smoothed engagement features (per event, trailing-8 EWMA)
    ewma = QUERIES["ewma_value_by_user"](spark, sf_dir)
    feat_rows = ewma.count()

    # 5. next-event model + QA: every row must be a distribution
    markov = QUERIES["markov_transition_matrix"](spark, sf_dir).collect()
    rows_ok = {}
    for r in markov:
        rows_ok[r["from_type"]] = rows_ok.get(r["from_type"], 0.0) + r["p"]
    dominant = max(markov, key=lambda r: (r["p"], r["from_type"]))

    # 6. sequence corpus for a next-event model
    seqs = QUERIES["user_event_sequences"](spark, sf_dir)
    n_seqs = seqs.count()
    avg_len = seqs.agg(F.avg("n_events")).first()[0]

    # 7. drift monitor (ref vs cur hash-split of orders)
    psi_rows = QUERIES["psi_split_drift"](spark, sf_dir).collect()
    psi = sum(r["psi_term"] for r in psi_rows)

    print(f"SCD-2 intervals        : {n_intervals} ({n_current} current)")
    print(f"attributed purchases   : {credited}/{total_purchases}")
    print(
        "top Wilson converters  : "
        + ", ".join(f"u{r['user_id']}={r['wilson_lb']:.3f}" for r in top)
    )
    print(f"EWMA feature rows      : {feat_rows}")
    print(
        f"markov dominant edge   : {dominant['from_type']}->{dominant['to_type']}"
        f" p={dominant['p']:.3f}; row sums ok: "
        f"{all(abs(v - 1.0) < 1e-3 for v in rows_ok.values())}"
    )
    print(f"behavior sequences     : {n_seqs} (avg len {avg_len:.1f})")
    print(f"PSI (ref vs cur split) : {psi:.5f} ({'OK' if psi < 0.1 else 'DRIFT'})")
    spark.stop()


if __name__ == "__main__":
    main()
