"""Optimization-round measurement helper (r15/r16): time individual catalog
queries in isolation with bench.py's exact methodology (same session conf,
same timed action — count(), or the forced-hash agg for map-only plans)
and/or capture their .explain("formatted") to plans/r16/.

Usage:
    python tools/opt_bench.py --queries a,b,c [--reps 3] [--explain before]
    python tools/opt_bench.py --queries a --noop          # noop-sink timing
    python tools/opt_bench.py --all-headline --reps 1

--explain before|after writes plans/r16/<name>_<tag>.txt.
Timed numbers print to stdout as one line per query:
    name  min=..  med=..  reps=[..]  rows=N
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _MAP_ONLY, _scan_partition_bytes  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--all-headline", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default="", help="tag: write plans/r16/<q>_<tag>.txt")
    ap.add_argument("--noop", action="store_true", help="time via noop sink")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from govgis_nov2023_slim_spatial_server_spark.catalog import QUERIES
    from govgis_nov2023_slim_spatial_server_spark.session import get_spark

    sf_dir = args.sf_dir
    spark = get_spark(
        app_name="govgis-opt-bench",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": _scan_partition_bytes(sf_dir)
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    if args.all_headline:
        from bench import HEADLINE

        names = list(HEADLINE)
    else:
        names = [n for n in args.queries.split(",") if n]

    if not args.no_warm:
        spark.range(1).count()
        try:
            QUERIES["flagship_hybrid_search"](spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass
        try:
            from govgis_nov2023_slim_spatial_server_spark.catalog.spatial_mm import (
                _spatial_layers,
            )

            _spatial_layers(spark, sf_dir)
        except Exception:
            pass

    for name in names:
        fn = QUERIES[name]
        if args.explain:
            df = fn(spark, sf_dir)
            os.makedirs("plans/r16", exist_ok=True)
            path = os.path.join("plans/r16", f"{name}_{args.explain}.txt")
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(path, "w") as f:
                f.write(plan)
            print(f"# wrote {path}", file=sys.stderr)
        ts, n = [], None
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"opt:{name}:rep{rep}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            elif name in _MAP_ONLY:
                row = df.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.expr(
                        f"bit_xor(xxhash64({', '.join(df.columns)}))"
                    ).alias("h"),
                ).collect()[0]
                n = row["n"]
            else:
                n = df.count()
            ts.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        if ts:
            print(
                f"{name}  min={min(ts):.3f}  med={statistics.median(ts):.3f}  "
                f"reps={ts}  rows={n}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
