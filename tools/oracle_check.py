"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet
tables; compare row count, column names, and order-insensitive values.

Usage:
    python tools/oracle_check.py [--sf /root/testdata/sf0.01] [--query NAME]
"""

from __future__ import annotations

import argparse
import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Match the driver: hash EXACT values, including the sign of zero.
        # -0.0 formats as '-0' here so a -0.0/+0.0 divergence fails locally
        # exactly like the graded gate (r1's similarity_join_topk lesson —
        # queries normalize via catalog._registry.rnd_nz instead).
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return "-0"
        return f"{v:.10g}"
    return str(v)


def rows_to_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


# DuckDB types Spark can never emit — an oracle outputting one of these WILL
# hash-mismatch on the driver even when the stringified values agree (r2's
# three red rows were all uncast integer SUMs typed HUGEINT/int128).
_UNEMITTABLE = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT")

# Spark simpleString dtype -> acceptable DuckDB column_type spellings.
# Signed int widths <=64 are interchangeable: the driver's typed hash
# accepted spark int vs oracle BIGINT (window_ntile_quartiles green r2,
# window_rank_orders_per_customer green r1) while int128 demonstrably
# fails — so only the width jump past 64 bits is gated.
_INTS = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT"}
_TYPE_OK = {
    "bigint": _INTS,
    "int": _INTS,
    "smallint": _INTS,
    "tinyint": _INTS,
    "double": {"DOUBLE"},
    "float": {"FLOAT", "REAL"},
    "string": {"VARCHAR"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    "timestamp_ntz": {"TIMESTAMP"},
    "boolean": {"BOOLEAN"},
    "binary": {"BLOB"},
}


def type_mismatches(con, sql, spark_schema) -> list[str]:
    """Typed-gate: DESCRIBE the oracle (plan only) and flag any column whose
    DuckDB type Spark cannot emit, or that disagrees with the Spark result's
    dtype. The driver hashes TYPED values, so int128-vs-int64 (etc.) fails
    there while stringified comparison passes locally — this closes that gap."""
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    otypes = {r[0]: r[1] for r in desc}
    stypes = {f.name: f.dataType.simpleString() for f in spark_schema.fields}
    problems = []
    for col, stype in stypes.items():
        # The driver canonicalizes results through a pandas sort — a list/
        # struct/map cell is unhashable there and crashes the comparator
        # (r3's inverted_index_postings red row). Nested output columns must
        # be serialized (concat_ws / to_json) before they leave the query.
        if stype.startswith(("array", "struct", "map")):
            problems.append(
                f"{col}: spark output type {stype} is nested — the driver "
                "comparator cannot sort/hash it; serialize to string"
            )
    for col, otype in otypes.items():
        base = otype.upper()
        if any(u in base for u in _UNEMITTABLE):
            problems.append(f"{col}: oracle type {otype} is un-emittable by Spark")
            continue
        if base.endswith("[]") or base.startswith(("LIST", "STRUCT", "MAP")):
            problems.append(
                f"{col}: oracle type {otype} is nested — the driver "
                "comparator cannot sort/hash it; serialize to string"
            )
            continue
        stype = stypes.get(col)
        if stype is None:
            continue  # column-name mismatch reported separately
        if stype.startswith("decimal"):
            ok = base.startswith("DECIMAL")
        else:
            ok = base in _TYPE_OK.get(stype, {base})
        if not ok:
            problems.append(f"{col}: spark {stype} vs oracle {otype}")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--query", default=None)
    ap.add_argument(
        "--prefix",
        action="store_true",
        help="run exactly the driver's graded set: the FIRST 50 queries() "
        "entries, in dict order, on one session (replicates cross-entry "
        "interference the sorted full run wouldn't)",
    )
    ap.add_argument("--rows-only-ok", action="store_true", default=True)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from govgis_nov2023_slim_spatial_server_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    if args.prefix:
        names = list(qs)[:50]
    elif args.query:
        names = args.query.split(",")
    else:
        names = sorted(qs)
    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        if name not in oracles:
            n_rows_only += 1
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            tprobs = type_mismatches(con, oracles[name], sdf.schema)
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        ok = True
        msg = []
        if tprobs:
            ok = False
            msg.append(f"typed-gate: {'; '.join(tprobs)}")
        if sorted(scols) != sorted(ocols):
            ok = False
            msg.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        elif len(srows) != len(orows):
            ok = False
            msg.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        else:
            sm = rows_to_multiset(scols, srows)
            om = rows_to_multiset(ocols, orows)
            if sm != om:
                ok = False
                diff = [(a, b) for a, b in zip(sm, om) if a != b][:3]
                msg.append(f"values differ; first diffs {diff}")
        if ok:
            n_pass += 1
            print(f"PASS  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
        else:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(msg)}")
    print(
        f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only "
        f"of {len(names)} queries"
    )
    if failures:
        print("failures:", " ".join(failures))
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
