"""Local mirror of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() twin on
DuckDB at the same sf, compare row count, column names, and
order-insensitive values. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # FULL precision (shortest round-trip repr distinguishes last-ulp
        # divergence) — the driver hashes exact values, and the r4
        # `sessionize` red shipped because the old %.9g normalization
        # was looser than the driver's hash (VERDICT r4 "What's wrong" #2).
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from pdf_parser_spark.session import get_spark

    spark = get_spark("check_oracle", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, os_ = entry.queries(), entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {e}")
            failures.append(name)
            continue
        finally:
            from pdf_parser_spark.caching import release_cached

            release_cached()  # free operator-internal caches per query
        if name not in os_:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(os_[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            failures.append(name)
            continue
        sc, sv = norm_rows(scols, srows)
        dc, dv = norm_rows(dcols, drows)
        status = "PASS"
        detail = f"{len(srows)} rows"
        if sc != dc:
            status, detail = "FAIL", f"cols {sc} vs {dc}"
        elif len(sv) != len(dv):
            status, detail = "FAIL", f"rowcount {len(sv)} vs {len(dv)}"
        elif sv != dv:
            diff = [(a, b) for a, b in zip(sv, dv) if a != b][:3]
            status, detail = "FAIL", f"values differ, first: {diff}"
        print(f"{status} {name}: {detail} ({time.time()-t0:.1f}s)")
        if status == "FAIL":
            failures.append(name)
    print("----")
    print(f"{len(failures)} failures: {failures}" if failures else "ALL PASS")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
