"""Local mirror of the driver's correctness gate.

For every query in ``__spark_entry__.queries()`` with an oracle, runs the
Spark DataFrame and the DuckDB SQL at the given scale factor and compares:

* row count,
* column names (sorted),
* order-insensitive multiset of rows with EXACT value equality (stricter
  than any plausible driver hash — if this passes, the driver's hash
  passes too).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from pyspark_streaming_base_spark.session import SessionFactory  # noqa: E402
from pyspark_streaming_base_spark.queries import load_all  # noqa: E402
from pyspark_streaming_base_spark.queries._tables import TABLES  # noqa: E402


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if vanilla:
        # Mirror the DRIVER's environment: a bare session with none of our
        # SessionFactory conf — catches any query that silently relies on
        # session settings it didn't set itself (invariant #4).
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
    else:
        spark = SessionFactory.local(shuffle_partitions=16)
    con = duckdb.connect()
    for tbl in TABLES:
        con.sql(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')"
        )
    registry = load_all()
    failures = []
    n_oracle = n_rows_only = 0
    for name, spec in sorted(registry.items()):
        if only and name not in only:
            continue
        n_oracle += 1 if spec.oracle is not None else 0
        n_rows_only += 1 if spec.oracle is None else 0
        try:
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if spec.oracle is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            if len(srows) == 0:
                failures.append(name)
                print(f"FAIL {name}: 0 rows from rows-only query")
            continue
        try:
            rel = con.sql(spec.oracle)
            dcols = [c.lower() for c in rel.columns]
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        ok = True
        if sorted(c.lower() for c in scols) != sorted(dcols):
            ok = False
            print(f"FAIL {name}: columns {sorted(scols)} vs {sorted(dcols)}")
        elif len(srows) != len(drows):
            ok = False
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(drows)}")
        else:
            sm = norm_rows([c.lower() for c in scols], [tuple(r) for r in srows])
            dm = norm_rows(dcols, drows)
            if sm != dm:
                ok = False
                diff_s = sm - dm
                diff_d = dm - sm
                print(
                    f"FAIL {name}: value mismatch; {sum(diff_s.values())} spark-only,"
                    f" {sum(diff_d.values())} duck-only rows. Examples:"
                )
                for r in list(diff_s)[:3]:
                    print("   spark:", r)
                for r in list(diff_d)[:3]:
                    print("   duck :", r)
        if ok:
            print(f"PASS {name} ({len(srows)} rows)")
        else:
            failures.append(name)
    print()
    # r13 (r12 verdict item 8): the checked-count line — carriage-return
    # progress clobbering made "all queries pass" unverifiable without
    # reconstructing counts from the log; a silently-skipped query can't
    # hide behind this line.
    print(
        f"checked {n_oracle} oracle / {n_rows_only} rows-only "
        f"of {len(registry)} registry queries"
        + (f" (subset filter: {len(only)} requested)" if only else "")
    )
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all queries pass")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
