"""Mirror of the driver's correctness gate: run every queries() entry and
its oracle_sql() on the same fixtures, compare rowcount+schema+values.

Usage: python scripts/check_entry.py [--strict] [sf_dir] [query_name ...]
(with query names, only those entries are checked and entry() is skipped)

--strict mirrors the driver's hash gate: values must be EXACTLY equal
(bit-identical floats after both sides' rounding), not merely within
1e-6 — this is what decides hash_match in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from dbt_databricks_metrics_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(v):
    """Sort key: coarse enough that float noise can't reorder rows."""
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return 0.0
        return round(v, max(0, 5 - int(math.log10(abs(v)))))
    if hasattr(v, "isoformat"):
        return v.isoformat()[:19]
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return float(v)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def values_close(a, b, rel=1e-6) -> bool:
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(values_close(x, y, rel) for x, y in zip(a, b))
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) or math.isnan(b):
            return math.isnan(a) == math.isnan(b)
        return math.isclose(a, b, rel_tol=rel, abs_tol=1e-9)
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return math.isclose(float(a), float(b), rel_tol=rel, abs_tol=1e-9)
    return a == b


def values_exact(a, b) -> bool:
    """Driver-hash equivalence: exact representation equality (NaN==NaN)."""
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(values_exact(x, y) for x, y in zip(a, b))
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) or math.isnan(b):
            return math.isnan(a) and math.isnan(b)
        return a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    return a == b


def main() -> int:
    argv = sys.argv[1:]
    strict = "--strict" in argv
    if strict:
        argv = [a for a in argv if a != "--strict"]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    compare = values_exact if strict else values_close
    spark = get_spark("check_entry", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"unknown query name(s): {sorted(unknown)}")
        return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            rows = [tuple(r) for r in df.collect()]
            cols = df.columns
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(rows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = [tuple(r) for r in res.fetchall()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        if sorted(cols) != sorted(dcols):
            failures.append((name, f"schema: {sorted(cols)} vs {sorted(dcols)}"))
            print(f"FAIL {name}: schema {sorted(cols)} vs {sorted(dcols)}")
            continue
        if len(rows) != len(drows):
            failures.append((name, f"rowcount {len(rows)} vs {len(drows)}"))
            print(f"FAIL {name}: rowcount {len(rows)} vs {len(drows)}")
            continue
        sidx = [cols.index(c) for c in sorted(cols)]
        didx = [dcols.index(c) for c in sorted(cols)]

        def _conv(v):
            if hasattr(v, "isoformat"):
                return v.isoformat()[:19]
            if isinstance(v, list):
                return tuple(v)
            from decimal import Decimal

            if isinstance(v, Decimal):
                return float(v)
            return v

        def _key(t):
            return tuple(str(norm(x)) for x in t)

        s = sorted((tuple(_conv(r[i]) for i in sidx) for r in rows), key=_key)
        d = sorted((tuple(_conv(r[i]) for i in didx) for r in drows), key=_key)
        bad = [i for i, (a, b) in enumerate(zip(s, d)) if not compare(a, b)]
        if bad:
            i = bad[0]
            failures.append((name, f"{len(bad)} value mismatches"))
            print(f"FAIL {name}: {len(bad)} mismatched rows; first:\n  spark={s[i]}\n  duck ={d[i]}")
        else:
            print(f"ok   {name}: {len(rows)} rows match")

    if not only:
        ent = entrymod.entry(spark)
        n = ent.count()
        print(f"entry(): {n} rows, schema={ent.columns}")
    if failures:
        print(f"\n{len(failures)} FAILURES")
        return 1
    print("\nall queries match oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
