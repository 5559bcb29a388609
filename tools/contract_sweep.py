"""Local mirror of the driver's correctness gate, dtype-strict.

Runs every __spark_entry__.queries() entry against its oracle_sql() via
DuckDB at the given sf dir (default sf0.01, the driver's gate SF) and
reports rows/schema/hash per entry. The value hash mimics the driver:
columns sorted by name, rows sorted, values hashed WITH their dtype —
so a DuckDB HUGEINT (object/float64) vs Spark int64 mismatch is caught
here, unlike a tolerant assert_frame_equal.

Usage: python tools/contract_sweep.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # integer WIDTH is normalized (driver compares values, int32==int64),
    # but float64-vs-int64 (the DuckDB HUGEINT tell) stays distinct.
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        h.update(c.encode())
        h.update(str(df[c].dtype).encode())
        for v in df[c].tolist():
            if isinstance(v, float):
                h.update(f"{v:.6f}".encode())
            else:
                h.update(repr(v).encode())
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry_mod
    from bugzilla_etl_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t)}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = set(sys.argv[2:])  # optional entry-name filter for iteration
    n_bad = 0
    for name in sorted(queries):
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            got = canon(queries[name](spark, sf_dir).toPandas())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {e}")
            n_bad += 1
            continue
        if sql is None:
            print(f"SKIP {name}: no oracle (rows={len(got)})")
            continue
        try:
            want = canon(con.sql(sql).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {e}")
            n_bad += 1
            continue
        rows_ok = len(got) == len(want)
        schema_ok = list(got.columns) == list(want.columns)
        hash_ok = rows_ok and schema_ok and value_hash(got) == value_hash(want)
        vac = " VACUOUS" if len(got) == 0 else ""
        if rows_ok and schema_ok and hash_ok:
            print(f"ok   {name} (rows={len(got)}){vac}")
        else:
            n_bad += 1
            print(
                f"FAIL {name}: rows={rows_ok}({len(got)}/{len(want)}) "
                f"schema={schema_ok} hash={hash_ok}"
            )
            if schema_ok and rows_ok:
                for c in got.columns:
                    if str(got[c].dtype) != str(want[c].dtype):
                        print(f"     dtype {c}: spark={got[c].dtype} duck={want[c].dtype}")
                    elif not got[c].equals(want[c]):
                        print(f"     values differ in {c}: {got[c].head(3).tolist()} vs {want[c].head(3).tolist()}")
    print(f"\n{'ALL GREEN' if n_bad == 0 else f'{n_bad} FAILURES'}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
