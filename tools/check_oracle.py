#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

For each <outDir>/<name>/ parquet result, runs <outDir>/oracle_sql.json[name]
in DuckDB with views named after the parquet tables in sfDir, then compares:
column name sets, row counts, and cell values (column-name-sorted, NaN-safe).
Exits non-zero on any mismatch. This is a local pre-flight only — the driver
runs its own equivalent.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if bool(pd.isna(a)) != bool(pd.isna(b)):
            return False
    except (TypeError, ValueError):
        pass
    return a == b


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    errs = []
    sc, dc = set(spark_df.columns), set(duck_df.columns)
    if sc != dc:
        errs.append(f"columns differ: spark={sorted(sc)} duck={sorted(dc)}")
        return errs
    if len(spark_df) != len(duck_df):
        errs.append(f"row count differs: spark={len(spark_df)} duck={len(duck_df)}")
        return errs
    a, b = canon(spark_df), canon(duck_df)
    # row order should already be deterministic (queries carry total ORDER BY),
    # but compare content-sorted too so we can tell order-only diffs apart.
    for ordered in (True, False):
        aa, bb = (a, b) if ordered else (
            a.sort_values(list(a.columns), ignore_index=True, key=lambda s: s.astype(str)),
            b.sort_values(list(b.columns), ignore_index=True, key=lambda s: s.astype(str)),
        )
        bad = 0
        for col in aa.columns:
            av, bv = aa[col].tolist(), bb[col].tolist()
            for i, (x, y) in enumerate(zip(av, bv)):
                if not cells_equal(x, y):
                    if bad < 3:
                        errs.append(
                            f"{'ordered' if ordered else 'sorted'} cell diff [{col}][{i}]: spark={x!r} duck={y!r}"
                        )
                    bad += 1
        if bad:
            errs.append(f"{'ordered' if ordered else 'sorted'}: {bad} differing cells")
        if not ordered and bad == 0 and errs:
            errs.append("NOTE: content matches when sorted — row-order-only diff")
        if bad == 0:
            return errs if ordered is False else []
    return errs


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = {}
    passed = []
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            failures[name] = [f"spark result unreadable: {e}"]
            continue
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            failures[name] = [f"duckdb error: {e}"]
            continue
        errs = compare(name, spark_df, duck_df)
        if errs:
            failures[name] = errs
        else:
            passed.append(name)
    for name in sorted(passed):
        print(f"PASS {name}")
    for name, errs in sorted(failures.items()):
        print(f"FAIL {name}")
        for e in errs[:6]:
            print(f"     {e}")
    print(f"\n{len(passed)} passed, {len(failures)} failed, "
          f"{len(oracle)} with oracle")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
