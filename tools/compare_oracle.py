"""Local mimic of the driver's DuckDB oracle gate (SURVEY.md §3.4).

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares against
``oracle_sql()`` via DuckDB: row count, column names, dtypes (warn), and
order-insensitive value equality (rows sorted by all columns).

Usage: python tools/compare_oracle.py [query ...] [--sf DIR]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            df[c] = s.map(lambda x: str(x) if x is not None else None)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.01"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]

    import __spark_entry__ as entry
    from kbgen_spark.session import get_spark

    spark = get_spark(app_name="oracle_check", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = args or list(qs)
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            spark_pd = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(
                f"rows-only {name}: {len(spark_pd)} rows"
                f" ({time.time() - t0:.1f}s)"
            )
            continue
        try:
            duck_pd = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failures += 1
            continue
        a, b = norm_frame(spark_pd), norm_frame(duck_pd)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            failures += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            failures += 1
            continue
        dtw = [
            (c, str(spark_pd.dtypes.get(c)), str(duck_pd.dtypes.get(c)))
            for c in spark_pd.columns
            if str(spark_pd.dtypes.get(c)) != str(duck_pd.dtypes.get(c))
        ]
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        except AssertionError as e:
            print(f"FAIL {name}: values differ: {str(e)[:400]}")
            failures += 1
            continue
        warn = f" DTYPE-WARN {dtw}" if dtw else ""
        print(f"OK   {name}: {len(a)} rows ({time.time() - t0:.1f}s){warn}")

    spark.stop()
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
