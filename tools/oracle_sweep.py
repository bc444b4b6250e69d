"""Replicates the driver's correctness gate: run every ``queries()``
entry against its ``oracle_sql()`` in DuckDB at sf0.01 and compare
row-count, column names, and values (columns sorted by name, rows
sorted by all columns — same normalization the driver uses).

Usage: python tools/oracle_sweep.py [sf_dir] [name ...]
"""
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")
import __spark_entry__ as E  # noqa: E402
from dask_relabeling_spark.session import (  # noqa: E402
    get_spark, release_persists)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray))
                else v)
    return df.sort_values(list(df.columns), kind="mergesort",
                          na_position="last").reset_index(drop=True)


def values_match(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    """Exact comparison, matching the driver's value-hash gate.

    Floats compare BITWISE-equal (NaN==NaN allowed): the driver hashes
    exact rendered values, so an `isclose` tolerance here is a softer
    gate than the driver's — exactly the gap that let the round-2/3
    `embedding_label_centroids` fix look green locally while the driver
    kept failing it.  Any query emitting doubles must therefore produce
    them through operations that are bit-deterministic across engines
    (IEEE-pinned op order), or emit integers instead."""
    if a.shape != b.shape:
        return False
    for c in a.columns:
        x, y = a[c], b[c]
        if pd.api.types.is_float_dtype(x) or pd.api.types.is_float_dtype(y):
            # True bit-pattern comparison: ``==`` would pass -0.0 vs
            # 0.0, and coercion failures collapsing to NaN on both
            # sides would pass too — both softer than the driver's
            # rendered-value hash.  Coercion failure (a non-numeric
            # value in a float-dtyped column) is itself a mismatch
            # unless the raw values were NaN on both sides.
            xr = pd.to_numeric(x, errors="coerce")
            yr = pd.to_numeric(y, errors="coerce")
            bad_x = xr.isna().to_numpy() & ~pd.isna(x).to_numpy()
            bad_y = yr.isna().to_numpy() & ~pd.isna(y).to_numpy()
            if bad_x.any() or bad_y.any():
                return False
            xa = xr.to_numpy(float)
            ya = yr.to_numpy(float)
            if (xa.view(np.uint64) != ya.view(np.uint64)).any():
                return False
        else:
            if not (x.astype(str).to_numpy() ==
                    y.astype(str).to_numpy()).all():
                return False
    return True


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    qs, oracles = E.queries(), E.oracle_sql()
    bad = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as exc:  # noqa: BLE001
            bad.append((name, f"SPARK ERROR: {exc}"))
            print(f"ERROR  {name}: spark: {exc}")
            continue
        finally:
            release_persists()
        if name not in oracles:
            print(f"rows   {name}: {len(sdf)} (rows-only, no oracle)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            bad.append((name, f"ORACLE ERROR: {exc}"))
            print(f"ERROR  {name}: oracle: {exc}")
            continue
        s, o = normalize(sdf), normalize(odf)
        if sorted(s.columns) != sorted(o.columns):
            bad.append((name, f"cols {list(s.columns)} != {list(o.columns)}"))
            print(f"FAIL   {name}: columns differ")
        elif len(s) != len(o):
            bad.append((name, f"rows {len(s)} != {len(o)}"))
            print(f"FAIL   {name}: rowcount {len(s)} != {len(o)}")
        elif not values_match(s, o):
            bad.append((name, "values differ"))
            print(f"FAIL   {name}: values differ")
        else:
            print(f"ok     {name}: {len(s)} rows")
    print(f"\n{len(bad)} failures / {n_run} queries run"
          f" (registry: {len(qs)})")
    for name, why in bad:
        print(f"  {name}: {why}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
