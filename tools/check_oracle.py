"""Local replica of the driver's correctness gate: run every
__spark_entry__ query on Spark AND its oracle SQL on DuckDB over the same
parquet, then compare row count, column names, and values
(order-insensitive, columns sorted by name).

Usage: python tools/check_oracle.py [query ...] [--sf DIR]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con.execute(sql).df()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None or (isinstance(v, float) and math.isnan(v)) else str(v))
        elif str(df[c].dtype).startswith(("float", "Float")):
            df[c] = df[c].astype("float64").round(6)
        elif str(df[c].dtype).startswith(("int", "Int", "uint", "UInt")):
            df[c] = df[c].astype("float64")  # unify int widths & nullables
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def driver_hash(df: pd.DataFrame) -> str:
    """Representation-SENSITIVE canonical hash mirroring the driver gate:
    columns sorted by name, every cell rendered from its fetched dtype
    (so an int64 Spark column vs a float64/HUGEINT-fetch DuckDB column
    hash DIFFERENTLY even when numerically equal — exactly the class
    that made joinsource_chained/staging_recompute red in r4), rows
    sorted by their rendered tuple, sha256 over the whole thing."""
    import hashlib

    import numpy as np

    df = df[sorted(df.columns)]
    rendered: list[list[str]] = []
    for c in df.columns:
        col = df[c]
        out = []
        for v in col:
            if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
                out.append("NULL")
            elif isinstance(v, (np.floating, float)):
                out.append(repr(round(float(v), 6)))
            elif isinstance(v, (np.integer, int)) and not isinstance(v, bool):
                out.append(repr(int(v)))
            elif isinstance(v, np.ndarray):
                out.append(repr(v.tolist()))
            else:
                out.append(repr(v) if not isinstance(v, str) else v)
        rendered.append(out)
    rows = sorted(zip(*rendered)) if rendered else []
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        errs.append(f"columns differ: {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}")
        return errs
    if len(spark_df) != len(duck_df):
        errs.append(f"row count {len(spark_df)} vs {len(duck_df)}")
    a, b = normalize(spark_df), normalize(duck_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if str(av.dtype).startswith("float") and str(bv.dtype).startswith("float"):
                mism = ~((av.isna() & bv.isna()) | ((av - bv).abs() <= 1e-9))
            else:
                mism = ~((av.isna() & bv.isna()) | (av == bv))
            n = int(mism.sum())
            if n:
                idx = mism[mism].index[0]
                errs.append(
                    f"col {c}: {n} mismatched values; first at row {idx}: "
                    f"{av[idx]!r} vs {bv[idx]!r}"
                )
    return errs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from chronon_spark.session import build_session

    spark = build_session("oracle-check", master="local[8]", shuffle_partitions=8)
    qs, os_ = entry.queries(), entry.oracle_sql()
    names = args.names or list(qs)
    failed = []
    for name in names:
        if name not in qs:
            print(f"{name}: NO SUCH QUERY")
            failed.append(name)
            continue
        try:
            sdf = qs[name](spark, args.sf).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {type(ex).__name__}: {str(ex).splitlines()[0][:200]}")
            failed.append(name)
            continue
        if name not in os_:
            print(f"{name}: rows-only ({len(sdf)} rows, no oracle)")
            continue
        try:
            ddf = duck_run(os_[name], args.sf)
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: DUCKDB ERROR {type(ex).__name__}: {str(ex).splitlines()[0][:200]}")
            failed.append(name)
            continue
        errs = compare(name, sdf, ddf)
        if not errs and driver_hash(sdf) != driver_hash(ddf):
            sd = {c: str(sdf[c].dtype) for c in sdf.columns}
            dd = {c: str(ddf[c].dtype) for c in ddf.columns}
            diff = {c: (sd[c], dd.get(c)) for c in sd if sd[c] != dd.get(c)}
            errs = [f"values equal but DRIVER-HASH mismatch (dtype drift): {diff}"]
        if errs:
            print(f"{name}: FAIL ({len(sdf)} vs {len(ddf)} rows)")
            for e in errs[:5]:
                print(f"    {e}")
            failed.append(name)
        else:
            print(f"{name}: OK ({len(sdf)} rows)")
    print(f"\n{len(names) - len(failed)}/{len(names)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
