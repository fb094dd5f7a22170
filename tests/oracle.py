"""Self-oracle comparison helpers mirroring the driver's gate
(__spark_entry__.py docstring): row count + column names +
order-insensitive values, DuckDB as the reference engine."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from uchr_scetl_spark.schemas import TABLES


def oracle_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            ser = pd.to_datetime(s)
            if getattr(ser.dt, "tz", None) is not None:
                ser = ser.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = ser.astype("datetime64[us]")
    # Driver-parity sort: column-wise sort_values, not row-stringify —
    # must die on driver-unsortable (array) cells exactly like the
    # driver's canonicalizer does (round-9 dedup_vec_ids lesson).
    if len(df.columns) and len(df):
        df = df.sort_values(by=list(df.columns), kind="stable")
    return df.reset_index(drop=True)


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(sdf) != len(odf):
        problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(
            f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
        )
    if problems:
        return problems
    a, b = _canon(sdf), _canon(odf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            if not np.array_equal(
                av.to_numpy(float), bv.to_numpy(float), equal_nan=True
            ):
                problems.append(f"col {c}: float mismatch")
        else:
            try:
                eq = (
                    av.astype(str).fillna("<null>") == bv.astype(str).fillna("<null>")
                ).all()
            except Exception:
                eq = list(av) == list(bv)
            if not eq:
                problems.append(f"col {c}: value mismatch")
    return problems
