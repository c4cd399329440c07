"""Local mirror of the driver's DuckDB-oracle comparison: row count, schema
shape, and order-insensitive value equality with columns sorted by name."""

from __future__ import annotations

import duckdb
import pandas as pd


def run_oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    import os

    con = duckdb.connect()
    for t in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]:
        # synthetic-fixture tests write only the tables their query reads
        # (the driver's sf dirs always carry all ten)
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).df()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].astype("float64")
        elif pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("int64")
        elif not pd.api.types.is_object_dtype(out[c]):
            out[c] = out[c].astype("object")
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def assert_matches_oracle(spark_df, sf_dir: str, sql: str, name: str = "query") -> None:
    got = canonicalize(spark_df.toPandas())
    want = canonicalize(run_oracle(sf_dir, sql))
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs oracle {len(want)}"
    for c in got.columns:
        a, b = got[c], want[c]
        if pd.api.types.is_float_dtype(a):
            eq = (a == b) | (a.isna() & b.isna())
        else:
            eq = a.astype(str).fillna("<NA>") == b.astype(str).fillna("<NA>")
        if not eq.all():
            bad = (~eq).idxmax()
            n_bad = int((~eq).sum())
            raise AssertionError(
                f"{name}: column {c!r} differs in {n_bad}/{len(got)} rows; "
                f"first diff row {bad}: spark={a[bad]!r} oracle={b[bad]!r}"
            )
