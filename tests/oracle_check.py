"""Local replica of the driver's oracle-differential comparison.

Runs a Spark query and its DuckDB oracle SQL over the same parquet,
then compares row count, column names, and order-insensitive values.
Stricter than needed (exact equality for most cells, 1e-9 relative
tolerance fallback for floats) so anything passing here should pass
the driver's hash compare.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # driver fixtures are single files; the materialized sf1/sf10
        # scale datasets are Spark-written part-file directories
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(by=list(df.columns), na_position="last") \
             .reset_index(drop=True)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str,
            float_rel_tol: float = 1e-9) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    s = spark_df.toPandas()
    d = con.execute(sql).fetchdf()
    if len(s) != len(d):
        problems.append(f"row count: spark={len(s)} duckdb={len(d)}")
    if sorted(s.columns) != sorted(d.columns):
        problems.append(f"columns: spark={sorted(s.columns)} duckdb={sorted(d.columns)}")
        return problems
    s, d = _normalize(s), _normalize(d)
    if len(s) != len(d):
        return problems
    for c in s.columns:
        sv, dv = s[c], d[c]
        ks, kd = sv.dtype.kind, dv.dtype.kind
        # Driver-faithfulness: the driver hashes each side's values
        # independently, so a dtype-representation divergence (Spark
        # Decimal objects vs DuckDB float64, or int vs float) fails its
        # hash even when every value is numerically identical.  The old
        # behavior routed any either-side-float column through tolerant
        # compare, which HID exactly that class (r6: corpus_health_report
        # passed locally and in the sf10 sweep, failed the driver).
        # Treat signed/unsigned int as one kind; everything else must
        # match kind-for-kind before values are compared.
        _ik = lambda k: "i" if k in ("i", "u") else k
        if _ik(ks) != _ik(kd):
            problems.append(
                f"col {c}: dtype-kind mismatch spark={sv.dtype} "
                f"duckdb={dv.dtype} — driver hash would fail even if "
                f"values match (cast both sides to the same type)")
            continue
        if sv.dtype.kind == "f" or dv.dtype.kind == "f":
            bad = 0
            for a, b in zip(sv, dv):
                na, nb = pd.isna(a), pd.isna(b)
                if na and nb:
                    continue
                if na != nb or not math.isclose(a, b, rel_tol=float_rel_tol, abs_tol=1e-12):
                    bad += 1
            if bad:
                problems.append(f"col {c}: {bad} float mismatches")
        else:
            neq = ~((sv == dv) | (sv.isna() & dv.isna()))
            if neq.any():
                i = neq.idxmax()
                problems.append(
                    f"col {c}: {int(neq.sum())} mismatches, first at {i}: "
                    f"spark={sv[i]!r} duckdb={dv[i]!r}")
    return problems
