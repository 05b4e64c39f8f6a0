"""Local replica of the driver's oracle-differential comparison.

Runs a Spark query and its DuckDB oracle SQL over the same parquet,
then compares row count, column names, and order-insensitive values.
Exactly as strict as the driver: the driver hashes raw cell values
bit-for-bit, so floats here compare BIT-EXACT too (r14 — the prior
1e-9 relative tolerance was LOOSER than the driver and hid the r13
``skew_salted_join`` half-ULP red; "stricter than needed" was false).
A pair whose engines disagree in the last ULP must fix the plan
(usually: collapse double→decimal→double re-rounding round-trips to
one rounding site), not the comparator.
"""

from __future__ import annotations

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


def compare(spark_df, con: duckdb.DuckDBPyConnection,
            sql: str) -> list[str]:
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
            # BIT-EXACT, like the driver's value hash. Report the
            # worst relative diff so a fresh red is triageable: a
            # ~1e-16 rel diff is the double→decimal re-rounding class
            # (fix the plan's rounding sites), anything larger is a
            # real semantic divergence.
            bad, worst, worst_pair = 0, 0.0, None
            for a, b in zip(sv, dv):
                na, nb = pd.isna(a), pd.isna(b)
                if na and nb:
                    continue
                if na != nb or float(a) != float(b):
                    bad += 1
                    if not (na or nb):
                        denom = max(abs(a), abs(b), 1e-300)
                        rel = abs(a - b) / denom
                        if rel >= worst:
                            worst, worst_pair = rel, (a, b)
            if bad:
                detail = (f", worst rel diff {worst:.3e} "
                          f"(spark={worst_pair[0]!r} "
                          f"duckdb={worst_pair[1]!r})"
                          if worst_pair else "")
                problems.append(
                    f"col {c}: {bad} bit-exact float mismatches{detail}")
        else:
            neq = ~((sv == dv) | (sv.isna() & dv.isna()))
            if neq.any():
                i = neq.idxmax()
                problems.append(
                    f"col {c}: {int(neq.sum())} mismatches, first at {i}: "
                    f"spark={sv[i]!r} duckdb={dv[i]!r}")
    return problems


def _digest_specs(spark_df):
    """Per-column (alias, spark Column, duckdb SQL expr) digest
    aggregates, derived from the Spark result schema. All digests are
    order-independent and exact: integer/decimal sums accumulate in
    DECIMAL(38,*); doubles are floor-scaled to integers IN DOUBLE
    SPACE first (identical IEEE ops on both engines) so no float
    summation order or decimal-rounding divergence can drift them."""
    from pyspark.sql import functions as F

    specs = []

    def add(alias, s_col, d_sql):
        specs.append((alias, s_col.alias(alias), f"{d_sql} AS {alias}"))

    add("row_cnt", F.count(F.lit(1)).cast("decimal(38,0)"),
        "CAST(COUNT(*) AS DECIMAL(38,0))")
    for f in spark_df.schema.fields:
        c, q = F.col(f.name), f'"{f.name}"'
        t = f.dataType.simpleString()
        a = f.name
        add(f"{a}__cnt", F.count(c).cast("decimal(38,0)"),
            f"CAST(COUNT({q}) AS DECIMAL(38,0))")
        if t in ("tinyint", "smallint", "int", "bigint"):
            add(f"{a}__sum", F.sum(c.cast("decimal(38,0)")),
                f"SUM(CAST({q} AS DECIMAL(38,0)))")
            add(f"{a}__min", F.min(c).cast("decimal(38,0)"),
                f"CAST(MIN({q}) AS DECIMAL(38,0))")
            add(f"{a}__max", F.max(c).cast("decimal(38,0)"),
                f"CAST(MAX({q}) AS DECIMAL(38,0))")
        elif t in ("float", "double"):
            # clamp to +-1e12, scale by 1e6, floor: all in double
            # space (bit-identical cross-engine), then exact-sum
            scaled = (F.when(F.isnan(c) | c.isNull(), None)
                       .otherwise(F.floor(
                           F.least(F.greatest(c.cast("double"),
                                              F.lit(-1e12)),
                                   F.lit(1e12)) * F.lit(1e6))))
            add(f"{a}__ssum", F.sum(scaled.cast("decimal(38,0)")),
                f"SUM(CASE WHEN isnan(CAST({q} AS DOUBLE)) OR {q} IS NULL"
                f" THEN NULL ELSE CAST(FLOOR(LEAST(GREATEST("
                f"CAST({q} AS DOUBLE), -1e12), 1e12) * 1e6)"
                f" AS DECIMAL(38,0)) END)")
            add(f"{a}__nan", F.sum(F.when(F.isnan(c), 1).otherwise(0))
                .cast("decimal(38,0)"),
                f"CAST(SUM(CASE WHEN isnan(CAST({q} AS DOUBLE)) THEN 1"
                f" ELSE 0 END) AS DECIMAL(38,0))")
        elif t.startswith("decimal"):
            add(f"{a}__sum", F.sum(c.cast("decimal(38,6)")),
                f"SUM(CAST({q} AS DECIMAL(38,6)))")
        elif t == "string":
            add(f"{a}__bytes", F.sum(F.octet_length(c))
                .cast("decimal(38,0)"),
                f"CAST(SUM(octet_length(encode({q}))) AS DECIMAL(38,0))")
            add(f"{a}__min", F.min(c), f"MIN({q})")
            add(f"{a}__max", F.max(c), f"MAX({q})")
        elif t == "boolean":
            add(f"{a}__true", F.sum(F.when(c, 1).otherwise(0))
                .cast("decimal(38,0)"),
                f"CAST(SUM(CASE WHEN {q} THEN 1 ELSE 0 END)"
                f" AS DECIMAL(38,0))")
        elif t in ("timestamp", "timestamp_ntz", "date"):
            add(f"{a}__min", F.min(c), f"MIN({q})")
            add(f"{a}__max", F.max(c), f"MAX({q})")
        # arrays/structs/binary: the per-column count above is all
    return specs


def digest_compare(spark_df, con: duckdb.DuckDBPyConnection,
                   sql: str) -> list[str]:
    """Value-level compare for row-explosion pairs without
    materializing either result: both engines reduce their FULL
    output to one row of exact order-independent per-column digests
    (counts, decimal-accumulated sums, min/max, byte totals,
    floor-scaled double sums), and the digest rows must match
    exactly. Strictly stronger than a row-count check: any cell-level
    divergence in a numeric/string/timestamp column shifts at least
    one digest."""
    import datetime
    from decimal import Decimal

    specs = _digest_specs(spark_df)
    s_row = spark_df.agg(*[s for _, s, _ in specs]).collect()[0]
    d_row = con.execute(
        f"SELECT {', '.join(d for _, _, d in specs)} FROM ({sql})"
    ).fetchall()[0]

    problems = []
    for (alias, _, _), sv, dv in zip(specs, s_row, d_row):
        s_null, d_null = sv is None, dv is None
        if s_null or d_null:
            if s_null != d_null:
                problems.append(
                    f"digest {alias}: spark={sv!r} duckdb={dv!r}")
            continue
        if isinstance(sv, (int, Decimal)) and isinstance(dv, (int, Decimal)):
            ok = Decimal(sv) == Decimal(dv)
        elif isinstance(sv, datetime.datetime) or isinstance(
                dv, datetime.datetime):
            ok = (pd.Timestamp(sv).tz_localize(None)
                  == pd.Timestamp(dv).tz_localize(None))
        else:
            ok = sv == dv
        if not ok:
            problems.append(f"digest {alias}: spark={sv!r} duckdb={dv!r}")
    return problems
