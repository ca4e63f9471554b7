"""Local Spark-vs-DuckDB comparison harness (mirrors the driver's t2 check:
row count + schema-insensitive, order-insensitive value comparison)."""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

from flink_psl_spark.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    """Exact comparison (bit-level for floats): what passes here passes any
    reasonable hash-based driver check. Queries are responsible for rounding
    discipline — the harness adds no tolerance."""
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return 0.0 if v == 0.0 else v  # collapse -0.0
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None)
    return v


def rows_key(rows, colnames):
    """Order-insensitive canonical form: columns sorted by name, rows sorted."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = tuple(_norm(r[i]) for i in order)
        out.append(tuple(repr(v) for v in vals))
    return sorted(out)


# DuckDB output types the driver's hasher provably normalizes the same
# way this replica does (each carries driver-green CORRECTNESS rows).
# HUGEINT — DuckDB's default result type for an integral SUM — provably
# does NOT (the r8/r9 llm_bfd_packing red rows: the registry's only
# HUGEINT-emitting oracle was its only ever-red row). fetchall() masks
# the raw type (HUGEINT → Python int), so compare() checks the
# relation's DECLARED schema before fetching.
_PORTABLE_TYPES = frozenset({
    "BOOLEAN", "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "FLOAT", "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP", "JSON",
})


def non_portable_types(types) -> list[str]:
    """Names of DuckDB result types outside the portable allowlist
    (HUGEINT, UBIGINT, INTERVAL, BLOB, nested types, …)."""
    bad = []
    for t in types:
        s = str(t)
        if s in _PORTABLE_TYPES:
            continue
        if s.startswith("DECIMAL(") and s.endswith(")"):
            continue
        bad.append(s)
    return bad


# Spark output dtypes with driver-green evidence: the exact dtype
# surface of the 376-query registry at the r10 full-green round
# (measured by sweeping every QUERIES entry's df.dtypes). The symmetric
# Spark-side arm of the oracle-type tripwire (VERDICT r10 §next-5): a
# stray decimal(38,18) from an uncast Spark aggregate would class as
# "float" on both sides — invisible to the cross-side CLASS gate — yet
# hash-diverge under the driver's dtype-sensitive hasher exactly the
# way HUGEINT did on the DuckDB side. Widening this set is a conscious
# act, not an accident.
_PORTABLE_SPARK_DTYPES = frozenset({
    "tinyint", "smallint", "int", "bigint", "float", "double",
    "boolean", "string", "date", "timestamp", "timestamp_ntz",
})


def non_portable_spark_dtypes(dtypes) -> list[str]:
    """Spark dtypes (from df.dtypes pairs or plain strings) outside the
    driver-proven allowlist (decimal(p,s), binary, interval, nested…)."""
    bad = []
    for t in dtypes:
        s = t[1] if isinstance(t, tuple) else str(t)
        if s not in _PORTABLE_SPARK_DTYPES:
            bad.append(s)
    return bad


# wall seconds of the two sides of the LAST compare() call — lets the
# check harness attribute a slow row to the engine or to the oracle
# without changing compare()'s signature
LAST_TIMINGS: dict = {"spark_sec": None, "oracle_sec": None}


def _type_class(s: str) -> str:
    """Collapse a Spark dtype or DuckDB type name into the class the
    driver's value hash distinguishes: int/float/bool/str/date/ts.
    Cross-side CLASS agreement is the invariant (int width differences
    normalize; int-vs-float or ts-vs-str would hash-diverge)."""
    s = s.lower()
    if s in ("tinyint", "smallint", "int", "integer", "bigint"):
        return "int"
    if s in ("float", "double") or s.startswith("decimal"):
        return "float"
    if s == "boolean":
        return "bool"
    if s in ("string", "varchar", "json"):
        return "str"
    if s == "date":
        return "date"
    if s.startswith("timestamp"):
        return "ts"
    return s


def compare(spark_df, con, oracle_sql: str) -> tuple[bool, str]:
    import time as _time

    # reset BOTH timings up front: an early return (e.g. the type gate)
    # must not leave the previous row's value to be misattributed
    LAST_TIMINGS["spark_sec"] = None
    LAST_TIMINGS["oracle_sec"] = None
    s_cols = spark_df.columns
    bad_spark = non_portable_spark_dtypes(spark_df.dtypes)
    if bad_spark:
        return False, (
            f"query emits non-portable Spark dtypes {bad_spark} — outside "
            "the driver-proven surface (the HUGEINT lesson, Spark side); "
            "CAST in the query or consciously widen _PORTABLE_SPARK_DTYPES"
        )
    t0 = _time.time()
    s_rows = [tuple(r) for r in spark_df.collect()]
    LAST_TIMINGS["spark_sec"] = round(_time.time() - t0, 2)
    t0 = _time.time()
    rel = con.sql(oracle_sql)
    bad_types = non_portable_types(rel.types)
    if bad_types:
        return False, (
            f"oracle emits non-portable DuckDB types {bad_types} — "
            "fetchall() would mask these locally but the driver's hasher "
            "sees the raw type (r8/r9 llm_bfd_packing); CAST in the oracle"
        )
    d_cols = rel.columns
    d_rows = rel.fetchall()
    LAST_TIMINGS["oracle_sec"] = round(_time.time() - t0, 2)
    if sorted(s_cols) != sorted(c.lower() for c in d_cols) and sorted(
        c.lower() for c in s_cols
    ) != sorted(c.lower() for c in d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    # cross-side TYPE-CLASS agreement (verified 0 mismatches across the
    # whole registry): an int-vs-float or ts-vs-str pair would pass the
    # normalized value compare below but can diverge under the driver's
    # dtype-sensitive hash — the HUGEINT lesson, one level up
    s_classes = {c.lower(): _type_class(t) for c, t in spark_df.dtypes}
    d_classes = {
        c.lower(): _type_class(str(t)) for c, t in zip(d_cols, rel.types)
    }
    class_diff = {
        c: (s_classes.get(c), d_classes[c])
        for c in d_classes
        if s_classes.get(c) != d_classes[c]
    }
    if class_diff:
        return False, (
            f"column type classes differ (spark, oracle): {class_diff} — "
            "align the types on both sides or the driver hash may diverge"
        )
    if len(s_rows) != len(d_rows):
        return False, f"row count: spark={len(s_rows)} duck={len(d_rows)}"
    sk = rows_key(s_rows, [c.lower() for c in s_cols])
    dk = rows_key(d_rows, [c.lower() for c in d_cols])
    if sk != dk:
        diff = [(a, b) for a, b in zip(sk, dk) if a != b][:3]
        bad_cols = _diverging_columns(sk, dk, sorted(c.lower() for c in s_cols))
        return False, (
            f"values differ in columns {bad_cols}; first diffs: {diff}"
        )
    return True, "ok"


def _diverging_columns(sk, dk, sorted_cols):
    """Name the columns whose multiset of values differs — localizes a
    mismatch to the offending expression instead of a row-level diff
    (the round-8 llm_bfd_packing forensics cost a session without this)."""
    if len(set(sorted_cols)) != len(sorted_cols):
        # duplicate (case-folded) names would misattribute values to
        # columns by index — fall back to positional labels
        sorted_cols = [f"col#{i}" for i in range(len(sorted_cols))]
    bad = []
    for i, col in enumerate(sorted_cols):
        if sorted(r[i] for r in sk) != sorted(r[i] for r in dk):
            bad.append(col)
    # per-column multisets can all match while row TUPLES differ
    # (misaligned associations) — report that explicitly
    return bad or ["<row association only>"]
