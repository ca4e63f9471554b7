"""SQL script execution — the reference's SQL-client surface on Spark SQL.

Reference: flink-table/flink-sql-client (SqlClient.java:62) executes ``-f``
script files: ';'-terminated statements, ``SET 'key' = 'value';`` session
config, DDL/DML/queries. Spark's engine runs the statements natively
(``spark.sql``); this module supplies the script semantics — statement
splitting that respects quotes/comments, SET/RESET handling against the
session conf, and per-statement results — so a user can port a
``sql-client -f job.sql`` invocation directly.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def split_statements(script: str) -> list[str]:
    """Split a SQL script into statements on ';', respecting single/double
    quotes, backticks, and ``--`` line comments."""
    out, buf = [], []
    quote: str | None = None
    i, n = 0, len(script)
    while i < n:
        c = script[i]
        if quote:
            buf.append(c)
            if c == quote:
                quote = None
            elif c == "\\" and i + 1 < n:  # escaped char inside quotes
                i += 1
                buf.append(script[i])
            i += 1
            continue
        if c in ("'", '"', "`"):
            quote = c
            buf.append(c)
        elif c == "-" and script[i : i + 2] == "--":
            j = script.find("\n", i)
            i = (n if j < 0 else j)
            continue
        elif c == ";":
            stmt = "".join(buf).strip()
            if stmt:
                out.append(stmt)
            buf = []
        else:
            buf.append(c)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return out


_SET_RE = re.compile(
    r"^SET\s+'?(?P<key>[^'=\s]+)'?\s*=\s*'?(?P<val>[^']*?)'?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_RESET_RE = re.compile(r"^RESET\s+'?(?P<key>[^'\s]+)'?\s*$", re.IGNORECASE)


@dataclass
class StatementResult:
    statement: str
    kind: str  # set | reset | query
    df: DataFrame | None = None


def run_script(
    spark: SparkSession, script: str, *, sf_dir: str | None = None
) -> list[StatementResult]:
    """Execute a SQL script statement by statement.

    ``SET 'k' = 'v'`` / ``RESET 'k'`` hit the session conf (the reference's
    session-option semantics); everything else goes through ``spark.sql``
    eagerly (DDL/DML execute; queries return their DataFrame lazily in the
    result list). With ``sf_dir``, the fixture tables are registered first
    so scripts can reference them by name.
    """
    if sf_dir is not None:
        from flink_psl_spark.queries.registry import tables

        for name, df in tables(spark, sf_dir).items():
            df.createOrReplaceTempView(name)
    results: list[StatementResult] = []
    for stmt in split_statements(script):
        m = _SET_RE.match(stmt)
        if m:
            spark.conf.set(m.group("key"), m.group("val"))
            results.append(StatementResult(stmt, "set"))
            continue
        m = _RESET_RE.match(stmt)
        if m:
            try:
                spark.conf.unset(m.group("key"))
            except Exception:
                pass  # resetting a never-set key is a no-op, like the client
            results.append(StatementResult(stmt, "reset"))
            continue
        # Flink SQL clause rewrites (temporal joins, window TVFs) -> standard SQL
        from flink_psl_spark.temporal_sql import rewrite_flink_sql

        results.append(
            StatementResult(stmt, "query", spark.sql(rewrite_flink_sql(stmt)))
        )
    return results


def run_script_file(
    spark: SparkSession, path: str, *, sf_dir: str | None = None
) -> list[StatementResult]:
    """``sql-client -f`` equivalent: run a script file."""
    with open(path) as f:
        return run_script(spark, f.read(), sf_dir=sf_dir)
