"""FOR SYSTEM_TIME AS OF — Flink SQL's temporal-join clause on Spark SQL.

Reference: event-time temporal join SQL (`JOIN versioned_table FOR
SYSTEM_TIME AS OF fact.rowtime AS v ON v.k = fact.k` — planned by
StreamExecTemporalJoin.java:57; the version table must declare a PRIMARY
KEY and a rowtime, FlinkLogicalSnapshot). Spark SQL has no FOR SYSTEM_TIME
clause, so this module rewrites it into standard SQL before ``spark.sql``:
the versioned table becomes a validity-interval subquery

    SELECT *, LEAD(<time>) OVER (PARTITION BY <pk> ORDER BY <time>)
        AS __valid_to FROM <table>

and the join condition gains ``fact.ts >= v.<time> AND (v.__valid_to IS
NULL OR fact.ts < v.__valid_to)`` — each fact row sees exactly the version
in force at its timestamp, the reference's semantics. The rewrite is a
declarative SQL-to-SQL transform: Catalyst still plans the join (the
interval predicate typically executes as a range-bounded sort-merge join).

Versioned-table metadata mirrors the reference's requirements and is
declared once per table via ``register_versioned_table(name, time_col=...,
primary_key=[...])``.

Scope: one or more `[LEFT] JOIN t FOR SYSTEM_TIME AS OF expr [AS alias]
ON cond` clauses per statement; the ON condition is taken up to the next
top-level clause keyword. ``SELECT *`` will surface the synthesized
``__valid_to`` column — project explicit columns in temporal queries.
"""

from __future__ import annotations

import re

_REGISTRY: dict[str, dict] = {}


def register_versioned_table(
    name: str, *, time_col: str, primary_key: list[str] | str
) -> None:
    """Declare a table as versioned (reference: PRIMARY KEY + rowtime on
    the version table). Required before FOR SYSTEM_TIME AS OF can target
    it."""
    pk = [primary_key] if isinstance(primary_key, str) else list(primary_key)
    if not pk:
        raise ValueError("primary_key must name at least one column")
    _REGISTRY[name.lower()] = {"time_col": time_col, "primary_key": pk}


def clear_versioned_tables() -> None:
    _REGISTRY.clear()
    _TTF_REGISTRY.clear()


_TTF_REGISTRY: dict[str, dict] = {}


def register_temporal_table_function(
    fn_name: str, table: str, *, time_col: str, primary_key: list[str] | str
) -> None:
    """Declare a temporal table FUNCTION over a versioned table — the
    reference's ``TemporalTableFunction`` (created via
    ``table.createTemporalTableFunction(timeAttribute, primaryKey)`` and
    joined with ``LATERAL TABLE (fn(o.rowtime))``). The function name
    becomes usable in the legacy comma-join SQL form; the key equality
    lives in WHERE, exactly as in the reference docs."""
    pk = [primary_key] if isinstance(primary_key, str) else list(primary_key)
    if not pk:
        raise ValueError("primary_key must name at least one column")
    _TTF_REGISTRY[fn_name.lower()] = {
        "table": table,
        "time_col": time_col,
        "primary_key": pk,
    }


_TTF_RE = re.compile(
    r",\s*LATERAL\s+TABLE\s*\(\s*(?P<fn>[A-Za-z_]\w*)\s*\(\s*"
    r"(?P<ts>[A-Za-z_][\w.]*)\s*\)\s*\)\s*"
    r"(?:AS\s+(?P<alias>[A-Za-z_]\w*))?",
    re.IGNORECASE,
)


def rewrite_temporal_table_functions(sql: str) -> str:
    """Rewrite ``, LATERAL TABLE (fn(fact.ts)) AS r`` (the reference's
    temporal table function join — processTemporalJoin over a
    TemporalTableFunction) into the same validity-interval join the
    FOR SYSTEM_TIME form compiles to. Inner-join semantics: a fact row
    with no version in force at its time drops, per the reference. Only
    registered function names are rewritten — other LATERAL TABLE calls
    (plain UDTFs) pass through untouched."""
    if "lateral" not in sql.lower():
        return sql

    def repl(m: re.Match) -> str:
        meta = _TTF_REGISTRY.get(m.group("fn").lower())
        if meta is None:
            return m.group(0)  # a plain UDTF lateral, not ours
        alias = m.group("alias") or m.group("fn")
        ts = m.group("ts")
        tc = meta["time_col"]
        pk = ", ".join(meta["primary_key"])
        versioned = (
            f"(SELECT *, LEAD({tc}) OVER (PARTITION BY {pk} "
            f"ORDER BY {tc}) AS __valid_to FROM {meta['table']})"
        )
        return (
            f" JOIN {versioned} AS {alias} ON {ts} >= {alias}.{tc} "
            f"AND ({alias}.__valid_to IS NULL OR {ts} < {alias}.__valid_to)"
        )

    return _TTF_RE.sub(repl, sql)


# ---------------------------------------------------------------------------
# Query hints (reference docs/dev/table/sql/queries/hints.md — Join Hints
# BROADCAST / SHUFFLE_HASH / SHUFFLE_MERGE / NEST_LOOP). Spark understands
# the first two under the same names; the other two translate. The OPTIONS
# dynamic-table hint is intentionally unmapped: our DDL tables resolve to
# views at CREATE time, so per-query connector-option override has no
# rebinding point — pass options at CREATE TABLE ... WITH (...) instead
# (documented in sql_client.py's coverage note).
# ---------------------------------------------------------------------------

_JOIN_HINT_MAP = {
    "SHUFFLE_MERGE": "MERGE",
    "NEST_LOOP": "SHUFFLE_REPLICATE_NL",
}

_JOIN_HINT_RE = re.compile(
    r"/\*\+\s*(?P<body>[^*]*?)\s*\*/",
)


def rewrite_join_hints(sql: str) -> str:
    """Translate reference join-hint names inside ``/*+ ... */`` blocks to
    Spark's: SHUFFLE_MERGE → MERGE, NEST_LOOP → SHUFFLE_REPLICATE_NL
    (BROADCAST and SHUFFLE_HASH already share names)."""
    if "/*+" not in sql:
        return sql

    def repl(m: re.Match) -> str:
        body = m.group("body")
        for src, dst in _JOIN_HINT_MAP.items():
            body = re.sub(
                rf"\b{src}\b", dst, body, flags=re.IGNORECASE
            )
        return f"/*+ {body} */"

    return _JOIN_HINT_RE.sub(repl, sql)


_TEMPORAL_RE = re.compile(
    r"(?P<how>LEFT\s+(?:OUTER\s+)?JOIN|INNER\s+JOIN|JOIN)\s+"
    r"(?P<tbl>[A-Za-z_][\w.]*)\s+"
    r"FOR\s+SYSTEM_TIME\s+AS\s+OF\s+(?P<ts>[A-Za-z_][\w.]*)\s*"
    r"(?:AS\s+(?P<alias>[A-Za-z_]\w*)\s+)?"
    r"ON\s+(?P<on>.*?)"
    r"(?=\s+(?:LEFT|RIGHT|FULL|INNER|CROSS|JOIN|WHERE|GROUP|ORDER|HAVING|"
    r"LIMIT|UNION|EXCEPT|INTERSECT)\b|\s*$|\s*\))",
    re.IGNORECASE | re.DOTALL,
)


def rewrite_system_time_joins(sql: str) -> str:
    """Rewrite every FOR SYSTEM_TIME AS OF join in ``sql`` to standard SQL.

    Raises ValueError when the clause targets a table that was not
    registered as versioned (the reference likewise rejects temporal joins
    against tables without a primary key / rowtime)."""
    if "system_time" not in sql.lower():
        return sql

    def repl(m: re.Match) -> str:
        tbl = m.group("tbl")
        meta = _REGISTRY.get(tbl.lower())
        if meta is None:
            raise ValueError(
                f"table {tbl!r} is not registered as versioned — call "
                "register_versioned_table(name, time_col=..., "
                "primary_key=[...]) first"
            )
        alias = m.group("alias") or tbl.split(".")[-1]
        ts = m.group("ts")
        time_col = meta["time_col"]
        pk = ", ".join(meta["primary_key"])
        on = m.group("on").strip()
        versioned = (
            f"(SELECT *, LEAD({time_col}) OVER (PARTITION BY {pk} "
            f"ORDER BY {time_col}) AS __valid_to FROM {tbl})"
        )
        cond = (
            f"({on}) AND {ts} >= {alias}.{time_col} "
            f"AND ({alias}.__valid_to IS NULL OR {ts} < {alias}.__valid_to)"
        )
        return f"{m.group('how')} {versioned} AS {alias} ON {cond}"

    out, n = _TEMPORAL_RE.subn(repl, sql)
    if "system_time" in out.lower():
        raise ValueError(
            "unsupported FOR SYSTEM_TIME AS OF form (supported: "
            "'[LEFT] JOIN tbl FOR SYSTEM_TIME AS OF fact.ts [AS a] ON …')"
        )
    return out


# ---------------------------------------------------------------------------
# Window TVF SQL syntax (reference SqlTumbleTableFunction / SqlHopTableFunction
# — `FROM TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL '1' HOUR))`).
# Spark's window() function expresses the same assignment; the rewrite turns
# the TVF call into a subquery projecting window_start / window_end, which
# the surrounding GROUP BY consumes exactly as in the reference.
# ---------------------------------------------------------------------------

_IVL = r"INTERVAL\s+'([\d.]+)'\s+(\w+)"
_TUMBLE_RE = re.compile(
    r"TABLE\s*\(\s*TUMBLE\s*\(\s*TABLE\s+(?P<tbl>[\w.]+)\s*,\s*"
    rf"DESCRIPTOR\s*\(\s*(?P<ts>\w+)\s*\)\s*,\s*{_IVL}\s*\)\s*\)",
    re.IGNORECASE,
)
_HOP_RE = re.compile(
    r"TABLE\s*\(\s*HOP\s*\(\s*TABLE\s+(?P<tbl>[\w.]+)\s*,\s*"
    rf"DESCRIPTOR\s*\(\s*(?P<ts>\w+)\s*\)\s*,\s*{_IVL}\s*,\s*{_IVL}\s*\)\s*\)",
    re.IGNORECASE,
)


_CUMULATE_RE = re.compile(
    r"TABLE\s*\(\s*CUMULATE\s*\(\s*TABLE\s+(?P<tbl>[\w.]+)\s*,\s*"
    rf"DESCRIPTOR\s*\(\s*(?P<ts>\w+)\s*\)\s*,\s*{_IVL}\s*,\s*{_IVL}\s*\)\s*\)",
    re.IGNORECASE,
)

# SESSION TVF (Flink 1.17+ syntax — the reference line is 1.16, so this is
# forward parity: SqlSessionTableFunction landed in FLINK-24024):
# TABLE(SESSION(TABLE t [PARTITION BY k], DESCRIPTOR(ts), gap))
_SESSION_RE = re.compile(
    r"TABLE\s*\(\s*SESSION\s*\(\s*TABLE\s+(?P<tbl>[\w.]+)"
    r"(?:\s+PARTITION\s+BY\s+(?P<pk>\w+))?\s*,\s*"
    rf"DESCRIPTOR\s*\(\s*(?P<ts>\w+)\s*\)\s*,\s*{_IVL}\s*\)\s*\)",
    re.IGNORECASE,
)

_IVL_US = {
    "SECOND": 1_000_000,
    "MINUTE": 60_000_000,
    "HOUR": 3_600_000_000,
    "DAY": 86_400_000_000,
}


def _cumulate_subquery(tbl: str, ts: str, step_us: int, max_us: int) -> str:
    """CUMULATE TVF body: the same integer-µs slice arithmetic as
    ``operators.windows.cumulate`` (row-local explode of growing window
    ends), expressed in SQL."""
    return (
        f"(SELECT * EXCEPT (__t, __off, __e), "
        f"TIMESTAMP_MICROS(__t - __off) AS window_start, "
        f"TIMESTAMP_MICROS(__e) AS window_end "
        f"FROM (SELECT *, unix_micros({ts}) AS __t, "
        f"unix_micros({ts}) % {max_us} AS __off FROM {tbl}) "
        f"LATERAL VIEW explode(sequence("
        f"__t - __off + (CAST(floor(__off / {step_us}) AS BIGINT) + 1) "
        f"* {step_us}, __t - __off + {max_us}, {step_us})) AS __e)"
    )


def _win_subquery(tbl: str, ts: str, size: str, slide: str | None) -> str:
    args = f"{ts}, '{size}'" + (f", '{slide}'" if slide else "")
    return (
        f"(SELECT * EXCEPT (__w), __w.start AS window_start, "
        f"__w.end AS window_end "
        f"FROM (SELECT *, window({args}) AS __w FROM {tbl}))"
    )


def _session_subquery(tbl: str, ts: str, pk: str | None, ivl: str) -> str:
    """SESSION TVF body: gaps-and-islands in pure SQL — a new session
    starts where the gap to the previous row reaches the interval; every
    row then projects its session's MIN(ts) / MAX(ts)+gap as
    window_start / window_end (the same assignment Spark's
    aggregation-position-only ``session_window`` produces). RANGE-framed
    running sum keeps tied timestamps in one session deterministically."""
    part = f"PARTITION BY {pk} " if pk else ""
    sid_part = f"PARTITION BY {pk}, __sid" if pk else "PARTITION BY __sid"
    return (
        f"(SELECT * EXCEPT (__sid), "
        f"MIN({ts}) OVER ({sid_part}) AS window_start, "
        f"MAX({ts}) OVER ({sid_part}) + {ivl} AS window_end "
        f"FROM (SELECT * EXCEPT (__new), "
        f"SUM(__new) OVER ({part}ORDER BY {ts}) AS __sid "
        f"FROM (SELECT *, CASE WHEN "
        f"LAG({ts}) OVER ({part}ORDER BY {ts}) IS NULL "
        f"OR {ts} - LAG({ts}) OVER ({part}ORDER BY {ts}) >= {ivl} "
        f"THEN 1 ELSE 0 END AS __new FROM {tbl})))"
    )


def rewrite_window_tvfs(sql: str) -> str:
    """Rewrite TUMBLE/HOP/CUMULATE/SESSION window-TVF calls to
    subqueries — TUMBLE/HOP via window()-projection, CUMULATE via the
    same integer-µs slice explode as `operators.windows.cumulate`,
    SESSION (the Flink 1.17+ TVF form, FLINK-24024) via a
    gaps-and-islands subquery equivalent to ``session_window``."""

    def tumble_repl(m: re.Match) -> str:
        size = f"{m.group(3)} {m.group(4)}"
        return _win_subquery(m.group("tbl"), m.group("ts"), size, None)

    def hop_repl(m: re.Match) -> str:
        # Flink argument order: slide first, then size
        slide = f"{m.group(3)} {m.group(4)}"
        size = f"{m.group(5)} {m.group(6)}"
        return _win_subquery(m.group("tbl"), m.group("ts"), size, slide)

    def cumulate_repl(m: re.Match) -> str:
        # Flink argument order: step first, then max size
        step_us = int(m.group(3)) * _IVL_US[m.group(4).upper().rstrip("S")]
        max_us = int(m.group(5)) * _IVL_US[m.group(6).upper().rstrip("S")]
        return _cumulate_subquery(m.group("tbl"), m.group("ts"), step_us, max_us)

    def session_repl(m: re.Match) -> str:
        n, unit = m.groups()[-2:]  # _IVL's captures are the last two
        ivl = f"INTERVAL '{n}' {unit.upper().rstrip('S')}"
        return _session_subquery(
            m.group("tbl"), m.group("ts"), m.group("pk"), ivl
        )

    sql = _TUMBLE_RE.sub(tumble_repl, sql)
    sql = _HOP_RE.sub(hop_repl, sql)
    sql = _CUMULATE_RE.sub(cumulate_repl, sql)
    sql = _SESSION_RE.sub(session_repl, sql)
    return sql


def rewrite_flink_sql(sql: str) -> str:
    """All Flink-SQL-to-Spark-SQL clause rewrites this engine supports:
    FOR SYSTEM_TIME AS OF temporal joins, LATERAL TABLE temporal table
    functions, join-hint name translation, TUMBLE/HOP window TVFs, and
    the legacy GROUP BY TUMBLE/HOP/SESSION group-window family."""
    from flink_psl_spark.ddl import rewrite_create_table

    sql = rewrite_create_table(sql)
    if isinstance(sql, list):  # DDL expanded to (base table, metadata view)
        return sql
    # Flink's `EXPLAIN PLAN FOR <stmt>` (SqlClient / TableEnvironment
    # explain syntax) — Spark spells it `EXPLAIN <stmt>`
    sql = re.sub(
        r"^\s*EXPLAIN\s+PLAN\s+FOR\b", "EXPLAIN", sql, flags=re.IGNORECASE
    )
    sql = rewrite_join_hints(sql)
    sql = rewrite_system_time_joins(sql)
    sql = rewrite_temporal_table_functions(sql)
    sql = rewrite_window_tvfs(sql)  # must run before the legacy rewrite --
    # the TVF form contains bare TUMBLE(/HOP( tokens the legacy regexes
    # would otherwise half-rewrite
    return rewrite_group_windows(sql)


# ---------------------------------------------------------------------------
# Legacy group-window SQL syntax (reference FlinkSqlOperatorTable.java:940-1005
# — `GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)` with TUMBLE_START/TUMBLE_END
# auxiliary projections; HOP/SESSION likewise). Spark's window() /
# session_window() are legal in GROUP BY and expose .start/.end on the
# grouped struct, so the rewrite is positional text substitution.
# ---------------------------------------------------------------------------

def _ivl_arg(n: str, unit: str) -> str:
    return f"'{n} {unit}'"


_GW_TUMBLE = re.compile(
    rf"\bTUMBLE\s*\(\s*(\w+)\s*,\s*{_IVL}\s*\)", re.IGNORECASE
)
_GW_HOP = re.compile(
    rf"\bHOP\s*\(\s*(\w+)\s*,\s*{_IVL}\s*,\s*{_IVL}\s*\)", re.IGNORECASE
)
_GW_SESSION = re.compile(
    rf"\bSESSION\s*\(\s*(\w+)\s*,\s*{_IVL}\s*\)", re.IGNORECASE
)
_GW_AUX = re.compile(
    r"\b(?P<fn>TUMBLE|HOP|SESSION)_(?P<edge>START|END|ROWTIME)\s*\("
    r"[^()]*\)",
    re.IGNORECASE,
)


def rewrite_group_windows(sql: str) -> str:
    """Rewrite the legacy group-window clause family.

    - ``GROUP BY TUMBLE(ts, INTERVAL 'n' U)`` → ``window(ts, 'n U')``
    - ``HOP(ts, slide, size)`` → ``window(ts, 'size', 'slide')``
    - ``SESSION(ts, gap)`` → ``session_window(ts, 'gap')``
    - ``TUMBLE_START/END(…)`` → ``window.start`` / ``window.end``
      (HOP_* likewise; SESSION_* → ``session_window.start/.end``);
      ``*_ROWTIME`` → ``window.end - INTERVAL 1 MILLISECOND`` (the
      reference's rowtime attribute is end − 1 ms).
    """
    def aux_repl(m: re.Match) -> str:
        struct = (
            "session_window" if m.group("fn").upper() == "SESSION" else "window"
        )
        edge = m.group("edge").upper()
        if edge == "START":
            return f"{struct}.start"
        if edge == "END":
            return f"{struct}.end"
        return f"{struct}.end - INTERVAL 1 MILLISECOND"  # ROWTIME

    sql = _GW_AUX.sub(aux_repl, sql)
    sql = _GW_TUMBLE.sub(
        lambda m: f"window({m.group(1)}, {_ivl_arg(m.group(2), m.group(3))})",
        sql,
    )
    sql = _GW_HOP.sub(
        lambda m: (
            f"window({m.group(1)}, {_ivl_arg(m.group(4), m.group(5))}, "
            f"{_ivl_arg(m.group(2), m.group(3))})"
        ),
        sql,
    )
    sql = _GW_SESSION.sub(
        lambda m: (
            f"session_window({m.group(1)}, "
            f"{_ivl_arg(m.group(2), m.group(3))})"
        ),
        sql,
    )
    return sql
