"""Flink DDL dialect — `CREATE TABLE … WITH ('connector' = …)` on Spark.

Reference: SQL DDL planned through `SqlCreateTable` → `CatalogTable` with
connector options (`FactoryUtil.java` resolves 'connector'/'format'/'path');
schema clauses Spark's DDL lacks: ``WATERMARK FOR ts AS ts - INTERVAL …``
(StreamExecWatermarkAssigner) and ``PRIMARY KEY (…) NOT ENFORCED``.

The rewrite keeps the semantics and drops nothing silently:

- filesystem connector → ``CREATE TABLE … USING <format> LOCATION <path>``
  (Spark-native external table; Catalyst handles pushdown/pruning),
- the WATERMARK clause is lifted out of the DDL and recorded in a registry
  (``watermark_spec(table)``) that streaming helpers consume as their
  ``withWatermark`` arguments — Spark attaches watermarks per-query, not
  per-table, so the table-level declaration becomes library metadata,
- PRIMARY KEY NOT ENFORCED is recorded likewise; a table declaring BOTH a
  primary key and a watermark is auto-registered as a versioned table, so
  ``FOR SYSTEM_TIME AS OF`` works directly against it (the reference's
  requirement for version tables is exactly this pair),
- Flink-only types are normalized (TIMESTAMP(3)/TIMESTAMP_LTZ(3) →
  TIMESTAMP, ROW<…> → STRUCT<…>),
- ``c TYPE METADATA FROM 'file.…' [VIRTUAL]`` columns and computed columns
  (``c AS expr``) map to a base table plus a view projecting the metadata
  fields / expressions under the declared names (SupportsReadingMetadata +
  computed-column parity; Catalyst inlines the view projections),
- other connectors raise with the library-level equivalent named (datagen →
  ``sources.datagen_stream``, print/blackhole → console/noop sinks, kafka →
  jar-gated ``sources.kafka_stream``) rather than creating a broken table.
"""

from __future__ import annotations

import re

_WATERMARKS: dict[str, tuple[str, str]] = {}
_PRIMARY_KEYS: dict[str, list[str]] = {}


def watermark_spec(table: str) -> tuple[str, str] | None:
    """(ts_col, delay) declared by the table's DDL, e.g. ("ts", "5 seconds")."""
    return _WATERMARKS.get(table.lower())


def primary_key(table: str) -> list[str] | None:
    return _PRIMARY_KEYS.get(table.lower())


def clear_ddl_metadata() -> None:
    _WATERMARKS.clear()
    _PRIMARY_KEYS.clear()


_CREATE_HEAD_RE = re.compile(
    r"^\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>[\w.`]+)\s*\(",
    re.IGNORECASE,
)
_TAIL_RE = re.compile(
    r"^\s*(?:COMMENT\s+'[^']*'\s*)?"
    r"(?:PARTITIONED\s+BY\s*\((?P<parts>[^)]*)\)\s*)?"
    r"WITH\s*\((?P<opts>.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _match_create(sql: str):
    """Split a CREATE TABLE … ( <body> ) <tail> statement on the BALANCED
    closing paren (the schema body itself contains parens: PRIMARY KEY,
    types), then parse the tail for COMMENT / PARTITIONED BY / WITH."""
    head = _CREATE_HEAD_RE.match(sql)
    if head is None:
        return None
    depth, i = 1, head.end()
    while i < len(sql) and depth:
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
        i += 1
    if depth:
        return None
    tail = _TAIL_RE.match(sql[i:])
    if tail is None:
        return None
    return head.group("name"), sql[head.end() : i - 1], tail
_WM_RE = re.compile(
    r"WATERMARK\s+FOR\s+(?P<col>\w+)\s+AS\s+\w+\s*-\s*"
    r"INTERVAL\s+'(?P<n>[\d.]+)'\s+(?P<unit>\w+)",
    re.IGNORECASE,
)
_PK_RE = re.compile(
    r"PRIMARY\s+KEY\s*\((?P<cols>[^)]*)\)\s*(?:NOT\s+ENFORCED)?",
    re.IGNORECASE,
)
_OPT_RE = re.compile(r"'(?P<k>[^']+)'\s*=\s*'(?P<v>[^']*)'")
_META_COL_RE = re.compile(
    r"^\s*(?P<col>\w+)\s+(?P<type>.+?)\s+METADATA"
    r"(?:\s+FROM\s+'(?P<key>[^']+)')?(?:\s+VIRTUAL)?\s*$",
    re.IGNORECASE,
)

_CONNECTOR_HINTS = {
    "datagen": "use sources.datagen_stream (rate source + column synthesis)",
    "print": "use sources.to_console / writeStream.format('console')",
    "blackhole": "use sources.to_blackhole / format('noop')",
    "kafka": "use sources.kafka_stream (requires the spark-sql-kafka jar)",
    "upsert-kafka": "use sources.kafka_stream + cdc.merge_upsert",
    "jdbc": "use sources.jdbc_table / write_jdbc_table",
}


def _split_columns(body: str) -> list[str]:
    """Split the schema body on top-level commas (ROW<...> and (...) nест
    safely)."""
    parts, depth, buf = [], 0, []
    for ch in body:
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        parts.append(tail)
    return parts


def _normalize_type(col_def: str) -> str:
    out = re.sub(
        r"\bTIMESTAMP(?:_LTZ)?\s*\(\s*\d+\s*\)", "TIMESTAMP", col_def,
        flags=re.IGNORECASE,
    )
    out = re.sub(r"\bROW\s*<", "STRUCT<", out, flags=re.IGNORECASE)
    return out


def rewrite_create_table(sql: str) -> str:
    """Rewrite one Flink `CREATE TABLE … WITH (…)` statement to Spark DDL;
    statements without a WITH(...) clause pass through untouched."""
    parsed = _match_create(sql)
    if parsed is None:
        return sql
    raw_name, body, tail = parsed
    name = raw_name.strip("`")
    opts = {
        om.group("k").lower(): om.group("v")
        for om in _OPT_RE.finditer(tail.group("opts"))
    }
    connector = opts.get("connector", "")
    if connector != "filesystem":
        hint = _CONNECTOR_HINTS.get(
            connector, "no Spark-native mapping for this connector"
        )
        raise ValueError(
            f"connector {connector!r} has no DDL mapping — {hint}"
        )
    path = opts.get("path")
    if not path:
        raise ValueError("filesystem connector requires a 'path' option")
    fmt = opts.get("format", "parquet")

    cols: list[str] = []
    meta_cols: list[tuple[str, str]] = []
    computed_cols: list[tuple[str, str]] = []
    for part in _split_columns(body):
        wm = _WM_RE.match(part)
        if wm:
            _WATERMARKS[name.lower()] = (
                wm.group("col"),
                f"{wm.group('n')} {wm.group('unit').lower()}",
            )
            continue
        pk = _PK_RE.match(part)
        if pk:
            _PRIMARY_KEYS[name.lower()] = [
                c.strip(" `") for c in pk.group("cols").split(",")
            ]
            continue
        mc = _META_COL_RE.match(part)
        if mc:
            meta_cols.append(
                (mc.group("col"), mc.group("key") or mc.group("col"))
            )
            continue
        cc = re.match(
            r"^\s*(?P<col>\w+)\s+AS\s+(?P<expr>.+)$", part,
            re.IGNORECASE | re.DOTALL,
        )
        if cc:
            computed_cols.append((cc.group("col"), cc.group("expr").strip()))
            continue
        cols.append(_normalize_type(part))

    if name.lower() in _PRIMARY_KEYS and name.lower() in _WATERMARKS:
        # PK + rowtime = a version table; make FOR SYSTEM_TIME AS OF work
        # against it out of the box
        from flink_psl_spark.temporal_sql import register_versioned_table

        register_versioned_table(
            name,
            time_col=_WATERMARKS[name.lower()][0],
            primary_key=_PRIMARY_KEYS[name.lower()],
        )

    col_list = ", ".join(cols)
    partition_clause = ""
    if tail.group("parts"):
        part_cols = ", ".join(
            c.strip(" `") for c in tail.group("parts").split(",") if c.strip()
        )
        partition_clause = f" PARTITIONED BY ({part_cols})"
    if not meta_cols and not computed_cols:
        return (
            f"CREATE TABLE IF NOT EXISTS {name} ({col_list}) "
            f"USING {fmt}{partition_clause} LOCATION '{path}'"
        )
    # METADATA columns (SupportsReadingMetadata / `c TYPE METADATA FROM
    # 'file.name' VIRTUAL`) and computed columns (`c AS expr`): the physical
    # table lands under <name>__base and <name> becomes a view projecting
    # the scan-time _metadata fields / the computed expressions under the
    # declared names — queries see the full declared schema at zero extra
    # I/O, and Catalyst inlines the view expressions into every plan
    from flink_psl_spark.sources import FILE_METADATA_KEYS

    base = f"{name}__base"
    projections = [c.split()[0] for c in cols]
    for col, key in meta_cols:
        try:
            field = FILE_METADATA_KEYS[key]
        except KeyError:
            raise ValueError(
                f"metadata key {key!r} has no file-connector mapping; one "
                f"of {sorted(FILE_METADATA_KEYS)}"
            ) from None
        projections.append(f"_metadata.{field} AS {col}")
    for col, expr in computed_cols:
        projections.append(f"({expr}) AS {col}")
    return [
        f"CREATE TABLE IF NOT EXISTS {base} ({col_list}) "
        f"USING {fmt}{partition_clause} LOCATION '{path}'",
        f"CREATE OR REPLACE VIEW {name} AS SELECT "
        + ", ".join(projections)
        + f" FROM {base}",
    ]
