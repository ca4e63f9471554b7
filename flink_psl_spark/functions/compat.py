"""Reference built-in functions that need a shim on Spark.

Each function documents the reference definition it mirrors
(reference: flink-table/flink-table-api-java/src/main/java/org/apache/flink/
table/functions/BuiltInFunctionDefinitions.java and
flink-table-planner/.../functions/sql/FlinkSqlOperatorTable.java; runtime
semantics in flink-table/flink-table-runtime/.../functions/SqlFunctionUtils.java).

Design rule: every shim is a composition of built-in Column expressions so it
stays inside whole-stage codegen — the 100 TB hot path never crosses into
Python. ``register_sql_compat`` additionally exposes the shims to SQL texts.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def split_index(s: Column | str, delimiter: str, index: int) -> Column:
    """SPLIT_INDEX(str, delim, index) — zero-based field extract.

    Reference: SqlFunctionUtils.java ``splitIndex`` (zero-based, NULL when
    out of range, separator is a LITERAL string — splitByWholeSeparator).
    Spark's ``split`` is regex-based, so the delimiter is regex-escaped.
    """
    import re

    return F.try_element_at(
        F.split(_col(s), re.escape(delimiter)), F.lit(index + 1)
    )


def to_base64(s: Column | str) -> Column:
    """TO_BASE64 (BuiltInFunctionDefinitions: toBase64) → Spark base64."""
    return F.base64(_col(s).cast("binary"))


def from_base64(s: Column | str) -> Column:
    """FROM_BASE64 → Spark unbase64 (returns binary, as the reference does)."""
    return F.unbase64(_col(s))


def json_value(s: Column | str, path: str) -> Column:
    """JSON_VALUE(json, path) — scalar JSON extraction.

    Reference: SqlJsonUtils.java JSON_VALUE. Spark: get_json_object covers
    the RETURNING VARCHAR default; callers cast for typed returns.
    """
    return F.get_json_object(_col(s), path)


def is_json(s: Column | str) -> Column:
    """IS_JSON predicate (BuiltInFunctionDefinitions IS_JSON /
    SqlJsonUtils.isJsonValue): TRUE iff the string parses as JSON.

    Spark: try_parse_json (VARIANT, Spark 4) — NULL on malformed input —
    with a NULL-input guard (IS_JSON(NULL) is FALSE in the reference,
    unlike most predicates)."""
    c = _col(s)
    return F.when(c.isNull(), F.lit(False)).otherwise(
        F.try_parse_json(c).isNotNull()
    )


def json_exists(s: Column | str, path: str) -> Column:
    """JSON_EXISTS(json, path) (reference SqlJsonUtils.jsonExists, lax
    mode): TRUE iff the path hits a value. Approximated with
    get_json_object — a JSON null at the path reads as a miss (the
    documented divergence; the reference's lax mode treats it as a hit)."""
    return F.when(_col(s).isNull(), F.lit(None).cast("boolean")).otherwise(
        F.get_json_object(_col(s), path).isNotNull()
    )


def json_query(s: Column | str, path: str) -> Column:
    """JSON_QUERY(json, path) — extract a JSON OBJECT/ARRAY as JSON text
    (reference SqlJsonUtils.jsonQuery, WITHOUT ARRAY WRAPPER default:
    scalar hits return NULL). get_json_object returns minified JSON for
    containers and raw text for scalars, so the scalar case is filtered
    by shape."""
    v = F.get_json_object(_col(s), path)
    looks_container = v.rlike(r"^[ \t\n\f\r]*[\[{]")
    return F.when(looks_container, v)


def json_string(v: Column) -> Column:
    """JSON_STRING(value) — serialize any value to JSON text (reference
    BuiltInFunctionDefinitions JSON_STRING; NULL input → NULL). Spark's
    to_json wants container input, so the value rides through a 1-element
    array whose brackets are stripped — strings keep their JSON quoting,
    exactly as the reference serializes them."""
    arr = F.to_json(F.array(v))
    return F.when(
        v.isNull(), F.lit(None).cast("string")
    ).otherwise(F.regexp_extract(arr, r"^\[([\s\S]*)\]$", 1))


def json_object(*pairs) -> Column:
    """JSON_OBJECT('k1', v1, 'k2', v2, …) → JSON object text (reference
    SqlJsonUtils.jsonObject, NULL ON NULL behavior). Keys must be Python
    strings (the SQL form's KEY literals)."""
    if len(pairs) % 2 != 0:
        raise ValueError("json_object takes alternating key, value pairs")
    fields = []
    for k, v in zip(pairs[::2], pairs[1::2]):
        if not isinstance(k, str):
            raise ValueError("json_object keys must be literal strings")
        fields.append(F.lit(k))
        fields.append(v if isinstance(v, Column) else F.lit(v))
    return F.to_json(F.create_map(*fields))


def json_array(*values) -> Column:
    """JSON_ARRAY(v1, v2, …) → JSON array text (reference
    SqlJsonUtils.jsonArray, same-type elements — heterogeneous arrays need
    JSON_STRING-serialized elements first)."""
    cols = [v if isinstance(v, Column) else F.lit(v) for v in values]
    return F.to_json(F.array(*cols))


def truncate(x: Column | str, d: int = 0) -> Column:
    """TRUNCATE(x, d) — truncate toward zero to d decimal places.

    Reference: SqlFunctionUtils.java ``struncate``. Spark has no numeric
    truncate; build it from floor on |x| to keep toward-zero semantics.
    """
    c = _col(x)
    p = F.lit(10.0) ** F.lit(d)
    return F.signum(c) * F.floor(F.abs(c) * p) / p


def is_digit(s: Column | str) -> Column:
    """IS_DIGIT (FlinkSqlOperatorTable.java:276-294)."""
    return _col(s).rlike("^[0-9]+$")


def is_alpha(s: Column | str) -> Column:
    """IS_ALPHA."""
    return _col(s).rlike("^[a-zA-Z]+$")


def is_decimal(s: Column | str) -> Column:
    """IS_DECIMAL — parseable as a number."""
    return _col(s).try_cast("decimal(38,18)").isNotNull()


def if_then_else(cond: Column, t: Column, f: Column) -> Column:
    """IF(cond, t, f) (BuiltInFunctionDefinitions: ifThenElse)."""
    return F.when(cond, t).otherwise(f)


def str_to_map(s: Column | str, pair_delim: str = ",", kv_delim: str = "=") -> Column:
    """STR_TO_MAP — same built-in exists in Spark; kept for API parity."""
    return F.str_to_map(_col(s), F.lit(pair_delim), F.lit(kv_delim))


def parse_url(url: Column | str, part: str, key: str | None = None) -> Column:
    """PARSE_URL — same built-in exists in Spark; kept for API parity."""
    if key is None:
        return F.parse_url(_col(url), F.lit(part))
    return F.parse_url(_col(url), F.lit(part), F.lit(key))


def locate(substr: Column | str, s: Column | str, pos: int = 1) -> Column:
    """LOCATE(substr, str[, pos]) — 1-based, 0 when absent (reference semantics)."""
    return F.locate(substr if isinstance(substr, str) else substr, _col(s), pos)


def instr(s: Column | str, substr: str) -> Column:
    """INSTR(str, substr) — 1-based position."""
    return F.instr(_col(s), substr)


def chr_(n: Column | str) -> Column:
    """CHR(n) — code point to string."""
    return F.chr(_col(n))


def regexp(s: Column | str, pattern: str) -> Column:
    """REGEXP(str, pattern) — partial-match boolean (reference REGEXP)."""
    return _col(s).rlike(pattern)


def listagg(col: Column | str, sep: str = ",", *, sort: bool = True) -> Column:
    """LISTAGG(expr [, sep]) aggregate.

    Reference: functions/aggregate/ListAggFunction.java. Spark:
    array_join(collect_list). ``sort=True`` makes the result deterministic
    under distributed aggregation (the reference's accumulation order is
    arrival order, which is nondeterministic in any parallel engine).
    """
    collected = F.collect_list(_col(col))
    if sort:
        collected = F.array_sort(collected)
    return F.array_join(collected, sep)


def temporal_overlaps(
    l_start: Column | str,
    l_end: Column | str,
    r_start: Column | str,
    r_end: Column | str,
) -> Column:
    """TEMPORAL_OVERLAPS(lt, lend, rt, rend) → do [lt,lend] and [rt,rend]
    share any point (inclusive)?

    Reference: BuiltInFunctionDefinitions.TEMPORAL_OVERLAPS planned by
    TemporalOverlapsConverter.java (standard OVERLAPS conversion): endpoints
    are normalized (swapped if reversed) then tested (e0 >= s1) AND
    (e1 >= s0). Interval second arguments are expressed by the caller as
    ``col + INTERVAL ...`` — Spark has no interval-typed parameters here.
    """
    ls, le = _col(l_start), _col(l_end)
    rs, re_ = _col(r_start), _col(r_end)
    s0, e0 = F.least(ls, le), F.greatest(ls, le)
    s1, e1 = F.least(rs, re_), F.greatest(rs, re_)
    return (e0 >= s1) & (e1 >= s0)


_SQL_COMPAT_DECLS = (
    # (name, params, return type, body) — SQL scalar UDFs (Spark ≥4.0):
    # pure expressions, inlined by Catalyst, zero Python round-trips.
    # the delimiter is literal in the reference; escape regex metachars
    ("SPLIT_INDEX", "s STRING, d STRING, i INT", "STRING",
     r"try_element_at(split(s, regexp_replace(d, '([^a-zA-Z0-9])', '\\\\$1')), i + 1)"),
    ("TO_BASE64", "s STRING", "STRING", "base64(CAST(s AS BINARY))"),
    ("FROM_BASE64", "s STRING", "BINARY", "unbase64(s)"),
    ("JSON_VALUE", "j STRING, p STRING", "STRING", "get_json_object(j, p)"),
    ("TRUNCATE", "x DOUBLE, d INT", "DOUBLE",
     "sign(x) * floor(abs(x) * power(10, d)) / power(10, d)"),
    ("IS_DIGIT", "s STRING", "BOOLEAN", "s RLIKE '^[0-9]+$'"),
    ("IS_ALPHA", "s STRING", "BOOLEAN", "s RLIKE '^[a-zA-Z]+$'"),
    ("IS_DECIMAL", "s STRING", "BOOLEAN",
     "try_cast(s AS DECIMAL(38,18)) IS NOT NULL"),
    ("HASH_CODE", "s STRING", "INT", "hash(s)"),
    ("TEMPORAL_OVERLAPS",
     "ls TIMESTAMP, le TIMESTAMP, rs TIMESTAMP, re TIMESTAMP", "BOOLEAN",
     "least(ls, le) <= greatest(rs, re) AND least(rs, re) <= greatest(ls, le)"),
)


def register_sql_compat(spark: SparkSession) -> None:
    """Expose the compat surface to SQL texts (SELECT SPLIT_INDEX(...) ...).

    Registered as SQL scalar functions (CREATE TEMPORARY FUNCTION ... RETURN
    expr) so they are inlined into the plan and stay inside whole-stage
    codegen — no Python UDF round-trip on the hot path.
    """
    for name, params, ret, body in _SQL_COMPAT_DECLS:
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({params}) "
            f"RETURNS {ret} RETURN {body}"
        )


def hash_code(s: Column | str) -> Column:
    """HASH_CODE (FlinkSqlOperatorTable.java:424 — Java String.hashCode):
    ``h = 31*h + char`` with 32-bit signed wraparound, expression-only
    (aggregate over the character codepoints; whole-stage codegen). Exact
    for BMP strings — ascii() yields the codepoint, which equals the UTF-16
    unit below the surrogate range. Jobs ported from the reference that
    partition or bucket on HASH_CODE keep identical placement."""
    c = _col(s)
    wrap_lo = F.lit(2147483648)
    wrap = F.lit(4294967296)
    return F.aggregate(
        F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda h, code: F.pmod(h * 31 + code + wrap_lo, wrap) - wrap_lo,
    )


def sum0(c: Column | str) -> Column:
    """SUM0 (reference BuiltInFunctionDefinitions ``sum0`` /
    Sum0AggFunction): SUM that yields 0, not NULL, over an empty or
    all-NULL input — the aggregate the reference's windowed/retractable
    plans rely on for initialized accumulators."""
    return F.coalesce(F.sum(_col(c)), F.lit(0))


def to_timestamp_ltz(epoch: Column | str, precision: int = 3) -> Column:
    """TO_TIMESTAMP_LTZ(numeric, precision) (reference
    FlinkSqlOperatorTable TO_TIMESTAMP_LTZ): epoch seconds (precision 0)
    or milliseconds (precision 3) → local-zone timestamp. Spark's
    TIMESTAMP type is LTZ-semantics already (session-zone rendering of an
    absolute instant), so the mapping is timestamp_seconds /
    timestamp_millis."""
    e = _col(epoch).cast("long")
    if precision == 0:
        return F.timestamp_seconds(e)
    if precision == 3:
        return F.timestamp_millis(e)
    raise ValueError("precision must be 0 (seconds) or 3 (milliseconds)")
