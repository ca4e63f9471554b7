"""Scalar-function surface (reference §2.8 parity).

Spark's built-in ``pyspark.sql.functions`` covers nearly all of the
reference's catalog (BuiltInFunctionDefinitions.java, 2052 LoC); this package
adds only the functions whose name or semantics differ. Everything here is a
pure Column expression (JVM-side, codegen'd) — no Python UDFs in this layer.
"""

from flink_psl_spark.functions.compat import (  # noqa: F401
    split_index,
    to_base64,
    from_base64,
    json_value,
    is_json,
    json_exists,
    json_query,
    json_string,
    json_object,
    json_array,
    truncate,
    is_digit,
    is_alpha,
    is_decimal,
    if_then_else,
    str_to_map,
    parse_url,
    locate,
    instr,
    chr_,
    regexp,
    temporal_overlaps,
    listagg,
    register_sql_compat,
)
