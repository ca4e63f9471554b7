"""SQL front-end for MATCH_RECOGNIZE (reference: the planner's
StreamExecMatch.java:59 consumes the SQL-standard clause; the library API in
cep.py covers the semantics — this module closes the SQL-surface gap by
translating the clause text into a ``cep.match_recognize`` call).

Supported clause grammar (the reference's supported subset, minus pattern
alternation — which the reference also rejects):

    MATCH_RECOGNIZE (
        PARTITION BY k1 [, k2 ...]
        ORDER BY t1 [, t2 ...]
        MEASURES expr AS name [, ...]
        [ONE ROW PER MATCH]
        [AFTER MATCH SKIP PAST LAST ROW
         | AFTER MATCH SKIP TO NEXT ROW
         | AFTER MATCH SKIP TO FIRST var
         | AFTER MATCH SKIP TO LAST var]
        PATTERN ( V1[quant] V2[quant] ... )
        [WITHIN INTERVAL 'n' unit]
        DEFINE V1 AS cond [, V2 AS cond ...]
    )

Measure expressions: FIRST(V.c), LAST(V.c), MIN/MAX/SUM/AVG(V.c),
COUNT(V.*) / COUNT(V.c), or bare V.c (≡ FIRST). Quantifiers: ``V``,
``V?``, ``V*``, ``V+``, ``V{n}``, ``V{n,}``, ``V{n,m}``, each with an
optional reluctant ``?`` suffix; parenthesized groups with quantifiers —
``(A B){2}`` — compile to quantified subpatterns (reference
GroupPattern). DEFINE conditions are Spark SQL boolean
expressions over the input columns; ``V.col`` self-references are
rewritten to ``col`` (cross-variable references like ``LAST(A.x)`` inside
DEFINE are not supported — same class of restriction the reference
documents for aggregates in DEFINE). Undefined variables default to TRUE.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from flink_psl_spark.cep import (
    SKIP_PAST_LAST_ROW,
    SKIP_TO_NEXT_ROW,
    Measure,
    Step,
    match_recognize,
    skip_to_first,
    skip_to_last,
)

_SECTIONS = [
    "PARTITION BY",
    "ORDER BY",
    "MEASURES",
    "ONE ROW PER MATCH",
    "AFTER MATCH",
    "PATTERN",
    "WITHIN",
    "DEFINE",
]

_QUANT_RE = re.compile(
    r"^(?P<name>[A-Za-z_][A-Za-z_0-9]*)"
    r"(?P<quant>\{\s*\d+\s*(?:,\s*\d*\s*)?\}|[*+?])?"
    r"(?P<reluctant>\?)?$"
)

_MEASURE_RE = re.compile(
    r"^(?:(?P<fn>FIRST|LAST|MIN|MAX|SUM|AVG|COUNT)\s*\(\s*"
    r"(?P<var>[A-Za-z_][A-Za-z_0-9]*)\.(?P<col>[A-Za-z_0-9*]+)\s*\)"
    r"|(?P<bvar>[A-Za-z_][A-Za-z_0-9]*)\.(?P<bcol>[A-Za-z_0-9]+))"
    r"\s+AS\s+(?P<alias>[A-Za-z_][A-Za-z_0-9]*)$",
    re.IGNORECASE,
)


def _split_top_level(text: str) -> list[str]:
    """Split on commas outside parentheses/quotes."""
    parts, depth, buf, quote = [], 0, [], None
    for ch in text:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        parts.append(tail)
    return parts


def _extract_body(sql: str) -> str:
    """Accept the full ``MATCH_RECOGNIZE ( ... )`` text or just the body."""
    m = re.search(r"MATCH_RECOGNIZE\s*\(", sql, re.IGNORECASE)
    if not m:
        return sql.strip()
    start = m.end()
    depth = 1
    for i in range(start, len(sql)):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                return sql[start:i].strip()
    raise ValueError("unbalanced parentheses in MATCH_RECOGNIZE clause")


def _split_sections(body: str) -> dict[str, str]:
    """Locate each top-level section keyword and slice the body."""
    hits: list[tuple[int, int, str]] = []
    for kw in _SECTIONS:
        pat = re.compile(r"\b" + kw.replace(" ", r"\s+") + r"\b", re.IGNORECASE)
        for m in pat.finditer(body):
            hits.append((m.start(), m.end(), kw))
    # drop hits nested inside parentheses (e.g. PATTERN's body can't contain
    # keywords, but DEFINE exprs could contain e.g. a column named pattern_x
    # — the \b guards handle words; parens guard expressions like IN (...))
    depth_at: list[int] = []
    d = 0
    for ch in body:
        depth_at.append(d)
        if ch == "(":
            d += 1
        elif ch == ")":
            d -= 1
    hits = [h for h in hits if depth_at[h[0]] == 0]
    hits.sort()
    out: dict[str, str] = {}
    for i, (s, e, kw) in enumerate(hits):
        nxt = hits[i + 1][0] if i + 1 < len(hits) else len(body)
        if kw in out:
            raise ValueError(f"duplicate {kw} section")
        out[kw] = body[e:nxt].strip().rstrip(",")
    for required in ("PARTITION BY", "ORDER BY", "MEASURES", "PATTERN", "DEFINE"):
        if required not in out:
            raise ValueError(f"MATCH_RECOGNIZE clause missing {required}")
    return out


def _parse_quantified(tok: str) -> tuple[str, int, int | None, bool]:
    m = _QUANT_RE.match(tok)
    if not m:
        raise ValueError(f"cannot parse pattern token {tok!r}")
    name = m.group("name")
    quant = m.group("quant")
    greedy = m.group("reluctant") is None
    if quant is None:
        lo, hi = 1, 1
    elif quant == "+":
        lo, hi = 1, None
    elif quant == "*":
        lo, hi = 0, None
    elif quant == "?":
        lo, hi = 0, 1
    else:  # {n} / {n,} / {n,m}
        inner = quant.strip("{}").replace(" ", "")
        if "," in inner:
            a, b = inner.split(",", 1)
            lo, hi = int(a), (int(b) if b else None)
        else:
            lo = hi = int(inner)
    return name, lo, hi, greedy


def _parse_quant_suffix(s: str, i: int) -> tuple[int, int | None, bool, int]:
    """Parse an optional quantifier at s[i:] — {n}/{n,}/{n,m}/*/+/? plus an
    optional reluctant '?' — returning (lo, hi, greedy, next_i)."""
    lo, hi = 1, 1
    if i < len(s) and s[i] in "{*+?":
        if s[i] == "{":
            j = s.index("}", i)
            inner = s[i + 1 : j].replace(" ", "")
            if "," in inner:
                a, b = inner.split(",", 1)
                lo, hi = int(a), (int(b) if b else None)
            else:
                lo = hi = int(inner)
            i = j + 1
        elif s[i] == "*":
            lo, hi = 0, None
            i += 1
        elif s[i] == "+":
            lo, hi = 1, None
            i += 1
        else:  # '?'
            lo, hi = 0, 1
            i += 1
    greedy = True
    if i < len(s) and s[i] == "?" and (lo, hi) != (1, 1):
        greedy = False
        i += 1
    return lo, hi, greedy, i


def _parse_pattern(text: str, defines: dict[str, str]) -> list[Step]:
    """Recursive-descent pattern parser: variables with quantifiers plus
    parenthesized groups ``(A B){2}`` (reference GroupPattern)."""
    text = text.strip()
    if not (text.startswith("(") and text.endswith(")")):
        raise ValueError("PATTERN must be parenthesized")
    inner = text[1:-1]
    if "|" in inner:
        raise ValueError(
            "pattern alternation '|' is not supported "
            "(the reference's MATCH_RECOGNIZE rejects it as well)"
        )
    counter = [0]

    def parse_seq(s: str, i: int) -> tuple[list[Step], int]:
        steps: list[Step] = []
        while i < len(s):
            if s[i].isspace():
                i += 1
                continue
            if s[i] == ")":
                break
            if s[i] == "(":
                sub, i = parse_seq(s, i + 1)
                if i >= len(s) or s[i] != ")":
                    raise ValueError("unbalanced parentheses in PATTERN")
                i += 1
                lo, hi, greedy, i = _parse_quant_suffix(s, i)
                if not sub:
                    raise ValueError("empty group in PATTERN")
                counter[0] += 1
                steps.append(
                    Step(f"__g{counter[0]}", "true", lo, hi, greedy, "strict", sub)
                )
                continue
            j = i
            while j < len(s) and not s[j].isspace() and s[j] not in "()":
                if s[j] == "{":  # quantifier braces ride with the token
                    j = s.index("}", j) + 1
                    # a trailing reluctant '?' belongs to this token too
                    if j < len(s) and s[j] == "?":
                        j += 1
                    break
                j += 1
            # '?'/'*'/'+' suffixes (and reluctant '?') are not space-broken,
            # so the whole token is in s[i:j]
            name, lo, hi, greedy = _parse_quantified(s[i:j])
            pred = defines.get(name.upper(), "true")
            steps.append(Step(name, pred, lo, hi, greedy))
            i = j
        return steps, i

    steps, end = parse_seq(inner, 0)
    if end != len(inner) and inner[end:].strip():
        raise ValueError(f"trailing PATTERN content {inner[end:]!r}")
    if not steps:
        raise ValueError("empty PATTERN")
    return steps


def _parse_defines(text: str, pattern_vars: list[str]) -> dict[str, str]:
    out: dict[str, str] = {}
    for item in _split_top_level(text):
        m = re.match(
            r"^([A-Za-z_][A-Za-z_0-9]*)\s+AS\s+(.+)$", item, re.IGNORECASE | re.DOTALL
        )
        if not m:
            raise ValueError(f"cannot parse DEFINE item {item!r}")
        var, cond = m.group(1), m.group(2).strip()
        # rewrite self-references V.col -> col; reject other-variable refs
        for v in pattern_vars:
            ref = re.compile(r"\b" + re.escape(v) + r"\.", re.IGNORECASE)
            if v.upper() != var.upper() and ref.search(cond):
                raise ValueError(
                    f"DEFINE {var} references variable {v} — cross-variable "
                    "references in DEFINE are not supported"
                )
        cond = re.sub(
            r"\b" + re.escape(var) + r"\.", "", cond, flags=re.IGNORECASE
        )
        out[var.upper()] = cond
    return out


def _parse_measures(text: str) -> list[Measure]:
    out = []
    for item in _split_top_level(text):
        m = _MEASURE_RE.match(" ".join(item.split()))
        if not m:
            raise ValueError(
                f"cannot parse measure {item!r} (supported: "
                "FIRST/LAST/MIN/MAX/SUM/AVG(V.col), COUNT(V.*), bare V.col, "
                "each AS alias)"
            )
        alias = m.group("alias")
        if m.group("bvar"):
            out.append(Measure(alias, m.group("bvar"), "first", m.group("bcol")))
            continue
        fn = m.group("fn").lower()
        var, col = m.group("var"), m.group("col")
        if fn == "count":
            out.append(Measure(alias, var, "count"))
        else:
            if col == "*":
                raise ValueError(f"{fn.upper()}(V.*) is not a valid measure")
            out.append(Measure(alias, var, fn, col))
    return out


def _parse_after_match(text: str) -> str:
    t = " ".join(text.upper().split())
    if t == "SKIP PAST LAST ROW":
        return SKIP_PAST_LAST_ROW
    if t == "SKIP TO NEXT ROW":
        return SKIP_TO_NEXT_ROW
    m = re.match(r"^SKIP TO (FIRST|LAST) ([A-Za-z_][A-Za-z_0-9]*)$", t)
    if m:
        return (
            skip_to_first(m.group(2)) if m.group(1) == "FIRST"
            else skip_to_last(m.group(2))
        )
    raise ValueError(f"unsupported AFTER MATCH clause {text!r}")


def _parse_within(text: str) -> str:
    m = re.match(
        r"^INTERVAL\s+'(\d+)'\s+(SECOND|MINUTE|HOUR|DAY)S?$",
        " ".join(text.upper().split()),
    )
    if not m:
        raise ValueError(f"cannot parse WITHIN clause {text!r}")
    return f"{m.group(1)} {m.group(2).lower()}s"


def match_recognize_sql(df: DataFrame, sql: str) -> DataFrame:
    """Run a SQL MATCH_RECOGNIZE clause against ``df``.

    ``sql`` is the ``MATCH_RECOGNIZE ( ... )`` clause (a surrounding
    ``SELECT ... FROM t MATCH_RECOGNIZE (...)`` statement is tolerated —
    only the clause is consumed; apply projections on the returned frame).
    Output: partition columns + ``match_seq`` + measures, as in
    ``cep.match_recognize`` (ONE ROW PER MATCH).
    """
    body = _extract_body(sql)
    sections = _split_sections(body)

    partition_by = [c.strip() for c in sections["PARTITION BY"].split(",")]
    order_by = [c.strip() for c in sections["ORDER BY"].split(",")]

    # pattern vars are needed before DEFINE parsing (cross-ref rejection),
    # and DEFINE predicates before Step construction — parse the structure
    # once with empty defines to learn the leaf variable names
    from flink_psl_spark.cep import _leaf_steps

    pat_text = sections["PATTERN"]
    skeleton = _parse_pattern(pat_text, {})
    var_names = [s.name for s in _leaf_steps(skeleton)]
    defines = _parse_defines(sections["DEFINE"], var_names)
    unknown = set(defines) - {v.upper() for v in var_names}
    if unknown:
        raise ValueError(f"DEFINE for variables not in PATTERN: {sorted(unknown)}")
    pattern = _parse_pattern(pat_text, defines)
    measures = _parse_measures(sections["MEASURES"])

    kwargs = {}
    if "AFTER MATCH" in sections:
        kwargs["after_match"] = _parse_after_match(sections["AFTER MATCH"])
    if "WITHIN" in sections:
        kwargs["within"] = _parse_within(sections["WITHIN"])
        kwargs["time_col"] = order_by[0]
    return match_recognize(
        df, partition_by, order_by, pattern, measures, **kwargs
    )


def streaming_match_recognize_sql(
    events: DataFrame,
    sql: str,
    *,
    delay: str = "10 minutes",
    horizon_ms: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Run a SQL MATCH_RECOGNIZE clause on a watermarked stream (reference
    StreamExecMatch.java:59 — the planner's streaming entry point).

    Single partition column and a single ORDER BY time column (the stream's
    event-time attribute), as the reference requires for streaming
    MATCH_RECOGNIZE; ``tiebreak_col`` breaks equal-timestamp order. WITHIN
    and AFTER MATCH translate directly (a WITHIN bound legalizes a trailing
    NOT, as in the library API).
    """
    from flink_psl_spark.streaming.cep_stream import streaming_match_recognize

    body = _extract_body(sql)
    sections = _split_sections(body)
    partition_by = [c.strip() for c in sections["PARTITION BY"].split(",")]
    order_by = [c.strip() for c in sections["ORDER BY"].split(",")]
    if len(partition_by) != 1:
        raise ValueError(
            "streaming MATCH_RECOGNIZE takes exactly one PARTITION BY column"
        )
    if len(order_by) != 1:
        raise ValueError(
            "streaming MATCH_RECOGNIZE orders by the event-time column only "
            "(pass tiebreak_col for deterministic equal-timestamp order)"
        )
    from flink_psl_spark.cep import _leaf_steps

    skeleton = _parse_pattern(sections["PATTERN"], {})
    var_names = [s.name for s in _leaf_steps(skeleton)]
    defines = _parse_defines(sections["DEFINE"], var_names)
    unknown = set(defines) - {v.upper() for v in var_names}
    if unknown:
        raise ValueError(f"DEFINE for variables not in PATTERN: {sorted(unknown)}")
    pattern = _parse_pattern(sections["PATTERN"], defines)
    measures = _parse_measures(sections["MEASURES"])
    kwargs = {}
    if "AFTER MATCH" in sections:
        kwargs["after_match"] = _parse_after_match(sections["AFTER MATCH"])
    if "WITHIN" in sections:
        kwargs["within"] = _parse_within(sections["WITHIN"])
    return streaming_match_recognize(
        events,
        partition_by[0],
        order_by[0],
        pattern,
        measures,
        delay=delay,
        horizon_ms=horizon_ms,
        tiebreak_col=tiebreak_col,
        **kwargs,
    )
