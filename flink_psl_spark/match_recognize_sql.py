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
rewritten to ``col``. Pattern-variable HISTORY references are supported
(reference IterativeCondition.java:61): ``FIRST(X.col[, offset])`` /
``LAST(X.col[, offset])`` over any pattern variable, running aggregates
``SUM/AVG/MIN/MAX(X.col)`` / ``COUNT(X.*)`` (reference
MatchCodeGenerator — aggregates in DEFINE see the partial match), and
bare ``X.col`` for another variable (≡ its running LAST) — e.g. the
canonical V-shape ``DEFINE DOWN AS DOWN.price < LAST(DOWN.price, 1)``.
Conjuncts with history references compile to per-row iterative
conditions (a documented SQL subset: comparisons, arithmetic, AND/OR/
NOT, IS [NOT] NULL, ABS, literals); row-local conjuncts stay vectorized
JVM-side. For the step's
own variable the candidate row is its running LAST row (offset 0), so
``LAST(V.col, 1)`` is the previous row bound to V. Undefined variables
default to TRUE.
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


_FIRST_LAST_RE = re.compile(
    r"\b(FIRST|LAST)\s*\(\s*([A-Za-z_][A-Za-z_0-9]*)\."
    r"([A-Za-z_][A-Za-z_0-9]*)\s*(?:,\s*(\d+)\s*)?\)",
    re.IGNORECASE,
)

# running aggregates in DEFINE (reference MatchCodeGenerator: SUM/AVG/
# MIN/MAX/COUNT over a pattern variable see the partial match)
_DEFINE_AGG_RE = re.compile(
    r"\b(SUM|AVG|MIN|MAX|COUNT)\s*\(\s*([A-Za-z_][A-Za-z_0-9]*)\."
    r"([A-Za-z_0-9*]+)\s*\)",
    re.IGNORECASE,
)


def _split_top_level_and(text: str) -> list[str]:
    """Split on the word AND outside parentheses/quotes."""
    parts, depth, buf, quote, i = [], 0, [], None, 0
    up = text.upper()
    while i < len(text):
        ch = text[i]
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            i += 1
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
        elif (
            depth == 0
            and up.startswith("AND", i)
            and (i == 0 or not (text[i - 1].isalnum() or text[i - 1] == "_"))
            and (
                i + 3 >= len(text)
                or not (text[i + 3].isalnum() or text[i + 3] == "_")
            )
        ):
            parts.append("".join(buf).strip())
            buf = []
            i += 3
            continue
        else:
            buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        parts.append(tail)
    return parts


def _has_history_refs(cond: str, var: str, vars_upper: set[str]) -> bool:
    """Does this DEFINE conjunct reference pattern-variable history —
    FIRST/LAST or a running aggregate over a pattern variable, or another
    variable's columns?"""
    for m in _FIRST_LAST_RE.finditer(cond):
        if m.group(2).upper() in vars_upper:
            return True
    for m in _DEFINE_AGG_RE.finditer(cond):
        if m.group(2).upper() in vars_upper:
            return True
    for v in vars_upper:
        if v != var.upper() and re.search(
            r"\b" + v + r"\.", cond, re.IGNORECASE
        ):
            return True
    return False


_PY_KEEP = {"and", "or", "not", "is", "None", "True", "False", "in"}
_PY_FNS = {"ABS": "abs"}


def _sql_cond_to_python(
    cond: str, var: str, vars_upper: set[str], columns: list[str]
) -> tuple[str, set[str]]:
    """Translate a DEFINE conjunct with history references into a Python
    expression over ``get/first/last`` (the iterative-condition calling
    convention in cep.Step.iter_pred). Documented subset: comparisons
    (= <> < <= > >=), arithmetic, AND/OR/NOT, IS [NOT] NULL, TRUE/FALSE/
    NULL, ABS(), string/number literals, FIRST/LAST(X.col[, offset]),
    ``X.col`` variable references (other-variable bare refs mean
    LAST(X.col), as in the reference), and bare input-column names."""
    frags: list[str] = []
    used: set[str] = set()

    def stash(frag: str) -> str:
        frags.append(frag)
        return f"\x00{len(frags) - 1}\x00"

    # string literals first (protect their content from rewriting)
    def stash_str(m: re.Match) -> str:
        return stash(repr(m.group(0)[1:-1].replace("''", "'")))

    s = re.sub(r"'(?:[^']|'')*'", stash_str, cond)

    # FIRST/LAST(X.col[, k]) over pattern variables
    def repl_fl(m: re.Match) -> str:
        fn, v, col, k = m.groups()
        if v.upper() not in vars_upper:
            raise ValueError(
                f"{fn.upper()}({v}.{col}) in DEFINE {var}: {v!r} is not a "
                "pattern variable"
            )
        used.add(col)
        return stash(f"{fn.lower()}({v.upper()!r}, {col!r}, {int(k or 0)})")

    s = _FIRST_LAST_RE.sub(repl_fl, s)

    # running aggregates SUM/AVG/MIN/MAX(X.col), COUNT(X.*) / COUNT(X.col)
    # (COUNT counts bound ROWS — the reference's COUNT(V.*) semantics)
    def repl_agg(m: re.Match) -> str:
        fn, v, col = m.groups()
        if v.upper() not in vars_upper:
            raise ValueError(
                f"{fn.upper()}({v}.{col}) in DEFINE {var}: {v!r} is not a "
                "pattern variable"
            )
        if fn.upper() == "COUNT":
            return stash(f"agg('count', {v.upper()!r})")
        if col == "*":
            raise ValueError(f"{fn.upper()}({v}.*) is not a valid aggregate")
        used.add(col)
        return stash(f"agg({fn.lower()!r}, {v.upper()!r}, {col!r})")

    s = _DEFINE_AGG_RE.sub(repl_agg, s)

    # X.col references (self -> current row, other -> running LAST)
    def repl_ref(m: re.Match) -> str:
        v, col = m.groups()
        if v.upper() not in vars_upper:
            raise ValueError(
                f"unknown variable {v!r} in DEFINE {var} (have "
                f"{sorted(vars_upper)})"
            )
        used.add(col)
        if v.upper() == var.upper():
            return stash(f"get({col!r})")
        return stash(f"last({v.upper()!r}, {col!r}, 0)")

    s = re.sub(
        r"\b([A-Za-z_][A-Za-z_0-9]*)\.([A-Za-z_][A-Za-z_0-9]*)", repl_ref, s
    )

    # SQL keywords / null tests / operators
    s = re.sub(r"\bIS\s+NOT\s+NULL\b", " is not None ", s, flags=re.IGNORECASE)
    s = re.sub(r"\bIS\s+NULL\b", " is None ", s, flags=re.IGNORECASE)
    s = re.sub(r"\bAND\b", " and ", s, flags=re.IGNORECASE)
    s = re.sub(r"\bOR\b", " or ", s, flags=re.IGNORECASE)
    s = re.sub(r"\bNOT\b", " not ", s, flags=re.IGNORECASE)
    s = re.sub(r"\bTRUE\b", " True ", s, flags=re.IGNORECASE)
    s = re.sub(r"\bFALSE\b", " False ", s, flags=re.IGNORECASE)
    s = re.sub(r"\bNULL\b", " None ", s, flags=re.IGNORECASE)
    s = s.replace("<>", "!=")
    s = re.sub(r"(?<![<>!=])=(?!=)", "==", s)

    # remaining identifiers: allowed functions, then bare input columns
    def repl_word(m: re.Match) -> str:
        w = m.group(0)
        if w in _PY_KEEP:
            return w
        if w.upper() in _PY_FNS:
            return _PY_FNS[w.upper()]
        if w in columns:
            used.add(w)
            return stash(f"get({w!r})")
        raise ValueError(
            f"unsupported identifier {w!r} in iterative DEFINE {var} "
            "(not a column, pattern variable, or supported function)"
        )

    s = re.sub(r"\b[A-Za-z_][A-Za-z_0-9]*\b", repl_word, s)
    s = re.sub(r"\x00(\d+)\x00", lambda m: frags[int(m.group(1))], s)
    return s, used


def _parse_defines(
    text: str, pattern_vars: list[str], columns: list[str] | None = None
) -> tuple[dict[str, str], dict]:
    """Parse DEFINE items into (sql_defines, iter_defines).

    Per variable, top-level AND conjuncts WITHOUT history references stay
    a Spark SQL predicate (vectorized JVM-side); conjuncts WITH
    FIRST/LAST(var.col) or cross-variable references compile into an
    iterative condition (reference IterativeCondition.java:61) evaluated
    against the partial match. ``columns`` (the input schema) resolves
    bare identifiers inside iterative conjuncts; cross-variable DEFINEs
    require it.
    """
    vars_upper = {v.upper() for v in pattern_vars}
    out: dict[str, str] = {}
    iter_out: dict[str, tuple] = {}
    for item in _split_top_level(text):
        m = re.match(
            r"^([A-Za-z_][A-Za-z_0-9]*)\s+AS\s+(.+)$", item, re.IGNORECASE | re.DOTALL
        )
        if not m:
            raise ValueError(f"cannot parse DEFINE item {item!r}")
        var, cond = m.group(1), m.group(2).strip()
        sql_parts, iter_parts = [], []
        for conj in _split_top_level_and(cond):
            if _has_history_refs(conj, var, vars_upper):
                iter_parts.append(conj)
            else:
                sql_parts.append(conj)
        if iter_parts:
            if columns is None:
                raise ValueError(
                    f"DEFINE {var} uses pattern-variable history but the "
                    "input schema is unavailable"
                )
            pysrcs, used_all = [], set()
            for conj in iter_parts:
                pysrc, used = _sql_cond_to_python(
                    conj, var, vars_upper, columns
                )
                pysrcs.append(f"({pysrc})")
                used_all |= used
            fn = eval(  # noqa: S307 — restricted builtins, parsed source
                compile(
                    "lambda get, first, last, agg: "
                    f"({' and '.join(pysrcs)})",
                    "<define-iter>",
                    "eval",
                ),
                {"__builtins__": {"abs": abs}},
            )
            iter_out[var.upper()] = (fn, tuple(sorted(used_all)))
        sql_cond = " AND ".join(f"({p})" for p in sql_parts) or "true"
        # rewrite self-references V.col -> col in the vectorized part
        sql_cond = re.sub(
            r"\b" + re.escape(var) + r"\.", "", sql_cond, flags=re.IGNORECASE
        )
        out[var.upper()] = sql_cond
    return out, iter_out


def _attach_iter_defines(steps: list[Step], iter_defines: dict) -> list[Step]:
    """Attach compiled iterative conditions to their leaf steps."""
    from dataclasses import replace

    out = []
    for s in steps:
        if s.sub is not None:
            out.append(replace(s, sub=_attach_iter_defines(s.sub, iter_defines)))
        elif s.name.upper() in iter_defines:
            fn, cols = iter_defines[s.name.upper()]
            out.append(s.where_history(fn, cols))
        else:
            out.append(s)
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
    defines, iter_defines = _parse_defines(
        sections["DEFINE"], var_names, df.columns
    )
    unknown = (set(defines) | set(iter_defines)) - {
        v.upper() for v in var_names
    }
    if unknown:
        raise ValueError(f"DEFINE for variables not in PATTERN: {sorted(unknown)}")
    pattern = _attach_iter_defines(
        _parse_pattern(pat_text, defines), iter_defines
    )
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
    defines, iter_defines = _parse_defines(
        sections["DEFINE"], var_names, events.columns
    )
    unknown = (set(defines) | set(iter_defines)) - {
        v.upper() for v in var_names
    }
    if unknown:
        raise ValueError(f"DEFINE for variables not in PATTERN: {sorted(unknown)}")
    pattern = _attach_iter_defines(
        _parse_pattern(sections["PATTERN"], defines), iter_defines
    )
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
