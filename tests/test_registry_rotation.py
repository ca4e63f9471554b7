"""Invariants of the driver-visibility rotation (queries/__init__.py).

The round driver verifies the FIRST 50 registry entries each round, so
the ordering machinery is itself correctness-critical: a typo'd window
name or a stale checked-set entry silently burns verification slots.
"""

from __future__ import annotations

import flink_psl_spark.queries as q


def test_window_names_all_registered():
    missing = [n for n in q._PRIORITY_WINDOW if n not in q.QUERIES]
    assert missing == [], f"window names not in registry: {missing}"


def test_window_is_exactly_the_first_fifty():
    assert len(q._PRIORITY_WINDOW) == 50
    assert list(q.QUERIES)[:50] == q._PRIORITY_WINDOW


def test_window_has_no_duplicates():
    assert len(set(q._PRIORITY_WINDOW)) == len(q._PRIORITY_WINDOW)


def test_window_spends_slots_only_on_unverified_or_seeded_reproofs():
    """Every slot goes to a query with no prior driver evidence OR to an
    explicitly seeded re-proof (the round-8 verdict's staleness-refresh
    set + the red-row re-proof) — accidental re-checks still fail."""
    wasted = [
        n for n in q._PRIORITY_WINDOW
        if n in q._DRIVER_CHECKED and n not in q._REPROOFS
    ]
    assert wasted == [], f"window slots wasted on driver-checked rows: {wasted}"


def test_reproof_names_all_registered():
    stale = [n for n in q._REPROOFS if n not in q.QUERIES]
    assert stale == [], f"re-proof names not in registry: {stale}"


def test_checked_set_names_all_registered():
    """A renamed/removed query must leave the checked set too, or the
    reorder quietly mis-partitions."""
    stale = [n for n in q._DRIVER_CHECKED if n not in q.QUERIES]
    assert stale == [], f"checked-set names not in registry: {stale}"


def test_middle_is_never_checked_then_tail_is_checked():
    """Ordering contract: positions 51+ lead with every remaining
    never-checked query (registration order), then the checked tail."""
    names = list(q.QUERIES)
    rest = names[50:]
    never = [n for n in rest if n not in q._DRIVER_CHECKED]
    assert rest[: len(never)] == never


def test_every_query_has_an_oracle_or_is_rows_only():
    """Every registered query either carries a DuckDB oracle or is an
    intentional rows-only entry (non-SQL-expressible)."""
    no_oracle = [n for n in q.QUERIES if n not in q.ORACLES]
    # rows-only entries are allowed but must stay rare and deliberate
    assert len(no_oracle) == 0, f"queries without oracles: {no_oracle}"


def test_whitespace_contract_stays_pinned():
    """Textual tripwire for the cross-engine whitespace pin: the Spark
    tokenizer's class and the DuckDB oracle's _TOKS must both carry the
    explicit common-subset class — a bare \\s reintroduced on either side
    resurrects the round-8 llm_bfd_packing divergence (\\x0B)."""
    from flink_psl_spark.llm.text import WS_CLASS, _WS
    from flink_psl_spark.queries.llm_queries import _TOKS

    assert WS_CLASS == r"[ \t\n\f\r]"
    assert _WS == r"[ \t\n\f\r]+"
    assert r"[ \t\n\f\r]+" in _TOKS
    assert r"\s" not in _TOKS


def test_no_bare_whitespace_class_in_oracles():
    """No oracle SQL may use the regex \\s class — RE2 and Java disagree
    on \\x0B; every whitespace class must be spelled explicitly."""
    from flink_psl_spark.queries import ORACLES

    offenders = [
        name for name, sql in ORACLES.items()
        if "\\s" in sql or "\\S" in sql
    ]
    assert offenders == [], offenders
    # \b (word boundary) is engine-portable for ASCII subjects and is
    # used only by the driver-green llm_pii_scrub (r4) — any NEW use
    # must be consciously allowlisted here
    boundary = [
        name for name, sql in ORACLES.items()
        if "\\b" in sql and name != "llm_pii_scrub"
    ]
    assert boundary == [], boundary


def test_oracle_output_types_are_portable(sf_dir):
    """Registry-wide type tripwire (the class fix behind the r8/r9
    llm_bfd_packing red rows): every oracle's DECLARED DuckDB output
    schema must contain only types the driver's hasher provably
    normalizes like the local replica. DuckDB types an integral SUM as
    HUGEINT (int128) unless CAST — the local fetchall() masks that
    (Python int either way) but the driver's hasher does not, so only
    the driver ever failed. Types-only: binds each relation, executes
    nothing."""
    from _oracle import duck_connection, non_portable_types

    import flink_psl_spark.queries as q

    con = duck_connection(sf_dir)
    offenders = {}
    for name, sql in q.ORACLES.items():
        bad = non_portable_types(con.sql(sql).types)
        if bad:
            offenders[name] = bad
    assert offenders == {}, (
        f"oracles emitting non-portable DuckDB types (CAST them): {offenders}"
    )


def test_type_tripwire_catches_hugeint():
    """Prove the tripwire actually fires: an uncast integral SUM — the
    exact shape of the r8/r9 red row — must be flagged as HUGEINT."""
    import duckdb

    from _oracle import non_portable_types

    rel = duckdb.connect().sql("SELECT SUM(x) AS s FROM (SELECT 1 AS x) t")
    assert non_portable_types(rel.types) == ["HUGEINT"]
    ok = duckdb.connect().sql(
        "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (SELECT 1 AS x) t"
    )
    assert non_portable_types(ok.types) == []
