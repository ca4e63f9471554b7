"""CEP / MATCH_RECOGNIZE query inventory (SURVEY §2.9, reference
flink-cep Pattern/NFA + StreamExecMatch.java:59).

The oracle for the contiguous one-or-more pattern is a gaps-and-islands
reconstruction in DuckDB SQL — exact, order-deterministic.
"""

from __future__ import annotations

from flink_psl_spark.cep import Measure, Step, match_recognize
from flink_psl_spark.queries.registry import query, tables


@query(
    "cep_clicks_then_purchase",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events),
    base AS (
      SELECT *,
             SUM(CASE WHEN event_type <> 'click' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY rn) AS grp
      FROM ordered)
    SELECT c.user_id,
           c.n_clicks,
           c.first_click_ts,
           ROUND(c.click_value_sum, 3) AS click_value_sum,
           p.event_id AS purchase_id
    FROM (SELECT user_id, grp, COUNT(*) AS n_clicks, MIN(ts) AS first_click_ts,
                 SUM(value) AS click_value_sum
          FROM base WHERE event_type = 'click' GROUP BY user_id, grp) c
    JOIN (SELECT user_id, grp, event_id, event_type FROM base
          WHERE event_type <> 'click') p
      ON c.user_id = p.user_id AND c.grp = p.grp - 1
    WHERE p.event_type = 'purchase'
    """,
)
def cep_clicks_then_purchase(spark, sf_dir):
    """PATTERN (A+ B) — a maximal contiguous run of clicks immediately
    followed by a purchase, per user (greedy A+, SKIP PAST LAST ROW).
    Columns must avoid 'match_seq' in the compare (oracle islands carry no
    sequence number), so it is not selected."""
    t = tables(spark, sf_dir)
    out = match_recognize(
        t["events"],
        partition_by="user_id",
        order_by=["ts", "event_id"],
        pattern=[
            Step.one_or_more("A", "event_type = 'click'"),
            Step.once("B", "event_type = 'purchase'"),
        ],
        measures=[
            Measure("n_clicks", "A", "count"),
            Measure("first_click_ts", "A", "first", "ts"),
            Measure("click_value_sum", "A", "sum", "value"),
            Measure("purchase_id", "B", "last", "event_id"),
        ],
    )
    from pyspark.sql import functions as F

    return out.select(
        "user_id",
        "n_clicks",
        "first_click_ts",
        F.round("click_value_sum", 3).alias("click_value_sum"),
        "purchase_id",
    )


@query(
    "stream_cep_clicks_then_purchase",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events),
    base AS (
      SELECT *,
             SUM(CASE WHEN event_type <> 'click' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY rn) AS grp
      FROM ordered)
    SELECT CAST(c.user_id AS VARCHAR) AS user_id, c.n_clicks,
           p.event_id AS purchase_id
    FROM (SELECT user_id, grp, COUNT(*) AS n_clicks
          FROM base WHERE event_type = 'click' GROUP BY user_id, grp) c
    JOIN (SELECT user_id, grp, event_id, event_type FROM base
          WHERE event_type <> 'click') p
      ON c.user_id = p.user_id AND c.grp = p.grp - 1
    WHERE p.event_type = 'purchase'
    """,
)
def stream_cep_clicks_then_purchase(spark, sf_dir):
    """STREAMING MATCH_RECOGNIZE (reference CepOperator.java:82): the same
    A+ B pattern as the batch query, run as a watermarked stateful stream —
    rows buffer per key, the NFA fires on the watermark-finalized prefix,
    event-time timers flush tails. A far-future sentinel row (separate key)
    advances the final watermark so every real match finalizes; results
    must equal the batch islands oracle."""
    import datetime as dt
    import tempfile

    from pyspark.sql import functions as F

    from flink_psl_spark.cep import Measure, Step
    from flink_psl_spark.streaming import run_to_memory_table
    from flink_psl_spark.streaming.cep_stream import streaming_match_recognize

    t = tables(spark, sf_dir)
    ev = t["events"].select(
        F.col("user_id").cast("string").alias("u"),
        F.col("event_id").alias("eid"),
        F.when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .otherwise("x")
        .alias("et"),
        "ts",
    )
    d = tempfile.mkdtemp(prefix="fps_scep_q_")
    ev.coalesce(4).write.parquet(f"{d}/src")
    far = ev.select(F.max("ts")).first()[0] + dt.timedelta(days=30)
    spark.createDataFrame(
        [("__sentinel__", 0, "x", far)], "u string, eid long, et string, ts timestamp"
    ).coalesce(1).write.mode("append").parquet(f"{d}/src")

    st = (
        spark.readStream.schema("u string, eid long, et string, ts timestamp")
        .option("maxFilesPerTrigger", 4)
        .parquet(f"{d}/src")
    )
    out = streaming_match_recognize(
        st,
        "u",
        "ts",
        [Step.one_or_more("A", "et = 'c'"), Step.once("B", "et = 'p'")],
        [Measure("n_clicks", "A", "count"), Measure("purchase_id", "B", "first", "eid")],
        delay="5 minutes",
        tiebreak_col="eid",
    )
    mem = run_to_memory_table(out, output_mode="append")
    return mem.select(F.col("u").alias("user_id"), "n_clicks", "purchase_id")


@query(
    "cep_error_burst",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events),
    base AS (
      SELECT *,
             SUM(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY rn) AS grp
      FROM ordered)
    SELECT user_id, COUNT(*) AS n_errors,
           MIN(ts) AS burst_start, MAX(ts) AS burst_end
    FROM base WHERE event_type = 'error'
    GROUP BY user_id, grp HAVING COUNT(*) >= 3
    """,
)
def cep_error_burst(spark, sf_dir):
    """PATTERN (E{3,}) — maximal runs of >=3 consecutive error events per
    user (reference Pattern.timesOrMore; the WITHIN clause is exercised in
    tests/test_cep.py)."""
    t = tables(spark, sf_dir)
    return match_recognize(
        t["events"],
        partition_by="user_id",
        order_by=["ts", "event_id"],
        pattern=[Step.at_least("E", "event_type = 'error'", 3)],
        measures=[
            Measure("n_errors", "E", "count"),
            Measure("burst_start", "E", "first", "ts"),
            Measure("burst_end", "E", "last", "ts"),
        ],
    ).select("user_id", "n_errors", "burst_start", "burst_end")


@query(
    "cep_unconverted_clicks",
    # terminal notFollowedBy: a click matches iff NO later purchase exists
    # in the user's ordered sequence — NOT EXISTS over the (ts, event_id)
    # order replicates the NFA exactly
    oracle="""
    SELECT c.user_id, COUNT(*) AS n_unconverted
    FROM events c
    WHERE c.event_type = 'click'
      AND NOT EXISTS (
        SELECT 1 FROM events p
        WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
          AND (p.ts > c.ts OR (p.ts = c.ts AND p.event_id > c.event_id)))
    GROUP BY c.user_id
    """,
)
def cep_unconverted_clicks(spark, sf_dir):
    """PATTERN (click notFollowedBy purchase) — clicks never converted for
    the rest of the user's history (reference Pattern.notFollowedBy,
    flink-cep/.../pattern/Pattern.java notFollowedBy; negative patterns in
    NFACompiler)."""
    t = tables(spark, sf_dir)
    matches = match_recognize(
        t["events"],
        partition_by="user_id",
        order_by=["ts", "event_id"],
        pattern=[
            Step.once("click", "event_type = 'click'"),
            Step.not_followed_by("np", "event_type = 'purchase'"),
        ],
        measures=[Measure("click_id", "click", "first", "event_id")],
    )
    from pyspark.sql import functions as F

    return matches.groupBy("user_id").agg(
        F.count("*").alias("n_unconverted")
    )


@query(
    "cep_session_no_logout_purchase",
    # middle notFollowedBy: signup, then a purchase with no error between
    # them (next purchase scans forward; an intervening error kills the
    # match). Replica: for each signup, the FIRST later purchase/error
    # decides; after a match the scan resumes past the purchase.
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events WHERE event_type IN ('signup', 'purchase', 'error')),
    nxt AS (
      SELECT s.user_id, s.rn AS srn,
             MIN(CASE WHEN e.event_type = 'purchase' THEN e.rn END) AS prn,
             MIN(CASE WHEN e.event_type = 'error' THEN e.rn END) AS ern
      FROM ordered s JOIN ordered e
        ON e.user_id = s.user_id AND e.rn > s.rn
      WHERE s.event_type = 'signup'
      GROUP BY s.user_id, s.rn),
    matched AS (
      SELECT user_id, srn, prn FROM nxt
      WHERE prn IS NOT NULL AND (ern IS NULL OR prn < ern)),
    -- skip_past_last_row: drop signups inside a previous match's span
    kept AS (
      SELECT m.user_id, m.srn, m.prn FROM matched m
      WHERE NOT EXISTS (
        SELECT 1 FROM matched m2
        WHERE m2.user_id = m.user_id AND m2.srn < m.srn AND m2.prn >= m.srn))
    SELECT user_id, COUNT(*) AS n_clean_conversions
    FROM kept GROUP BY user_id
    """,
)
def cep_session_no_logout_purchase(spark, sf_dir):
    """PATTERN (signup notFollowedBy error, then purchase) over the
    signup/purchase/error event stream — conversions untainted by an error
    in between (reference Pattern.notFollowedBy mid-pattern)."""
    from pyspark.sql import functions as F

    t = tables(spark, sf_dir)
    ev = t["events"].where(
        F.col("event_type").isin("signup", "purchase", "error")
    )
    matches = match_recognize(
        ev,
        partition_by="user_id",
        order_by=["ts", "event_id"],
        pattern=[
            Step.once("s", "event_type = 'signup'"),
            Step.not_followed_by("ne", "event_type = 'error'"),
            Step.once("p", "event_type = 'purchase'"),
        ],
        measures=[Measure("purchase_id", "p", "first", "event_id")],
    )
    return matches.groupBy("user_id").agg(
        F.count("*").alias("n_clean_conversions")
    )


@query(
    "stream_cep_clean_conversion",
    # same replica as the batch cep_session_no_logout_purchase oracle —
    # streaming (watermark-finalized NFA over bounded replay) must agree
    # with the batch semantics exactly
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events WHERE event_type IN ('signup', 'purchase', 'error')),
    nxt AS (
      SELECT s.user_id, s.rn AS srn,
             MIN(CASE WHEN e.event_type = 'purchase' THEN e.rn END) AS prn,
             MIN(CASE WHEN e.event_type = 'error' THEN e.rn END) AS ern
      FROM ordered s JOIN ordered e
        ON e.user_id = s.user_id AND e.rn > s.rn
      WHERE s.event_type = 'signup'
      GROUP BY s.user_id, s.rn),
    matched AS (
      SELECT user_id, srn, prn FROM nxt
      WHERE prn IS NOT NULL AND (ern IS NULL OR prn < ern)),
    kept AS (
      SELECT m.user_id, m.srn, m.prn FROM matched m
      WHERE NOT EXISTS (
        SELECT 1 FROM matched m2
        WHERE m2.user_id = m.user_id AND m2.srn < m.srn AND m2.prn >= m.srn))
    SELECT CAST(user_id AS VARCHAR) AS user_id,
           COUNT(*) AS n_clean_conversions
    FROM kept GROUP BY user_id
    """,
)
def stream_cep_clean_conversion(spark, sf_dir):
    """STREAMING mid-pattern negation (signup notFollowedBy error, then
    purchase): the negative gap finalizes with its closing positive step
    inside the watermark-finalized prefix, so streaming emission equals the
    batch NFA (reference CepOperator + Pattern.notFollowedBy)."""
    import datetime as dt
    import tempfile

    from pyspark.sql import functions as F

    from flink_psl_spark.cep import Measure, Step
    from flink_psl_spark.streaming import run_to_memory_table
    from flink_psl_spark.streaming.cep_stream import streaming_match_recognize

    t = tables(spark, sf_dir)
    ev = (
        t["events"]
        .where(F.col("event_type").isin("signup", "purchase", "error"))
        .select(
            F.col("user_id").cast("string").alias("u"),
            F.col("event_id").alias("eid"),
            F.col("event_type").alias("et"),
            "ts",
        )
    )
    d = tempfile.mkdtemp(prefix="fps_scep_neg_")
    ev.coalesce(4).write.parquet(f"{d}/src")
    far = ev.select(F.max("ts")).first()[0] + dt.timedelta(days=30)
    spark.createDataFrame(
        [("__sentinel__", 0, "x", far)], "u string, eid long, et string, ts timestamp"
    ).coalesce(1).write.mode("append").parquet(f"{d}/src")

    st = (
        spark.readStream.schema("u string, eid long, et string, ts timestamp")
        .option("maxFilesPerTrigger", 4)
        .parquet(f"{d}/src")
    )
    out = streaming_match_recognize(
        st,
        "u",
        "ts",
        [
            Step.once("s", "et = 'signup'"),
            Step.not_followed_by("ne", "et = 'error'"),
            Step.once("p", "et = 'purchase'"),
        ],
        [Measure("purchase_id", "p", "first", "eid")],
        delay="5 minutes",
        tiebreak_col="eid",
    )
    mem = run_to_memory_table(out, output_mode="append")
    return mem.groupBy(F.col("u").alias("user_id")).agg(
        F.count("*").alias("n_clean_conversions")
    )


@query(
    "cep_skip_to_next_click_runs",
    # AFTER MATCH SKIP TO NEXT ROW over A+ B emits every SUFFIX of a click
    # run that ends in a purchase (the scan resumes one row after each
    # match's start). Replica: a click matches iff its next non-click row
    # (in (ts, event_id) order) is a purchase; n_clicks = distance to it.
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events),
    nc AS (
      SELECT c.user_id, c.rn, c.event_id AS first_click_id,
             MIN(e.rn) AS nrn
      FROM ordered c JOIN ordered e
        ON e.user_id = c.user_id AND e.rn > c.rn AND e.event_type <> 'click'
      WHERE c.event_type = 'click'
      GROUP BY c.user_id, c.rn, c.event_id)
    SELECT nc.user_id, nc.first_click_id,
           CAST(nc.nrn - nc.rn AS BIGINT) AS n_clicks,
           p.event_id AS purchase_id
    FROM nc JOIN ordered p
      ON p.user_id = nc.user_id AND p.rn = nc.nrn
    WHERE p.event_type = 'purchase'
    """,
)
def cep_skip_to_next_click_runs(spark, sf_dir):
    """PATTERN (A+ B) AFTER MATCH SKIP TO NEXT ROW (reference
    SkipToNextStrategy.java) — overlapping suffix-run matches that the
    default SKIP PAST LAST ROW would consume."""
    from flink_psl_spark.cep import SKIP_TO_NEXT_ROW

    t = tables(spark, sf_dir)
    return match_recognize(
        t["events"],
        partition_by="user_id",
        order_by=["ts", "event_id"],
        pattern=[
            Step.one_or_more("A", "event_type = 'click'"),
            Step.once("B", "event_type = 'purchase'"),
        ],
        measures=[
            Measure("first_click_id", "A", "first", "event_id"),
            Measure("n_clicks", "A", "count"),
            Measure("purchase_id", "B", "first", "event_id"),
        ],
        after_match=SKIP_TO_NEXT_ROW,
    ).select("user_id", "first_click_id", "n_clicks", "purchase_id")


@query(
    "cep_no_skip_conversion_pairs",
    # NO_SKIP (reference NoSkipStrategy.java) enumerates EVERY solution from
    # every start: click followed (relaxed, followedByAny-style) by each
    # purchase within 30 minutes -> the full set of ordered (click,
    # purchase) pairs inside the window
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
    FROM events c JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND (p.ts > c.ts OR (p.ts = c.ts AND p.event_id > c.event_id))
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def cep_no_skip_conversion_pairs(spark, sf_dir):
    """PATTERN (click -> purchase) WITHIN 30 min, AFTER MATCH NO SKIP —
    every attribution pair, overlapping matches included (reference
    NoSkipStrategy.java + Pattern.followedByAny: each later purchase is its
    own branch)."""
    from flink_psl_spark.cep import NO_SKIP

    t = tables(spark, sf_dir)
    return match_recognize(
        t["events"],
        partition_by="user_id",
        order_by=["ts", "event_id"],
        pattern=[
            Step.once("A", "event_type = 'click'"),
            Step.followed_by_any("B", "event_type = 'purchase'"),
        ],
        measures=[
            Measure("click_id", "A", "first", "event_id"),
            Measure("purchase_id", "B", "first", "event_id"),
        ],
        after_match=NO_SKIP,
        within="30 minutes",
        time_col="ts",
    ).select("user_id", "click_id", "purchase_id")


@query(
    "cep_skip_to_last_error_runs",
    # SKIP TO LAST A (reference SkipToLastStrategy.java) resumes AT the last
    # error of each matched run: a k-error run before a purchase emits the
    # full-run match plus (k >= 2) a single-error match on its last error
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events WHERE event_type IN ('error', 'purchase')),
    base AS (
      SELECT *,
             SUM(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY rn) AS grp
      FROM ordered),
    runs AS (
      SELECT user_id, grp, COUNT(*) AS k,
             ARG_MIN(event_id, rn) AS first_error_id,
             ARG_MAX(event_id, rn) AS last_error_id
      FROM base WHERE event_type = 'error' GROUP BY user_id, grp),
    m AS (
      SELECT r.user_id, r.k, r.first_error_id, r.last_error_id,
             p.event_id AS purchase_id
      FROM runs r JOIN base p
        ON p.user_id = r.user_id AND p.grp = r.grp + 1
      WHERE p.event_type = 'purchase')
    SELECT user_id, CAST(k AS BIGINT) AS n_errors,
           first_error_id, purchase_id
    FROM m
    UNION ALL
    SELECT user_id, CAST(1 AS BIGINT) AS n_errors,
           last_error_id AS first_error_id, purchase_id
    FROM m WHERE k >= 2
    """,
)
def cep_skip_to_last_error_runs(spark, sf_dir):
    """PATTERN (E+ P) AFTER MATCH SKIP TO LAST E over the error/purchase
    subsequence — the retry-then-convert shape where the last failed attempt
    is re-examined as its own match (reference SkipToLastStrategy.java)."""
    from pyspark.sql import functions as F

    from flink_psl_spark.cep import skip_to_last

    t = tables(spark, sf_dir)
    ev = t["events"].where(F.col("event_type").isin("error", "purchase"))
    return match_recognize(
        ev,
        partition_by="user_id",
        order_by=["ts", "event_id"],
        pattern=[
            Step.one_or_more("E", "event_type = 'error'"),
            Step.once("P", "event_type = 'purchase'"),
        ],
        measures=[
            Measure("n_errors", "E", "count"),
            Measure("first_error_id", "E", "first", "event_id"),
            Measure("purchase_id", "P", "first", "event_id"),
        ],
        after_match=skip_to_last("E"),
    ).select("user_id", "n_errors", "first_error_id", "purchase_id")


@query(
    "cep_skip_to_first_purchase_chain",
    # SKIP TO FIRST C (reference SkipToFirstStrategy.java) resumes AT each
    # match's closing purchase, which then OPENS the next match: purchase ->
    # clicks -> purchase chains share their boundary purchases. Replica:
    # every consecutive purchase pair (on the click/purchase subsequence)
    # with at least one click between them.
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events WHERE event_type IN ('click', 'purchase')),
    p AS (
      SELECT user_id, event_id, rn,
             LEAD(event_id) OVER w AS next_id,
             LEAD(rn) OVER w AS next_rn
      FROM ordered WHERE event_type = 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY rn))
    SELECT user_id, event_id AS open_purchase_id,
           next_id AS close_purchase_id,
           CAST(next_rn - rn - 1 AS BIGINT) AS n_clicks
    FROM p WHERE next_rn IS NOT NULL AND next_rn - rn >= 2
    """,
)
def cep_skip_to_first_purchase_chain(spark, sf_dir):
    """PATTERN (P1 C+ P2) AFTER MATCH SKIP TO FIRST P2 — session chains
    where each conversion opens the next browse-to-buy window; the default
    skip would drop every other chain link (reference
    SkipToFirstStrategy.java)."""
    from pyspark.sql import functions as F

    from flink_psl_spark.cep import skip_to_first

    t = tables(spark, sf_dir)
    ev = t["events"].where(F.col("event_type").isin("click", "purchase"))
    return match_recognize(
        ev,
        partition_by="user_id",
        order_by=["ts", "event_id"],
        pattern=[
            Step.once("P1", "event_type = 'purchase'"),
            Step.one_or_more("C", "event_type = 'click'"),
            Step.once("P2", "event_type = 'purchase'"),
        ],
        measures=[
            Measure("open_purchase_id", "P1", "first", "event_id"),
            Measure("close_purchase_id", "P2", "first", "event_id"),
            Measure("n_clicks", "C", "count"),
        ],
        after_match=skip_to_first("P2"),
    ).select(
        "user_id", "open_purchase_id", "close_purchase_id", "n_clicks"
    )


@query(
    "match_recognize_sql_clicks",
    # same islands replica as cep_clicks_then_purchase (reduced measures)
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events),
    base AS (
      SELECT *,
             SUM(CASE WHEN event_type <> 'click' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY rn) AS grp
      FROM ordered)
    SELECT c.user_id, c.n_clicks, c.first_click_ts, p.event_id AS purchase_id
    FROM (SELECT user_id, grp, COUNT(*) AS n_clicks, MIN(ts) AS first_click_ts
          FROM base WHERE event_type = 'click' GROUP BY user_id, grp) c
    JOIN (SELECT user_id, grp, event_id, event_type FROM base
          WHERE event_type <> 'click') p
      ON c.user_id = p.user_id AND c.grp = p.grp - 1
    WHERE p.event_type = 'purchase'
    """,
)
def match_recognize_sql_clicks(spark, sf_dir):
    """The SQL-standard MATCH_RECOGNIZE clause text, parsed and executed
    (reference StreamExecMatch.java:59 — its users write this SQL, not the
    library API)."""
    from flink_psl_spark.match_recognize_sql import match_recognize_sql

    t = tables(spark, sf_dir)
    out = match_recognize_sql(
        t["events"],
        """
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES
                COUNT(A.*) AS n_clicks,
                FIRST(A.ts) AS first_click_ts,
                FIRST(B.event_id) AS purchase_id
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A+ B)
            DEFINE
                A AS A.event_type = 'click',
                B AS B.event_type = 'purchase'
        )
        """,
    )
    return out.select("user_id", "n_clicks", "first_click_ts", "purchase_id")


@query(
    "match_recognize_sql_skip_chain",
    # same consecutive-purchase-pair replica as cep_skip_to_first_purchase_chain
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events WHERE event_type IN ('click', 'purchase')),
    p AS (
      SELECT user_id, event_id, rn,
             LEAD(event_id) OVER w AS next_id,
             LEAD(rn) OVER w AS next_rn
      FROM ordered WHERE event_type = 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY rn))
    SELECT user_id, event_id AS open_purchase_id,
           next_id AS close_purchase_id,
           CAST(next_rn - rn - 1 AS BIGINT) AS n_clicks
    FROM p WHERE next_rn IS NOT NULL AND next_rn - rn >= 2
    """,
)
def match_recognize_sql_skip_chain(spark, sf_dir):
    """AFTER MATCH SKIP TO FIRST through the SQL clause front-end — parses
    the variable-relative skip strategy and the quantified pattern."""
    from pyspark.sql import functions as F

    from flink_psl_spark.match_recognize_sql import match_recognize_sql

    t = tables(spark, sf_dir)
    ev = t["events"].where(F.col("event_type").isin("click", "purchase"))
    out = match_recognize_sql(
        ev,
        """
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES
                FIRST(P1.event_id) AS open_purchase_id,
                FIRST(P2.event_id) AS close_purchase_id,
                COUNT(C.*) AS n_clicks
            AFTER MATCH SKIP TO FIRST P2
            PATTERN (P1 C+ P2)
            DEFINE
                P1 AS P1.event_type = 'purchase',
                C AS C.event_type = 'click',
                P2 AS P2.event_type = 'purchase'
        )
        """,
    )
    return out.select(
        "user_id", "open_purchase_id", "close_purchase_id", "n_clicks"
    )


@query(
    "match_recognize_sql_price_dip",
    # Exact NFA-scan replica of the V-shape pattern (DOWN{2,} UP) with
    # iterative DEFINEs. Structure: is_down flags -> descent-run groups
    # (run containing any row k extends to runend(grp)); a match at scan
    # position k needs >= 2 descending rows from k and the row after the
    # run strictly above value(k) (greedy DOWN + backtracking can never
    # accept a shorter block: the would-be UP row is itself descending,
    # hence below the peak). The recursive CTE replays the AFTER MATCH
    # SKIP PAST LAST ROW scan: jump past the consumed UP row on a match,
    # else advance one row.
    oracle="""
    WITH RECURSIVE ordered AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events),
    d AS (
      SELECT *,
             CASE WHEN value < LAG(value)
                    OVER (PARTITION BY user_id ORDER BY rn)
                  THEN 0 ELSE 1 END AS brk
      FROM ordered),
    g AS (
      SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY rn) AS grp
      FROM d),
    runs AS (
      SELECT user_id, rn, value, grp,
             MAX(rn) OVER (PARTITION BY user_id, grp) AS runend
      FROM g),
    cand AS (
      SELECT r.user_id, r.rn, r.value AS peak, b.value AS bottom,
             u.value AS rebound, r.runend,
             (r.runend >= r.rn + 1 AND u.value IS NOT NULL
              AND u.value > r.value) AS ok
      FROM runs r
      JOIN runs b ON b.user_id = r.user_id AND b.rn = r.runend
      LEFT JOIN runs u ON u.user_id = r.user_id AND u.rn = r.runend + 1),
    scan AS (
      SELECT user_id, 1 AS pos FROM (SELECT DISTINCT user_id FROM events)
      UNION ALL
      SELECT s.user_id,
             CAST(CASE WHEN c.ok THEN c.runend + 2 ELSE s.pos + 1 END AS BIGINT)
      FROM scan s JOIN cand c ON c.user_id = s.user_id AND c.rn = s.pos),
    hits AS (
      SELECT c.user_id, c.rn, c.peak, c.bottom, c.rebound,
             c.runend - c.rn + 1 AS n_down
      FROM scan s JOIN cand c ON c.user_id = s.user_id AND c.rn = s.pos
      WHERE c.ok)
    SELECT user_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) - 1
                AS BIGINT) AS match_seq,
           peak AS peak_value, bottom AS bottom_value,
           CAST(n_down AS BIGINT) AS n_down, rebound AS rebound_value
    FROM hits
    """,
)
def match_recognize_sql_price_dip(spark, sf_dir):
    """Cross-variable DEFINE references through the SQL front-end
    (reference IterativeCondition.java:61 — conditions over the partial
    match's history): the canonical V-shape price dip. DOWN's condition
    reads its own running history (``LAST(DOWN.value, 1)`` with the
    IS NULL first-row branch); UP's condition reads another variable's
    binding (``FIRST(DOWN.value)``)."""
    from flink_psl_spark.match_recognize_sql import match_recognize_sql

    t = tables(spark, sf_dir)
    out = match_recognize_sql(
        t["events"],
        """
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES
                FIRST(DOWN.value) AS peak_value,
                LAST(DOWN.value) AS bottom_value,
                COUNT(DOWN.*) AS n_down,
                LAST(UP.value) AS rebound_value
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (DOWN{2,} UP)
            DEFINE
                DOWN AS LAST(DOWN.value, 1) IS NULL
                        OR DOWN.value < LAST(DOWN.value, 1),
                UP AS UP.value > FIRST(DOWN.value)
        )
        """,
    )
    return out.select(
        "user_id", "match_seq", "peak_value", "bottom_value", "n_down",
        "rebound_value",
    )


@query(
    "cep_group_pattern_double_conversion",
    # (click purchase){2} on the click/purchase subsequence with NO SKIP:
    # every position i whose next four rows are click,purchase,click,purchase
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events WHERE event_type IN ('click', 'purchase'))
    SELECT a.user_id, a.event_id AS first_click_id,
           d.event_id AS last_purchase_id
    FROM ordered a
    JOIN ordered b ON b.user_id = a.user_id AND b.rn = a.rn + 1
    JOIN ordered c ON c.user_id = a.user_id AND c.rn = a.rn + 2
    JOIN ordered d ON d.user_id = a.user_id AND d.rn = a.rn + 3
    WHERE a.event_type = 'click' AND b.event_type = 'purchase'
      AND c.event_type = 'click' AND d.event_type = 'purchase'
    """,
)
def cep_group_pattern_double_conversion(spark, sf_dir):
    """PATTERN ((C P){2}) — quantified subpattern (reference
    GroupPattern.java: Pattern.begin(sub).times(2)) over the click/purchase
    subsequence, NO SKIP so every overlapping double-conversion window is
    emitted."""
    from pyspark.sql import functions as F

    from flink_psl_spark.cep import NO_SKIP

    t = tables(spark, sf_dir)
    ev = t["events"].where(F.col("event_type").isin("click", "purchase"))
    return match_recognize(
        ev,
        partition_by="user_id",
        order_by=["ts", "event_id"],
        pattern=[
            Step.group(
                "G",
                [
                    Step.once("C", "event_type = 'click'"),
                    Step.once("P", "event_type = 'purchase'"),
                ],
                2,
            )
        ],
        measures=[
            Measure("first_click_id", "C", "first", "event_id"),
            Measure("last_purchase_id", "P", "last", "event_id"),
        ],
        after_match=NO_SKIP,
    ).select("user_id", "first_click_id", "last_purchase_id")


@query(
    "cep_until_stop_condition",
    # A+ (any row) UNTIL purchase, then the purchase: with SKIP PAST LAST
    # ROW this segments each user's history at purchases — one match per
    # purchase with >= 1 preceding row since the previous purchase
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events),
    p AS (
      SELECT user_id, event_id, rn,
             LAG(rn, 1, 0) OVER (PARTITION BY user_id ORDER BY rn) AS prev_rn
      FROM ordered WHERE event_type = 'purchase')
    SELECT user_id, event_id AS purchase_id,
           CAST(rn - prev_rn - 1 AS BIGINT) AS n_before
    FROM p WHERE rn - prev_rn >= 2
    """,
)
def cep_until_stop_condition(spark, sf_dir):
    """Pattern.until (reference Pattern.java:692): a looping any-row block
    stops extending at the first purchase (the stopping row is not bound),
    then the purchase closes the match — per-purchase session segmentation."""
    from flink_psl_spark.cep import Measure, Step, match_recognize

    t = tables(spark, sf_dir)
    return match_recognize(
        t["events"],
        partition_by="user_id",
        order_by=["ts", "event_id"],
        pattern=[
            Step.one_or_more("A", "event_id IS NOT NULL").until(
                "event_type = 'purchase'"
            ),
            Step.once("B", "event_type = 'purchase'"),
        ],
        measures=[
            Measure("n_before", "A", "count"),
            Measure("purchase_id", "B", "first", "event_id"),
        ],
    ).select("user_id", "purchase_id", "n_before")


@query(
    "stream_cep_no_conversion_within",
    # same replica as the batch cep_no_conversion_within: a click matches
    # iff no purchase follows it (in (ts, event_id) order) within one hour
    oracle="""
    SELECT CAST(c.user_id AS VARCHAR) AS user_id, COUNT(*) AS n_unconverted
    FROM events c
    WHERE c.event_type = 'click'
      AND NOT EXISTS (
        SELECT 1 FROM events p
        WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
          AND (p.ts > c.ts OR (p.ts = c.ts AND p.event_id > c.event_id))
          AND p.ts <= c.ts + INTERVAL 1 HOUR)
    GROUP BY c.user_id
    """,
)
def stream_cep_no_conversion_within(spark, sf_dir):
    """STREAMING trailing notFollowedBy bounded by WITHIN — the reference's
    only legal trailing-NOT form (Pattern.notFollowedBy + within), emitted
    when the watermark closes each match's window (CepOperator timer
    timeout). Must equal the batch NFA / NOT EXISTS replica."""
    import datetime as dt
    import tempfile

    from pyspark.sql import functions as F

    from flink_psl_spark.cep import Measure, Step
    from flink_psl_spark.streaming import run_to_memory_table
    from flink_psl_spark.streaming.cep_stream import streaming_match_recognize

    t = tables(spark, sf_dir)
    ev = t["events"].select(
        F.col("user_id").cast("string").alias("u"),
        F.col("event_id").alias("eid"),
        F.col("event_type").alias("et"),
        "ts",
    )
    d = tempfile.mkdtemp(prefix="fps_scep_nfbw_")
    ev.coalesce(4).write.parquet(f"{d}/src")
    far = ev.select(F.max("ts")).first()[0] + dt.timedelta(days=30)
    spark.createDataFrame(
        [("__sentinel__", 0, "x", far)],
        "u string, eid long, et string, ts timestamp",
    ).coalesce(1).write.mode("append").parquet(f"{d}/src")

    st = (
        spark.readStream.schema("u string, eid long, et string, ts timestamp")
        .option("maxFilesPerTrigger", 4)
        .parquet(f"{d}/src")
    )
    out = streaming_match_recognize(
        st,
        "u",
        "ts",
        [
            Step.once("click", "et = 'click'"),
            Step.not_followed_by("np", "et = 'purchase'"),
        ],
        [Measure("click_id", "click", "first", "eid")],
        delay="5 minutes",
        tiebreak_col="eid",
        within="1 hour",
    )
    mem = run_to_memory_table(out, output_mode="append")
    return mem.groupBy(F.col("u").alias("user_id")).agg(
        F.count("*").alias("n_unconverted")
    )


@query(
    "cep_no_conversion_within",
    # bounded terminal negation: a click matches iff no purchase occurs
    # after it (in (ts, event_id) order) within one hour of the click
    oracle="""
    SELECT c.user_id, COUNT(*) AS n_unconverted
    FROM events c
    WHERE c.event_type = 'click'
      AND NOT EXISTS (
        SELECT 1 FROM events p
        WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
          AND (p.ts > c.ts OR (p.ts = c.ts AND p.event_id > c.event_id))
          AND p.ts <= c.ts + INTERVAL 1 HOUR)
    GROUP BY c.user_id
    """,
)
def cep_no_conversion_within(spark, sf_dir):
    """PATTERN (click notFollowedBy purchase) WITHIN 1 hour — the
    conversion-timeout pattern (reference: trailing Pattern.notFollowedBy
    is legal only with a within bound; NFACompiler + Pattern.within)."""
    from pyspark.sql import functions as F

    t = tables(spark, sf_dir)
    matches = match_recognize(
        t["events"],
        partition_by="user_id",
        order_by=["ts", "event_id"],
        pattern=[
            Step.once("click", "event_type = 'click'"),
            Step.not_followed_by("np", "event_type = 'purchase'"),
        ],
        measures=[Measure("click_id", "click", "first", "event_id")],
        within="1 hour",
        time_col="ts",
    )
    return matches.groupBy("user_id").agg(F.count("*").alias("n_unconverted"))


@query(
    "cep_followed_by_nearest",
    # followedBy (ignore edge carries NOT condition): each click binds only
    # its NEAREST later purchase within the window, even under NO SKIP —
    # the separation from followedByAny's all-pairs enumeration
    oracle="""
    WITH pairs AS (
      SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
             ROW_NUMBER() OVER (
               PARTITION BY c.user_id, c.event_id
               ORDER BY p.ts, p.event_id) AS rn
      FROM events c JOIN events p
        ON p.user_id = c.user_id
       AND c.event_type = 'click' AND p.event_type = 'purchase'
       AND (p.ts > c.ts OR (p.ts = c.ts AND p.event_id > c.event_id))
       AND p.ts <= c.ts + INTERVAL 30 MINUTE)
    SELECT user_id, click_id, purchase_id FROM pairs WHERE rn = 1
    """,
)
def cep_followed_by_nearest(spark, sf_dir):
    """PATTERN (click -> purchase) WITHIN 30 min, NO SKIP, with plain
    followedBy (reference NFACompiler ignore edge = ¬condition): a matching
    purchase cannot be skipped, so each click yields exactly its nearest
    purchase — contrast with cep_no_skip_conversion_pairs (followedByAny)."""
    from flink_psl_spark.cep import NO_SKIP

    t = tables(spark, sf_dir)
    return match_recognize(
        t["events"],
        partition_by="user_id",
        order_by=["ts", "event_id"],
        pattern=[
            Step.once("A", "event_type = 'click'"),
            Step.followed_by("B", "event_type = 'purchase'"),
        ],
        measures=[
            Measure("click_id", "A", "first", "event_id"),
            Measure("purchase_id", "B", "first", "event_id"),
        ],
        after_match=NO_SKIP,
        within="30 minutes",
        time_col="ts",
    ).select("user_id", "click_id", "purchase_id")


@query(
    "match_recognize_sql_budget_runs",
    # Exact scan replica of PATTERN (S{2,}) / DEFINE S AS SUM(S.cents) <=
    # 10000: cents are positive, so the per-user prefix sum is monotone and
    # the greedy block from pos is exactly the rows whose cumulative sum
    # stays within cap of the pre-block prefix. The recursive CTE replays
    # the SKIP PAST LAST ROW scan (jump past a >= 2-row block, else +1).
    oracle="""
    WITH RECURSIVE ordered AS (
      SELECT user_id, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events),
    ps AS (
      SELECT *, SUM(cents) OVER (PARTITION BY user_id ORDER BY rn) AS c
      FROM ordered),
    ext AS (
      -- e = last rn of the greedy block opened at pos (NULL if even the
      -- first row busts the cap)
      SELECT p.user_id, p.rn AS pos,
             (SELECT MAX(q.rn) FROM ps q
              WHERE q.user_id = p.user_id AND q.rn >= p.rn
                AND q.c - (p.c - p.cents) <= 10000) AS e
      FROM ps p),
    scan AS (
      SELECT user_id, 1 AS pos FROM (SELECT DISTINCT user_id FROM events)
      UNION ALL
      SELECT s.user_id,
             CAST(CASE WHEN x.e IS NOT NULL AND x.e >= s.pos + 1
                       THEN x.e + 1 ELSE s.pos + 1 END AS BIGINT)
      FROM scan s JOIN ext x ON x.user_id = s.user_id AND x.pos = s.pos),
    hits AS (
      SELECT s.user_id, s.pos, x.e
      FROM scan s JOIN ext x ON x.user_id = s.user_id AND x.pos = s.pos
      WHERE x.e IS NOT NULL AND x.e >= s.pos + 1)
    SELECT h.user_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY h.user_id ORDER BY h.pos) - 1
                AS BIGINT) AS match_seq,
           f.event_id AS first_event_id,
           CAST(h.e - h.pos + 1 AS BIGINT) AS n_rows,
           CAST(l.c - (f.c - f.cents) AS BIGINT) AS total_cents
    FROM hits h
    JOIN ps f ON f.user_id = h.user_id AND f.rn = h.pos
    JOIN ps l ON l.user_id = h.user_id AND l.rn = h.e
    """,
)
def match_recognize_sql_budget_runs(spark, sf_dir):
    """Running aggregates in DEFINE (reference MatchCodeGenerator —
    SUM over the partial match): maximal spending runs of >= 2 events
    whose running cents total stays within a 10000-cent budget. Integer
    cents keep the running sum exact on both engines."""
    from pyspark.sql import functions as F

    from flink_psl_spark.match_recognize_sql import match_recognize_sql

    t = tables(spark, sf_dir)
    ev = t["events"].withColumn(
        "cents", F.round(F.col("value") * 100).cast("bigint")
    )
    out = match_recognize_sql(
        ev,
        """
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES
                FIRST(S.event_id) AS first_event_id,
                COUNT(S.*) AS n_rows,
                SUM(S.cents) AS total_cents
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (S{2,})
            DEFINE S AS SUM(S.cents) <= 10000
        )
        """,
    )
    return out.select(
        "user_id", "match_seq", "first_event_id", "n_rows", "total_cents"
    )
