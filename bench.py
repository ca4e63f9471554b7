"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Runs each headline query to full materialization (noop sink — no driver
collect) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family (agg, multi-join, window fn, window
# TVF, dedup, as-of join, set op, LLM dedup exact+minhash, ANN search).
HEADLINE = [
    "q1_pricing_summary",
    "join_multiway_revenue",
    "join_broadcast_dim",
    "wf_topn_per_group",
    "wf_running_rows_frame",
    "tumble_window_agg",
    "session_window_agg",
    "dedup_keep_last",
    "asof_join",
    "interval_join_batch",
    "setop_except_all",
    "llm_exact_dedup",
    "llm_minhash_dedup",
    "llm_text_stats",
    "llm_cosine_topk",
    "llm_pq_ann_topk",
    "llm_corpus_overlap_sketch",
    "llm_trained_quality_classifier",
    "window_join",
    "cep_clicks_then_purchase",
    "cdc_debezium_roundtrip",
    "udf_pandas_scalar",
    "q5_local_supplier_volume",
    "graph_pagerank",
    # streaming (real Structured Streaming runs, AvailableNow replay of the
    # events table): window agg, stream-stream join, custom stateful op
    "stream_tumble_agg",
    "stream_interval_join",
    "stream_keyed_top3",
    # ADDED r13 (additions only — no existing entry removed/renamed): the
    # most expensive non-headline paths, optimized this round; in the bench
    # so their cost is driver-measured from now on. The adjudication
    # guards skip queries absent from the previous committed artifact, so
    # these gain vs-prev verdicts from r14 onward.
    "llm_bloom_decontamination",
    "llm_span_dedup_rewrite",
    "cogroup_user_summary",
    "async_lookup_enrich",
    "recursive_cte_order_chain",
    "graph_hits",
    "llm_semantic_dedup",
]


def main() -> int:
    from flink_psl_spark import get_spark
    from flink_psl_spark.queries import QUERIES

    spark = get_spark(app_name="flink_psl_spark_bench")
    # warm-up: JVM/codegen startup + catalog registration (schema reads are
    # one-time metadata setup, not per-query work)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from flink_psl_spark.queries.registry import tables

    tbls = tables(spark, SF_DIR)
    # touch every fixture table once (parquet footers + vectorized-reader JIT)
    for df in tbls.values():
        df.limit(1).count()
    # pre-spawn the Python worker pool (pandas/pyarrow imports dominate the
    # first Arrow-UDF query otherwise) — one tiny pandas UDF per core
    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda s: s, "long")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(cpus * 4, numPartitions=cpus).select(
        F.sum(_warm(F.col("id")))
    ).collect()

    # host calibration: a fixed JVM-side compute, identical every round —
    # the absolute host scale for the pinned budgets (vs-prev drift is
    # adjudicated by median-of-ratios instead; see adjudicate). MUST stay
    # the START-of-run probe: the pins' CALIB_REF was quoted at round 6's
    # start probe, and the same probe AFTER the timed passes is ~2x
    # faster (fully JIT-hot JVM — measured 0.082 vs 0.201-class starts in
    # r11), which would silently tighten every pin budget ~2x. The end
    # probe is still taken, as a diagnostic only (calib_end_sec).
    def _calib_probe() -> float:
        return min(
            _timed(lambda: spark.range(200_000_000).selectExpr(
                "sum(id * 2 + 1)").collect())
            for _ in range(3)
        )

    calib = _calib_probe()

    # five passes, min per query: steady-state cost (the first pass absorbs
    # per-shape codegen/JIT and Arrow worker spawn; warm-up bleed reaches
    # into pass 2 for Arrow-heavy queries; min over the extra passes
    # estimates the same steady state with less scheduler-jitter variance)
    per_query: dict[str, float] = {}
    for _pass in range(5):
        for name in HEADLINE:
            fn = QUERIES[name]
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            elapsed = round(time.time() - t0, 3)
            if name not in per_query or elapsed < per_query[name]:
                per_query[name] = elapsed

    calib_end = _calib_probe()

    raw_sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(raw_sf) if raw_sf.replace(".", "").isdigit() else None
    total = round(sum(per_query.values()), 3)
    guards = adjudicate(
        per_query, calib, os.path.dirname(os.path.abspath(__file__)),
        sf=sf_val,
    )
    payload_dict = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "n": 5,
        "calib_sec": calib,
        "calib_end_sec": calib_end,
        "queries": per_query,
        "guards": guards,
        "sf": sf_val if sf_val is not None else raw_sf,
    }
    payload = json.dumps(payload_dict)
    # The driver captures a stdout TAIL, which truncated BENCH_r08 mid-JSON
    # (parsed: null). Persist the full artifact to a sibling file too —
    # same pattern as check_queries --json-out — so the committed
    # BENCH_r{N}.json always carries the complete per-query block.
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_LOCAL.json"),
    )
    try:
        with open(out_path, "w") as f:
            f.write(payload + "\n")
    except OSError as e:
        # stdout remains the contract; the file is belt-and-braces — but
        # a silent failure would leave a STALE committed snapshot that
        # looks fresh, so say so loudly (ADVICE r9)
        print(f"WARNING: could not write {out_path}: {e}", file=sys.stderr)
    # stdout gets a SLIM line (guards summarized): the driver captures a
    # stdout tail that truncated the full payload mid-JSON in r8 and r9;
    # halving the line doubles the chance the contract fields
    # (metric/value/queries/sf) survive. Full guards detail lives in the
    # committed snapshot file above.
    slim = {
        **payload_dict,  # derived, so the two copies can't drift
        "guards": {
            "pass": guards.get("pass"),
            "vs_prev_fail": guards.get("vs_prev_fail"),
            "pins_fail": guards.get("pins_fail"),
            "baseline_ratio": (guards.get("baseline") or {}).get("ratio"),
            "detail": "see BENCH_LOCAL.json",
        },
    }
    print(json.dumps(slim))
    return 0


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


# --- self-adjudicating guards -------------------------------------------
#
# Cross-round totals drift ±30% with the host (each round runs on a fresh
# container); the adjudication rules used to live in session logs and had
# to be re-litigated by hand every round. They are encoded here instead so
# every BENCH_r{N}.json carries its own verdicts:
#
#   * vs_prev: per-query ratio against the previous committed BENCH file,
#     normalized by the MEDIAN raw ratio across all shared queries
#     (median-of-ratios, as in DESeq): any common host factor — including
#     path-dependent mixtures (contention hits shuffle/Arrow harder than a
#     JVM long-sum; the r10 lesson: queries drifted +20% "normalized" while
#     their code was untouched, because one scalar calib can't linearize
#     that) — cancels exactly, while a real single-query regression sticks
#     out because the median is robust to a few changed queries. A GLOBAL
#     regression (every query slower from one config change) is invisible
#     here by construction; the calib-normalized pins and the raw r1
#     baseline ratio below carry that case. Falls back to calib
#     normalization when fewer than 5 queries overlap (a median over 2-3
#     ratios would just erase the regression it's meant to catch). The
#     regression bar is 1.3x per query AND >= VS_PREV_MIN_EXCESS_SEC of
#     absolute excess over the host-adjusted expectation — ratios on
#     sub-half-second queries are fixed-overhead noise.
#   * pins: absolute calib-normalized budgets for queries with a history
#     of creep, expressed at the round-6 reference calib (0.172):
#     norm_sec = sec * (CALIB_REF / calib_cur). Pin values carried from
#     the round-6/7 verdicts; stream_interval_join's pin is 1.3x its r6
#     record (3.141 s), the explicit carry-forward guard from VERDICT r7.
#     The calib probe itself swings ±30% with the host class (0.127 vs
#     0.201 observed r10→r11 on untouched code), so a pin miss is
#     EXCUSED — recorded as excused_by_prev, never silently — when the
#     query is provably not creeping: its median-of-ratios-adjusted cost
#     is within PIN_PREV_EXCUSE of the previous committed run AND that
#     run's MEASURED norm_sec was itself within the limit (not merely
#     recorded pass=true — an excused round's norm_sec is over the
#     limit by definition, so excuses cannot chain: after one excused
#     round the pin must genuinely pass or fail; r11 ADVICE showed the
#     old pins_fail-keyed check let 2%/round creep ratchet forever).

CALIB_REF = 0.172  # round-6 host class; pins are quoted at this calib

PINNED_GUARDS = {
    "llm_trained_quality_classifier": 2.6,
    "llm_pq_ann_topk": 2.2,
    "llm_corpus_overlap_sketch": 2.1,
    "llm_minhash_dedup": 2.5,
    "stream_interval_join": round(3.141 * 1.3, 3),
}

VS_PREV_BAR = 1.3
# a vs-prev failure additionally requires this many seconds of absolute
# excess over the host-adjusted expectation: ratios on sub-half-second
# queries are scheduling noise (r11: four ~0.3 s queries printed
# 1.32-1.39x "drift" that was ~0.08 s of fixed per-job overhead not
# scaling with a 0.716x host factor). A real regression on any query
# big enough to matter clears 0.2 s; one too small to clear it is below
# measurement noise and still covered by the pins/baseline guards.
VS_PREV_MIN_EXCESS_SEC = 0.2

# a pin miss is excused when the query's median-of-ratios-adjusted cost
# is within this factor of the previous committed run AND that run
# passed the pin (see the pins note above)
PIN_PREV_EXCUSE = 1.02


def _latest_prev_bench(repo_dir: str) -> tuple[str, dict] | None:
    """Newest PARSEABLE committed BENCH_r{N}.json (driver wrapper or raw
    line) — a malformed newest file (e.g. a failed run committed anyway)
    falls back to the next-newest instead of disabling the guard."""
    import glob
    import re

    candidates: list[tuple[int, str]] = []
    for path in glob.glob(os.path.join(repo_dir, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            candidates.append((int(m.group(1)), path))
    for _, path in sorted(candidates, reverse=True):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        parsed = data.get("parsed", data)  # driver wraps the raw line
        if isinstance(parsed, dict) and "queries" in parsed:
            return os.path.basename(path), parsed
    return None


def adjudicate(per_query: dict[str, float], calib: float,
               repo_dir: str, sf: float | str | None = None) -> dict:
    """Build the guards block: vs-prev ratios + pinned budgets, verdicts
    included, so the artifact settles drift arguments without session
    logs. Pins and the previous-round artifact are quoted at sf0.1 (the
    driver's scale); a run at any other sf still reports the numbers but
    its verdicts are non-binding ("sf_mismatch": true, "pass": null)."""
    guards: dict = {
        "calib_ref": CALIB_REF,
        "vs_prev_bar": VS_PREV_BAR,
        "vs_prev": {},
        "vs_prev_fail": [],
        "pins": {},
        "pins_fail": [],
    }
    prev = _latest_prev_bench(repo_dir)
    if prev is not None:
        prev_name, prev_parsed = prev
        prev_calib = prev_parsed.get("calib_sec") or CALIB_REF
        guards["prev_bench"] = prev_name
        guards["prev_calib_sec"] = prev_calib
        raw = {
            name: sec / prev_parsed["queries"][name]
            for name, sec in per_query.items()
            if prev_parsed["queries"].get(name)
        }
        if len(raw) >= 5:
            ordered = sorted(raw.values())
            mid = len(ordered) // 2
            host = (
                ordered[mid]
                if len(ordered) % 2
                else (ordered[mid - 1] + ordered[mid]) / 2
            )
            guards["host_factor"] = round(host, 3)
            guards["host_factor_source"] = "median_of_ratios"
        else:
            host = calib / prev_calib
            guards["host_factor"] = round(host, 3)
            guards["host_factor_source"] = "calib"
        for name, r in raw.items():
            ratio = r / host
            excess = per_query[name] - host * prev_parsed["queries"][name]
            ok = ratio <= VS_PREV_BAR or excess < VS_PREV_MIN_EXCESS_SEC
            guards["vs_prev"][name] = {
                "ratio_norm": round(ratio, 3),
                "ratio_raw": round(r, 3),
                "excess_sec": round(excess, 3),
                "pass": ok,
            }
            if not ok:
                guards["vs_prev_fail"].append(name)
    else:
        guards["prev_bench"] = None
    for name, limit in PINNED_GUARDS.items():
        sec = per_query.get(name)
        if sec is None:
            continue
        norm = sec * (CALIB_REF / calib)
        ok = norm <= limit
        entry = {
            "limit": limit,
            "norm_sec": round(norm, 3),
            "pass": ok,
        }
        if not ok and prev is not None:
            v = guards["vs_prev"].get(name)
            # The excuse is anchored to the previous round's MEASURED
            # normalized cost, not its recorded pass flag: an excused
            # round records pass=true but its norm_sec was over the
            # limit (that is why it needed the excuse), so the chain is
            # capped at one consecutive excused round by construction —
            # after an excuse the pin must genuinely pass or fail.
            # (Pre-r12 this keyed on prev pins_fail, which an excused
            # round never enters, so 2%/round creep could chain
            # excuses forever — ADVICE r11.)
            prev_sec = prev[1]["queries"].get(name)
            prev_calib = prev[1].get("calib_sec") or CALIB_REF
            prev_norm = (
                prev_sec * (CALIB_REF / prev_calib)
                if prev_sec is not None else None
            )
            if (
                v is not None
                and v["ratio_norm"] <= PIN_PREV_EXCUSE
                and prev_norm is not None
                and prev_norm <= limit
            ):
                ok = True
                entry["pass"] = True
                entry["excused_by_prev"] = v["ratio_norm"]
                entry["prev_norm_sec"] = round(prev_norm, 3)
        guards["pins"][name] = entry
        if not ok:
            guards["pins_fail"].append(name)
    # baseline ratio: total over the query subset shared with BENCH_r01
    # (the reference publishes no wall-times — BASELINE.md — so the r1
    # measurement is the standing bar; r1 predates calib_sec, so the
    # ratio is raw seconds). This is the judge's bench_vs_baseline
    # number, self-reported.
    r1_path = os.path.join(repo_dir, "BENCH_r01.json")
    if os.path.exists(r1_path):
        with open(r1_path) as f:
            r1 = json.load(f)
        r1 = r1.get("parsed", r1)
        shared = sorted(set(per_query) & set(r1.get("queries", {})))
        if shared:
            cur_total = sum(per_query[n] for n in shared)
            r1_total = sum(r1["queries"][n] for n in shared)
            guards["baseline"] = {
                "file": "BENCH_r01.json",
                "n_shared": len(shared),
                "shared_total_sec": round(cur_total, 3),
                "r1_total_sec": round(r1_total, 3),
                "ratio": round(cur_total / r1_total, 3),
            }
    # unknown scale is a mismatch too — binding verdicts only at the
    # driver's sf0.1
    guards["sf_mismatch"] = sf is None or float(sf) != 0.1
    if guards["sf_mismatch"]:
        guards["pass"] = None
    else:
        guards["pass"] = (
            not guards["vs_prev_fail"] and not guards["pins_fail"]
        )
    return guards


if __name__ == "__main__":
    sys.exit(main())
