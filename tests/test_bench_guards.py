"""Self-adjudicating bench guards (bench.py: adjudicate).

Round-to-round bench totals drift ±30% with the host; the adjudication
rules (calib normalization, the 1.3x vs-prev bar, the pinned budgets)
used to live in session logs. These tests pin the encoded rules by
replaying the round-7 driver artifact, whose drift analysis the round-7
VERDICT worked out by hand.

The artifacts are copied into a tmp dir so the tests stay frozen on the
r07-vs-r01 pair — adjudicating against the live repo would flip the
"previous bench" every time a new round's BENCH_r{N}.json is committed.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


@pytest.fixture(scope="module")
def guard_repo(tmp_path_factory):
    """A dir whose newest bench is pinned to BENCH_r07.json."""
    d = tmp_path_factory.mktemp("guard_repo")
    for name in ("BENCH_r01.json", "BENCH_r07.json"):
        shutil.copy(os.path.join(REPO, name), d / name)
    return str(d)


@pytest.fixture(scope="module")
def r07():
    with open(os.path.join(REPO, "BENCH_r07.json")) as f:
        return json.load(f)["parsed"]


def test_replaying_prev_round_gives_unit_ratios(r07, guard_repo):
    """A run identical to the newest committed BENCH must adjudicate to
    ratio 1.0 everywhere (the normalization cancels its own calib)."""
    g = bench.adjudicate(r07["queries"], r07["calib_sec"], guard_repo,
                         sf=0.1)
    assert g["prev_bench"] == "BENCH_r07.json"
    assert g["vs_prev"], "no overlap with previous bench queries"
    assert all(
        abs(v["ratio_norm"] - 1.0) < 1e-9 for v in g["vs_prev"].values()
    )
    assert g["vs_prev_fail"] == []


@pytest.fixture(scope="module")
def creep_repo(tmp_path_factory):
    """A dir whose newest bench is BENCH_r06.json — replaying the r07
    run against it reproduces the round-7 creep adjudication."""
    d = tmp_path_factory.mktemp("creep_repo")
    for name in ("BENCH_r01.json", "BENCH_r06.json"):
        shutil.copy(os.path.join(REPO, name), d / name)
    return str(d)


def test_pins_reproduce_round7_verdict(r07, creep_repo):
    """Replaying the r7 driver run against its true predecessor (r6):
    pq-ann and stream_interval_join creep for real (their r7-vs-r6
    host-adjusted ratios are 1.10 and 1.33 — past the excuse band), the
    classifier and overlap sketch are within budget outright. The r7
    hand-verdict ALSO failed llm_minhash_dedup, but by the r11
    median-of-ratios analysis that was the calib phantom (raw 1.226x on
    a 1.244x-slower host, host-adjusted 0.985): the excuse rule now
    records it excused_by_prev rather than failed — the documented
    reinterpretation, not a loosened gate (creep >2%/round still
    binds)."""
    g = bench.adjudicate(r07["queries"], r07["calib_sec"], creep_repo,
                         sf=0.1)
    assert g["prev_bench"] == "BENCH_r06.json"
    assert set(g["pins_fail"]) == {
        "llm_pq_ann_topk",
        "stream_interval_join",
    }
    mh = g["pins"]["llm_minhash_dedup"]
    assert mh["pass"] is True
    assert 0.9 < mh["excused_by_prev"] <= bench.PIN_PREV_EXCUSE
    assert g["pins"]["llm_trained_quality_classifier"]["pass"]
    assert g["pins"]["llm_corpus_overlap_sketch"]["pass"]
    assert g["pass"] is False


def test_pin_excuse_requires_prev_round_to_have_passed(r07, tmp_path):
    """A failing pin must not ratchet itself green: if the previous
    committed artifact already failed the pin, an unchanged (ratio 1.0)
    run stays failed."""
    d = tmp_path / "repo"
    d.mkdir()
    prev = dict(r07)
    prev = {
        "calib_sec": r07["calib_sec"],
        "queries": dict(r07["queries"]),
        "guards": {"pins_fail": ["llm_minhash_dedup"]},
    }
    (d / "BENCH_r07.json").write_text(json.dumps({"parsed": prev}))
    g = bench.adjudicate(r07["queries"], r07["calib_sec"], str(d), sf=0.1)
    assert "llm_minhash_dedup" in g["pins_fail"]
    assert "excused_by_prev" not in g["pins"]["llm_minhash_dedup"]


def test_uniform_host_drift_passes(r07, guard_repo):
    """A uniform 1.5x slowdown WITH a matching calib drift is the
    environment, not a regression — every ratio must stay 1.0."""
    slowed = {k: v * 1.5 for k, v in r07["queries"].items()}
    g = bench.adjudicate(slowed, r07["calib_sec"] * 1.5, guard_repo,
                         sf=0.1)
    assert all(
        abs(v["ratio_norm"] - 1.0) < 1e-6 for v in g["vs_prev"].values()
    )
    assert g["vs_prev_fail"] == []


def test_single_query_regression_fails(r07, guard_repo):
    """One query 2x slower at the same calib must fail exactly that
    query's vs-prev verdict."""
    cur = dict(r07["queries"])
    cur["q1_pricing_summary"] = cur["q1_pricing_summary"] * 2
    g = bench.adjudicate(cur, r07["calib_sec"], guard_repo, sf=0.1)
    assert g["vs_prev_fail"] == ["q1_pricing_summary"]
    assert g["vs_prev"]["q1_pricing_summary"]["pass"] is False


def test_no_prev_bench_is_not_an_error(tmp_path):
    """First round in a fresh repo: no BENCH files — pins still run,
    vs-prev is empty, no crash."""
    g = bench.adjudicate({"llm_pq_ann_topk": 1.0}, bench.CALIB_REF,
                         str(tmp_path), sf=0.1)
    assert g["prev_bench"] is None
    assert g["vs_prev"] == {}
    assert g["pins"]["llm_pq_ann_topk"]["pass"]
    assert g["pass"] is True


def test_malformed_newest_bench_falls_back(r07, guard_repo, tmp_path):
    """A truncated newest BENCH file must not silently disable the
    vs-prev guard — the next-newest parseable file is used."""
    d = tmp_path / "repo"
    d.mkdir()
    for name in ("BENCH_r01.json", "BENCH_r07.json"):
        shutil.copy(os.path.join(REPO, name), d / name)
    (d / "BENCH_r99.json").write_text("{not json")
    g = bench.adjudicate(r07["queries"], r07["calib_sec"], str(d), sf=0.1)
    assert g["prev_bench"] == "BENCH_r07.json"
    assert g["vs_prev"]


def test_baseline_block_reports_comparable_subset(r07, guard_repo):
    """The artifact self-reports the judge's bench_vs_baseline number:
    the total over the 24 queries shared with BENCH_r01, raw seconds
    (r1 predates calib_sec)."""
    g = bench.adjudicate(r07["queries"], r07["calib_sec"], guard_repo,
                         sf=0.1)
    b = g["baseline"]
    assert b["file"] == "BENCH_r01.json"
    assert b["n_shared"] == 24
    # replaying the r7 driver artifact: its verdict worked this out as
    # 26.66 s = 0.85x of the 31.54 s r1 bar
    assert abs(b["shared_total_sec"] - 26.66) < 0.02
    assert abs(b["ratio"] - 0.845) < 0.005


def test_sf_mismatch_makes_verdicts_non_binding(r07, creep_repo):
    """Pins and the prev artifact are quoted at sf0.1; a quick sf0.01
    iteration run — or an unparseable scale — must not emit binding
    verdicts."""
    for sf in (0.01, None):
        g = bench.adjudicate(r07["queries"], r07["calib_sec"], creep_repo,
                             sf=sf)
        assert g["sf_mismatch"] is True
        assert g["pass"] is None
    g01 = bench.adjudicate(r07["queries"], r07["calib_sec"], creep_repo,
                           sf=0.1)
    assert g01["sf_mismatch"] is False
    assert g01["pass"] is False  # replays the r7-vs-r6 creep failures


def test_pinned_guards_cover_verdict_names():
    """The four round-6 pins plus the round-7 carry-forward guard."""
    assert set(bench.PINNED_GUARDS) == {
        "llm_trained_quality_classifier",
        "llm_pq_ann_topk",
        "llm_corpus_overlap_sketch",
        "llm_minhash_dedup",
        "stream_interval_join",
    }


def test_path_dependent_host_drift_cancels(r07, guard_repo):
    """The r10 phantom-drift scenario: every query 1.2x slower while the
    calib probe (pure JVM sum) barely moves — one scalar calib prints
    +20% on untouched code, the median-of-ratios normalizer cancels it."""
    slowed = {k: v * 1.2 for k, v in r07["queries"].items()}
    g = bench.adjudicate(slowed, r07["calib_sec"] * 1.02, guard_repo,
                         sf=0.1)
    assert g["host_factor_source"] == "median_of_ratios"
    assert abs(g["host_factor"] - 1.2) < 1e-6
    assert all(
        abs(v["ratio_norm"] - 1.0) < 1e-6 for v in g["vs_prev"].values()
    )
    assert g["vs_prev_fail"] == []


def test_regression_on_top_of_host_drift_still_fails(r07, guard_repo):
    """A real 2x regression must still fail when stacked on a uniform
    1.2x host drift (the median absorbs only the common factor)."""
    cur = {k: v * 1.2 for k, v in r07["queries"].items()}
    cur["q1_pricing_summary"] *= 2
    g = bench.adjudicate(cur, r07["calib_sec"], guard_repo, sf=0.1)
    assert g["vs_prev_fail"] == ["q1_pricing_summary"]
    assert abs(g["vs_prev"]["q1_pricing_summary"]["ratio_norm"] - 2.0) < 1e-6


def test_thin_overlap_falls_back_to_calib(r07, tmp_path):
    """With <5 shared queries a median over the ratios would erase the
    regression it exists to catch — calib normalization takes over."""
    d = tmp_path / "repo"
    d.mkdir()
    prev = {
        "parsed": {
            "calib_sec": 0.2,
            "queries": {"a": 1.0, "b": 1.0, "c": 1.0},
        }
    }
    (d / "BENCH_r01.json").write_text(json.dumps(prev))
    g = bench.adjudicate(
        {"a": 2.0, "b": 1.0, "c": 1.0}, 0.2, str(d), sf=0.1
    )
    assert g["host_factor_source"] == "calib"
    assert g["vs_prev_fail"] == ["a"]


def test_pin_excuses_cannot_chain_through_excused_rounds(r07, tmp_path):
    """The r11 ADVICE scenario: slow creep (<2%/round) excused every
    round ratchets a pin arbitrarily over budget if the excuse keys on
    the recorded pass flag (an excused round records pass=true and never
    enters pins_fail). The excuse is now anchored to the previous
    round's MEASURED norm_sec: a prev round whose own norm was over the
    limit — i.e. an excused round — cannot seed another excuse, so the
    chain is capped at one round."""
    d = tmp_path / "repo"
    d.mkdir()
    limit = bench.PINNED_GUARDS["llm_minhash_dedup"]
    # prev round: norm 1% over the limit, recorded pass=true with an
    # excuse (exactly what an excused round commits), empty pins_fail
    prev_sec = limit * 1.01 * (1.0 / (bench.CALIB_REF / bench.CALIB_REF))
    filler = {f"f{i}": 1.0 for i in range(6)}
    prev = {
        "calib_sec": bench.CALIB_REF,
        "queries": {"llm_minhash_dedup": prev_sec, **filler},
        "guards": {
            "pins_fail": [],
            "pins": {"llm_minhash_dedup": {
                "pass": True, "excused_by_prev": 1.01,
                "norm_sec": round(prev_sec, 3),
            }},
        },
    }
    (d / "BENCH_r07.json").write_text(json.dumps({"parsed": prev}))
    cur = {"llm_minhash_dedup": prev_sec * 1.019, **filler}
    g = bench.adjudicate(cur, bench.CALIB_REF, str(d), sf=0.1)
    entry = g["pins"]["llm_minhash_dedup"]
    assert entry["pass"] is False, (
        "a 1.9%-creep round after an excused round must bind"
    )
    assert "llm_minhash_dedup" in g["pins_fail"]
    assert "excused_by_prev" not in entry


def test_pin_excuse_still_granted_after_genuine_pass(r07, tmp_path):
    """The legitimate excuse path survives: prev round's measured norm
    within the limit + current ratio inside the excuse band → excused,
    even on a host whose calib swings the scalar normalization."""
    d = tmp_path / "repo"
    d.mkdir()
    limit = bench.PINNED_GUARDS["llm_minhash_dedup"]
    filler = {f"f{i}": 1.0 for i in range(6)}
    prev_sec = limit * 0.99  # genuinely under budget at CALIB_REF
    prev = {
        "calib_sec": bench.CALIB_REF,
        "queries": {"llm_minhash_dedup": prev_sec, **filler},
    }
    (d / "BENCH_r07.json").write_text(json.dumps({"parsed": prev}))
    # current: same true cost, but the calib probe came back 10% low,
    # inflating norm_sec past the limit — the classic phantom miss
    cur = {"llm_minhash_dedup": prev_sec * 1.01, **filler}
    g = bench.adjudicate(cur, bench.CALIB_REF * 0.9, str(d), sf=0.1)
    entry = g["pins"]["llm_minhash_dedup"]
    assert entry["pass"] is True
    assert entry["excused_by_prev"] == pytest.approx(1.01, abs=1e-6)
    assert entry["prev_norm_sec"] == pytest.approx(prev_sec, abs=1e-3)
    assert g["pins_fail"] == []


def test_tiny_query_blip_below_noise_floor_is_excused(r07, guard_repo):
    """A 1.4x ratio on a ~0.4 s query is ~0.18 s of scheduling noise,
    not a regression — the absolute-excess floor must excuse it while
    still reporting the ratio."""
    cur = dict(r07["queries"])
    cur["q1_pricing_summary"] = round(cur["q1_pricing_summary"] * 1.4, 3)
    g = bench.adjudicate(cur, r07["calib_sec"], guard_repo, sf=0.1)
    entry = g["vs_prev"]["q1_pricing_summary"]
    assert entry["ratio_norm"] > bench.VS_PREV_BAR
    assert entry["excess_sec"] < bench.VS_PREV_MIN_EXCESS_SEC
    assert entry["pass"] is True
    assert g["vs_prev_fail"] == []
