"""Property-based tests (hypothesis): custom operators vs independent
reference models — pandas merge_asof for the as-of join, a pure-python
window model for CUMULATE, a brute-force matcher for the CEP NFA."""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

BASE = dt.datetime(2024, 1, 1)

_SETTINGS = dict(
    # each example runs Spark jobs — keep the default sane; raise via
    # SPARK_GRAFT_HYPOTHESIS_EXAMPLES for a deep soak of the
    # cross-engine contracts (e.g. 100+ before a round lands)
    max_examples=int(os.environ.get("SPARK_GRAFT_HYPOTHESIS_EXAMPLES", "12")),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

keys = st.sampled_from(["a", "b"])
times = st.integers(min_value=0, max_value=50)


@st.composite
def asof_case(draw):
    left = draw(
        st.lists(st.tuples(keys, times), min_size=1, max_size=12, unique=True)
    )
    right = draw(
        st.lists(
            st.tuples(keys, times, st.integers(0, 100)),
            min_size=0,
            max_size=12,
            unique_by=lambda r: (r[0], r[1]),
        )
    )
    return left, right


@given(asof_case())
@settings(**_SETTINGS)
def test_asof_join_matches_merge_asof(spark, case):
    from flink_psl_spark.operators import asof_join

    left_rows, right_rows = case
    l = spark.createDataFrame(
        [(k, BASE + dt.timedelta(minutes=m), i) for i, (k, m) in enumerate(left_rows)],
        "k string, t timestamp, lid int",
    )
    r = spark.createDataFrame(
        [(k, BASE + dt.timedelta(minutes=m), v) for k, m, v in right_rows],
        "k string, t timestamp, v int",
    ) if right_rows else spark.createDataFrame([], "k string, t timestamp, v int")

    out = asof_join(l, r, on="k", left_time="t", right_time="t", how="left")
    got = {row["lid"]: row["r_v"] for row in out.collect()}

    lp = pd.DataFrame(
        [(k, BASE + dt.timedelta(minutes=m), i) for i, (k, m) in enumerate(left_rows)],
        columns=["k", "t", "lid"],
    ).sort_values("t", kind="mergesort")
    rp = pd.DataFrame(
        [(k, BASE + dt.timedelta(minutes=m), v) for k, m, v in right_rows],
        columns=["k", "t", "v"],
    ).sort_values("t", kind="mergesort")
    if len(rp):
        merged = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
        want = {
            int(row.lid): (None if pd.isna(row.v) else int(row.v))
            for row in merged.itertuples()
        }
    else:
        want = {int(row.lid): None for row in lp.itertuples()}
    assert got == want


@given(
    st.lists(st.integers(0, 7199), min_size=1, max_size=20),
    st.sampled_from([(15, 60), (30, 120), (10, 30)]),
)
@settings(**_SETTINGS)
def test_cumulate_matches_model(spark, offsets_s, spec):
    from flink_psl_spark.operators import cumulate

    step_min, max_min = spec
    df = spark.createDataFrame(
        [(BASE + dt.timedelta(seconds=s),) for s in offsets_s], "ts timestamp"
    )
    out = cumulate(df, "ts", f"{step_min} minutes", f"{max_min} minutes")
    got = sorted(
        (r["ts"], r["window_start"], r["window_end"])
        for r in out.collect()
    )

    want = []
    step, mx = step_min * 60, max_min * 60
    for s in offsets_s:
        t = BASE + dt.timedelta(seconds=s)
        start_s = (s // mx) * mx
        off = s - start_s
        first_end = ((off // step) + 1) * step
        for end in range(first_end, mx + 1, step):
            want.append(
                (
                    t,
                    BASE + dt.timedelta(seconds=start_s),
                    BASE + dt.timedelta(seconds=start_s + end),
                )
            )
    assert got == sorted(want)


@st.composite
def cep_case(draw):
    # sequence over alphabet {c, p, x}; pattern: c+ p
    return draw(
        st.lists(st.sampled_from(["c", "p", "x"]), min_size=1, max_size=16)
    )


def _brute_matches(seq: list[str]):
    """Greedy c+ p with SKIP PAST LAST ROW, scanning left to right."""
    out, i, n = [], 0, len(seq)
    while i < n:
        j = i
        while j < n and seq[j] == "c":
            j += 1
        if j > i and j < n and seq[j] == "p":
            out.append((i, j))  # (first c idx, count of c) with p at j
            i = j + 1
        else:
            i += 1
    return [(a, b - a) for a, b in out]


@given(cep_case())
@settings(**_SETTINGS)
def test_cep_matches_brute_force(spark, seq):
    from flink_psl_spark.cep import Measure, Step, match_recognize

    df = spark.createDataFrame(
        [("k", i, s) for i, s in enumerate(seq)], "k string, i long, et string"
    )
    out = match_recognize(
        df,
        "k",
        "i",
        [Step.one_or_more("A", "et = 'c'"), Step.once("B", "et = 'p'")],
        [Measure("first_i", "A", "first", "i"), Measure("n", "A", "count")],
    )
    got = sorted((r["first_i"], r["n"]) for r in out.collect())
    assert got == sorted(_brute_matches(seq))


@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 30), st.integers(0, 9)),
        min_size=1,
        max_size=15,
        unique_by=lambda r: (r[0], r[1]),
    ),
    st.sampled_from([(0, 5), (2, 8), (-3, 3)]),
)
@settings(**_SETTINGS)
def test_interval_join_matches_model(spark, rows, band):
    from flink_psl_spark.operators import interval_join

    lo, hi = band
    df = spark.createDataFrame(
        [(k, BASE + dt.timedelta(minutes=m), v) for k, m, v in rows],
        "k string, t timestamp, v int",
    )
    out = interval_join(
        df, df, "k", "t", "t", f"'{lo}' MINUTE", f"'{hi}' MINUTE"
    ).select(
        "__l.k",
        "__l.t",
        "__r.v",
        "__l.v",
    )
    got = sorted(map(tuple, out.collect()))

    want = []
    for k1, m1, v1 in rows:
        for k2, m2, v2 in rows:
            if k1 == k2 and m1 + lo <= m2 <= m1 + hi:
                want.append((k1, BASE + dt.timedelta(minutes=m1), v2, v1))
    assert got == sorted(want)


@st.composite
def doc_corpus(draw):
    words = st.sampled_from(["alpha", "b", "cc", "dd d".replace(" ", ""), "e"])
    docs = draw(
        st.lists(
            st.tuples(
                st.sampled_from(["s0", "s1"]),
                st.lists(words, min_size=0, max_size=30),
            ),
            min_size=1,
            max_size=10,
        )
    )
    return [(i, src, " ".join(ws)) for i, (src, ws) in enumerate(docs)]


@given(doc_corpus(), st.integers(2, 8), st.integers(1, 8))
@settings(**_SETTINGS)
def test_chunking_matches_python_model(spark, rows, chunk, stride):
    """chunk_documents vs a pure-python sliding-window model: same chunk
    ids, boundaries, and text for arbitrary docs/chunk/stride."""
    from flink_psl_spark.llm.chunking import chunk_documents

    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["start_token"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(
            df, chunk_tokens=chunk, stride=stride
        ).collect()
    )
    want = []
    for doc_id, _, text in rows:
        toks = text.split()
        for start in range(1, max(len(toks), 1) + 1, stride):
            piece = toks[start - 1 : start - 1 + chunk]
            if piece:
                want.append(
                    (doc_id, (start - 1) // stride, start, len(piece), " ".join(piece))
                )
    assert got == sorted(want)


@given(doc_corpus(), st.integers(1, 16))
@settings(**_SETTINGS)
def test_packing_matches_python_model(spark, rows, max_len):
    """pack_sequences vs a pure-python running-offset model per shard."""
    from flink_psl_spark.llm.chunking import pack_sequences

    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    got = {
        r["doc_id"]: (r["shard"], r["n_tokens"], r["first_seq"], r["seq_offset"], r["seqs_spanned"])
        for r in pack_sequences(df, max_len=max_len).collect()
    }
    cum: dict[str, int] = {}
    for doc_id, src, text in rows:  # doc_id order == generation order
        n = len(text.split())
        c = cum.get(src, 0)
        first = c // max_len
        last = (c + n - 1) // max_len if n else first
        assert got[doc_id] == (src, n, first, c % max_len, last - first + 1)
        cum[src] = c + n


@st.composite
def seg_corpus(draw):
    # small vocab maximizes segment collisions across docs
    words = st.sampled_from(["a", "b", "c"])
    doc = st.lists(words, min_size=0, max_size=9).map(" ".join)
    return draw(st.lists(doc, min_size=1, max_size=6))


@given(seg_corpus())
@settings(**_SETTINGS)
def test_segment_dedup_matches_python_model(spark, texts):
    from flink_psl_spark.llm import segment_dedup

    seg_tokens = 2
    df = spark.createDataFrame(
        [(i, "s", t) for i, t in enumerate(texts)],
        "doc_id long, source string, text string",
    )
    got = {
        r["doc_id"]: (r["n_segments"], r["n_kept"], r["clean_text"])
        for r in segment_dedup(df, segment_tokens=seg_tokens).collect()
    }
    # python replica: keep-first by (doc_id, seg_no) corpus-wide
    seen: set = set()
    for i, t in enumerate(texts):
        w = t.split()
        segs = [
            " ".join(w[s : s + seg_tokens])
            for s in range(0, len(w), seg_tokens)
        ]
        kept = []
        for seg in segs:
            if seg not in seen:
                seen.add(seg)
                kept.append(seg)
        assert got[i] == (len(segs), len(kept), " ".join(kept)), (i, texts)


def _brute_dips(vals: list[float]):
    """Scan-replay of PATTERN (DOWN{2,} UP) with iterative DEFINEs
    (DOWN strictly below its previous row, UP above DOWN's first row),
    SKIP PAST LAST ROW — the reference model for the iterative-condition
    NFA path."""
    out, i, n = [], 0, len(vals)
    while i < n:
        j = i + 1
        while j < n and vals[j] < vals[j - 1]:
            j += 1
        # DOWN block = vals[i..j-1] (>= 2 rows), UP = vals[j] > vals[i]
        if j - i >= 2 and j < n and vals[j] > vals[i]:
            out.append((i, j - i, vals[i], vals[j - 1], vals[j]))
            i = j + 1
        else:
            i += 1
    return out


@given(st.lists(st.integers(0, 6), min_size=1, max_size=14))
@settings(**_SETTINGS)
def test_iterative_conditions_match_brute_force(spark, raw):
    """Engine NFA with cross-variable/self-history DEFINEs agrees with a
    sequential scan replay on arbitrary integer-valued sequences
    (plateaus, repeats, and single-row descents included)."""
    from flink_psl_spark.cep import Measure, Step, match_recognize

    vals = [float(v) for v in raw]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)],
        "k string, i long, v double",
    )
    down = Step.at_least("DOWN", "true", 2).where_history(
        lambda get, first, last: last("DOWN", "v", 1) is None
        or get("v") < last("DOWN", "v", 1),
        ["v"],
    )
    up = Step.once("UP", "true").where_history(
        lambda get, first, last: (
            first("DOWN", "v") is not None and get("v") > first("DOWN", "v")
        ),
        ["v"],
    )
    out = match_recognize(
        df, "k", "i",
        [down, up],
        [
            Measure("fi", "DOWN", "first", "i"),
            Measure("nd", "DOWN", "count"),
            Measure("peak", "DOWN", "first", "v"),
            Measure("bottom", "DOWN", "last", "v"),
            Measure("upv", "UP", "first", "v"),
        ],
    )
    got = sorted(
        (r["fi"], r["nd"], r["peak"], r["bottom"], r["upv"])
        for r in out.collect()
    )
    assert got == sorted(_brute_dips(vals))


@st.composite
def cep_stream_case(draw):
    """A value sequence + a random arrival-order permutation split into
    1-4 files (so the streaming matcher sees out-of-order, cross-batch
    arrivals of the SAME event-time sequence the batch matcher scans)."""
    vals = draw(st.lists(st.integers(0, 6), min_size=3, max_size=10))
    order = draw(st.permutations(list(range(len(vals)))))
    n_files = draw(st.integers(1, min(4, len(vals))))
    return vals, order, n_files


@given(cep_stream_case())
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_streaming_cep_iterative_defines_match_batch(spark, case):
    """Batch vs streaming MATCH_RECOGNIZE parity for ITERATIVE conditions
    (cross-variable FIRST/LAST history refs in DEFINE) under arbitrary
    arrival permutations and batch splits — exercises the frontier
    deferral of greedy blocks (streaming/cep_stream.py) against the batch
    NFA, which the brute-force test above already pins to ground truth.

    Sentinels make finalization total: two trailing -1e9 rows can never
    bind UP (UP requires v > first(DOWN)), so every legitimate match ends
    strictly before a finalized row and must emit."""
    import tempfile as _tf

    from flink_psl_spark.cep import Measure, Step, match_recognize
    from flink_psl_spark.streaming import run_to_memory_table
    from flink_psl_spark.streaming.cep_stream import streaming_match_recognize

    vals, order, n_files = case
    rows = [
        ("k", i, float(v), BASE + dt.timedelta(minutes=i))
        for i, v in enumerate(vals)
    ]
    # sentinels: one UP-able high row, then two un-bindable floor rows
    # whose arrival finalizes everything before them
    rows += [
        ("k", 500, 1e9, BASE + dt.timedelta(minutes=500)),
        ("k", 1000, -1e9, BASE + dt.timedelta(minutes=1000)),
        ("k", 1500, -1e9, BASE + dt.timedelta(minutes=1500)),
    ]
    schema = "k string, i long, v double, ts timestamp"

    def pattern():
        down = Step.at_least("DOWN", "true", 2).where_history(
            lambda get, first, last: last("DOWN", "v", 1) is None
            or get("v") < last("DOWN", "v", 1),
            ["v"],
        )
        up = Step.once("UP", "true").where_history(
            lambda get, first, last: (
                first("DOWN", "v") is not None
                and get("v") > first("DOWN", "v")
            ),
            ["v"],
        )
        return [down, up]

    measures = [
        Measure("fi", "DOWN", "first", "i"),
        Measure("nd", "DOWN", "count"),
        Measure("bottom", "DOWN", "last", "v"),
        Measure("upv", "UP", "first", "v"),
    ]

    batch = match_recognize(
        spark.createDataFrame(rows, schema), "k", "i", pattern(), measures
    )
    want = sorted(
        (r["fi"], r["nd"], r["bottom"], r["upv"]) for r in batch.collect()
    )

    # stream the main rows in the drawn permutation across n_files files,
    # then the sentinels in time order (they close the watermark)
    main = [rows[j] for j in order]
    step = max(1, -(-len(main) // n_files))
    files = [main[o:o + step] for o in range(0, len(main), step)]
    files += [[rows[-3]], [rows[-2]], [rows[-1]]]
    d = _tf.mkdtemp(prefix="fps_cepprop_")
    for chunk in files:
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "append"
        ).parquet(f"{d}/src")
    st_df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/src")
    )
    out = streaming_match_recognize(
        st_df, "k", "ts", pattern(), measures,
        delay="60 minutes", tiebreak_col="i",
    )
    mem = run_to_memory_table(out, output_mode="append")
    got = sorted(
        (r["fi"], r["nd"], r["bottom"], r["upv"]) for r in mem.collect()
    )
    assert got == want


@st.composite
def dsir_corpus(draw):
    word = st.sampled_from(["ab", "cd", "ef", "gh", "ij"])
    doc = st.lists(word, min_size=0, max_size=6).map(" ".join)
    docs = draw(st.lists(doc, min_size=2, max_size=10))
    flags = draw(
        st.lists(st.booleans(), min_size=len(docs), max_size=len(docs))
    )
    return list(zip(range(len(docs)), docs, flags))


@given(dsir_corpus(), st.integers(4, 32))
@settings(**_SETTINGS)
def test_importance_resample_matches_python_model(spark, rows, n_buckets):
    """The distributed DSIR scorer agrees exactly with a single-process
    transcription of the same recipe (md5 bucketing, add-1 smoothing,
    1e-6-quantized log-ratios, integer score sums, (score desc, id asc)
    ranking) — including all-target / all-raw / empty-text corners."""
    import hashlib
    import math as m

    from flink_psl_spark.llm import importance_resample

    def buckets(text):
        toks = text.split() if text.strip() else []
        grams = toks + [
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        ]
        return [
            int(hashlib.md5(g.encode()).hexdigest()[:6], 16) % n_buckets
            for g in grams
        ]

    tc: dict[int, int] = {}
    rc: dict[int, int] = {}
    for _, text, is_t in rows:
        for b in buckets(text):
            (tc if is_t else rc)[b] = (tc if is_t else rc).get(b, 0) + 1
    t_tot, r_tot = sum(tc.values()), sum(rc.values())
    lr = {
        b: round(
            (
                m.log(tc.get(b, 0) + 1.0)
                - m.log(t_tot + n_buckets)
                - m.log(rc.get(b, 0) + 1.0)
                + m.log(r_tot + n_buckets)
            )
            * 1e6
        )
        for b in set(tc) | set(rc)
    }
    scores = {}
    for i, text, is_t in rows:
        if is_t:
            continue
        bs = buckets(text)
        if bs:
            scores[i] = (sum(lr[b] for b in bs), len(bs))
    want = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:5]

    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    got = importance_resample(
        df, df["is_t"], n_buckets=n_buckets, k=5
    ).collect()
    assert [
        (r["doc_id"], round(r["logweight"] * 1e6), r["n_feats"], r["rank"])
        for r in sorted(got, key=lambda r: r["rank"])
    ] == [
        (i, s, n, rk + 1) for rk, (i, (s, n)) in enumerate(want)
    ]


@st.composite
def session_case(draw):
    # minute offsets with duplicates allowed; random file split
    mins = draw(st.lists(st.integers(0, 60), min_size=1, max_size=14))
    n_files = draw(st.integers(1, 3))
    order = draw(st.permutations(list(range(len(mins)))))
    return mins, order, n_files


@given(session_case())
@settings(**_SETTINGS)
def test_timer_session_agg_matches_model(spark, case):
    """Timer-driven sessions equal a pure-python gap-split model over the
    watermark-finalized prefix, for arbitrary event times, duplicates,
    arrival permutations, and batch splits."""
    import tempfile as _tf

    from flink_psl_spark.streaming import run_to_memory_table, timer_session_agg

    mins, order, n_files = case
    GAP_MIN = 10
    rows = [
        ("k", BASE + dt.timedelta(minutes=m), float(i)) for i, m in enumerate(mins)
    ]
    # sentinel far ahead finalizes everything (wm = max ts - delay)
    sentinel_min = max(mins) + 120
    rows_with_sentinel = rows + [
        ("z", BASE + dt.timedelta(minutes=sentinel_min), 0.0)
    ]

    # python model: sort by (ts, v), gap-split
    sess, out = [], []
    for ts, v in sorted((r[1], r[2]) for r in rows):
        if sess and (ts - sess[-1][0]) < dt.timedelta(minutes=GAP_MIN):
            sess.append((ts, v))
        else:
            if sess:
                out.append(sess)
            sess = [(ts, v)]
    if sess:
        out.append(sess)

    main = [rows_with_sentinel[j] for j in order]
    step = max(1, -(-len(main) // n_files))
    files = [main[o:o + step] for o in range(0, len(main), step)]
    files.append([rows_with_sentinel[-1]])  # sentinel last
    d = _tf.mkdtemp(prefix="fps_tsprop_")
    for chunk in files:
        spark.createDataFrame(
            chunk, "k string, ts timestamp, v double"
        ).coalesce(1).write.mode("append").parquet(f"{d}/src")
    st_df = spark.readStream.schema(
        "k string, ts timestamp, v double"
    ).parquet(f"{d}/src")
    # delay = 130 min covers the worst-case arrival disorder (the
    # sentinel may be read before late rows across file batches: nothing
    # may drop as late); the final watermark is still max ts - delay,
    # which the model's keep-filter mirrors
    DELAY_MIN = 130
    out_df = timer_session_agg(
        st_df, "k", "ts", "v", gap="10 minutes", delay=f"{DELAY_MIN} minutes"
    )
    got = sorted(
        (r["session_start"], r["session_end"], r["n"], r["total"])
        for r in run_to_memory_table(out_df, output_mode="append").collect()
        if r["k"] == "k"
    )
    wm = BASE + dt.timedelta(minutes=sentinel_min - DELAY_MIN)
    want = sorted(
        (
            s[0][0],
            s[-1][0] + dt.timedelta(minutes=GAP_MIN),
            len(s),
            sum(v for _, v in s),
        )
        for s in out
        if s[-1][0] + dt.timedelta(minutes=GAP_MIN) <= wm
    )
    assert got == want


@given(
    st.lists(
        st.lists(
            st.floats(-4, 4, allow_nan=False, width=32),
            min_size=3, max_size=3,
        ),
        min_size=2, max_size=10,
    ),
    st.integers(1, 4),
)
@settings(**_SETTINGS)
def test_cosine_topk_blas_parity_random(spark, vecs, k):
    """expr vs BLAS cosine top-k on arbitrary vectors (including
    zero-norm rows): identical neighbor ids and ranks, dot products equal
    to float tolerance."""
    from flink_psl_spark.llm import cosine_topk

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where("vec_id < 2")
    a = cosine_topk(df, q, k=k).collect()
    b = cosine_topk(df, q, k=k, method="blas").collect()
    ka = sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in a)
    kb = sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in b)
    # both paths order by (sim desc, id asc) and drop NULL/zero-norm
    # rows, so triples must agree unless two DISTINCT sims collide within
    # the paths' different summation orders; tolerate only that case by
    # falling back to a per-rank sim comparison
    if ka != kb:
        ra = sorted(
            (r["query_id"], r["rank"], round(r["cos_sim"], 5)) for r in a
        )
        rb = sorted(
            (r["query_id"], r["rank"], round(r["cos_sim"], 5)) for r in b
        )
        assert ra == rb


# ---------------------------------------------------------------------------
# Bloom filter kernel (llm/text.py _bloom_build): membership invariants —
# pure numpy, no Spark per example
# ---------------------------------------------------------------------------


def _bloom_member(bits, m, k, hashes):
    import numpy as np

    if not len(hashes):
        return np.zeros(0, dtype=bool)
    h1 = np.asarray(hashes, dtype=np.int64).astype(np.uint64)
    h2 = (h1 * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    member = np.ones(len(h1), dtype=bool)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
        member &= (
            bits[pos >> np.uint64(3)]
            >> (pos & np.uint64(7)).astype(np.uint8)
        ) & np.uint8(1) > 0
    return member


@settings(max_examples=100, deadline=None)
@given(
    items=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        max_size=200,
        unique=True,
    ),
    probes=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        max_size=200,
        unique=True,
    ),
    fpp=st.sampled_from([0.5, 0.1, 0.01]),
)
def test_bloom_kernel_no_false_negatives(items, probes, fpp):
    """Every inserted hash MUST test positive (the tier-1 guarantee the
    two-tier decontamination correctness proof rests on); non-members may
    false-positive but at fpp=0.01 the observed rate over the random
    probe set stays far below certainty (sanity bound 50%)."""
    from flink_psl_spark.llm.text import _bloom_build

    bits, m, k = _bloom_build(items, fpp)
    assert _bloom_member(bits, m, k, items).all()
    outsiders = [p for p in probes if p not in set(items)]
    if fpp == 0.01 and len(outsiders) >= 50:
        fp = _bloom_member(bits, m, k, outsiders).sum()
        assert fp / len(outsiders) < 0.5


# ---------------------------------------------------------------------------
# BFD packing vs pure-python model
# ---------------------------------------------------------------------------


def _bfd_model(docs, max_len):
    """(id, tokens) -> {id: bin}, best-fit-decreasing, ties to lowest bin."""
    fills = []
    out = {}
    for did, t in sorted(docs, key=lambda x: (-x[1], x[0])):
        if t > max_len:
            out[did] = len(fills)
            fills.append(t)
            continue
        best, best_fill = -1, -1
        for bi, f in enumerate(fills):
            if f + t <= max_len and f > best_fill:
                best, best_fill = bi, f
        if best < 0:
            best = len(fills)
            fills.append(0)
        fills[best] += t
        out[did] = best
    return out


@settings(**_SETTINGS)
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=25),
    max_len=st.integers(min_value=5, max_value=40),
)
def test_bfd_packing_matches_python_model(spark, sizes, max_len):
    """Spark BFD packing (one shard, one sub-shard) must assign exactly
    the bins of the sequential python model."""
    from flink_psl_spark.llm.chunking import pack_sequences_bfd

    rows = [("s", i, " ".join(["w"] * n)) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "source string, doc_id bigint, text string")
    got = {
        r["doc_id"]: r["bin_id"]
        for r in pack_sequences_bfd(df, max_len=max_len, n_sub_shards=1).collect()
    }
    assert got == _bfd_model(list(enumerate(sizes)), max_len)


# ---------------------------------------------------------------------------
# snapshot_diff vs a pure-python dict model (operators/changelog.py)
# ---------------------------------------------------------------------------


@st.composite
def snapshot_pair(draw):
    """Two keyed images over a small key space with NULL-able values —
    nulls exercise the null-safe struct compare on both sides."""
    vals = st.one_of(st.none(), st.integers(0, 3))
    image = st.dictionaries(st.integers(0, 9), vals, max_size=8)
    return draw(image), draw(image)


@given(snapshot_pair())
@settings(**_SETTINGS)
def test_snapshot_diff_matches_dict_model(spark, pair):
    from flink_psl_spark.operators.changelog import snapshot_diff

    old_d, new_d = pair

    def frame(d):
        rows = [(k, v) for k, v in d.items()]
        return (
            spark.createDataFrame(rows, "k int, v int")
            if rows
            else spark.createDataFrame([], "k int, v int")
        )

    out = {
        r["k"]: (r["v"], r["__op"])
        for r in snapshot_diff(frame(old_d), frame(new_d), "k").collect()
    }

    expect = {}
    for k in old_d.keys() | new_d.keys():
        if k not in old_d:
            expect[k] = (new_d[k], "I")
        elif k not in new_d:
            expect[k] = (old_d[k], "D")  # before-image
        elif old_d[k] != new_d[k]:
            expect[k] = (new_d[k], "U")  # after-image
    assert out == expect


@given(doc_corpus())
@settings(**_SETTINGS)
def test_kneser_ney_matches_python_model(spark, rows):
    """kneser_ney_scores vs a pure-python interpolated-KN model: same
    bigram counts and quantized log-prob sums for arbitrary corpora."""
    import math

    from flink_psl_spark.llm.text import kneser_ney_scores

    df = spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in kneser_ney_scores(df).collect()
    }
    per_doc, bgs = {}, []
    for doc_id, _, text in rows:
        ws = text.split()
        doc_bg = [(ws[i], ws[i + 1]) for i in range(len(ws) - 1)]
        per_doc[doc_id] = doc_bg
        bgs.extend(doc_bg)
    c12: dict = {}
    c1: dict = {}
    n1f: dict = {}
    n1b: dict = {}
    for a, b in bgs:
        c12[(a, b)] = c12.get((a, b), 0) + 1
        c1[a] = c1.get(a, 0) + 1
    for a, b in set(bgs):
        n1f[a] = n1f.get(a, 0) + 1
        n1b[b] = n1b.get(b, 0) + 1
    t = float(len(set(bgs)))
    d = 0.75
    for doc_id, doc_bg in per_doc.items():
        if not doc_bg:
            assert got[doc_id] == (0, None)
            continue
        s = 0
        for a, b in doc_bg:
            p = (
                max(c12[(a, b)] - d, 0.0) / c1[a]
                + d * n1f[a] / c1[a] * (n1b[b] / t)
            )
            s += round(math.log(p) * 1e6)
        n, avg = got[doc_id]
        assert n == len(doc_bg)
        assert abs(avg - s / n / 1e6) < 1e-6


@given(snapshot_pair())
@settings(**_SETTINGS)
def test_retract_algebra_reconciles_aggregates(spark, pair):
    """The RowKind retract algebra (RowKind.java:25 -U/+U pairs): for ANY
    pair of images, agg(new) == agg(old) + agg(sign-weighted retract
    rows) for every distributive aggregate — the invariant that lets
    incremental_agg_retract_apply advance aggregates without recompute."""
    from flink_psl_spark.operators.changelog import retract_rows

    old_d, new_d = pair

    def frame(d):
        rows = [(k, v) for k, v in d.items()]
        return (
            spark.createDataFrame(rows, "k int, v int")
            if rows
            else spark.createDataFrame([], "k int, v int")
        )

    deltas = retract_rows(frame(old_d), frame(new_d), "k").collect()
    # pure-python ledger: sum and count advance by the signed rows
    def s(d):
        return sum(v for v in d.values() if v is not None)
    def c(d):
        return sum(1 for v in d.values() if v is not None)
    d_sum = sum(r["__sign"] * (r["v"] or 0) for r in deltas)
    d_cnt = sum(r["__sign"] for r in deltas if r["v"] is not None)
    assert s(old_d) + d_sum == s(new_d)
    assert c(old_d) + d_cnt == c(new_d)
    # and every update materializes as a -1/+1 pair on the same key
    by_key: dict[int, list[int]] = {}
    for r in deltas:
        by_key.setdefault(r["k"], []).append(r["__sign"])
    for k, signs in by_key.items():
        in_old, in_new = k in old_d, k in new_d
        if in_old and in_new:
            assert sorted(signs) == [-1, 1]  # update-before / update-after
        else:
            assert signs == [1] if not in_old else signs == [-1]


@given(snapshot_pair())
@settings(**_SETTINGS)
def test_snapshot_diff_apply_roundtrip(spark, pair):
    """Applying a snapshot_diff changelog onto the old image through
    changelog_normalize reproduces the new image exactly — the CDC
    bootstrap contract (derive a changelog from dumps, then upsert)."""
    import pyspark.sql.functions as F

    from flink_psl_spark.operators.changelog import (
        changelog_normalize,
        snapshot_diff,
        to_changelog,
    )

    old_d, new_d = pair

    def frame(d):
        rows = [(k, v) for k, v in d.items()]
        return (
            spark.createDataFrame(rows, "k int, v int")
            if rows
            else spark.createDataFrame([], "k int, v int")
        )

    old, new = frame(old_d), frame(new_d)
    diff = snapshot_diff(old, new, "k")
    # replay: baseline image at version 0, changelog rows at version 1
    log = (
        to_changelog(old).withColumn("ver", F.lit(0))
        .unionByName(diff.withColumn("ver", F.lit(1)))
    )
    applied = {
        r["k"]: r["v"]
        for r in changelog_normalize(log, "k", ["ver"]).drop("ver").collect()
    }
    assert applied == new_d


@st.composite
def scd2_events(draw):
    """Per-key I/U/D event sequences at strictly increasing times."""
    n = draw(st.integers(1, 10))
    events = []
    alive: set[str] = set()
    for t in range(n):
        key = draw(st.sampled_from(["a", "b"]))
        if key in alive:
            op = draw(st.sampled_from(["U", "D"]))
            if op == "D":
                alive.discard(key)
        else:
            op = "I"
            alive.add(key)
        events.append((key, t, draw(st.integers(0, 5)), op))
    return events


@given(scd2_events())
@settings(**_SETTINGS)
def test_scd2_history_versions_partition_time(spark, events):
    """SCD2 invariants for any event sequence: per key, versions are
    non-overlapping and contiguous ([valid_from, valid_to) chains), a D
    closes without opening, and exactly the keys whose last event is not
    D have one open (is_current) version."""
    from flink_psl_spark.operators.changelog import scd2_history

    df = spark.createDataFrame(
        [(k, BASE + dt.timedelta(minutes=t), v, op) for k, t, v, op in events],
        "k string, ts timestamp, v int, __op string",
    )
    hist = scd2_history(df, "k", "ts").collect()
    by_key: dict[str, list] = {}
    for r in hist:
        by_key.setdefault(r["k"], []).append(r)
    last_op = {}
    for k, t, v, op in events:
        last_op[k] = op
    for k, rows in by_key.items():
        rows.sort(key=lambda r: r["valid_from"])
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] is not None and a["valid_to"] <= b["valid_from"]
        open_rows = [r for r in rows if r["valid_to"] is None]
        if last_op[k] == "D":
            assert open_rows == []
        else:
            assert len(open_rows) == 1 and open_rows[0]["is_current"]
    # every non-D event opens exactly one version
    expected_versions = sum(1 for _, _, _, op in events if op != "D")
    assert len(hist) == expected_versions


# ---------------------------------------------------------------------------
# cross-engine tokenization contract (Java regex vs DuckDB/RE2)
# ---------------------------------------------------------------------------
# Java \s is [ \t\n\x0B\f\r]; RE2 \s is [ \t\n\f\r] — they disagree on \x0B
# (vertical tab), which made llm_bfd_packing's corpus-exact total_tokens the
# round-8 red row. Both tokenize() (llm/text.py) and the shared oracle _TOKS
# (queries/llm_queries.py) are now pinned to the explicit common-subset class
# [ \t\n\f\r]; these tests prove the two engines agree token-for-token on
# every whitespace the pin must survive: \x0B, NBSP, Unicode spaces,
# line/paragraph separators, zero-width space, ideographic space.

_EXOTIC_WS = [
    " ", "\t", "\n", "\r", "\f",
    "\x0b",      # vertical tab — the Java-vs-RE2 divergence
    "\xa0",      # NBSP (neither engine splits: ASCII-only \s in both)
    " ",    # em space
    " ",    # line separator
    "　",    # ideographic space
    "​",    # zero-width space
]

_ws_texts = st.lists(
    st.text(
        alphabet=st.sampled_from(list("abXY9.") + _EXOTIC_WS),
        min_size=0,
        max_size=24,
    ),
    min_size=1,
    max_size=16,
)


def _duck_token_counts(texts):
    import duckdb
    import pandas as pd

    from flink_psl_spark.queries.llm_queries import _TOKS

    con = duckdb.connect()
    docs = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    )
    con.register("documents", docs)
    rows = con.sql(
        f"SELECT doc_id, LEN({_TOKS}) AS n FROM documents ORDER BY doc_id"
    ).fetchall()
    con.close()
    return [int(n) for _, n in rows]


def _spark_token_counts(spark, texts):
    from flink_psl_spark.llm.text import token_count

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    rows = (
        df.select("doc_id", token_count("text").alias("n"))
        .orderBy("doc_id")
        .collect()
    )
    return [int(r["n"]) for r in rows]


def test_tokenization_contract_vertical_tab_probe(spark):
    """The exact round-8 divergence: a \\x0B inside a token must not split
    in either engine (pre-pin: Spark said 5 tokens, DuckDB said 4)."""
    texts = [
        "alpha beta\x0bgamma delta epsilon",
        "\x0b",
        " \x0b ",
        "a\x0b\x0bb c",
        "tab\tmix\x0bend",
    ]
    assert _spark_token_counts(spark, texts) == _duck_token_counts(texts)


@given(_ws_texts)
@settings(**_SETTINGS)
def test_tokenization_contract_property(spark, texts):
    """Spark token_count == DuckDB LEN(_TOKS) on arbitrary mixes of words
    and exotic whitespace — the invariant every token-count oracle rests on."""
    assert _spark_token_counts(spark, texts) == _duck_token_counts(texts)


def _duck_token_arrays(texts):
    import duckdb
    import pandas as pd

    from flink_psl_spark.queries.llm_queries import _TOKS

    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    rows = con.sql(
        f"SELECT doc_id, {_TOKS} AS w FROM documents ORDER BY doc_id"
    ).fetchall()
    con.close()
    return [list(w) for _, w in rows]


def _spark_token_arrays(spark, texts):
    from flink_psl_spark.llm.text import tokenize

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    rows = (
        df.select("doc_id", tokenize("text").alias("w"))
        .orderBy("doc_id")
        .collect()
    )
    return [list(r["w"]) for r in rows]


@given(_ws_texts)
@settings(**_SETTINGS)
def test_tokenization_contract_full_arrays(spark, texts):
    """Stronger than counts: the token ARRAYS must be identical — every
    n-gram, shingle and segment oracle consumes the tokens themselves."""
    assert _spark_token_arrays(spark, texts) == _duck_token_arrays(texts)


_BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\f\r]"


def test_bpe_ish_contract_exotic_whitespace(spark):
    """The second shared tokenizer (bpe_ish_token_count vs the
    REGEXP_EXTRACT_ALL oracles at llm_queries n_pieces sites): piece
    LISTS must agree cross-engine, including on \\x0B — which is now a
    piece in BOTH engines (it is outside the pinned whitespace class)."""
    import duckdb
    import pandas as pd

    from pyspark.sql import functions as F

    texts = [
        "hello world42!",
        "a\x0bb",          # \x0B is a (weird) punctuation piece, not a split
        "tab\tsep 9.5%",
        "\xa0nbsp\xa0",     # NBSP pieces survive on both sides
        "",
        "mixedCASE123...",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got_spark = [
        list(r["p"])
        for r in df.select(
            "doc_id",
            F.regexp_extract_all(
                "text", F.lit(_BPE_PATTERN), F.lit(0)
            ).alias("p"),
        )
        .orderBy("doc_id")
        .collect()
    ]
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got_duck = [
        list(w)
        for _, w in con.sql(
            "SELECT doc_id, REGEXP_EXTRACT_ALL(text, "
            "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\f\\r]') AS p "
            "FROM documents ORDER BY doc_id"
        ).fetchall()
    ]
    con.close()
    assert got_spark == got_duck


# ---------------------------------------------------------------------------
# PII-scrub chain contract (Java regex vs RE2) — same discipline as the
# tokenization pin: the three patterns live in the documented common
# subset; this proves the CHAIN (ordering included) replays identically.
# ---------------------------------------------------------------------------

_PII_FRAGMENTS = [
    "plain words here",
    "user.name+tag@sub.example.co",
    "bad@@double.at",
    "10.0.300.5",          # out-of-range octet — still the \d{1,3} shape
    "1.2.3.4",
    "255.255.255.255.255",  # 5 octets — boundary behavior
    "+1-555-0100 433",
    "12345678901",
    "+-+-",
    "a_b@c.de",             # 2-char TLD boundary
    "x@y.z",                # 1-char TLD — must NOT match {2,}
    "19.9.9.9rock",         # trailing word chars defeat \b
    " 7.7.7.7 ",
    "tel:081-2345-6789",
    "\x0bemail@vt.example\x0b",  # exotic whitespace around PII
]

_pii_texts = st.lists(
    st.lists(st.sampled_from(_PII_FRAGMENTS), min_size=0, max_size=6).map(
        " ".join
    ),
    min_size=1,
    max_size=12,
)


def _spark_scrub(spark, texts):
    from pyspark.sql import functions as F

    from flink_psl_spark.llm.text import pii_counts, scrub_pii

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    counts = pii_counts(F.col("text"))
    rows = (
        df.select(
            "doc_id",
            counts["email"].alias("e"),
            counts["ipv4"].alias("i"),
            counts["phone"].alias("p"),
            scrub_pii(F.col("text")).alias("s"),
        )
        .orderBy("doc_id")
        .collect()
    )
    return [(r["e"], r["i"], r["p"], r["s"]) for r in rows]


def _duck_scrub(texts):
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register(
        "docs", pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    ip = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    phone = r"\+?\d[\d\- ]{7,}\d"
    rows = con.sql(
        f"""
        SELECT doc_id,
               LEN(REGEXP_EXTRACT_ALL(text, '{email}')) AS e,
               LEN(REGEXP_EXTRACT_ALL(text, '{ip}')) AS i,
               LEN(REGEXP_EXTRACT_ALL(text, '{phone}')) AS p,
               REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(text,
                 '{email}', '<EMAIL>', 'g'),
                 '{ip}', '<IP>', 'g'),
                 '{phone}', '<PHONE>', 'g') AS s
        FROM docs ORDER BY doc_id
        """
    ).fetchall()
    con.close()
    return [(int(e), int(i), int(p), s) for _, e, i, p, s in rows]


@given(_pii_texts)
@settings(**_SETTINGS)
def test_pii_scrub_contract_property(spark, texts):
    """Counts AND scrubbed text agree cross-engine over adversarial PII
    shapes (boundary TLDs, 5-octet runs, \\b-defeating suffixes, exotic
    whitespace) — the llm_pii_scrub oracle's standing assumption."""
    assert _spark_scrub(spark, texts) == _duck_scrub(texts)
