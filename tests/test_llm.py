"""LLM-pipeline operator tests: sketch exactness vs brute force, recall,
plumbing shape (SURVEY §7 M5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base + " today"),  # near dup of 1
        (4, "completely different text about spark sql engines and scale"),
        (5, "another unrelated document mentioning embeddings and vectors here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    from flink_psl_spark.llm import exact_dedup

    out = exact_dedup(docs)
    got = {(r["doc_id"], r["dup_count"]) for r in out.collect()}
    assert (1, 2) in got  # docs 1+2 collapse, min id survives
    assert len(got) == 4


def test_minhash_near_dup(spark, docs):
    from flink_psl_spark.llm import minhash_dedup, ngram_jaccard_pairs

    # brute-force truth: pairs with 3-shingle jaccard >= 0.5
    truth = {
        (r["a"], r["b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert (1, 2) in truth and (1, 3) in truth

    survivors = {
        r["doc_id"]
        for r in minhash_dedup(docs, threshold=0.5).select("doc_id").collect()
    }
    # 2 and 3 are near-dups of 1 → dropped; 1, 4, 5 survive
    assert survivors == {1, 4, 5}


def test_simhash_dedup(spark, docs):
    from flink_psl_spark.llm import simhash_dedup
    from flink_psl_spark.llm.dedup import hamming64, simhash

    fps = docs.select("doc_id", simhash("text").alias("fp")).collect()
    fp = {r["doc_id"]: r["fp"] for r in fps}
    assert fp[1] == fp[2]  # identical text → identical fingerprint

    survivors = {
        r["doc_id"] for r in simhash_dedup(docs).select("doc_id").collect()
    }
    assert 2 not in survivors  # exact dup always within any hamming budget
    assert {4, 5} <= survivors

    df = docs.sparkSession.createDataFrame([(0b1011, 0b0010)], "a long, b long")
    assert df.select(hamming64(F.col("a"), F.col("b")).alias("h")).first()["h"] == 2


def test_cosine_topk_exact(spark):
    from flink_psl_spark.llm import cosine_topk

    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),   # closest to 1
        (3, [0.0, 1.0]),   # orthogonal to 1
        (4, [-1.0, 0.0]),  # opposite
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cosine_topk(emb, emb.where(F.col("vec_id") == 1), k=3)
    ranked = [r["neighbor_id"] for r in out.orderBy("rank").collect()]
    assert ranked == [2, 3, 4]


def test_lsh_recall(spark, t):
    """Multi-table LSH must recover most of the exact top-5 on the fixture."""
    from flink_psl_spark.llm import cosine_topk, lsh_cosine_topk

    emb = t["embeddings"]
    queries = emb.where(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_cosine_topk(emb, queries, k=5, n_planes=4, n_tables=16).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"LSH recall too low: {recall}"


def test_ivf_recall(spark, t):
    from flink_psl_spark.llm import cosine_topk
    from flink_psl_spark.llm.similarity import ivf_cosine_topk

    emb = t["embeddings"]
    queries = emb.where(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_cosine_topk(
            emb, queries, k=5, n_centroids=8, n_probe=5
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_rolling_fingerprints(spark):
    from flink_psl_spark.llm.text import rolling_fingerprints

    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river"),
        (2, "the quick brown fox jumps over the lazy dog near the river"),
        (3, "THE  quick brown fox jumps over the lazy dog near the river"),
        (4, "a completely different sentence with other words entirely here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {
        r["doc_id"]: tuple(r["fp"])
        for r in df.select(
            "doc_id", rolling_fingerprints("text").alias("fp")
        ).collect()
    }
    assert fps[1] == fps[2]  # identical text → identical sketch
    assert fps[1] == fps[3]  # whitespace/case-normalized → identical
    # partial-overlap robustness: shared substrings → overlapping sketches
    overlap_same = len(set(fps[1]) & set(fps[4]))
    assert overlap_same < len(set(fps[1]))
    assert len(fps[1]) == 8


def test_language_id(spark, t):
    """The fixture's ``lang`` label is synthetic (text is English-ish words
    for every label), so accuracy is asserted on real-language sentences;
    the fixture run only checks the operator executes over real data."""
    from flink_psl_spark.llm import language_id

    samples = [
        ("en", "the cat sat on the mat and it was not a problem for this dog"),
        ("fr", "le chat est dans la maison et les enfants sont pour une surprise"),
        ("de", "der hund ist nicht in dem haus und die katze ist mit den kindern"),
        ("es", "el perro es de la casa y los gatos son para una fiesta en que"),
        ("und", "zzz qqq xxx yyy www vvv uuu ttt sss rrr"),
    ]
    df = spark.createDataFrame(samples, "lang string, text string")
    rows = df.select("lang", language_id("text").alias("pred")).collect()
    assert all(r["lang"] == r["pred"] for r in rows), rows

    n = (
        t["documents"]
        .select(language_id("text").alias("pred"))
        .groupBy("pred")
        .count()
        .count()
    )
    assert n >= 1


def test_text_features(spark):
    from flink_psl_spark.llm.text import (
        bpe_ish_token_count,
        mean_word_length,
        quality_score,
        token_count,
    )

    df = spark.createDataFrame(
        [("hello world, this is fine",), ("",)], "text string"
    )
    rows = df.select(
        token_count("text").alias("tc"),
        bpe_ish_token_count("text").alias("bc"),
        mean_word_length("text").alias("mwl"),
        quality_score("text").alias("q"),
    ).collect()
    assert rows[0]["tc"] == 5
    assert rows[0]["bc"] == 6  # comma splits out as its own piece
    assert rows[1]["tc"] == 0 and rows[1]["mwl"] == 0.0
    assert 0.0 <= rows[0]["q"] <= 1.0


def test_multimodal_plumbing(spark, t):
    from flink_psl_spark.llm.multimodal import (
        FEATURE_SCHEMA,
        extract_features,
        sample_frames,
        synthetic_media,
    )

    media = synthetic_media(spark, t["documents"].limit(20))
    feats = extract_features(media)
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r["feature"]) == 8 for r in rows)
    assert all(r["n_bytes"] > 0 and r["sha"] is not None for r in rows)

    vids = synthetic_media(spark, t["documents"].limit(2), media_type="video")
    fr = sample_frames(vids, every_n=10)
    assert fr.columns == ["media_id", "frame_idx"]
    assert fr.count() > 0


def test_scrub_pii_and_counts(spark):
    from pyspark.sql import functions as F

    from flink_psl_spark.llm.text import pii_counts, scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "server 192.168.0.1 answered"),
            (3, "call +1-555-123 4567 today"),
            (4, "clean text with no identifiers"),
        ],
        "id long, t string",
    )
    out = df.select(
        "id",
        scrub_pii(F.col("t")).alias("s"),
        *[v.alias(k) for k, v in pii_counts(F.col("t")).items()],
    )
    got = {r["id"]: r for r in out.collect()}
    assert got[1]["s"] == "mail <EMAIL> now" and got[1]["email"] == 1
    assert got[2]["s"] == "server <IP> answered" and got[2]["ipv4"] == 1
    assert got[3]["s"] == "call <PHONE> today" and got[3]["phone"] == 1
    assert got[4]["s"] == "clean text with no identifiers"
    assert got[4]["email"] == got[4]["ipv4"] == got[4]["phone"] == 0


def test_benchmark_contamination(spark):
    from flink_psl_spark.llm.text import benchmark_contamination

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),   # shares a 5-gram
            (2, "one two three four five six"),           # clean
            (3, "alpha beta gamma delta epsilon"),        # exact 5-gram hit
            (4, "too short"),                             # < n tokens
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "prefix alpha beta gamma delta epsilon suffix")],
        "doc_id long, text string",
    )
    out = benchmark_contamination(docs, bench, n=5)
    got = {r["doc_id"]: (r["n_hits"], r["contaminated"]) for r in out.collect()}
    assert got[1] == (1, True)
    assert got[2] == (0, False)
    assert got[3] == (1, True)
    assert got[4] == (0, False)
    # scale shape: the benchmark gram set is broadcast, never shuffled
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_decode_image_fallback_deterministic(spark):
    """Without PIL the decode is the deterministic fake; with PIL a junk
    payload also falls back. Either way: stable uint8 H×W×3 output."""
    import numpy as np

    from flink_psl_spark.llm.multimodal import decode_image, fake_decode_image

    a = decode_image(b"\x89PNG-not-really-an-image")
    b = decode_image(b"\x89PNG-not-really-an-image")
    assert a.dtype == np.uint8 and a.ndim == 3 and a.shape[2] == 3
    assert np.array_equal(a, b)
    # metadata-shaped fake decode tiles payload bytes exactly
    img = fake_decode_image(b"\x01\x02\x03\x04", width=2, height=2)
    assert img.shape == (2, 2, 3)
    assert img.flatten().tolist() == [1, 2, 3, 4, 1, 2, 3, 4, 1, 2, 3, 4]


def _encode_png(px, color_type, filter_type=0):
    """Stdlib PNG writer (spec chunks + chosen per-row filter) for tests."""
    import struct
    import zlib

    import numpy as np

    h, w, c = px.shape
    flat = px.reshape(h, w * c).astype(np.int16)

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body)
        )

    lines = bytearray()
    prev = np.zeros(w * c, dtype=np.int16)
    for y in range(h):
        row = flat[y]
        if filter_type == 0:
            enc = row
        elif filter_type == 1:  # Sub
            left = np.concatenate([np.zeros(c, dtype=np.int16), row[:-c]])
            enc = row - left
        elif filter_type == 2:  # Up
            enc = row - prev
        elif filter_type == 3:  # Average
            left = np.concatenate([np.zeros(c, dtype=np.int16), row[:-c]])
            enc = row - ((left + prev) >> 1)
        else:  # Paeth
            left = np.concatenate([np.zeros(c, dtype=np.int16), row[:-c]])
            upleft = np.concatenate([np.zeros(c, dtype=np.int16), prev[:-c]])
            p = left + prev - upleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = row - pred
        lines.append(filter_type)
        lines += (enc & 0xFF).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def test_decode_png_real_pixels_all_filters():
    """The stdlib PNG decode branch reproduces exact pixels for every
    filter type and color type (public PNG spec vectors built in-test)."""
    import numpy as np

    from flink_psl_spark.llm.multimodal import decode_image, decode_png

    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, size=(5, 4, 3), dtype=np.uint8)
    for f in range(5):
        payload = _encode_png(rgb, color_type=2, filter_type=f)
        assert np.array_equal(decode_png(payload), rgb), f"filter {f}"
    # greyscale replicates to RGB; RGBA drops alpha
    grey = rng.randint(0, 256, size=(3, 6, 1), dtype=np.uint8)
    out = decode_png(_encode_png(grey, color_type=0))
    assert np.array_equal(out, np.repeat(grey, 3, axis=2))
    rgba = rng.randint(0, 256, size=(4, 4, 4), dtype=np.uint8)
    out = decode_png(_encode_png(rgba, color_type=6, filter_type=4))
    assert np.array_equal(out, rgba[:, :, :3])
    # decode_image dispatches PNG payloads to the real decoder (PIL or the
    # stdlib path) — never the byte-tiling fake
    assert np.array_equal(decode_image(_encode_png(rgb, 2, 1)), rgb)


def test_decode_resize_stats_on_real_png(spark):
    """The Spark decode pipeline over an actual PNG payload produces stats
    from the REAL pixels (non-fake branch end-to-end)."""
    import numpy as np

    from flink_psl_spark.llm.multimodal import (
        decode_resize_stats,
        resize_image,
    )

    rng = np.random.RandomState(11)
    rgb = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    payload = _encode_png(rgb, color_type=2, filter_type=2)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), None)],
        "media_id long, media_type string, payload binary, "
        "meta map<string,string>",
    )
    row = decode_resize_stats(media, out_w=8, out_h=8).collect()[0]
    small = resize_image(rgb, 8, 8)
    means = small.reshape(-1, 3).mean(axis=0)
    assert np.allclose([row["mean_r"], row["mean_g"], row["mean_b"]], means)


def test_resize_image_nearest_neighbor():
    import numpy as np

    from flink_psl_spark.llm.multimodal import resize_image

    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    half = resize_image(img, 2, 2)
    assert half.shape == (2, 2, 3)
    assert np.array_equal(half, img[[0, 2]][:, [0, 2]])
    up = resize_image(half, 4, 4)
    assert up.shape == (4, 4, 3)


def test_decode_resize_stats_pipeline(spark, t):
    """decode → resize → stats via mapInPandas matches a driver-side numpy
    recompute on the same payloads."""
    import hashlib

    import numpy as np

    from flink_psl_spark.llm.multimodal import (
        decode_image,
        decode_resize_stats,
        resize_image,
        synthetic_media,
    )

    docs = t["documents"].limit(10)
    media = synthetic_media(spark, docs)
    got = {r["media_id"]: r for r in decode_resize_stats(media, out_w=8, out_h=8).collect()}
    for row in docs.collect():
        payload = row["text"].encode()
        small = resize_image(decode_image(payload), 8, 8)
        means = small.reshape(-1, 3).mean(axis=0)
        g = got[row["doc_id"]]
        assert (g["width"], g["height"], g["n_px"]) == (8, 8, 8 * 8 * 3)
        assert g["payload_sha"] == hashlib.sha256(payload).hexdigest()
        assert np.allclose([g["mean_r"], g["mean_g"], g["mean_b"]], means)


def test_sample_frame_payloads_reconstructs(spark, t):
    """Codec-free frame extraction: fixed-stride byte windows reproduce the
    payload slices exactly (expression-only, no Python)."""
    from flink_psl_spark.llm.multimodal import sample_frame_payloads, synthetic_media

    docs = t["documents"].limit(5)
    vids = synthetic_media(spark, docs, media_type="video")
    frames = sample_frame_payloads(vids, frame_len=16, stride=24).collect()
    payloads = {r["doc_id"]: r["text"].encode() for r in docs.collect()}
    assert frames
    for fr in frames:
        p = payloads[fr["media_id"]]
        off = fr["frame_idx"] * 24
        assert bytes(fr["frame_bytes"]) == p[off : off + 16]


def test_audio_stats(spark, t):
    from flink_psl_spark.llm.multimodal import audio_stats, synthetic_media

    docs = t["documents"].limit(5)
    auds = synthetic_media(spark, docs, media_type="audio")
    got = {r["media_id"]: r for r in audio_stats(auds, sample_rate=8000).collect()}
    for row in docs.collect():
        n = len(row["text"].encode()) // 2
        g = got[row["doc_id"]]
        assert g["n_samples"] == n
        assert g["duration_s"] == round(n / 8000, 6)


def test_deterministic_sampling(spark, t):
    from flink_psl_spark.llm import deterministic_sample, mix_datasets, stratified_sample

    docs = t["documents"]
    s1 = deterministic_sample(docs, 0.3, key_cols=["doc_id"])
    s2 = deterministic_sample(docs, 0.3, key_cols=["doc_id"])
    ids1 = {r["doc_id"] for r in s1.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in s2.select("doc_id").collect()}
    assert ids1 == ids2  # reproducible
    frac = len(ids1) / docs.count()
    assert 0.2 < frac < 0.4, frac
    # monotone: a larger fraction strictly contains a smaller one (same seed)
    ids_half = {
        r["doc_id"]
        for r in deterministic_sample(docs, 0.6, key_cols=["doc_id"])
        .select("doc_id").collect()
    }
    assert ids1 <= ids_half

    strat = stratified_sample(
        docs, "lang", {"en": 1.0, "fr": 0.5}, key_cols=["doc_id"]
    )
    got = {r["lang"]: r["n"] for r in
           strat.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n_en = docs.where(F.col("lang") == "en").count()
    n_fr = docs.where(F.col("lang") == "fr").count()
    assert got.get("en") == n_en  # keep-all stratum intact
    assert 0.25 * n_fr < got.get("fr", 0) < 0.75 * n_fr
    assert set(got) == {"en", "fr"}  # default fraction drops other strata

    mixed = mix_datasets(
        [(docs.where(F.col("lang") == "en"), 1.0),
         (docs.where(F.col("lang") != "en"), 0.25)],
        key_cols=["doc_id"],
    )
    per_src = {r["__mix_source"]: r["n"] for r in
               mixed.groupBy("__mix_source").agg(F.count("*").alias("n")).collect()}
    assert per_src[0] == n_en
    n_rest = docs.where(F.col("lang") != "en").count()
    assert 0.1 * n_rest < per_src.get(1, 0) < 0.45 * n_rest


def test_hll_sketch_accuracy(spark, sf_dir):
    from flink_psl_spark.queries import QUERIES
    from flink_psl_spark.queries.registry import tables

    rows = {r["l_returnflag"]: r for r in
            QUERIES["agg_hll_sketch"](spark, sf_dir).collect()}
    t = tables(spark, sf_dir)
    exact_total = t["lineitem"].select("l_partkey").distinct().count()
    assert rows["ALL"]["exact_parts"] == exact_total
    # the query emits the estimate-accuracy invariant directly (per group
    # AND for the merged union sketch)
    assert all(r["within_5pct"] for r in rows.values())


def test_shingle_dedup_short_docs(spark):
    """Documents shorter than the shingle size must not crash the dedup
    family (Spark's sequence(1,0) counts DOWN into an invalid slice
    start): they get empty shingle sets, never verify as near-dups, and
    survive."""
    from flink_psl_spark.llm import minhash_dedup, simhash_dedup
    from flink_psl_spark.llm.dedup import minhash_signatures

    df = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "one two"),
         (4, "a b c d e"), (5, "a b c d e")],
        "doc_id long, text string",
    )
    sigs = {r["doc_id"]: r["minhash"] for r in minhash_signatures(df).collect()}
    assert sigs[1] == [0] * 64 and sigs[2] == [0] * 64
    assert sigs[4] == sigs[5] != [0] * 64
    kept = sorted(r["doc_id"] for r in minhash_dedup(df).collect())
    assert kept == [1, 2, 3, 4]  # exact dup 5 dropped; short docs survive
    # verified simhash configuration also keeps the short docs
    kept_sh = sorted(
        r["doc_id"]
        for r in simhash_dedup(df, max_hamming=10, verify_threshold=0.8).collect()
    )
    assert kept_sh == [1, 2, 3, 4]


def test_cosine_zero_vector_is_null_not_crash(spark):
    """Zero-norm embeddings must not crash ANN/dedup under ANSI mode:
    cosine is NULL for them, so they NEVER rank (the documented contract,
    enforced identically by the expr and BLAS paths) and never pass a
    similarity threshold."""
    from pyspark.sql import functions as F

    from flink_psl_spark.llm import cosine_topk, embedding_dedup

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.5, 0.5]), (4, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    top = cosine_topk(df, df.where(F.col("vec_id") == 2), k=3).collect()
    ids = [r["neighbor_id"] for r in sorted(top, key=lambda r: r["rank"])]
    assert ids == [4, 3]  # exact match first; zero vec excluded, not padded
    kept = sorted(
        r["vec_id"] for r in embedding_dedup(df, threshold=0.9, exact=True).collect()
    )
    assert kept == [1, 2, 3]  # dup pair (2,4) pruned; zero vec survives


def test_cosine_topk_blas_matches_expr(spark, t):
    """The wide-vector BLAS path (per-partition matmul + local top-k)
    returns the same neighbor sets and ranks as the expression path, with
    dot products equal to float tolerance; the exchange carries only
    partition-local top-k rows."""
    from flink_psl_spark.llm import cosine_topk

    emb = t["embeddings"]
    queries = emb.where("vec_id < 5")
    a = cosine_topk(emb, queries, k=4).collect()
    b = cosine_topk(emb, queries, k=4, method="blas").collect()
    ka = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"]) for r in a}
    kb = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"]) for r in b}
    assert ka.keys() == kb.keys()
    for key in ka:
        assert ka[key][0] == kb[key][0], (key, ka[key], kb[key])
        assert abs(ka[key][1] - kb[key][1]) < 1e-6


def test_cosine_topk_blas_zero_norm_and_empty(spark):
    """Zero-norm corpus rows never rank (the expr path's NULL contract);
    an empty query set yields an empty result frame."""
    from pyspark.sql import functions as F

    from flink_psl_spark.llm import cosine_topk

    rows = [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.9, 0.1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = cosine_topk(df, df.where("vec_id = 1"), k=5, method="blas").collect()
    assert [r["neighbor_id"] for r in got] == [3]
    assert cosine_topk(df, df.where("vec_id = 99"), k=5, method="blas").count() == 0


def test_pq_codebook_and_encode(spark, t):
    """PQ codebook: deterministic hash-sampled training, fixed shapes;
    encoding is one code per subspace within range, zero-norm dropped."""
    import numpy as np

    from flink_psl_spark.llm import pq_encode, pq_train_codebook

    emb = t["embeddings"]
    book = pq_train_codebook(emb, m=8, n_codes=16, sample_size=128)
    book2 = pq_train_codebook(emb, m=8, n_codes=16, sample_size=128)
    assert book.shape == (8, 16, 8)
    assert np.array_equal(book, book2)  # same data -> same codebook

    rows = spark.createDataFrame(
        [(1, [1.0] * 64), (2, [0.0] * 64)],
        "vec_id bigint, embedding array<double>",
    )
    enc = pq_encode(rows, book).collect()
    assert [r["vec_id"] for r in enc] == [1]  # zero-norm dropped
    codes = enc[0]["code"]
    assert len(codes) == 8 and all(0 <= c < 16 for c in codes)

    with pytest.raises(ValueError, match="divisible"):
        pq_train_codebook(emb, m=7, n_codes=16, sample_size=64)


def test_pq_recall_and_exact_rerank(spark, t):
    """PQ ADC + exact re-rank recovers most of the exact top-5, and the
    emitted cos_sim values are the EXACT cosines (re-rank contract):
    every (query, neighbor) shared with the exact result agrees on
    cos_sim to the rounded 6 places."""
    from flink_psl_spark.llm import cosine_topk
    from flink_psl_spark.llm.similarity import pq_cosine_topk

    emb = t["embeddings"]
    queries = emb.where(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in pq_cosine_topk(
            emb, queries, k=5, m=8, n_codes=32, refine=12
        ).collect()
    }
    shared = set(exact) & set(approx)
    recall = len(shared) / len(exact)
    assert recall >= 0.5, f"PQ recall too low: {recall}"
    for key in shared:
        assert exact[key] == approx[key]  # exact re-rank, same rounding


def test_bloom_contamination_matches_exact(spark, t):
    """Two-tier Bloom decontamination must be BIT-identical to the exact
    broadcast-join check (no false negatives by Bloom construction, no
    false positives after the exact verify tier), including at an
    aggressive fpp where tier-1 false positives certainly occur."""
    from flink_psl_spark.llm.text import benchmark_contamination, bloom_contamination

    docs_all = t["documents"]
    docs = docs_all.where(F.col("doc_id") % 7 != 0)
    bench = docs_all.where(F.col("doc_id") % 7 == 0)
    exact = {tuple(r) for r in benchmark_contamination(docs, bench, n=5).collect()}
    for fpp in (0.01, 0.5):
        bloom = {
            tuple(r)
            for r in bloom_contamination(docs, bench, n=5, fpp=fpp).collect()
        }
        assert bloom == exact, f"fpp={fpp}"


def test_bloom_contamination_empty_benchmark(spark, t):
    """Degenerate input: an empty benchmark flags nothing and still
    returns every corpus doc with n_hits=0."""
    from flink_psl_spark.llm.text import bloom_contamination

    docs = t["documents"].where(F.col("doc_id") < 50)
    bench = t["documents"].where(F.col("doc_id") < 0)
    out = bloom_contamination(docs, bench, n=5).collect()
    assert len(out) == docs.count()
    assert all(r["n_hits"] == 0 and not r["contaminated"] for r in out)


def test_cms_heavy_hitters_exact(spark, t):
    """CMS-prefiltered heavy hitters must equal the exact HAVING result,
    including with an aggressively small sketch (large eps) where the
    overestimate fringe is certainly non-empty."""
    from flink_psl_spark.llm.text import cms_heavy_hitters, ngrams

    docs = t["documents"]
    exact = {
        (r["gram"], r["cnt"])
        for r in docs.select(F.explode(ngrams(F.col("text"), 2)).alias("gram"))
        .groupBy("gram").agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= 10).collect()
    }
    for eps in (0.001, 0.05):
        got = {
            (r["gram"], r["cnt"])
            for r in cms_heavy_hitters(
                docs, n=2, threshold=10, eps=eps
            ).collect()
        }
        assert got == exact, f"eps={eps}"


def test_cms_heavy_hitters_empty_and_high_threshold(spark, t):
    """Degenerate paths: a threshold above every count returns an empty
    frame with the right schema; an empty corpus returns empty."""
    from flink_psl_spark.llm.text import cms_heavy_hitters

    docs = t["documents"]
    out = cms_heavy_hitters(docs, n=2, threshold=10**9)
    assert out.columns == ["gram", "cnt"] and out.count() == 0
    empty = cms_heavy_hitters(docs.where("doc_id < 0"), n=2, threshold=1)
    assert empty.count() == 0


def test_heavy_keys_matches_exact_groupby(spark, t):
    """heavy_keys (CMS skew diagnosis) must equal the exact groupBy-count
    HAVING, on a numeric key column (stringified canonical form)."""
    from flink_psl_spark.llm.text import heavy_keys

    ev = t["events"]
    exact = {
        (str(r["user_id"]), r["cnt"])
        for r in ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= 60).collect()
    }
    got = {
        (r["user_id"], r["cnt"])
        for r in heavy_keys(ev, "user_id", threshold=60).collect()
    }
    assert got == exact and len(got) > 0


def test_sq_encode_and_recall(spark, t):
    """SQ8: codes bounded to [-127, 127], zero-norm dropped, dequantized
    search recovers the full exact top-5 on the fixture (int8 error is
    tiny), and emitted cos_sim values are exact (re-rank contract)."""
    from flink_psl_spark.llm import cosine_topk, sq_cosine_topk, sq_encode

    emb = t["embeddings"]
    enc = sq_encode(emb)
    assert set(enc.columns) == {"vec_id", "scale", "code"}
    row = enc.first()
    assert all(-127 <= c <= 127 for c in row["code"]) and row["scale"] > 0
    zero = spark.createDataFrame(
        [(1, [0.0] * 4)], "vec_id bigint, embedding array<double>"
    )
    assert sq_encode(zero).count() == 0

    queries = emb.where(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in sq_cosine_topk(emb, queries, k=5, refine=4).collect()
    }
    assert got == exact


def test_image_dhash_dedup_semantics(spark, t):
    """dHash dedup: identical payloads collapse (same fake decode →
    same hash), survivor is the lowest media_id per group, and the hash
    is invariant to nearest-neighbor rescaling of the image (the
    perceptual property byte hashes lack)."""
    import numpy as np

    from flink_psl_spark.llm.multimodal import (
        dhash_kernel,
        image_dedup,
        resize_image,
        synthetic_media,
    )

    docs = t["documents"].where(F.col("doc_id") < 30)
    dup = docs.where(F.col("doc_id") == 3).withColumn(
        "doc_id", F.lit(9999).cast("bigint")
    )
    media = synthetic_media(spark, docs.unionByName(dup))
    out = image_dedup(media).collect()
    rows = {r["media_id"]: r for r in out}
    # the injected exact duplicate shares doc 3's group; 3 survives
    assert rows[9999]["dhash"] == rows[3]["dhash"]
    assert rows[3]["survivor"] and not rows[9999]["survivor"]
    assert rows[9999]["group_size"] >= 2

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(64, 48, 3), dtype=np.uint8)
    h = dhash_kernel(img)
    assert dhash_kernel(resize_image(img, 96, 128)) == h


def test_image_near_dedup_model_parity(spark, t):
    """image_near_dedup survivors must equal the python model: an image
    is dropped iff some lower-id image's dHash is within max_hamming
    bits (verified over the collected bounded test corpus, including an
    injected exact duplicate)."""
    from flink_psl_spark.llm.multimodal import (
        image_dhash,
        image_near_dedup,
        synthetic_media,
    )

    docs = t["documents"].where(F.col("doc_id") < 80)
    dup = docs.where(F.col("doc_id") == 5).withColumn(
        "doc_id", F.lit(8888).cast("bigint")
    )
    media = synthetic_media(spark, docs.unionByName(dup))
    for max_h in (0, 3):
        hashes = {
            r["media_id"]: r["dhash"] for r in image_dhash(media).collect()
        }
        expect = {
            i
            for i in hashes
            if not any(
                j < i
                and bin((hashes[i] ^ hashes[j]) & ((1 << 64) - 1)).count("1")
                <= max_h
                for j in hashes
            )
        }
        got = {
            r["media_id"]
            for r in image_near_dedup(media, max_hamming=max_h).collect()
        }
        assert got == expect, f"max_hamming={max_h}"
    assert 8888 not in got  # the injected exact duplicate never survives


def test_audio_fingerprint_dedup(spark, t):
    """Audio fingerprint dedup over REAL WAV bytes: identical clips
    collapse, the fingerprint is invariant to volume scaling (energy-
    delta signs), and survivor is the lowest media_id per group."""
    import numpy as np

    from flink_psl_spark.llm.multimodal import (
        audio_dedup,
        audio_fingerprint_kernel,
        encode_wav,
        synthetic_wav_media,
    )

    docs = t["documents"].where(F.col("doc_id") < 40)
    media = synthetic_wav_media(spark, docs)
    dup = media.where(F.col("media_id") == 2).withColumn(
        "media_id", F.lit(7777).cast("bigint")
    )
    out = audio_dedup(media.unionByName(dup)).collect()
    rows = {r["media_id"]: r for r in out}
    assert rows[7777]["afp"] == rows[2]["afp"]
    assert rows[2]["survivor"] and not rows[7777]["survivor"]

    rng = np.random.default_rng(3)
    clip = rng.integers(-800, 800, size=4000).astype(np.int64)
    assert audio_fingerprint_kernel(clip) == audio_fingerprint_kernel(clip * 8)
    assert audio_fingerprint_kernel(np.array([], dtype=np.int64)) == 0
    # encode_wav round-trip feeds the same kernel (real codec path)
    assert isinstance(encode_wav(clip.clip(-1024, 1023).tolist()), bytes)


def test_multimodal_paths_tolerate_malformed_payloads(spark):
    """100 TB robustness contract for the multimodal codecs (r12, the
    multimodal leg of the r11 ANN degenerate-input sweep): a NULL,
    zero-byte, truncated, garbage, or zero-rate-header payload must not
    kill a task on ANY codec path. Audio: malformed clips emit NULL
    stats / NULL fingerprints and are singleton survivors in dedup
    (a NULL fingerprint must never join a dedup group — partitionBy
    groups NULL keys together). Image: every byte string decodes via
    the deterministic fallback, so the pipeline is total already —
    asserted here so a future codec swap keeps the contract."""
    import numpy as np

    from flink_psl_spark.llm.multimodal import (
        audio_dedup,
        audio_fingerprint,
        decode_resize_stats,
        encode_wav,
        image_dedup,
        try_decode_wav,
        wav_stats,
    )

    good = encode_wav([(i * 7) % 512 - 256 for i in range(300)], 8000)
    truncated_header = good[:20]  # cut inside the fmt chunk
    zero_rate = bytearray(good)
    zero_rate[24:28] = b"\x00\x00\x00\x00"  # fmt-chunk sample rate = 0
    payloads = [
        (1, good),
        (2, None),
        (3, b""),
        (4, truncated_header),
        (5, b"not a riff header at all"),
        (6, bytes(zero_rate)),
    ]
    # kernel-level contract first
    assert try_decode_wav(good) is not None
    for _, p in payloads[1:]:
        assert try_decode_wav(p) is None, p
    # a payload cut inside the DATA chunk keeps a valid header — the
    # stdlib reader (like most real decoders) returns the partial
    # samples; the contract is only that it never crashes
    partial = try_decode_wav(good[: len(good) // 2])
    assert partial is not None and 0 < len(partial[2]) < 300

    media = spark.createDataFrame(
        [(i, "audio", p) for i, p in payloads],
        "media_id long, media_type string, payload binary",
    )
    stats = {r["media_id"]: r for r in wav_stats(media).collect()}
    assert len(stats) == 6  # every clip kept, malformed included
    assert stats[1]["n_samples"] == 300 and stats[1]["sample_rate"] == 8000
    for mid in (2, 3, 4, 5, 6):
        assert stats[mid]["n_samples"] is None, mid
        assert stats[mid]["rms"] is None, mid

    fps = {r["media_id"]: r["afp"] for r in audio_fingerprint(media).collect()}
    assert fps[1] is not None
    assert all(fps[m] is None for m in (2, 3, 4, 5, 6))

    dd = {r["media_id"]: r for r in audio_dedup(media).collect()}
    for mid in (2, 3, 4, 5, 6):
        assert dd[mid]["survivor"] is True, mid
        assert dd[mid]["group_size"] == 1, mid
    assert dd[1]["survivor"] is True

    # image paths: same degenerate payloads (plus a truncated PNG) flow
    # through decode → resize → stats and dhash dedup without error
    png_head = b"\x89PNG\r\n\x1a\n" + b"\x00" * 10
    imgs = spark.createDataFrame(
        [(i, "image", p) for i, p in payloads] + [(7, "image", png_head)],
        "media_id long, media_type string, payload binary",
    )
    assert decode_resize_stats(imgs, out_w=4, out_h=4).count() == 7
    assert image_dedup(imgs).count() == 7


def test_video_clip_dedup_jaccard(spark, t):
    """Clip dedup: an injected clip sharing most of a lower-id clip's
    payload (same frames except the tail) is dropped at threshold 0.6;
    unrelated clips survive; survivors equal the python Jaccard model."""
    from flink_psl_spark.llm.multimodal import (
        synthetic_media,
        video_clip_dedup,
        video_frame_hashes,
    )

    docs = t["documents"].where(F.col("doc_id") < 25)
    media = synthetic_media(spark, docs, media_type="video")
    near = (
        media.where(F.col("media_id") == 4)
        .withColumn("media_id", F.lit(6666).cast("bigint"))
        .withColumn(
            "payload",
            F.concat(F.col("payload"), F.encode(F.lit(" tail-change"), "utf-8")),
        )
    )
    allm = media.unionByName(near)
    thr = 0.6
    sets = {}
    for r in video_frame_hashes(allm).collect():
        sets.setdefault(r["media_id"], set()).add(r["frame_hash"])
    expect = {
        i
        for i in sets
        if not any(
            j < i
            and len(sets[i] & sets[j]) / len(sets[i] | sets[j]) >= thr
            for j in sets
        )
    }
    got = {
        r["media_id"]
        for r in video_clip_dedup(allm, jaccard_threshold=thr).collect()
    }
    assert got == expect
    assert 6666 not in got and 4 in got  # near-dup clip dropped, original kept


def test_pack_sequences_bfd_invariants(spark, t):
    """BFD packing: every doc exactly once, no bin over capacity (except
    flagged singleton overflows), deterministic across runs, and at
    least as dense as one-doc-per-bin."""
    from flink_psl_spark.llm.chunking import pack_sequences_bfd

    docs = t["documents"].where(F.col("doc_id") < 120)
    # n_sub_shards=1 so each shard packs as one bin set (the density
    # assertion below needs real packing; the default 64 spreads this
    # tiny fixture too thin to co-pack anything)
    out = pack_sequences_bfd(docs, max_len=64, n_sub_shards=1).collect()
    assert len(out) == docs.count()
    fills: dict = {}
    for r in out:
        key = (r["shard"], r["sub_shard"], r["bin_id"])
        fills.setdefault(key, [0, False])
        fills[key][0] += r["n_tokens"]
        fills[key][1] |= r["overflow"]
        if r["overflow"]:
            assert r["n_tokens"] > 64
    for (fill, has_overflow) in fills.values():
        assert has_overflow or fill <= 64
    n_docs_over = sum(1 for r in out if r["overflow"])
    n_bins = len(fills)
    assert n_bins < len(out) or n_docs_over == len(out)  # denser than 1/bin
    again = pack_sequences_bfd(docs, max_len=64, n_sub_shards=1).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))

    # overflow singleton: a doc longer than max_len sits alone, flagged
    big = spark.createDataFrame(
        [("s", 1, " ".join(["w"] * 100)), ("s", 2, "a b")],
        "source string, doc_id bigint, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in pack_sequences_bfd(big, max_len=10, n_sub_shards=1).collect()
    }
    assert rows[1]["overflow"] and not rows[2]["overflow"]
    assert rows[1]["bin_id"] != rows[2]["bin_id"]


def test_hash_split_properties(spark, t):
    """hash_split: disjoint + exhaustive, roughly proportional, stable
    under corpus growth (existing rows keep their split), and loud on
    bad weights."""
    from flink_psl_spark.llm import hash_split

    docs = t["documents"]
    out = hash_split(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, key_cols=["doc_id"]
    )
    assert out.count() == docs.count()  # exhaustive, one split per row
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    n = docs.count()
    assert 0.7 < counts["train"] / n < 0.9
    # growth stability: the split of doc_id < 100 is identical whether
    # computed over the subset or the full corpus
    sub = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            docs.where(F.col("doc_id") < 100),
            {"train": 0.8, "val": 0.1, "test": 0.1},
            key_cols=["doc_id"],
        ).collect()
    }
    full = {
        r["doc_id"]: r["split"]
        for r in out.where(F.col("doc_id") < 100).collect()
    }
    assert sub == full
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, {"a": 0.5, "b": 0.2}, key_cols=["doc_id"])
    with pytest.raises(ValueError, match="non-empty"):
        hash_split(docs, {}, key_cols=["doc_id"])


def test_embedding_outliers_numpy_parity(spark, t):
    """maha_sq equals the numpy Mahalanobis distance in the PCA subspace
    for every vector, and the exact sum identity Σ maha² = k(n−1) holds."""
    import numpy as np

    from flink_psl_spark.llm import embedding_outliers, pca_fit

    emb = t["embeddings"]
    k = 5
    model = pca_fit(emb, k)
    got = {
        r["vec_id"]: r["maha_sq"]
        for r in embedding_outliers(emb, model=model).collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    W = np.array(model["components"])
    mu = np.array(model["mean"])
    lam = np.array(model["eigenvalues"])
    P = (X - mu) @ W.T / np.sqrt(lam)
    want = (P * P).sum(axis=1)
    for r, w in zip(rows, want):
        assert abs(got[r["vec_id"]] - w) < 1e-8 * max(w, 1.0)
    total = sum(got.values())
    assert abs(total - k * (model["n"] - 1)) < 1e-6 * k * model["n"]


def test_curriculum_schedule_properties(spark, t):
    """Curriculum: phases are contiguous difficulty bands (max score of
    phase p <= min score of phase p+1 modulo ties), near-equal sized,
    descending flips the band order, and the order key is epoch-stable
    (same seed → same key)."""
    from flink_psl_spark.llm import curriculum_schedule

    docs = t["documents"].select("doc_id", "n_chars")
    out = curriculum_schedule(
        docs, "n_chars", id_col="doc_id", n_phases=4,
        bin_col=F.col("n_chars"),
    )
    n = docs.count()
    stats = {
        r["phase"]: r
        for r in out.groupBy("phase")
        .agg(F.count("*").alias("c"), F.min("n_chars").alias("lo"),
             F.max("n_chars").alias("hi"))
        .collect()
    }
    assert sorted(stats) == [1, 2, 3, 4]
    assert all(abs(s["c"] - n / 4) <= 1 for s in stats.values())
    for p in (1, 2, 3):
        assert stats[p]["hi"] <= stats[p + 1]["lo"] or (
            # a tie value may straddle the boundary
            stats[p]["hi"] == stats[p + 1]["lo"]
        )

    flipped = curriculum_schedule(
        docs, "n_chars", id_col="doc_id", n_phases=4, ascending=False,
        bin_col=F.col("n_chars"),
    )
    hard_first = flipped.where(F.col("phase") == 1).agg(
        F.min("n_chars")
    ).first()[0]
    assert hard_first >= stats[4]["lo"]

    # epoch stability: two invocations agree exactly
    a = {r["doc_id"]: r["order_key"] for r in out.collect()}
    b = {
        r["doc_id"]: r["order_key"]
        for r in curriculum_schedule(
            docs, "n_chars", id_col="doc_id", n_phases=4,
            bin_col=F.col("n_chars"),
        ).collect()
    }
    assert a == b


def test_html_extract_heuristics(spark):
    """html_extract: chrome subtrees dropped (even nested/unclosed),
    link-dense blocks pruned at the density threshold, entities decoded,
    whitespace collapsed, malformed HTML degrades gracefully, NULL in →
    NULL out."""
    from flink_psl_spark.llm import html_extract

    cases = [
        # chrome subtree skipped, entities decoded, whitespace collapsed
        (1, "<body><nav>Home  About</nav><p>a &amp; b\n  c</p></body>",
         "a & b c"),
        # nested skip tags: everything inside head/style vanishes
        (2, "<head><title>T</title><style>p{}</style></head><p>keep</p>",
         "keep"),
        # link-dense div pruned; text-dense block with one link kept
        (3, '<div><a href="/">x</a> <a href="/">y</a></div>'
            '<p>real prose with <a href="/">one link</a> inside</p>',
         "real prose with one link inside"),
        # unclosed tags: parser still yields the visible text
        (4, "<p>first<p>second", "first\nsecond"),
        # no markup at all is one block
        (5, "bare text", "bare text"),
        # NULL html
        (6, None, None),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h, _ in cases], "doc_id bigint, html string"
    )
    got = {
        r["doc_id"]: r["text"] for r in html_extract(df).collect()
    }
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)

    # density threshold is configurable: at 1.0 the link menu survives
    lenient = html_extract(
        df.where(F.col("doc_id") == 3), max_link_density=1.0
    ).first()["text"]
    assert lenient.startswith("x y\n")


def test_pca_numpy_parity_and_contracts(spark, t):
    """Distributed PCA equals single-machine numpy PCA on the collected
    fixture (eigenvalues and |projections| to tight tolerance), applies
    the svd_flip sign convention, drops NULL/wrong-dim rows in
    projection, and raises on bad n_components."""
    import numpy as np

    from flink_psl_spark.llm import pca_fit, pca_project

    emb = t["embeddings"]
    model = pca_fit(emb, 3)
    X = np.array(
        [r["embedding"] for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )
    Xc = X - X.mean(axis=0)
    cov = Xc.T @ Xc / (len(X) - 1)
    ev, evec = np.linalg.eigh(cov)
    order = np.argsort(ev)[::-1][:3]
    np.testing.assert_allclose(
        model["eigenvalues"], ev[order], rtol=1e-8, atol=1e-12
    )
    Wn = evec[:, order].T
    flip = np.sign(Wn[np.arange(3), np.abs(Wn).argmax(axis=1)])
    np.testing.assert_allclose(
        np.array(model["components"]), Wn * flip[:, None], rtol=1e-6,
        atol=1e-10,
    )
    assert model["n"] == len(X) and model["dim"] == X.shape[1]
    r = model["explained_ratio"]
    assert all(0 <= x <= 1 for x in r) and r == sorted(r, reverse=True)

    # projection parity on a few ids
    proj = {
        row["vec_id"]: np.array(row["proj"])
        for row in pca_project(emb, model).limit(1000).collect()
    }
    ids = [r["vec_id"] for r in emb.select("vec_id").limit(5).collect()]
    lookup = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.where(F.col("vec_id").isin(ids)).collect()
    }
    Wm = np.array(model["components"])
    mu = np.array(model["mean"])
    for i in ids:
        np.testing.assert_allclose(
            proj[i], (lookup[i] - mu) @ Wm.T, rtol=1e-6, atol=1e-9
        )

    # whitening: every component has unit sample variance
    wp = pca_project(emb, model, whiten=True).select(
        *[F.col("proj")[i].alias(f"c{i}") for i in range(3)]
    )
    wv = wp.agg(*[F.var_samp(f"c{i}").alias(f"v{i}") for i in range(3)]
                ).first()
    for i in range(3):
        assert abs(wv[f"v{i}"] - 1.0) < 1e-6

    # NULL / wrong-dim rows are dropped by projection
    bad = spark.createDataFrame(
        [(9001, None), (9002, [1.0, 2.0])],
        "vec_id bigint, embedding array<double>",
    )
    assert pca_project(bad, model).count() == 0

    with pytest.raises(ValueError, match="n_components"):
        pca_fit(emb, 0)
    with pytest.raises(ValueError, match="n_components"):
        pca_fit(emb, 10_000)


def test_weighted_sample_aes_properties(spark, t):
    """A-ES weighted sampling: python-model parity (ln(u)/w top-k with
    the same md5-derived u), per-group k bound, weight bias (heavier rows
    overrepresented vs a uniform sample), and the non-positive-weight
    exclusion contract."""
    import hashlib
    import math

    from flink_psl_spark.llm import weighted_sample

    docs = t["documents"].select("doc_id", "source", "n_chars")

    # global mode vs a literal python model over the same rows
    rows = docs.collect()

    def model_key(doc_id, w):
        b = int(
            hashlib.md5(f"{doc_id}|42".encode()).hexdigest()[:6], 16
        )
        return round(math.log((b + 1) / 16**6) / w * 1e9)

    expect = sorted(
        ((model_key(r["doc_id"], r["n_chars"]), r["doc_id"]) for r in rows
         if r["n_chars"] and r["n_chars"] > 0),
        key=lambda kv: (-kv[0], kv[1]),
    )[:25]
    got = weighted_sample(docs, 25, "n_chars", key_cols=["doc_id"])
    assert [r["doc_id"] for r in got.orderBy("sample_rank").collect()] == [
        d for _, d in expect
    ]

    # grouped mode: k-bounded per group, rank dense from 1
    per_src = weighted_sample(
        docs, 5, "n_chars", by="source", key_cols=["doc_id"]
    )
    agg = per_src.groupBy("source").agg(
        F.count("*").alias("n"), F.max("sample_rank").alias("mx")
    )
    assert all(r["n"] <= 5 and r["mx"] == r["n"] for r in agg.collect())

    # weight bias: mean weight of the sample exceeds the corpus mean
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = got.agg(F.avg("n_chars")).first()[0]
    assert sample_mean > corpus_mean

    # zero/NULL weights are never sampled
    spiked = docs.withColumn(
        "w0", F.when(F.col("doc_id") % 2 == 0, F.lit(0)).otherwise(
            F.col("n_chars")
        )
    )
    z = weighted_sample(spiked, 50, "w0", key_cols=["doc_id"])
    assert z.where(F.col("doc_id") % 2 == 0).count() == 0

    with pytest.raises(ValueError, match="k must be"):
        weighted_sample(docs, 0, "n_chars", key_cols=["doc_id"])


def test_diversity_sample_quota_and_determinism(spark, t):
    """Cluster-balanced sampling: at most per_cluster rows per cluster,
    every non-empty cluster is represented (quota=1 ⇒ exactly one row
    per distinct routed cluster), selection is deterministic across
    runs, and every emitted row carries its full corpus payload."""
    from pyspark.sql import functions as F

    from flink_psl_spark.llm import diversity_sample

    emb = t["embeddings"].select("vec_id", "embedding", "label")
    out = diversity_sample(
        emb, target_cluster_size=32, per_cluster=3
    ).select("vec_id", "label", "cluster_id")
    per = out.groupBy("cluster_id").count().collect()
    assert per and all(r["count"] <= 3 for r in per)
    # quota=1 keeps exactly one representative per cluster
    one = diversity_sample(emb, target_cluster_size=32, per_cluster=1)
    ids = sorted(r["vec_id"] for r in one.select("vec_id").collect())
    assert len(ids) == one.select("cluster_id").distinct().count()
    # determinism: a rerun picks the identical rows
    rerun = diversity_sample(emb, target_cluster_size=32, per_cluster=1)
    assert sorted(r["vec_id"] for r in rerun.select("vec_id").collect()) == ids
    # the sample is a subset of the corpus with payload intact
    joined = one.join(
        t["embeddings"].select("vec_id", F.col("label").alias("l2")),
        on="vec_id",
    )
    assert joined.where(F.col("label") != F.col("l2")).count() == 0


def test_diversity_sample_plan_is_group_limited(spark, t):
    """The per-cluster quota must compile to WindowGroupLimit (only
    per_cluster rows per cluster survive the exchange) and the centroid
    join must be a broadcast — the two plan properties that make the
    sampler a scan-dominated pass at 100 TB."""
    from flink_psl_spark.llm import diversity_sample

    plan = (
        diversity_sample(
            t["embeddings"].select("vec_id", "embedding", "label"),
            target_cluster_size=32,
            per_cluster=2,
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_tfidf_top_terms_semantics(spark):
    """TF-IDF ranks distinctive terms above ubiquitous ones: a term in
    every document has idf=ln(1)=0 and can never outrank a unique term;
    tf/doc_freq are exact; rank ties break on the term."""
    from flink_psl_spark.llm import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "common alpha alpha"),
            (2, "common beta"),
            (3, "common gamma gamma gamma"),
        ],
        "doc_id int, text string",
    )
    out = tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # every doc's #1 keyword is its unique term, never 'common'
    for d, terms in by_doc.items():
        top = min(terms, key=lambda r: r["rank"])
        assert top["term"] != "common"
        assert top["doc_freq"] == 1
    # 'common' appears in all 3 docs → score_q == 0 (ln(3/3) == 0)
    commons = [r for r in out if r["term"] == "common"]
    assert commons and all(r["score_q"] == 0 for r in commons)
    # doc 1: tf(alpha)=2, doc_freq=1, score floor(2*ln(3)*1e6)
    import math

    alpha = next(r for r in out if r["term"] == "alpha")
    assert alpha["tf"] == 2
    assert alpha["score_q"] == math.floor(2 * math.log(3.0) * 1e6)


def test_vocab_coverage_curve(spark):
    """Coverage is a cumulative share of ALL token occurrences (not just
    the top-V), monotone in rank, and reaches 1.0 only when the
    vocabulary covers the whole corpus."""
    from flink_psl_spark.llm import vocab_coverage

    docs = spark.createDataFrame(
        [(1, "a a a a b b c"), (2, "a b d")],
        "doc_id int, text string",
    )
    rows = {r["rank"]: r for r in vocab_coverage(docs, top_v=3).collect()}
    assert rows[1]["token"] == "a" and rows[1]["n"] == 5
    assert rows[1]["coverage"] == 0.5  # 5 of 10 occurrences
    assert rows[2]["token"] == "b" and rows[2]["cum_n"] == 8
    # top-3 of 4 distinct tokens: coverage stays below 1.0
    assert rows[3]["coverage"] < 1.0
    full = {r["rank"]: r for r in vocab_coverage(docs, top_v=10).collect()}
    assert max(full) == 4 and full[4]["coverage"] == 1.0


def test_cluster_report_cohesion(spark):
    """cluster_report: counts cover the corpus, mean/min are quantized
    ratios in [-1, 1], and a self-centroid member reports sim 1.0 when
    its cluster is exactly itself."""
    from flink_psl_spark.llm import cluster_report

    # 4 vectors, 2 clusters (target size 2): centroids are hash-picked
    rows = [
        (1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [0.1, 0.9]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    rep = cluster_report(df, target_cluster_size=2).collect()
    assert sum(r["n_members"] for r in rep) == 4
    for r in rep:
        assert -1.0 <= r["min_sim"] <= r["mean_sim"] <= 1.0
    # every member routes somewhere; centroid members sit at sim ~1
    top = max(r["mean_sim"] for r in rep)
    assert top > 0.9


def test_duplicate_spans_semantics_and_hash_parity(spark):
    """Shared k-token spans pair the right documents; ubiquitous spans
    (df above the cap) never pair; the hashed scale path returns the
    identical pair set as the string-key oracle path."""
    from flink_psl_spark.llm import duplicate_spans

    quote = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [
            (1, f"intro words {quote} trailing one"),
            (2, f"other start {quote} different end"),
            (3, "completely unrelated text with no shared span at all ok"),
        ]
        # a 4-token span present in EVERY doc → df=12 > cap, never pairs
        + [(10 + i, f"common tail marker here filler{i}") for i in range(9)],
        "doc_id int, text string",
    )
    pairs = duplicate_spans(
        docs, k=8, max_span_df=4, hashed=False
    ).collect()
    assert {(r["a"], r["b"]) for r in pairs} == {(1, 2)}
    # doc 1 and 2 share the 9-token quote → two overlapping 8-shingles
    assert pairs[0]["n_shared"] == 2
    hashed = duplicate_spans(docs, k=8, max_span_df=4, hashed=True).collect()
    assert sorted(map(tuple, hashed)) == sorted(map(tuple, pairs))


def test_remove_duplicate_spans_policy(spark):
    """The owner (lowest id) keeps the span; every other doc loses
    exactly the covered tokens; short docs and unique text pass
    through; a fully-covered doc returns the empty string."""
    from flink_psl_spark.llm import duplicate_spans, remove_duplicate_spans

    quote = "q1 q2 q3 q4 q5 q6 q7 q8"
    docs = spark.createDataFrame(
        [
            (1, f"{quote} suffix stays"),
            (2, f"prefix kept {quote}"),
            (3, quote),          # nothing but the span → empty after cut
            (4, "short doc"),
            (5, "totally unique text with eight distinct tokens here ok"),
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(docs, k=8).collect()
    }
    assert out[1] == f"{quote} suffix stays"  # owner untouched
    assert out[2] == "prefix kept"
    assert out[3] == ""
    assert out[4] == "short doc"
    assert out[5] == "totally unique text with eight distinct tokens here ok"
    # post-condition: the rewrite kills the detection signal
    rewritten = spark.createDataFrame(
        [(k, v) for k, v in out.items()], "doc_id int, text string"
    )
    assert duplicate_spans(rewritten, k=8, hashed=False).count() == 0


def test_mixed_language_report_semantics(spark):
    """A doc switching languages mid-stream flags as mixed; a
    monolingual doc doesn't; all-und chunks give empty langs and
    is_mixed False; empty docs emit no row (no chunks)."""
    from flink_psl_spark.llm.text import mixed_language_report

    en = "the cat is on the mat and it is a good day for the cat"
    fr = "le chat est dans la maison et il est dans le jardin du chat"
    docs = spark.createDataFrame(
        [
            (1, f"{en} {fr}"),
            (2, en),
            (3, "zz xx qq ww rr tt yy uu ii oo pp aa ss dd"),  # und
            (4, ""),
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r
        for r in mixed_language_report(docs, chunk_tokens=14).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["is_mixed"] is True and out[1]["langs"] == "en,fr"
    assert out[2]["is_mixed"] is False and out[2]["langs"] == "en"
    assert out[3]["is_mixed"] is False and out[3]["langs"] == ""


def test_ngram_novelty_and_compression_ratio(spark):
    """Novelty: unique text scores 1.0, a clone pair scores 0.0, short
    docs report 0/0; compression ratio separates repetitive from
    natural text and handles empties."""
    from flink_psl_spark.llm.text import compression_ratio, ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "the clone body is word for word identical here"),
            (3, "the clone body is word for word identical here"),
            (4, "xy"),
        ],
        "doc_id int, text string",
    )
    nov = {r["doc_id"]: r for r in ngram_novelty(docs, n=3).collect()}
    assert nov[1]["novelty"] == 1.0
    assert nov[2]["novelty"] == 0.0 and nov[3]["novelty"] == 0.0
    assert nov[4]["n_grams"] == 0 and nov[4]["novelty"] == 0.0

    rep = "spam " * 200
    nat = (
        "A quiet brown fox wandered across the frozen river at dawn, "
        "pausing to listen for the distant sound of church bells."
    )
    cdocs = spark.createDataFrame(
        [(1, rep), (2, nat), (3, "")], "doc_id int, text string"
    )
    cr = {r["doc_id"]: r["ratio"] for r in compression_ratio(cdocs).collect()}
    assert cr[1] < 0.1 < cr[2] <= 1.1
    assert cr[3] == 0.0


def test_normalize_text_unicode_cases(spark):
    """NFC composes combining accents; curly quotes/dashes/ellipsis
    unify; zero-width and control chars vanish; exotic spaces fold into
    the whitespace collapse; NULL passes through."""
    from flink_psl_spark.llm.text import normalize_text

    decomposed = "Cafe\u0301"           # e + combining acute
    fancy = "\u201Cq\u201D \u2014 a\u2026 x\u200By\u00A0z\x07"
    docs = spark.createDataFrame(
        [(1, decomposed), (2, fancy), (3, "  a   b  "), (4, None)],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r["text"] for r in normalize_text(docs).collect()}
    assert out[1] == "Caf\u00e9"         # single composed codepoint
    assert out[2] == '"q" - a... xy z'
    assert out[3] == "a b"
    assert out[4] is None


def test_bm25_topk_semantics(spark):
    """BM25 agrees with a hand-rolled python model on a small corpus:
    exact integer statistics, quantized scores, ties on doc_id."""
    import math

    from flink_psl_spark.llm import bm25_topk

    corpus = {
        1: "apple banana apple",
        2: "banana cherry",
        3: "apple apple apple durian",
        4: "cherry cherry banana durian",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in corpus.items()], "doc_id int, text string"
    )
    queries = [("qa", "apple durian"), ("qb", "banana")]
    out = bm25_topk(docs, queries, k=3, k1=1.2, b=0.75).collect()

    # python model
    dl = {i: len(t.split()) for i, t in corpus.items()}
    n, sum_dl = len(corpus), sum(dl.values())
    tf = {}
    for i, t in corpus.items():
        for w in t.split():
            tf[(i, w)] = tf.get((i, w), 0) + 1
    df = {}
    for (_i, w) in tf:
        df[w] = df.get(w, 0) + 1

    def score(i, terms):
        s = 0
        for w in set(terms.split()):
            if (i, w) not in tf:
                continue
            idf = math.log(1.0 + (n - df[w] + 0.5) / (df[w] + 0.5))
            t = tf[(i, w)]
            s += math.floor(
                idf * (t * 2.2) / (t + 1.2 * (0.25 + 0.75 * dl[i] * n / sum_dl))
                * 1e6
            )
        return s

    expect = {}
    for qid, qtext in queries:
        ranked = sorted(
            ((score(i, qtext), i) for i in corpus if score(i, qtext) != 0),
            key=lambda p: (-p[0], p[1]),
        )[:3]
        for r, (s, i) in enumerate(ranked, 1):
            expect[(qid, i)] = (s, r)

    got = {(r["qid"], r["doc_id"]): (r["score_q"], r["rank"]) for r in out}
    assert got == expect


def test_assemble_conversations_gap_split(spark):
    """A gap larger than gap_minutes starts a new session; transcripts
    concatenate turns in (ts, event_id) order and cap at max_turns."""
    import datetime as dt

    from flink_psl_spark.llm import assemble_conversations

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, uid, minutes, typ):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid, typ)

    events = spark.createDataFrame(
        [
            ev(1, 7, 0, "a"),
            ev(2, 7, 10, "b"),
            ev(3, 7, 20, "c"),
            ev(4, 7, 120, "d"),   # 100-min gap -> new session
            ev(5, 7, 125, "e"),
            ev(6, 9, 0, "x"),
        ],
        "event_id int, ts timestamp, user_id int, event_type string",
    )
    out = {
        (r["user_id"], r["session_n"]): r
        for r in assemble_conversations(
            events, gap_minutes=30, max_turns=2
        ).collect()
    }
    assert set(out) == {(7, 1), (7, 2), (9, 1)}
    s1 = out[(7, 1)]
    assert s1["n_turns"] == 3
    # max_turns=2 caps the transcript but not n_turns
    assert s1["transcript"] == "a b"
    assert out[(7, 2)]["transcript"] == "d e"
    assert out[(7, 2)]["first_ts"] == t0 + dt.timedelta(minutes=120)
    assert out[(9, 1)]["n_turns"] == 1


def test_online_lsh_pairs_match_batch_across_batches(spark, tmp_path):
    """The drained online candidate-pair set equals the batch LSH pair
    set even when near-dup partners arrive in DIFFERENT micro-batches
    (the bucket roster carries across triggers)."""
    from flink_psl_spark.llm import (
        minhash_lsh_pairs,
        minhash_signatures,
        online_lsh_candidate_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again "
    rows1 = [(1, base * 4), (3, "totally unrelated text about spark plans")]
    rows2 = [(2, base * 4 + "tail"), (4, base * 4)]
    schema = "doc_id bigint, text string"
    for i, rows in enumerate([rows1, rows2]):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(f"{tmp_path}/src")

    st = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp_path}/src")
    )
    pairs = online_lsh_candidate_pairs(st)
    q = (
        pairs.writeStream.format("parquet")
        .option("path", f"{tmp_path}/out")
        .option("checkpointLocation", f"{tmp_path}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["a"], r["b"])
        for r in spark.read.parquet(f"{tmp_path}/out").distinct().collect()
    }

    batch = spark.createDataFrame(rows1 + rows2, schema)
    expect = {
        (r["a"], r["b"])
        for r in minhash_lsh_pairs(
            minhash_signatures(batch)
        ).collect()
    }
    assert got == expect
    # cross-batch partners (1,2), (1,4) must be present
    assert (1, 2) in got and (1, 4) in got


def test_minhash_dedup_keep_best_policy(spark):
    """A duplicate group keeps its highest-quality member (ties to the
    lower id), never the lowest id per se; non-duplicates pass through."""
    from flink_psl_spark.llm import minhash_dedup_keep_best

    base = "alpha beta gamma delta epsilon zeta eta theta " * 8
    docs = spark.createDataFrame(
        [
            (1, base, 10),            # dup group, low quality
            (2, base + "tail", 99),   # dup group, best quality -> kept
            (3, base, 50),
            (9, "completely different text about query planners", 5),
        ],
        "doc_id bigint, text string, n_chars bigint",
    )
    out = minhash_dedup_keep_best(docs, quality_col="n_chars")
    kept = {r["doc_id"] for r in out.collect()}
    assert kept == {2, 9}


def test_cross_corpus_dedup_no_intra_pairs(spark):
    """New docs near-dup of each other but of NO corpus doc all survive
    (no intra-crawl pairing); a new doc near-dup of a corpus doc drops."""
    from flink_psl_spark.llm import cross_corpus_dedup

    dup = "one two three four five six seven eight nine ten " * 6
    other = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6
    schema = "doc_id bigint, text string"
    new = spark.createDataFrame(
        [(3, dup), (6, dup + "x"), (9, other)], schema
    )
    corpus = spark.createDataFrame(
        [(1, other), (2, "unrelated words about physical plans only")], schema
    )
    kept = {r["doc_id"] for r in cross_corpus_dedup(new, corpus).collect()}
    # 3 and 6 duplicate EACH OTHER but no corpus doc -> both survive;
    # 9 duplicates corpus doc 1 -> dropped
    assert kept == {3, 6}


def test_containment_asymmetric(spark):
    """A short doc fully quoted inside a much longer one scores
    containment ~1.0 while its Jaccard is far below the near-dup bar."""
    from flink_psl_spark.llm import ngram_jaccard_pairs, shingle_containment_pairs

    quote = "to be or not to be that is the question " * 2
    page = ("lots of framing prose here " * 20) + quote + (
        "and a long discussion follows " * 20
    )
    docs = spark.createDataFrame(
        [(1, quote), (2, page), (5, "independent text about shuffles")],
        "doc_id bigint, text string",
    )
    out = {
        (r["a"], r["b"]): r["containment"]
        for r in shingle_containment_pairs(
            docs, shingle_n=4, threshold=0.5, df_range=(2, 8)
        ).collect()
    }
    assert (1, 2) in out and out[(1, 2)] >= 0.9
    assert all(a != 5 and b != 5 for a, b in out)
    jac = ngram_jaccard_pairs(docs, shingle_n=4, threshold=0.5).collect()
    assert not [r for r in jac if {r["a"], r["b"]} == {1, 2}]


def test_mmr_rerank_matches_python_model(spark):
    """Distributed MMR equals a straightforward python reference on a
    small corpus: greedy argmax of lam*rel - (1-lam)*max_sim_to_chosen,
    ties to lower id, first pick = exact top-1."""
    import numpy as np

    from flink_psl_spark.llm import mmr_rerank

    rng = np.random.RandomState(7)
    vecs = rng.randn(30, 8).round(3)
    rows = [(i, vecs[i].tolist()) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    q = emb.where(F.col("vec_id") < 3)
    got = {
        (r["query_id"], r["mmr_rank"]): r["neighbor_id"]
        for r in mmr_rerank(emb, q, k=4, pool=10, lam=0.6).collect()
    }

    unit = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    sims = unit @ unit.T
    for qi in range(3):
        rel = sims[qi]
        # candidate pool: top-10 by (rel desc, id asc), self included
        pool = sorted(
            (j for j in range(30) if j != qi),  # include_self=False
            key=lambda j: (-rel[j], j),
        )[:10]
        chosen = []
        while len(chosen) < 4:
            best, best_score = None, None
            for j in pool:
                if j in chosen:
                    continue
                if chosen:
                    s = 0.6 * rel[j] - 0.4 * max(sims[j][c] for c in chosen)
                else:
                    s = rel[j]
                # ties: pool is (rel desc, id asc)-ordered, argmax keeps first
                if best is None or s > best_score + 1e-12:
                    best, best_score = j, s
            chosen.append(best)
        for rank, j in enumerate(chosen, 1):
            assert got[(qi, rank)] == j, (qi, rank, got[(qi, rank)], j)


def test_leakage_safe_split_keeps_clusters_together(spark):
    from flink_psl_spark.llm.sampling import leakage_safe_split

    docs = spark.createDataFrame(
        [(i,) for i in range(60)], "doc_id long"
    )
    # three clusters + singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (20, 21), (21, 22), (22, 23)],
        "a long, b long",
    )
    out = leakage_safe_split(
        docs, pairs, {"train": 0.6, "val": 0.2, "test": 0.2}, seed=7
    )
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(rows) == 60  # exhaustive, singletons included
    for cluster in ([0, 1, 2], [10, 11], [20, 21, 22, 23]):
        assert len({rows[d] for d in cluster}) == 1  # one split per cluster
    assert set(rows.values()) <= {"train", "val", "test"}


def test_kmeans_distributed_matches_reference(spark, t):
    from flink_psl_spark.llm.clustering import kmeans_fit, reference_kmeans

    vecs = t["embeddings"].where(F.col("vec_id") < 300)
    got = kmeans_fit(vecs, 6, iters=3)
    rows = [
        (r["vec_id"], list(r["embedding"]))
        for r in vecs.select("vec_id", "embedding").collect()
    ]
    want = reference_kmeans(rows, 6, iters=3)
    assert got == want  # integer centroids, bit-exact


def test_kmeans_partition_invariance(spark, t):
    from flink_psl_spark.llm.clustering import kmeans_fit

    vecs = t["embeddings"].where(F.col("vec_id") < 200)
    c1 = kmeans_fit(vecs.repartition(1), 4, iters=2)
    c7 = kmeans_fit(vecs.repartition(7), 4, iters=2)
    assert c1 == c7


def test_trainers_degenerate_inputs(spark):
    """Degenerate-input sweep, trainer leg (r12): empty / all-NULL /
    undersized corpora fail FAST with a clear driver-side ValueError
    (pre-r12: NoneType subscripts and np.stack shape crashes inside
    tasks); malformed rows (NULL, null-element → NaN, ragged, non-
    finite) are excluded from fitting with exact distributed/reference
    parity; logreg tolerates empty and all-NULL text outright."""
    import pytest as _pytest

    from flink_psl_spark.llm.classifier import train_logreg_hashed
    from flink_psl_spark.llm.clustering import (
        kmeans_fit,
        pca_fit,
        reference_kmeans,
    )

    schema = "vec_id long, embedding array<double>"
    empty = spark.createDataFrame([], schema)
    allnull = spark.createDataFrame([(1, None), (2, None)], schema)
    tiny = spark.createDataFrame([(1, [1.0, 2.0])], schema)

    with _pytest.raises(ValueError, match="no non-NULL vectors"):
        pca_fit(empty, 1)
    with _pytest.raises(ValueError, match="no non-NULL vectors"):
        pca_fit(allnull, 1)
    with _pytest.raises(ValueError, match="no valid"):
        kmeans_fit(empty, 2, iters=1)
    with _pytest.raises(ValueError, match="no valid"):
        kmeans_fit(allnull, 2, iters=1)
    with _pytest.raises(ValueError, match="k=3 exceeds"):
        kmeans_fit(tiny, 3, iters=1)

    rows = [(1, [1.0, 2.0]), (2, None), (3, [0.5, 1.0]), (4, [3.0]),
            (5, [float("nan"), 1.0]), (6, [2.0, 4.0])]
    mixed = spark.createDataFrame(rows, schema)
    assert kmeans_fit(mixed, 2, iters=2) == reference_kmeans(
        rows, 2, iters=2
    )
    assert pca_fit(mixed, 1)["n"] == 3  # the three clean 2-dim vectors

    doc_schema = "doc_id long, text string, label int"
    w = train_logreg_hashed(
        spark.createDataFrame([], doc_schema), "text", "label",
        dim=8, iters=1,
    )
    assert len(w) == 9
    w = train_logreg_hashed(
        spark.createDataFrame([(1, None, 0), (2, None, 1)], doc_schema),
        "text", "label", dim=8, iters=1,
    )
    assert len(w) == 9


def test_ann_paths_tolerate_malformed_vectors(spark):
    """100 TB robustness contract (r11): one malformed corpus row — NULL,
    ragged, null-element, or NaN-bearing — must not kill a job or
    outrank valid neighbors on ANY ANN path. All six paths (expr, BLAS,
    LSH, IVF, PQ, SQ) must return the same ranking for this corpus: the
    NaN vector is excluded (NaN cosine is normalized to NULL — Spark
    would otherwise sort it FIRST under desc), the NULL/ragged rows are
    unscorable, and valid rows keep ranks 1..k."""
    from flink_psl_spark.llm import (
        cosine_topk,
        lsh_cosine_topk,
        pq_cosine_topk,
        sq_cosine_topk,
    )
    from flink_psl_spark.llm.similarity import ivf_cosine_topk

    schema = "vec_id long, embedding array<double>"
    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.5, 0.2]) for i in range(1, 20)]
        + [(30, None), (31, [1.0]), (32, [float("nan"), 1.0, 0.5, 0.2])],
        schema,
    )
    q = spark.createDataFrame([(100, [1.0, 1.0, 0.5, 0.2])], schema)
    paths = {
        "expr": lambda: cosine_topk(corpus, q, k=3),
        "blas": lambda: cosine_topk(corpus, q, k=3, method="blas"),
        "lsh": lambda: lsh_cosine_topk(corpus, q, k=3, n_planes=2, n_tables=8),
        "ivf": lambda: ivf_cosine_topk(corpus, q, k=3, n_centroids=4, n_probe=4),
        "pq": lambda: pq_cosine_topk(corpus, q, k=3, m=2, n_codes=8),
        "sq": lambda: sq_cosine_topk(corpus, q, k=3),
    }
    want = [(1, 1), (2, 2), (3, 3)]  # (rank, neighbor_id): ids 1,2,3
    for name, fn in paths.items():
        got = sorted((r["rank"], r["neighbor_id"]) for r in fn().collect())
        assert got == want, f"{name}: {got}"

    # degenerate corpora: empty and all-malformed yield empty results
    empty = spark.createDataFrame([], schema)
    allbad = spark.createDataFrame([(1, None), (2, None)], schema)
    for name, fn in {
        "blas_empty": lambda: cosine_topk(empty, q, k=3, method="blas"),
        "ivf_empty": lambda: ivf_cosine_topk(empty, q, k=3),
        "pq_empty": lambda: pq_cosine_topk(empty, q, k=3, m=2, n_codes=4),
        "sq_empty": lambda: sq_cosine_topk(empty, q, k=3),
        "ivf_allbad": lambda: ivf_cosine_topk(allbad, q, k=3),
        "pq_allbad": lambda: pq_cosine_topk(allbad, q, k=3, m=2, n_codes=4),
        "sq_allbad": lambda: sq_cosine_topk(allbad, q, k=3),
        # lsh derived its hyperplane dim via a bare first() until r12 —
        # TypeError on an empty corpus, and first() is nondeterministic
        # so a NULL-leading corpus could crash it too (ADVICE r11)
        "lsh_empty": lambda: lsh_cosine_topk(empty, q, k=3, n_planes=2),
        "lsh_allbad": lambda: lsh_cosine_topk(allbad, q, k=3, n_planes=2),
    }.items():
        assert fn().count() == 0, name


def test_lsh_malformed_rows_generate_no_candidate_pairs(spark):
    """Malformed vectors must bucket to a NULL signature — posexplode
    emits no banded rows, so they create ZERO candidate pairs. The r11
    fallback bucketed every bad row to the all-zero signature in all
    tables, an O(bad^2) candidate-join blowup of NULL-sim pairs on
    many-failed-encodes corpora (ADVICE r11)."""
    import pandas as pd

    from flink_psl_spark.llm.similarity import _hyperplanes, lsh_buckets
    from flink_psl_spark.llm import embedding_dedup

    tables = [_hyperplanes(4, 2, 42 + 1000 * t) for t in range(3)]
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, None), (3, [1.0]),
         (4, [None, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {
        r["vec_id"]: r["b"]
        for r in df.select(
            "vec_id", lsh_buckets("embedding", tables).alias("b")
        ).collect()
    }
    assert rows[1] is not None and len(rows[1]) == 3
    assert rows[2] is None and rows[3] is None and rows[4] is None

    # end-to-end: a corpus that is mostly malformed still dedups the
    # valid twins and keeps every malformed row (never-dropped contract)
    bad = [(100 + i, None) for i in range(50)]
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0, 0.0])] + bad,
        "vec_id long, embedding array<double>",
    )
    out = embedding_dedup(corpus, threshold=0.99, n_planes=2, n_tables=4)
    kept = {r["vec_id"] for r in out.collect()}
    assert 1 in kept and 2 not in kept
    assert all(100 + i in kept for i in range(50))
