"""Example 3 — training-data pipeline: quality filter → dedup → mix → ANN.

Run: python examples/llm_data_pipeline.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from flink_psl_spark import get_spark, register_tables
from flink_psl_spark.llm import (
    cosine_topk,
    exact_dedup,
    minhash_dedup,
    mix_datasets,
    stratified_sample,
)
from flink_psl_spark.llm.text import quality_score, token_count


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    t = register_tables(spark, sf_dir)

    # 1. quality filtering (expression-only, codegen'd)
    docs = t["documents"].withColumn("q", quality_score("text"))
    kept = docs.where((F.col("q") >= 0.5) & (token_count("text") >= 5))
    print("quality filter:", docs.count(), "→", kept.count())

    # 2. near-duplicate removal (MinHash-LSH + exact verify)
    deduped = minhash_dedup(kept, threshold=0.8)
    print("minhash dedup →", deduped.count())
    exact_dedup(kept).select("doc_id", "dup_count").orderBy(
        F.col("dup_count").desc()
    ).show(3)

    # 3. deterministic language-stratified training mix
    mixed = mix_datasets(
        [
            (deduped.where(F.col("lang") == "en"), 1.0),
            (deduped.where(F.col("lang") != "en"), 0.5),
        ],
        key_cols=["doc_id"],
    )
    mixed.groupBy("__mix_source").count().show()
    stratified_sample(
        deduped, "lang", {"en": 1.0, "fr": 0.5}, key_cols=["doc_id"]
    ).groupBy("lang").count().show()

    # 4. similarity search over embeddings (broadcast queries, corpus stays)
    emb = t["embeddings"]
    cosine_topk(emb, emb.where(F.col("vec_id") < 3), k=3).show()

    # 5. benchmark decontamination at scale: Bloom prefilter (no corpus
    # shuffle) + exact verify of candidates — output identical to the
    # exact broadcast-join check
    from flink_psl_spark.llm import bloom_contamination

    bench = t["documents"].where(F.col("doc_id") % 7 == 0)
    corpus = t["documents"].where(F.col("doc_id") % 7 != 0)
    bloom_contamination(corpus, bench, n=5).where("contaminated").show(3)

    # 6. skew workflow: diagnose hot keys with the CMS sketch (no
    # full-cardinality exchange), then spread exactly those keys in the
    # join — cold keys pay nothing
    from flink_psl_spark.llm import heavy_keys
    from flink_psl_spark.operators import salted_join

    ev = t["events"].select("user_id", "event_id")
    hot = heavy_keys(ev, "user_id", threshold=50).select(
        F.col("user_id").cast("bigint").alias("user_id")
    )
    cust = t["customer"].select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    print("salted join rows:",
          salted_join(ev, cust, "user_id", hot_keys=hot,
                      salt_source="event_id").count())

    # 7. compressed ANN: PQ codes (m bytes/vector) + ADC scoring + exact
    # re-rank — the stored-index path for 100 TB embedding tables
    from flink_psl_spark.llm import pq_cosine_topk

    pq_cosine_topk(emb, emb.where(F.col("vec_id") < 3), k=3, m=8,
                   n_codes=16, refine=4).show()


if __name__ == "__main__":
    main(*sys.argv[1:])


def curation_extras(sf_dir: str = "/root/testdata/sf0.001") -> None:
    """Round-2 additions: repetition filtering, chunking, packing, and the
    codec-gated multimodal decode pipeline."""
    from flink_psl_spark.llm.chunking import chunk_documents, pack_sequences
    from flink_psl_spark.llm.multimodal import (
        decode_resize_stats,
        synthetic_media,
    )
    from flink_psl_spark.llm.repetition import repetition_filter

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    t = register_tables(spark, sf_dir)
    docs = t["documents"]

    # 5. Gopher-style repetition filtering (single text scan)
    verdicts = repetition_filter(docs)
    verdicts.groupBy("keep").count().show()

    # 6. overlapping token chunks -> packed training sequences
    chunk_documents(docs, chunk_tokens=64, stride=48).show(3)
    pack_sequences(docs, max_len=512).show(3)

    # 7. image decode -> resize -> channel stats (deterministic fake decode
    # in-container; PIL takes over transparently when installed)
    media = synthetic_media(spark, docs.limit(50))
    decode_resize_stats(media, out_w=32, out_h=32).show(3)


def selection_extras(sf_dir: str = "/root/testdata/sf0.001") -> None:
    """Round-5 additions: DSIR importance resampling and scale-hardened
    semantic dedup (derived cluster count, pair cap, two-level routing)."""
    from flink_psl_spark.llm import importance_resample, semantic_dedup

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    t = register_tables(spark, sf_dir)

    # 7. pick the 50 raw docs most similar to the src0 target distribution
    importance_resample(
        t["documents"], F.col("source") == "src0", n_buckets=512, k=50
    ).show(5)

    # 8. SemDeDup at scale: cluster count follows the corpus, per-cluster
    #    pair work is hard-capped; two_level=True for ~100k-cluster runs
    survivors = semantic_dedup(
        t["embeddings"],
        target_cluster_size=64,
        max_cluster_size=128,
        threshold=0.95,
        two_level=True,
    )
    print("semantic dedup →", survivors.count())


def governance_extras(sf_dir: str = "/root/testdata/sf0.001") -> None:
    """Round-6 additions: gate every table drop behind a declared
    constraint suite, derive a changelog between two corpus snapshots,
    pick a space-covering sample, and report keywords + vocab coverage."""
    from flink_psl_spark.llm import (
        diversity_sample,
        tfidf_top_terms,
        vocab_coverage,
    )
    from flink_psl_spark.operators import (
        foreign_key,
        in_range,
        not_null,
        snapshot_diff,
        unique,
        validate_table,
    )

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    t = register_tables(spark, sf_dir)

    # 9. validation gate before anything downstream trains on the drop:
    #    row checks share one scan; pipeline aborts on any failed check
    report = validate_table(
        t["documents"],
        [
            not_null("text"),
            unique("doc_id"),
            in_range("n_chars", 1, 10_000),
            foreign_key("doc_id", t["documents"], "doc_id"),
        ],
    )
    report.show()
    failed = report.where(~F.col("passed")).count()
    assert failed == 0, "constraint gate failed — stop the pipeline"

    # 10. yesterday's corpus vs today's: what changed, as I/U/D rows —
    #     feed the same MERGE/upsert machinery as the CDC formats
    today = t["documents"].where(F.col("doc_id") % 7 != 0)
    snapshot_diff(t["documents"], today, "doc_id").groupBy("__op").count().show()

    # 11. cluster-balanced selection: one representative per semantic
    #     mode instead of a frequency-biased uniform sample
    diversity_sample(
        t["embeddings"], target_cluster_size=64, per_cluster=1
    ).show(3)

    # 12. corpus reports: per-doc keywords and the vocabulary Zipf curve
    tfidf_top_terms(t["documents"], k=3).show(6)
    vocab_coverage(t["documents"], top_v=20).show(5)


def monitoring_extras(sf_dir: str = "/root/testdata/sf0.001") -> None:
    """Round-6 monitoring + layout + history: PSI drift between
    snapshots, metric anomalies over time, Z-order clustering, SCD2."""
    from flink_psl_spark.operators import (
        detect_metric_anomalies,
        distribution_drift,
        scd2_history,
    )
    from flink_psl_spark.operators.bucketing import zorder_key

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    t = register_tables(spark, sf_dir)

    # 13. did the doc-length distribution shift between corpus halves?
    a = t["documents"].where(F.col("doc_id") % 2 == 0)
    b = t["documents"].where(F.col("doc_id") % 2 == 1)
    drift = distribution_drift(a, b, "n_chars", lo=0, hi=600, n_buckets=12)
    drift.agg((F.sum("psi_q") / 1e9).alias("total_psi")).show()

    # 14. daily event counts, 3-sigma anomalies over a trailing week
    daily = t["events"].groupBy(
        F.col("event_type").alias("metric"),
        F.date_trunc("day", "ts").alias("day"),
    ).agg(F.count("*").alias("value"))
    detect_metric_anomalies(daily, order_col="day", window=7).where(
        F.col("is_anomaly")
    ).show(3)

    # 15. Z-order key for layout: rows close in BOTH dims cluster
    t["events"].select(
        "user_id", "value",
        zorder_key(["user_id", "value"],
                   ranges=[(0, 256), (0, 512)], bits=8).alias("zkey"),
    ).orderBy("zkey").show(3)

    # 16. versioned user dimension from the event changelog
    ch = t["events"].select(
        "user_id", "ts", "value", "event_id",
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U").alias("__op"),
    )
    scd2_history(ch, "user_id", "ts", tiebreak=["event_id"]).where(
        "is_current"
    ).show(3)


def sketch_and_model_extras(sf_dir: str = "/root/testdata/sf0.001") -> None:
    """Final round-6 wave: sketch-based corpus algebra, the in-engine
    trained quality model, the unigram tokenizer, and privacy release."""
    from flink_psl_spark.llm import (
        kmv_overlap,
        score_logreg_hashed,
        train_logreg_hashed,
        unigram_encode,
        unigram_train,
    )
    from flink_psl_spark.llm.dedup import shingles
    from flink_psl_spark.operators.validation import (
        dp_noisy_counts,
        k_anonymize,
        l_diversity_report,
    )

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    t = register_tables(spark, sf_dir)
    docs = t["documents"]

    # 17. how much does today's crawl overlap the corpus? k numbers per
    #     side instead of an exact distinct join over every shingle
    el = docs.select(
        F.when(F.col("doc_id") % 2 == 0, "corpus").otherwise("crawl")
        .alias("side"),
        F.explode(shingles(F.col("text"), 3)).alias("e"),
    )
    kmv_overlap(el, "e", "side", "corpus", "crawl", k=128).show()

    # 18. train the quality/language model IN the engine (reproducible
    #     fixed-point GD), then score the whole corpus with a broadcast
    #     literal — the CCNet/DCLM filtering pattern
    labeled = docs.withColumn("__y", (F.col("lang") == "en").cast("double"))
    w = train_logreg_hashed(labeled, "text", "__y", dim=64, iters=3)
    score_logreg_hashed(docs, "text", w, dim=64).select(
        "doc_id", "lang", F.round("prob", 3).alias("p_en")
    ).show(5)

    # 19. the second canonical subword algorithm: unigram-LM pieces
    vocab = unigram_train(docs, vocab_size=24, iters=2, vocab_limit=50)
    unigram_encode(docs.limit(3), vocab).show(truncate=60)

    # 20. privacy-gated release of the per-(lang, source) doc counts
    cells = docs.select("lang", "source")
    k_anonymize(cells, ["lang", "source"], k=10).show(5)
    l_diversity_report(
        docs.select("lang", "source", "n_chars"), ["lang"], "source", l=2
    ).show(3)
    dp_noisy_counts(cells, ["lang"], epsilon=0.5).show(3)


def posttrain_extras(sf_dir: str = "/root/testdata/sf0.001") -> None:
    """Round-6 closers: KN fluency scoring, the WordPiece tokenizer,
    preference pairs for reward modeling, and SFT loss-mask layout."""
    from flink_psl_spark.llm import (
        preference_pairs,
        sft_loss_mask,
        wordpiece_alphabet,
        wordpiece_encode,
        wordpiece_train,
    )
    from flink_psl_spark.llm.text import kneser_ney_scores, quality_score

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    t = register_tables(spark, sf_dir)
    docs = t["documents"]

    # 21. Kneser-Ney fluency (the KenLM-filter smoothing, in-engine)
    kneser_ney_scores(docs).orderBy("ppl_proxy").show(3)

    # 22. the third canonical subword algorithm: WordPiece pieces
    merges = wordpiece_train(docs, n_merges=8, vocab_limit=50)
    vocab = wordpiece_alphabet(docs) + merges
    wordpiece_encode(docs.limit(3), vocab).show(truncate=60)

    # 23. reward-model pairs: per-source best-vs-worst with a margin gate
    preference_pairs(
        docs, group_col="source", score_col=quality_score("text"),
        k=3, min_margin=0.25,
    ).show(5)

    # 24. SFT mask spans over the chat log — the render stays virtual
    sft_loss_mask(t["events"], gap_minutes=30).show(5)


def release_extras(sf_dir: str = "/root/testdata/sf0.001") -> None:
    """Final round-6 wave: classifier, hybrid retrieval, release card."""
    from flink_psl_spark.llm import (
        hybrid_rrf_topk,
        naive_bayes_langid,
    )

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    t = register_tables(spark, sf_dir)
    docs = t["documents"]

    # 25. counting classifier — train+score is pure relational algebra
    naive_bayes_langid(docs).groupBy("pred").count().show()

    # 26. two-signal retrieval: fuse cosine and 3-gram Jaccard ranks
    hybrid_rrf_topk(docs, t["embeddings"], n_queries=5).show(10)

    # 27. the one-table release card
    from flink_psl_spark.queries import QUERIES  # registry composition
    QUERIES["llm_dataset_card"](spark, sf_dir).show()
