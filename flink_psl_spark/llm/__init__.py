"""Large-scale training-data pipeline operators (SURVEY §7 M5).

Beyond the reference's own surface: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard, segment-level with reassembly, corpus-frequency
boilerplate removal, SemDeDup-style semantic dedup over embeddings),
similarity search over embeddings (brute-force cosine top-k, IVF,
LSH-bucketed ANN, hard-negative mining), text analysis (language ID,
quality scoring, a fixed-weight linear quality classifier, token
counting, fingerprinting, bigram-LM fluency, BPE pair statistics,
per-source n-gram analytics, PII scrubbing, benchmark decontamination —
exact broadcast join + two-tier Bloom prefilter),
curation (Gopher repetition filters, chunking, sequence packing,
BPE tokenizer training/encoding, perplexity-bucketed sampling),
sampling/mixing (deterministic, stratified, temperature-scaled,
token-budget-capped via two-pass distributed prefix sum, training-order
shuffle), and multimodal column plumbing.

Everything is built for 100 TB: banded LSH turns the O(n²) pair space into
per-bucket joins, joins are self-equi-joins on band hashes (AQE-skew-safe),
and all text feature extraction is expression-only (whole-stage codegen).
"""

from flink_psl_spark.llm.dedup import (  # noqa: F401
    boilerplate_removal,
    duplicate_spans,
    remove_duplicate_spans,
    segment_dedup,
    exact_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    minhash_dedup,
    simhash,
    simhash_fingerprints,
    simhash_dedup,
    ngram_jaccard_pairs,
    online_lsh_candidate_pairs,
    minhash_dedup_keep_best,
    cross_corpus_dedup,
    shingle_containment_pairs,
)
from flink_psl_spark.llm.clustering import (  # noqa: F401
    connected_components,
    kmeans_fit,
    reference_kmeans,
    dedup_clusters,
    embedding_outliers,
    pca_fit,
    pca_project,
)
from flink_psl_spark.llm.similarity import (  # noqa: F401
    cosine_topk,
    hybrid_rrf_topk,
    embedding_dedup,
    hard_negatives,
    lsh_cosine_topk,
    mmr_rerank,
    pq_cosine_topk,
    pq_encode,
    pq_train_codebook,
    semantic_dedup,
    sq_cosine_topk,
    sq_encode,
)
from flink_psl_spark.llm.sampling import (  # noqa: F401
    cluster_report,
    curriculum_schedule,
    deterministic_sample,
    deterministic_shuffle,
    diversity_sample,
    hash_split,
    distributed_ntile,
    importance_resample,
    leakage_safe_split,
    mix_datasets,
    preference_pairs,
    stratified_sample,
    temperature_mix,
    token_budget_mix,
    weighted_sample,
)
from flink_psl_spark.llm.bpe import (  # noqa: F401
    bpe_encode,
    bpe_train,
    reference_bpe_merges,
    word_counts,
)
from flink_psl_spark.llm.text import (  # noqa: F401
    benchmark_contamination,
    bloom_contamination,
    cms_heavy_hitters,
    heavy_keys,
    tokenize,
    token_count,
    quality_score,
    linear_quality_classifier,
    quality_band,
    language_id,
    fingerprint,
    compression_ratio,
    html_extract,
    mixed_language_report,
    normalize_text,
    ngram_novelty,
    tfidf_top_terms,
    vocab_coverage,
    bm25_topk,
    assemble_conversations,
    sft_loss_mask,
)
from flink_psl_spark.llm.repetition import (  # noqa: F401
    duplicate_segment_fraction,
    duplicate_token_fraction,
    ngram_repetition_stats,
    repetition_filter,
)
from flink_psl_spark.llm.chunking import (  # noqa: F401
    chunk_documents,
    pack_sequences,
    pack_sequences_bfd,
)
from flink_psl_spark.llm.classifier import (  # noqa: F401
    hashed_feature_indices,
    naive_bayes_langid,
    score_logreg_hashed,
    train_logreg_hashed,
)
from flink_psl_spark.llm.unigram import (  # noqa: F401
    reference_unigram_train,
    unigram_encode,
    unigram_train,
)
from flink_psl_spark.llm.wordpiece import (  # noqa: F401
    reference_wordpiece_train,
    wordpiece_alphabet,
    wordpiece_encode,
    wordpiece_train,
)
from flink_psl_spark.llm.sketches import (  # noqa: F401
    kmv_distinct_estimates,
    kmv_hash,
    kmv_merge_batch,
    kmv_overlap,
    kmv_sketch,
    overlap_from_sketches,
    overlap_matrix,
    stream_kmv_sketch,
    stream_space_saving,
)
