"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The printed line is kept compact (<1.5 KB: headline total + slowest-10
map) because the driver stores only a ~2 KB stdout tail; the full
per-query timing map is written to BENCH_RUN.json next to this file.

BENCH_RUN.json is this session's RAW output. The committed
BENCH_DETAIL.json is the min-merged per-query FLOOR map and is written
ONLY by scripts/bench_floor_merge.py (VERDICT r8 "What's wrong" #1: a
bench run that wrote the raw session doc over the floors doc silently
dropped every floor_canary on the next commit). Flow:

    python bench.py                      # -> BENCH_RUN.json (+ self-triage)
    python scripts/bench_diff.py         # gate: floors vs BENCH_RUN
    python scripts/bench_floor_merge.py  # min-merge -> BENCH_DETAIL.json

Round-11 (VERDICT r10 #4): bench.py adjudicates its own session at
close — any floor-gate flag is re-measured median-of-3 in a fresh JVM
(after this session's spark.stop()) and the ``triage`` block is
stamped into BENCH_RUN.json, so the driver's plain bench run carries
its own verdicts and ``bench_diff.py --triage`` reuses them instead of
requiring a judge-side manual pass.

Each query is executed with a count()-style action (results consumed,
not collected to the driver). Per-query time is the MEDIAN of 3 timed
runs after a warmup pass — round 2 showed a uniform ~1.3x inflation on
untouched map-only queries from single-shot timing in a shared JVM
(GC, JIT recompilation, box noise), which made real plan regressions
invisible; medians isolate them.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datas_spark.registry import QUERIES
from datas_spark.session import get_spark

# Headline set: the flagship selection path + the scale-sensitive
# operator families (dedup joins, window aggs, array math).
HEADLINE = [
    "middle_band_select",
    "band_gather",
    "stride_skew_sample",
    "ifd_score",
    "exact_dedup",
    "minhash_signature",
    "ngram_jaccard_pairs",
    "token_count",
    "quality_score",
    "language_id",
    # round-7: the fifth bench canary (map-only rolling-hash scan)
    "doc_fingerprint",
    "events_window_agg",
    "least_confidence",
    "simhash",
    "ties_merge",
    "cosine_topk",
    "cosine_topk_vec",
    "events_sessionize",
    "order_totals_by_nation",
    "multi_scorer_wide",
    "ngram_contamination",
    "tfidf_top_terms",
    "paragraph_dedup",
    "chunk_documents",
    "events_asof_click",
    "pii_redact",
    # round 3: salted as-of (skew-proof twin), the composed curation
    # recipe, LESS influence through the pandas_udf boundary, LSH ANN,
    # and the skew-resistant stratified sample (en is the dominant
    # stratum at ~44% — the planted-skew bench the de-skew work asks for)
    "events_asof_click_salted",
    "curate_corpus",
    "less_influence",
    "lsh_topk",
    "stratified_sample_skew",
    # classic OLAP shapes over lineitem (the biggest table): scan-agg
    # throughput and the 6-table join-order test
    "pricing_summary",
    "regional_revenue",
    # round-3 families: banded SimHash pair detection and the
    # window-over-aggregate share rollup
    "simhash_near_dup",
    "nation_market_share",
    # round-4 families: the sketch suite (HLL distinct, count-min
    # probes, Bloom shingle decontamination), Z-order cell layout, the
    # skew profiler, and the Q18 pre-aggregated join shape
    "hll_user_count",
    "cms_user_heavy",
    "bloom_decontaminate",
    # round-6: the past-literal-ceiling join backend (m=2^24 broadcast
    # equi-join probe — VERDICT r5 "What's wrong" #1)
    "bloom_decontaminate_join",
    "events_zorder_cells",
    "events_key_skew",
    "large_volume_orders",
    # BPE vocabulary training (12 driver-coordinated rounds over the
    # word-frequency table) and the ordered conversion funnel
    "bpe_learn_merges",
    "events_funnel",
    # curation fate audit, event-sourced SCD2 history, embedding-space
    # decontamination
    "curate_audit",
    # round-6: the recipe consuming the materialize-once near-dup
    # artifacts instead of deriving pairs inline (VERDICT r5 #2)
    "curate_corpus_artifact",
    # round-6: distributed quality-classifier training + its pinned-
    # model inference scan (VERDICT r5 #6)
    "quality_classifier_train",
    "hashed_bow_score_pinned",
    "user_event_history",
    "embedding_decontaminate",
    # CUBE expand pass, fuzzy verify join, incremental rollup merge
    "events_cube",
    "simhash_fuzzy_verified",
    "incremental_daily_rollup",
    # lexical retrieval baseline
    "bm25_topk",
    # sketch applications: join pre-flight and rolling distinct reuse
    "join_size_estimate",
    "hll_rolling_users",
    # Q21 semi/anti choreography, JS drift, gap-fill resampling
    "late_supplier_blame",
    "corpus_term_drift",
    "events_resample_hourly",
    # late round-4 families: Q13 outer-join distribution, hybrid RRF
    # retrieval (BM25 + cosine fused), G² keyness, CUSUM change-point,
    # and the exact label rebalancer
    "customer_order_distribution",
    "hybrid_search_rrf",
    "source_keyness_terms",
    "events_type_changepoint",
    "label_rebalance",
    # final round-4 shapes: gaps-and-islands streaks and the Q16
    # distinct-supplier bracket counts
    "user_activity_streaks",
    "supplier_count_by_part_bracket",
    # sketch-quantile estimate and the Pareto concentration share
    "events_value_hist_quantiles",
    "revenue_concentration",
    # TPC-H completion: Q6 scan-agg and the Q7 bidirectional trade join
    "forecast_revenue_delta",
    "nation_trade_volume",
    # training-set assembly: leakage-safe component split (pairs + CC +
    # hash assignment in one plan) and the int8-quantized ANN path
    "group_safe_split",
    "sq8_topk",
    # asymmetric containment dedup (no size prune — the worst case for
    # the inverted index) and the RFM segmentation aggregate
    "ngram_containment_pairs",
    "customer_rfm_segments",
    # skew-proof generic join (identity-checked), algebraic cluster
    # cohesion, and the declared-vs-detected language audit
    "events_salted_enrich",
    "cluster_cohesion",
    "lang_id_confusion",
    # late round-4 families: DSIR importance weights (token-key join),
    # item-item CF (user-keyed co-occurrence), rank-free composite
    # quality fusion, and the deterministic Poisson bootstrap
    "dsir_importance_weights",
    "item_covisitation_topk",
    "composite_quality_index",
    "bootstrap_mean_ci",
    # batch 54: prefix-filtered exact Jaccard (the index-free scale
    # path next to ngram_jaccard_pairs), linear-cost duplicated-gram
    # coverage, and the two feature encodings
    "jaccard_prefix_pairs",
    "duplicate_ngram_coverage",
    "segment_target_encoding",
    "events_value_robust_scaled",
    # batch 55: sequence-window dataset construction and hash-drawn
    # negative sampling
    "next_event_examples",
    "negative_sample_views",
    # batches 57-58: phash media near-dup, sketch overlap algebra, PSI
    # drift, and multi-touch attribution
    "media_phash_near_dup",
    "hll_type_overlap",
    "events_value_psi",
    "view_linear_attribution",
    # batch 59: evaluation metrics
    "repeat_view_eval",
    "purchase_value_auc",
    # batch 60: quality + privacy gates
    "gopher_quality_flags",
    "customer_l_diversity",
    # batch 61: tokenizer-fit + structure observability
    "oov_rate_by_source",
    "sentence_stats",
    # batch 62: semantic dedup composition
    "embedding_semantic_dedup",
    # batch 63: two-stage retrieval
    "bm25_rerank_proxy",
    # batch 64: composition + ordering analytics
    "attribution_compare",
    "curriculum_order",
    # batch 65: model-eval completions
    "value_lift_table",
    "proxy_calibration_ece",
    # batch 66: merging diagnostics + DARE
    "task_vector_cosine",
    "dare_merge_apply",
    # batch 67: survival analysis
    "churn_survival_curve",
    # batch 68: featurizer
    "user_daily_lag_features",
    # batch 69: graph quality
    "embedding_kcore",
    # batch 70: code-switch screen
    "code_switch_stats",
    # batches 71-72: sketch accuracy, pooling, split backend choice
    "minhash_accuracy_audit",
    "label_mean_embedding",
    "group_safe_split_simhash",
    # batch 73: dedup-tier agreement
    "dedup_method_agreement",
    # batch 74: packing + distribution screens
    "packing_efficiency",
    "source_length_ks",
    # batch 75: eval + AL round
    "lang_prf1",
    "repeat_view_ndcg",
    "active_learning_round",
    # batch 76: incremental CC maintenance
    "incremental_components",
    # batch 77: readability
    "readability_scores",
    # batch 78: chat-to-SFT flattening
    "chat_training_pairs",
    # batch 79: closing analytics
    "label_centroid_distances",
    "component_density",
    "corpus_datacard",
    # batch 80: dedup business case
    "dedup_savings_estimate",
    # round 5: the materialize-once components artifact surfaced as a
    # query (parquet read + one join; the build cost is paid once at
    # ingest — here, the warmup pass)
    "near_dup_components_store",
    # round 5: C4 line cleaning + UniMax allocation + substring spans
    "c4_line_clean",
    "unimax_source_allocation",
    "substring_overlap_spans",
    # round 5: artifact-backed election + histogram + span cut/matrix
    "dedup_keep_best_quality",
    "component_size_histogram",
    "substring_dedup_cut",
    # round-6: corpus-wide span-family election (never double-keeps
    # chained copies — VERDICT r5 #5)
    "substring_dedup_elected",
    "source_copy_matrix",
    # round 5: exact concat-and-chunk pack plan + one-plan mixing
    "pack_chunk_manifest",
    "unimax_mixture_sample",
    "span_cut_savings",
    "chunk_mixing_report",
    "duplicate_mass_by_source",
    # round-6: product-quantization ANN — the compressed-domain ADC scan
    # (8-byte codes instead of 256-byte vectors on the data side)
    "pq_topk",
    "ivfpq_topk",
    # round-6: node-level graph quality, metadata MI, skyline sweep,
    # snake shard balance, the NFC pandas_udf boundary, and recall
    # measurement as a query. (embedding_dbscan is bench-excluded by
    # size — ~10 s of CC rounds at sf0.1; its sf1 ratio is 2.5x, see
    # SF1_SCALING.md round-6 note.)
    "near_dup_clustering_coef",
    "lang_source_mi",
    "part_skyline",
    "balanced_shard_assignment",
    "nfc_normalized_docs",
    "ivf_recall_report",
    # round-6 second wave: depth-3 baskets, ordered sequences, the
    # Matryoshka truncation audit, SNN edge weights, t-closeness
    "event_frequent_triples",
    "event_sequence_pairs",
    "matryoshka_recall",
    "near_dup_snn_edges",
    "customer_t_closeness",
    # round-6 third wave: MOSS winnowing fingerprints + pairing,
    # Adamic-Adar missed-edge audit
    "winnowing_fingerprints",
    "winnowing_near_dup",
    "near_dup_link_prediction",
    # round-6 third wave: blocked entity resolution
    "customer_entity_resolution",
    "knn_shapley_values",
    # round-6 fourth wave: lakehouse CDC (SCD2 build + incremental
    # MERGE + the point-in-time feature join), the data-skipping
    # layout what-if, and the one-pass constraint-suggestion profile
    "scd2_build",
    "scd2_incremental_merge",
    "scd2_pit_enrich",
    "layout_skipping_whatif",
    "documents_constraint_suggestions",
    # round-6 fourth wave: delta-join view maintenance, the watermark
    # lateness audit (two-level running max), encoding-damage rates
    "ivm_join_delta",
    "events_watermark_audit",
    "mojibake_audit",
    # round-6 fifth wave: right-to-erasure component repair and the
    # Hilbert-vs-Z-order skipping measurement
    "components_purge",
    "hilbert_vs_zorder_skipping",
    # round-6 sixth wave: SCD2 folded from periodic snapshots
    # (deletes/reappearances from presence, the no-changelog case)
    # and the nightly one-snapshot MERGE proven == full fold
    "scd2_from_snapshots",
    "scd2_snapshot_merge",
    # analytic LSH band planner (cheap; here so the planning surface
    # stays perf-tracked alongside the banding it tunes)
    "minhash_band_plan",
    # stratified 5-fold CV deal (per-stratum skew-resistant rank)
    "doc_stratified_kfold",
    # round-7: cohort retention matrix, the unigram LM companion, and
    # the DoReMi exponentiated-gradient mixture step (two self-trained
    # LM passes + the tiny-frame update)
    "events_retention_cohorts",
    "unigram_lm_score",
    "doremi_domain_weights",
    # round-7: deterministic JL sketch + its measured recall audit
    "jl_projection",
    "jl_recall_report",
    # round-8: the bucket-cap recall trade (runs capped AND uncapped
    # pair generation in one pass — ~2x the flagship's cost by design)
    "simhash_cap_agreement",
    # round-8: five unrolled DoReMi EG steps (packed 1-row iteration)
    "doremi_weights_k5",
    # round-8: DPO pair construction + exact SCD2 straggler repair
    "preference_pairs",
    "scd2_repair_keys",
    # round-8: CUPED variance-reduced A/B readout (exact-moment algebra)
    # + the SRM gate that must pass before anyone reads it
    "experiment_cuped_readout",
    "experiment_srm_check",
    # round-8 batch 2: post-training readouts (BT arena ratings, pass@k),
    # DiD + MDE experimentation companions, the DP release what-if, and
    # LPA communities on the embcos pair artifact
    "bt_model_ratings",
    "passk_estimate",
    "experiment_did_readout",
    "experiment_power_mde",
    "events_dp_release",
    "near_dup_label_prop",
    # round-8 batch 2b: conformal coverage + group-sequential looks
    "conformal_coverage_audit",
    "experiment_obf_looks",
    # round-8 batch 3: QTE, DSIR ESS audit, tokenizer fertility
    "experiment_qte",
    "dsir_ess_report",
    "tokenizer_fertility",
    # round-8 batch 4: Markov removal-effect attribution, Qini uplift,
    # order-independent content fingerprint
    "events_markov_attribution",
    "experiment_uplift_qini",
    "source_content_fingerprint",
    # round-8 batch 5: treatment-effect heterogeneity (Cochran's Q)
    "experiment_hte_segments",
    # round-8 batch 5b: MDM golden-record survivorship over the ER match tier
    "customer_golden_records",
    # round-8 batch 6: Dirichlet query-likelihood retrieval (the LM scorer)
    "ql_dirichlet_topk",
    # round-8 batch 6b: two-scorer lexical fusion + the Zipf screen
    "lexical_rrf_fusion",
    "vocab_zipf_fit",
    # round-8 batch 6c: whale-resistant trimmed A/B readout
    "experiment_trimmed_readout",
    # round-9: Fisher-weighted model merging (gradient moments through
    # the pandas_udf capture), the Beta-Binomial posterior A/B readout
    # (512-cell deterministic grid), generation-eval n-gram metrics,
    # and the memorization/novelty release gate
    "fisher_weighted_merge",
    "experiment_bayes_readout",
    "corpus_bleu",
    "rouge_n",
    "doc_novelty_rate",
    # round-9 batch 2: generation-eval completion — diversity readouts
    # (distinct-n, corpus-pooled Self-BLEU with the top-2 multi-ref
    # clip) and the tokenization-free chrF
    "distinct_n",
    "self_bleu",
    "chrf_score",
    # round-9 batch 3: Bloom-tier novelty router (sound release
    # certification in front of the exact semi-join) and RM3
    # pseudo-relevance feedback (two-pass weighted QL)
    "doc_novelty_route_bloom",
    "rm3_expanded_topk",
    # round-9 batch 4: Brier-score anatomy and multi-rater agreement
    "brier_decomposition",
    "annotator_alpha",
    # round-10 batch 1: the unrolled-iteration family — deterministic
    # Lloyd KMeans (clustering, learned-quantizer IVF, the flagship),
    # the exact-integer k-center greedy, exact-covariance PCA
    "kmeans_clusters",
    "ivf_topk_learned",
    "datas_full_pipeline",
    "kcenter_sample",
    "pca_embeddings",
    # round-10 batch 2: Evol-Instruct schedule, SLERP merge, the
    # late-interaction (MaxSim) tier, the unigram-LM trainer
    "evol_prompt_schedule",
    "slerp_merge",
    "maxsim_rerank_topk",
    "maxsim_recall_report",
    "unigram_lm_learn",
    "unigram_fertility",
    # round-10 batch 3: semantic dedup over Lloyd clusters + the
    # Self-Instruct ROUGE-L admission gate
    "semdedup",
    "rougeL_novel_instructions",
    # round-10 batch 4: LSH-blocked margin bitext mining
    "bitext_margin_pairs",
    # round-11 batch 1: deterministic GD quality-classifier trainer
    "quality_classifier_train_exact",
    # round-11 batch 2: Lloyd-learned PQ/IVF-PQ codebooks + readouts
    "pq_topk_learned",
    "ivfpq_topk_learned",
    "pq_recall_learned_vs_fixed",
    "pq_distortion_learned_vs_fixed",
    # round-11 batch 3: the semantic-dedup curation stage (auto-k)
    "curate_corpus_semantic",
    "curate_audit_semantic",
    # round-11 batch 4: sampled exact arm for the MaxSim recall report
    "maxsim_recall_sampled",
    # round-11 batch 5: the composed Evol select->evolve->re-score loop
    "evol_active_loop",
    # round-11 batch 6: packing under the learned unigram segmentation
    "pack_sequences_unigram",
    # round-11 batch 7: LSH (bands, rows) index-design planner
    "lsh_plan",
    # round-11 batch 8: Muennighoff data-constrained budget readout
    "data_constrained_mix",
    # round-11 batch 9: BPE-vs-unigram segmentation agreement
    "tokenizer_agreement",
]

RUNS_PER_QUERY = 3

# Canary protocol (round-7, VERDICT r6 "Next round" #1): the bench box
# swings 2-6x per query between runs, which defeats the 1.5x+0.3s
# regression gate. These five map-only scan queries are NEVER to be
# touched by operator work — their plans are frozen (a change to any of
# their source files should also update this comment) — so their total,
# plus a pure-JVM spark.range sum that does no I/O at all, measures the
# BOX, not the code. bench_diff.py divides every new timing by the
# canary ratio (new_canary_total / old_canary_total) before applying
# the gate, making BENCH_DETAIL.json self-normalizing across boxes.
CANARY_QUERIES = [
    "token_count",
    "language_id",
    "simhash",
    "quality_score",
    "doc_fingerprint",
    # round-9 throughput canaries (VERDICT r8 "Next round" #3): the five
    # map-only scan canaries above are 0.1-0.4 s fixed-overhead plans
    # that track session cost, not executor throughput (r7->r8 their
    # total moved 3.5x while the shared 176-query total moved 0.93x).
    # These two ~1.2 s frozen shuffle-heavy plans — the 6-table
    # broadcast-join rollup and the Q18 pre-aggregated join — weight the
    # normalization ratio toward where multi-second queries actually
    # spend time. Plans frozen in tests/canary_plans.json.
    "regional_revenue",
    "large_volume_orders",
]

RANGE_SENTINEL_N = 256_000_000  # fixed work: sum(id % 7) over 256M longs

# The ONLY file bench.py writes. The committed floors doc
# BENCH_DETAIL.json is written exclusively by scripts/bench_floor_merge.py.
RUN_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_RUN.json"
)


def _range_sentinel(spark) -> float:
    """Median-of-3 wall time of a fixed pure-JVM aggregate — zero I/O,
    zero Python, whole-stage codegen only: the cleanest possible probe
    of executor-thread throughput on this box right now."""
    samples = []
    for _ in range(RUNS_PER_QUERY):
        t0 = time.perf_counter()
        spark.range(0, RANGE_SENTINEL_N, 1, 32).selectExpr(
            "sum(id % 7) AS s"
        ).collect()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3)


def self_triage(
    run_doc: dict, run_path: str, run_triage=None, old_doc: dict | None = None
) -> dict | None:
    """Session-close auto-adjudication (VERDICT r10 #4): diff this
    run against the committed floors and, on any gate flag, re-measure
    the flagged queries median-of-3 in a FRESH JVM
    (scripts/bench_triage.py via bench_diff.apply_triage) and stamp
    the ``triage`` block into BENCH_RUN.json — a plain ``python
    bench.py`` session record is then self-adjudicating:
    ``bench_diff.py --triage`` sees the stamped block covering every
    flag and exits without re-measuring. Round 10 still needed a
    judge-side manual triage because the builder's stamp was
    overwritten by the driver's own bench run; running it HERE closes
    that hole.

    ``run_triage`` and ``old_doc`` are injectable for tests. Returns
    the stamped block, or None when the gate is clean — or when
    floors/git are unavailable, because the bench line must print no
    matter what.
    """
    try:
        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts")
        )
        import bench_diff as BD

        if old_doc is None:
            old_doc = BD._load("HEAD")
        res = BD.diff(old_doc, run_doc)
        if not res["fail"]:
            return None
        kwargs = {"run_triage": run_triage} if run_triage is not None else {}
        tri = BD.apply_triage(old_doc, run_doc, res, **kwargs)
        block = {k: v for k, v in tri.items() if not k.startswith("_")}
        run_doc["triage"] = block
        with open(run_path, "w") as fh:
            json.dump(run_doc, fh, indent=1, sort_keys=True)
        return block
    except Exception as e:
        print(f"self-triage skipped: {e!r}", file=sys.stderr)
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("datas-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: run every headline query once at the smallest SF so the
    # timed pass measures steady-state execution (codegen compiled,
    # classes JIT'd, parquet footers cached) — standard JVM bench practice
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in HEADLINE:
            try:
                QUERIES[name](spark, warm_dir).count()
            except Exception:
                pass
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()

    import gc as _gc

    # drift probe (round-8): the box can enter a slow phase MID-session
    # (round-8 rebase: 15 contiguous HEADLINE queries measured 3-14x
    # their fresh-JVM times in one window). One single-shot token_count
    # every DRIFT_EVERY queries records WHEN the box speed moved, so a
    # flagged block can be matched against the phase timeline instead
    # of triaging every query individually. Evidence only — the gate
    # still normalizes by the session-level canary medians.
    DRIFT_EVERY = 20
    drift: list[float] = []

    timings: dict[str, float] = {}
    drift_index: dict[str, int] = {}
    for qi, name in enumerate(HEADLINE):
        if qi % DRIFT_EVERY == 0:
            t0 = time.perf_counter()
            QUERIES["token_count"](spark, sf_dir).count()
            drift.append(round(time.perf_counter() - t0, 3))
        # nearest probe by run position (round-9, VERDICT r8 #2): the
        # probe at drift[qi // DRIFT_EVERY] was taken at the START of
        # this query's block; queries in the back half of a block are
        # closer to the NEXT probe. bench_diff divides each query by
        # the probe nearest it so mid-session box phases normalize out.
        drift_index[name] = round(qi / DRIFT_EVERY)
        fn = QUERIES[name]
        samples = []
        for _ in range(RUNS_PER_QUERY):
            t0 = time.perf_counter()
            # count() consumes the full result distributed-side
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)
        # drop cross-query state: cached frames and py4j handles to
        # localCheckpoint RDDs accumulate over ~150 queries and degrade
        # LATER queries (round 6: an iterative k-core measured 3x its
        # fresh-JVM time by the tail of the session); explicit cleanup
        # keeps the regression gate comparing plans, not heap pressure
        # (a per-query JVM System.gc() was tried and REVERTED: it made
        # the session total worse, and the remaining multi-second
        # outliers track the box's noisy-neighbor variance — fresh-JVM
        # spot checks, not harness knobs, are the arbiter for those)
        spark.catalog.clearCache()
        _gc.collect()

    range_s = _range_sentinel(spark)
    # ADVICE r7: if a canary query were ever renamed or dropped, old and
    # new canary totals would silently cover different query sets and
    # mis-normalize every gated timing — fail loudly instead, and record
    # the set so bench_diff can refuse to normalize across mismatches.
    missing = [q for q in CANARY_QUERIES if q not in timings]
    assert not missing, f"canary queries missing from timings: {missing}"
    canary = {
        "queries": {q: timings[q] for q in CANARY_QUERIES},
        "set": sorted(CANARY_QUERIES),
        "range_sentinel_s": range_s,
    }
    # scan_total (five frozen scan canaries) and the pure-JVM sentinel
    # are kept SEPARATE: the sentinel measures CPU throughput only, the
    # scan canaries add the I/O + Python-worker path — bench_diff
    # compares their ratios to tell box slowness from a code regression
    # in shared scan infrastructure. "total" (scan + sentinel) remains
    # for diffs against pre-round-8 baselines.
    canary["scan_total"] = round(sum(canary["queries"].values()), 3)
    canary["total"] = round(canary["scan_total"] + range_s, 3)
    canary["drift_probe"] = drift  # single-shot token_count each 20 queries
    # final probe indices may point one past the last recorded probe
    # (back half of the final block) — clamp to the probes we have
    canary["drift_index"] = {
        q: min(i, len(drift) - 1) for q, i in drift_index.items()
    }

    total = round(sum(timings.values()), 3)
    # Full per-query map goes to a FILE — with 120+ queries the inline
    # map is ~4.6 KB, and the driver keeps only a ~2 KB stdout tail, so
    # an oversized line loses its own head (round 4: "parsed": null).
    # RAW session output goes to BENCH_RUN.json — never to the committed
    # floors doc BENCH_DETAIL.json, which only bench_floor_merge.py may
    # write (VERDICT r8 #1: the r8 driver session clobbered the floors).
    detail_path = RUN_PATH
    run_doc = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
        "canary": canary,
    }
    with open(detail_path, "w") as f:
        json.dump(run_doc, f, indent=1, sort_keys=True)
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    # stop the JVM BEFORE printing: async executor/GC log lines share
    # stdout, and the driver parses the LAST line as JSON — nothing may
    # print after it
    spark.stop()
    # session-close self-triage (round 11, VERDICT r10 #4): adjudicate
    # this run's own gate flags in a fresh JVM now that this one is
    # down, so BENCH_RUN.json from a plain `python bench.py` carries
    # its triage block and bench_diff --triage reuses it (no judge-side
    # manual triage pass)
    tri = self_triage(run_doc, detail_path)
    sys.stdout.flush()
    out = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "canary_total": canary["total"],
        "queries": slowest,
    }
    if tri is not None:
        out["triage"] = {
            "cleared": len(tri["cleared"]),
            "confirmed": len(tri["confirmed"]),
        }
    line = json.dumps(out)
    assert len(line) < 1500, f"bench line too long ({len(line)} B) for driver tail"
    print(line)


if __name__ == "__main__":
    main()
