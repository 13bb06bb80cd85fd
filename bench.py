"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set covers every operator family (scan/filter, star join,
window, as-of, sessionize, streaming-equivalent windows, dedup exact +
minhash LSH + simhash + jaccard, knn, text stats, multimodal) while
excluding the deliberately quadratic demos (brute-force all-pairs) at
bench scale — those have their LSH-bucketed counterparts here instead —
and the deliberately LONG iterative trainers (q227/q228's 64-round BPE:
~20s of per-round job overhead on tiny vocab by design; the 3-round
q195/q212/q218 family times the same kernels, and SCALE_PROBE.md
measures the 64-round path at 1M docs). Same exclusion for the two
multi-store LIFECYCLE gates: q242 (seven-store erasure orchestration
— dozens of fixed-overhead jobs over a deliberately bounded corpus;
the per-store erase kernels ARE timed via SCALE_PROBE's
forget-at-state-scale rows), the single-store erasure lifecycles
q253, q264, q268, q274, q277, q278, q283, and q284 (same rationale;
SCALE_PROBE times the linkage, golden, pack-state, and sample-state
erase kernels), and the
A/B comparison harnesses q243, q248, and
q259, which build TWO indexes plus a brute-force truth —
q229/q234/q241/q244/q256 time the production IVFPQ paths, and q247
times the rotation-free selection scan.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "q01_pricing_summary",
    "q02_filter_project",
    "q03_join_revenue",
    "q04_topk_per_group",
    "q05_rollup",
    "q06_semi_join",
    "q09_running_total",
    "q11_pivot",
    "q14_cube",
    "q15_json",
    "q16_asof_join",
    "q17_sessionize",
    "q18_hourly_windows",
    "q19_sliding_windows",
    "q23_dedup_exact",
    "q24_text_stats",
    "q25_top_tokens",
    "q27_simhash",
    "q29_minhash_lsh",
    "q30_ngram_jaccard",
    "q31_knn_bruteforce",
    "q33_lsh_topk",
    "q34_multimodal_features",
    "q36_grouping_sets",
    "q84_except_all",
    "q38_percentiles",
    "q41_exists_agg",
    "q86_range_window",
    "q45_arg_max",
    "q114_conditional_agg",
    "q47_array_ops",
    "q109_string_agg",
    "q52_tpch_q6",
    "q53_tpch_q3",
    "q54_tpch_q10",
    "q55_tpch_q14",
    "q59_window_battery",
    "q63_dataprep_pipeline",
    "q65_funnel",
    "q66_cohort_retention",
    "q67_deterministic_sample",
    "q68_tpch_q7_volume",
    "q70_map_functions",
    "q71_tpch_q18_volume",
    "q72_tpch_q13_custdist",
    "q73_tpch_q19_disjunctive",
    "q74_tpch_q22_style",
    "q76_range_join",
    "q77_cascade_rollup",
    "q78_stratified_sample",
    "q79_approx_distinct_bounds",
    "q43_tfidf",
    "q37_dup_clusters",
    "q44_contamination",
    "q87_repetition",
    "q40_dedup_survivors",
    "q89_char_entropy",
    "q90_sequence_packing",
    "q91_tpch_q5",
    "q92_tpch_q17",
    "q93_tpch_q15",
    "q94_tpch_q8",
    "q95_embedding_quant",
    "q96_tpch_q9_profit",
    "q97_tpch_q2_mincost",
    "q98_line_dedup",
    "q99_quality_filter",
    "q100_tpch_q4",
    "q101_bpe_tokens",
    "q103_mixture_deciles",
    "q104_fixed_sample",
    "q105_source_overlap",
    "q106_doc_chunking",
    "q107_table_profile",
    "q108_zipf_fit",
    "q48_sketch_rollup",
    "q110_theta_set_ops",
    "q111_kll_quantiles",
    "q112_salted_join",
    "q46_cdc_apply",
    "q115_heaps_fit",
    "q116_skew_profile",
    "q117_value_histogram",
    "q118_tpch_q11_share",
    "q119_tpch_q21_waiting",
    "q08b_ann_recall",
    "q121_wkt_geo",
    "q122_table_checksum",
    "q123_decay_score",
    "q124_try_functions",
    "q125_triangle_count",
    "q127_nested_structs",
    "q128_recursive_cte",
    "q129_sql_udf",
    "q130_pipe_syntax",
    "q131_lateral_join",
    "q132_not_in_semantics",
    "q133_group_by_all",
    "q134_session_window_batch",
    "q135_collation",
    "q136_ewma",
    "q137_unigram_surprisal",
    "q138_streaming_sessions",
    "q139_expectations",
    "q140_ivf_index_probe",
    "q141_kmeans_clusters",
    "q142_bigram_surprisal",
    "q143_markov_transitions",
    "q144_interarrival_stats",
    "q145_hourly_correlation",
    "q146_tpch_q16_suppcnt",
    "q147_tpch_q20_promo",
    "q148_tpch_q12_priority",
    "q149_pii_redaction",
    "q150_source_cap",
    "q151_winnow_fingerprint",
    "q152_semantic_dedup",
    "q153_quality_logit",
    "q154_runtime_filter",
    "q155_winnow_matches",
    "q156_winsorize",
    "q157_trend_fit",
    "q158_zscore_outliers",
    "q159_session_paths",
    "q160_inverted_index",
    "q161_cogroup_merge",
    "q162_incremental_rollup",
    "q163_stream_ivm",
    "q164_skyline",
    "q165_mixture_sample",
    "q166_rfm_segments",
    "q167_mad_outliers",
    "q168_bm25_search",
    "q169_chi_square",
    "q170_ivm_retraction",
    "q171_ivm_minmax_rescan",
    "q172_stream_cdc_rollup",
    "q173_embedding_covariance",
    "q174_mahalanobis_ood",
    "q175_ivm_multiset_minmax",
    "q176_dedup_incremental",
    "q177_minhash_incremental",
    "q178_mahalanobis_d4",
    "q179_dedup_compaction",
    "q180_ivf_append",
    "q181_stream_dedup",
    "q182_dedup_bucketed_state",
    "q183_embedding_incremental",
    "q184_incremental_clusters",
    "q185_incremental_index",
    "q186_snapshot_state",
    "q187_incremental_sketch",
    "q188_dedup_bloom_state",
    "q189_heavy_hitters",
    "q190_weighted_sample",
    "q191_pq_train",
    "q192_pq_adc_topk",
    "q193_ivf_rebalance",
    "q194_stream_embedding_dedup",
    "q195_bpe_merges",
    "q196_negative_sampling",
    "q197_stratified_weighted",
    "q198_pq_append",
    "q199_sample_incremental",
    "q200_hh_incremental",
    "q201_psi_drift",
    "q202_ks_drift",
    "q203_drift_state",
    "q204_quantile_state",
    "q205_training_shards",
    "q206_psi_vs_state",
    "q207_grouped_split",
    "q208_token_budget_mix",
    "q209_bigram_cross_entropy",
    "q210_snapshot_diff",
    "q211_chunk_windows",
    "q212_bpe_encode",
    "q213_gopher_repetition",
    "q214_dup_ngram_coverage",
    "q215_containment_pairs",
    "q216_knn_label_vote",
    "q217_int8_quantization",
    "q218_bpe_frozen_apply",
    "q219_k_anonymity",
    "q220_temperature_mix",
    "q221_span_state",
    "q222_minhash_calibration",
    "q223_tpch_refresh",
    "q224_pipeline_funnel",
    "q225_shard_manifest",
    "q226_null_drift",
    "q229_ivfpq_recall",
    "q230_chi2_vs_state",
    "q231_quarantine_accounting",
    "q232_lsh_bucket_guard",
    "q233_embedding_drift",
    "q234_ivfpq_append",
    "q235_stream_category_gate",
    "q236_lsh_tuning",
    "q237_logit_calibration",
    "q238_filtered_ann",
    "q239_forget_state",
    "q240_stream_ivfpq_ingest",
    "q241_ivfpq_compact",
    "q244_ivfpq_rebalance",
    "q245_adaptive_nprobe",
    "q246_decontaminate",
    "q247_dsir_select",
    "q249_edit_join",
    "q250_record_linkage",
    "q251_incremental_linkage",
    "q252_entity_resolution",
    "q254_stream_linkage",
    "q255_sssp",
    "q256_ivfpq_adaptive_nprobe",
    "q257_match_scoring",
    "q258_golden_records",
    "q260_sssp_decimal",
    "q261_mdm_pipeline",
    "q262_incremental_golden",
    "q263_stream_golden",
    "q265_remap_golden",
    "q266_sequence_packing",
    "q267_phonetic_blocking",
    "q269_chunk_documents",
    "q270_chunk_then_pack",
    "q271_repetition_quality",
    "q272_bpe_packing",
    "q273_incremental_packing",
    "q275_stream_packing",
    "q276_pack_manifest",
    "q279_packed_tensors",
    "q280_stream_chunk_pack",
    "q281_packed_attention",
    "q282_epoch_repeats",
    "q285_frozen_vocab_encode",
    "q286_epoch_packed_tensors",
    "q287_training_pipeline",
]


def main() -> None:
    from etlhelper_spark.plans import QUERIES
    from etlhelper_spark.session import get_session

    spark = get_session("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM (codegen, shuffle, window, Arrow paths) on tiny data
    # so per-query numbers measure the queries, not JIT/bootstrap
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    warm = spark.read.parquet(f"{SF_DIR}/region.parquet")
    warm.count()
    warm.groupBy("r_name").count().count()
    warm.select(
        F.row_number()
        .over(Window.partitionBy("r_name").orderBy("r_regionkey"))
        .alias("rn")
    ).count()
    warm.join(F.broadcast(warm.select("r_regionkey")), "r_regionkey").count()

    def _identity(batches):
        yield from batches

    warm.mapInPandas(_identity, warm.schema).count()  # Python workers + Arrow
    # temporal/array codegen classes (sequence+explode+interval math +
    # bucketed range join) used by the range-join/rollup families
    from etlhelper_spark.functions.util import range_join

    _t0 = F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    _ev = spark.range(4).select(
        F.col("id").alias("k"),
        (_t0 + F.make_dt_interval(F.lit(0), F.col("id"))).alias("ts"),
    )
    _iv = spark.range(2).select(
        (_t0 + F.make_dt_interval(F.lit(0), F.col("id"))).alias("s"),
        (_t0 + F.make_dt_interval(F.lit(0), F.col("id") + 1)).alias("e"),
    )
    range_join(_ev, _iv, "ts", "s", "e", 3600).groupBy("k").count().count()
    # decimal-rounding + ntile codegen classes (quality/mixture family)
    warm.select(
        F.ntile(4)
        .over(Window.partitionBy("r_name").orderBy("r_regionkey"))
        .alias("nt"),
        F.round(
            (F.col("r_regionkey") / F.lit(7.0)).cast("decimal(30,10)"), 4
        ).cast("double").alias("dec"),
    ).count()

    # shingle/dedup codegen classes (ObjectHashAggregate collect_list,
    # array_sort lambda, explode-slice prefix, array_intersect verify)
    # used by the PPJoin/minhash family — tiny data, warms JIT only
    from etlhelper_spark.functions.dedup import ngram_jaccard_pairs

    _docs = spark.createDataFrame(
        [(i, f"w{i} w{i+1} a b c d e f g h") for i in range(40)],
        ["doc_id", "text"],
    )
    ngram_jaccard_pairs(_docs, "doc_id", "text", 3, 0.5).count()

    # IVF index build timed separately from the probe (q140): the
    # persistent index is build-once/probe-many, so the headline entry
    # measures the probe and this measures the build. One throwaway
    # build first compiles the assignment/write codegen, so the timed
    # number is steady-state like every other entry in the report.
    import shutil
    import tempfile

    from etlhelper_spark.functions.ann_index import build_ivf_index
    from etlhelper_spark.plans.queries import ivf_index_cached

    _warm_idx = tempfile.mkdtemp(prefix="ehs_ivf_warm_")
    build_ivf_index(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(512),
        os.path.join(_warm_idx, "idx"),
        nlist=16,
    )
    shutil.rmtree(_warm_idx, ignore_errors=True)
    t0 = time.time()
    ivf_index_cached(spark, SF_DIR, nlist=16)
    ivf_build_sec = round(time.time() - t0, 3)
    print(f"# ivf_index_build: {ivf_build_sec:.2f}s", file=sys.stderr)

    # same contract for the composed IVFPQ index (q229 probes only)
    from etlhelper_spark.plans.queries import ivfpq_index_cached

    t0 = time.time()
    ivfpq_index_cached(spark, SF_DIR)
    ivfpq_build_sec = round(time.time() - t0, 3)
    print(f"# ivfpq_index_build: {ivfpq_build_sec:.2f}s", file=sys.stderr)

    # Steady-state methodology (JMH-style): one untimed warm-up
    # execution per query compiles the generated code and JIT-warms the
    # JVM — first-run codegen/C2 cost is a per-process constant (~10s
    # on the heaviest plans), not query throughput, and a long-running
    # cluster never pays it per query. The memoized cross-query stages
    # (pair/cluster/k-means) are then FLUSHED so the timed pass
    # rebuilds them honestly; only the persistent IVF index survives,
    # because q140 times probe-only by design (build cost printed
    # above). Set SPARK_GRAFT_BENCH_WARM=0 for single-pass cold times.
    warm_pass = os.environ.get("SPARK_GRAFT_BENCH_WARM", "1") != "0"
    if warm_pass:
        t0 = time.time()
        for name in HEADLINE:
            QUERIES[name](spark, SF_DIR).count()
        from etlhelper_spark.plans.queries import clear_stage_caches

        clear_stage_caches()
        print(
            f"# warm pass: {time.time() - t0:.1f}s (untimed)",
            file=sys.stderr,
        )

    # Per-query MIN-OF-N (default 3 — VERDICT r11 #2: two samples
    # cannot separate a +6% uniform drift from the measured 31s
    # pass-to-pass spread; three tighten the min enough to read
    # delta_vs_prev against per-query spread): each timed pass is a
    # full sweep
    # with the memoized cross-query stages flushed first, so every pass
    # has identical cache behavior (comparable to prior rounds' single
    # pass) and min() suppresses one-off noise — GC pauses, a noisy
    # neighbor, page-cache misses. A single hot pass cannot distinguish
    # a real regression from machine wobble (the r6 q37 lesson:
    # +55% on one query, zero code change). SPARK_GRAFT_BENCH_PASSES=1
    # restores the old single-pass behavior.
    from etlhelper_spark.plans.queries import clear_stage_caches

    n_passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))
    runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for p in range(n_passes):
        clear_stage_caches()
        for name in HEADLINE:
            fn = QUERIES[name]
            t0 = time.time()
            df = fn(spark, SF_DIR)
            n = df.count()
            dt = round(time.time() - t0, 3)
            runs[name].append(dt)
            print(
                f"# pass {p + 1}/{n_passes} {name}: {dt:.2f}s ({n} rows)",
                file=sys.stderr,
            )
    # The top decile gets EXTRA min-of-N passes: the heavy queries
    # carry most of the artifact's noise (BENCH_r07 measured a 56.5s
    # pass-to-pass spread on a 173s total, concentrated in the
    # multi-second tail), and one more sample of ~20 queries costs
    # ~30s while tightening exactly the timings delta_vs_prev is read
    # against. SPARK_GRAFT_BENCH_TOPDECILE_PASSES=0 disables.
    extra = max(
        0, int(os.environ.get("SPARK_GRAFT_BENCH_TOPDECILE_PASSES", "1"))
    )
    if extra and n_passes > 1:
        decile = max(1, len(HEADLINE) // 10)
        slow = sorted(
            runs, key=lambda name: min(runs[name]), reverse=True
        )[:decile]
        for p in range(extra):
            clear_stage_caches()
            for name in slow:
                t0 = time.time()
                n = QUERIES[name](spark, SF_DIR).count()
                dt = round(time.time() - t0, 3)
                runs[name].append(dt)
                print(
                    f"# decile pass {p + 1}/{extra} {name}: "
                    f"{dt:.2f}s ({n} rows)",
                    file=sys.stderr,
                )
    timings = {name: min(ts) for name, ts in runs.items()}

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
    )
    # Regression visibility: per-query delta vs the PREVIOUS artifact
    # (the file this run overwrites), shared queries only, so every
    # round's artifact carries its own diff against the last.
    delta_vs_prev: dict[str, float] = {}
    prev_total = None
    try:
        with open(out_path) as f:
            prev = json.load(f).get("queries", {})
        delta_vs_prev = {
            name: round(timings[name] - prev[name], 3)
            for name in timings
            if name in prev
        }
        prev_total = round(sum(prev[n] for n in delta_vs_prev), 3)
    except (OSError, ValueError):
        pass
    # Full per-query map goes to a file; stdout gets ONE COMPACT line
    # (total + slowest five) so the driver's tail-capture always parses.
    # intra-artifact noise floor: how far the SAME query moved between
    # this run's own passes — the scale against which delta_vs_prev
    # should be read (this machine wobbles ±8% run-to-run at the
    # total level; a per-query delta inside the spread is noise)
    run_spread = round(
        sum(max(ts) - min(ts) for ts in runs.values()), 3
    )
    per_query_spread = {
        name: round(max(ts) - min(ts), 3) for name, ts in runs.items()
    }
    full = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": runs,
        "passes": n_passes,
        "run_spread_sec": run_spread,
        "per_query_spread_sec": per_query_spread,
        "delta_vs_prev": delta_vs_prev,
        "prev_shared_total_sec": prev_total,
        "sf": sf_val,
        "n_queries": len(timings),
        "ivf_index_build_sec": ivf_build_sec,
        "ivfpq_index_build_sec": ivfpq_build_sec,
        "methodology": (
            f"steady-state min-of-{n_passes}" if warm_pass else "cold"
        ),
    }
    with open(out_path, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
    # Stdout carries the FULL per-query map (slowest first so a
    # truncated tail-capture still sees the heavy queries), not just
    # the top five: a 238-float map is ~6 KB and fits on one line,
    # and the round-12 top-5-only line made improvements read as
    # "dropped_from_bench" in the driver's round-over-round diff.
    # `cpus` states the core count the run actually used so the
    # scaling comparison across SPARK_GRAFT_CPUS values is legible.
    ordered = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": ordered,
                "sf": sf_val,
                "n_queries": len(timings),
                "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "0"))
                or spark.sparkContext.defaultParallelism,
                "full": "BENCH_FULL.json",
            }
        )
    )


if __name__ == "__main__":
    main()
