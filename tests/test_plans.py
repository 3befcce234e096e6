"""Physical-plan regression tests: the plan properties that make these
queries survive a 100 TB deployment, pinned so a refactor can't silently
lose them (brief: '.explain the plan and iterate until it's the plan you'd
want').

- predicate pushdown reaches the parquet scan (PushedFilters non-empty)
- column pruning reaches the scan (ReadSchema excludes unused columns)
- dimension joins broadcast (no shuffle of the fact table for dims)
- grouped aggregation is two-phase (map-side partial before the exchange)
- global top-k plans as TakeOrderedAndProject (per-partition top-k + merge,
  never a full global sort)
- hot expression pipelines run inside WholeStageCodegen
"""

from __future__ import annotations

from flock_spark.registry import REGISTRY, get_queries

get_queries()


def plan_of(spark, sf_dir, name: str, execute: bool = False) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    if execute:
        # AQE finalizes the plan (and its WholeStageCodegen spans) lazily;
        # run this exact DataFrame so its plan reaches isFinalPlan=true.
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "filter_complex")
    assert "PushedFilters: [" in plan
    # the between bounds push down as gte/lte on o_totalprice
    assert "o_totalprice" in plan.split("PushedFilters")[1][:300]


def test_asof_cutoff_pushes_to_scan(spark, sf_dir):
    # the time-travel cutoff filters the RAW int64 nanos column, so it must
    # reach the parquet scan (row-group min/max pruning at scale) instead of
    # stopping at the ns→µs conversion projection
    plan = plan_of(spark, sf_dir, "cdc_snapshot_asof")
    pushed = plan.split("PushedFilters: [")[1][:200]
    assert "LessThanOrEqual(ts" in pushed


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "proj_arith")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "props" not in read_schema and "event_type" not in read_schema


def test_dim_join_broadcasts(spark, sf_dir):
    for name in ("tpch_q5", "join_broadcast_dim"):
        assert "BroadcastHashJoin" in plan_of(spark, sf_dir, name), name


def test_agg_is_two_phase(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "tpch_q1", execute=True)
    assert "isFinalPlan=true" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final
    # '*(n)' prefixes mark WholeStageCodegen spans in the final adaptive plan
    assert "*(1)" in plan and "*(2)" in plan


def test_topk_avoids_global_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "sort_limit_topk")
    assert "TakeOrderedAndProject" in plan


def test_semi_anti_join_plans(spark, sf_dir):
    assert "LeftSemi" in plan_of(spark, sf_dir, "join_semi")
    assert "LeftAnti" in plan_of(spark, sf_dir, "join_anti")


def test_sketches_are_shuffle_free(spark, sf_dir):
    # minhash signatures / simhash / repetition stats fold per-row with
    # higher-order functions — no key-based Exchange at any scale. The only
    # Exchange allowed is catalog.spread()'s RoundRobin input balancing,
    # which exists solely because test-scale parquet is a single split; no
    # hashpartitioning may appear (that would mean the fold itself shuffles).
    for name in ("dedup_minhash_signatures", "dedup_simhash", "corpus_repetition_stats"):
        plan = plan_of(spark, sf_dir, name)
        assert "hashpartitioning" not in plan, name
        assert "rangepartitioning" not in plan, name
        assert "Generate" not in plan, name  # no explode either


def test_decontaminate_broadcasts_eval_set(spark, sf_dir):
    # the eval shingle set broadcasts; the corpus side never hash-shuffles
    # rows into the join
    plan = plan_of(spark, sf_dir, "corpus_decontaminate")
    assert "BroadcastHashJoin" in plan


def test_vocab_topk_avoids_global_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "corpus_vocab_topk")
    assert "TakeOrderedAndProject" in plan


def test_nexmark_native_q3_broadcasts_person(spark, sf_dir):
    # person is 1/50 of events — it must ship to executors, not shuffle bids
    plan = plan_of(spark, sf_dir, "nexmark_native_q3")
    assert "BroadcastHashJoin" in plan


def test_ann_query_set_is_bounded_topk(spark, sf_dir):
    # the driver-side collect behind ann_topk_bruteforce must plan as a
    # bounded TakeOrderedAndProject (O(1) rows), never a corpus-wide collect
    from pyspark.sql import functions as F

    from flock_spark.operators.similarity import N_QUERIES, _spark_vecs

    q = (
        _spark_vecs(spark, sf_dir)
        .filter(F.col("vec_id") % 50 == 0)
        .select("vec_id", "v")
        .orderBy("vec_id")
        .limit(N_QUERIES)
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_chunking_and_redaction_are_narrow(spark, sf_dir):
    # chunk/redact are per-row pipelines — no Exchange at any corpus size
    # (chunking's explode is a Generate, which is narrow)
    for name in ("doc_chunk_fixed_tokens", "text_pii_redact"):
        plan = plan_of(spark, sf_dir, name)
        assert "Exchange" not in plan, name


def test_partitioned_scan_prunes(spark, sf_dir):
    # the layout entry's filtered read must show a partition filter on
    # event_type — whole-directory pruning, the 100 TB read-path win
    plan = plan_of(spark, sf_dir, "partitioned_write_prune_scan")
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters")[1][:200]


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    # both sides persist bucketed on the order key: the join never shuffles
    # on the join key (at tiny SF AQE may broadcast instead — also
    # shuffle-free; at scale the bucketed scans align). The only allowed
    # Exchange is the post-join aggregation's, keyed on o_orderstatus.
    plan = plan_of(spark, sf_dir, "bucketed_colocated_join")
    assert "Bucketed: true" in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan


def test_inverted_index_single_exchange(spark, sf_dir):
    # the whole index builds in ONE token-keyed shuffle: collect_set dedups
    # (tok, doc_id) inside the aggregate, so no separate distinct exchange
    plan = plan_of(spark, sf_dir, "text_inverted_index")
    assert plan.count("Exchange hashpartitioning") == 1


def test_length_band_cut_table_broadcasts(spark, sf_dir):
    # pass-2 of the two-pass percentile pattern must broadcast the
    # |langs|-row cut table — the corpus side never shuffles for the join
    plan = plan_of(spark, sf_dir, "corpus_length_band_twopass")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_count_star_scan_reads_zero_columns(spark, sf_dir):
    # count(*) must prune every data column: each parquet scan's ReadSchema
    # is the empty struct, so only row-group counts are read
    plan = plan_of(spark, sf_dir, "scan_count_star_pruned")
    schemas = [s.splitlines()[0].strip() for s in plan.split("ReadSchema: ")[1:]]
    assert schemas and all(s.startswith("struct<>") for s in schemas), schemas


def test_shuffle_hash_hint_pins_strategy(spark, sf_dir):
    # the SHUFFLE_HASH hint must survive to the physical plan: a shuffled
    # hash join (no per-partition sorts), never sort-merge
    plan = plan_of(spark, sf_dir, "join_shuffle_hash_hint")
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_percentiles_twopass_no_global_window(spark, sf_dir):
    # the scale-safe twin must rank inside bin-partitioned windows; the only
    # SinglePartition pass allowed is over the ~|bins|-sized aggregate (the
    # cumulative-offset window) and the 1-row total, never the base table
    plan = plan_of(spark, sf_dir, "window_percentiles_twopass")
    assert "hashpartitioning(bin" in plan
    # the direct form's signature — a global-sort window keyed on the raw
    # acctbal column — must not appear
    import re

    for m in re.finditer(r"Window \[[^\]]*\]", plan):
        frag = m.group(0)
        if "row_number" in frag:
            assert "bin" in plan[max(0, m.start() - 400): m.start() + 400]


def test_funnel_single_key_shuffle(spark, sf_dir):
    # one shuffle keyed by user_id for the per-step conditional mins; the
    # final roll-up is a scalar aggregate over 150 rows (SinglePartition) —
    # never a self-join of the event log
    plan = plan_of(spark, sf_dir, "events_funnel_steps")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_portable_sketches_aggregate_two_phase(spark, sf_dir):
    # sketch state must merge map-side (max/bit_or/sum partials) — that is
    # the property that makes the sketches distribute at 100 TB
    for name in ("hll_sketch_portable", "bloom_filter_portable",
                 "countmin_sketch_portable"):
        plan = plan_of(spark, sf_dir, name)
        assert plan.count("HashAggregate") >= 2, name
        assert "partial" in plan.lower(), name


def test_global_sort_is_range_partitioned(spark, sf_dir):
    # a global ORDER BY must distribute as a range-partitioned sort (sample
    # bounds, parallel per-partition sorts) — never a single-partition sort
    plan = plan_of(spark, sf_dir, "sort_global_range")
    assert "rangepartitioning" in plan
    assert "Sort" in plan


def test_bloom_semijoin_actually_prunes(spark, sf_dir):
    # the reduction claim: the broadcast bloom filter drops most fact rows
    # BEFORE the shuffle join (no false negatives — equality with the plain
    # join is the oracle's hash gate; this pins the pruning itself)
    from flock_spark.catalog import tbl
    from flock_spark.operators import sketches as sk
    from pyspark.sql import functions as F

    tbl(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    tbl(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    fact_rows = spark.table("lineitem").count()
    # count rows surviving the bloom pre-filter — the SAME filter the
    # operator applies (shared helper, so the test can't drift from it)
    pruned_rows = sk._bsj_pruned_fact(spark).count()
    true_rows = (
        spark.table("lineitem")
        .join(
            spark.table("orders").filter(F.col("o_totalprice") > sk.BSJ_PRICE),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_semi",
        )
        .count()
    )
    # no false negatives, and the filter must remove the bulk of the scan
    assert pruned_rows >= true_rows
    assert pruned_rows < fact_rows * 0.25, (pruned_rows, fact_rows)


def test_dpp_star_join_prunes_dynamically(spark, sf_dir):
    # the dim filter must reach the partitioned fact scan as a RUNTIME
    # partition filter (dynamic partition pruning) — the star-join read-path
    # win: the fact directories read are chosen by the dim subquery result
    plan = plan_of(spark, sf_dir, "dpp_star_join")
    assert "dynamicpruning" in plan
    assert "PartitionFilters" in plan


def test_salted_agg_is_two_stage(spark, sf_dir):
    # stage 1 keyed by (event_type, salt), stage 2 by event_type alone —
    # two distinct hash exchanges, and the salt column never reaches output
    plan = plan_of(spark, sf_dir, "agg_salted_two_stage")
    assert "salt" in plan
    assert plan.count("Exchange hashpartitioning") == 2


def test_binned_range_join_avoids_nested_loop(spark, sf_dir):
    # the pure interval join must lower to an equi-join on bin_id — never a
    # BroadcastNestedLoopJoin / CartesianProduct over points × intervals
    plan = plan_of(spark, sf_dir, "join_range_binned")
    assert "CartesianProduct" not in plan
    assert "bin_id" in plan


def test_array_hof_is_narrow(spark, sf_dir):
    # the lambda pipeline is a pure projection: no shuffle, no explode rows
    plan = plan_of(spark, sf_dir, "array_hof_funcs")
    assert "Exchange" not in plan
    assert "Generate" not in plan


def test_pq_adc_corpus_never_shuffles_wide(spark, sf_dir):
    # the PQ query path: codes fan out over ONE broadcast of the bounded
    # nested query LUT (was 4 sequential broadcast hash joins, one per
    # subquantizer); est_d2 is PQ_M in-row array lookups, with partial
    # top-k (WindowGroupLimit) before the single exchange on query_id —
    # the corpus relation itself never hash-shuffles
    plan = plan_of(spark, sf_dir, "ann_pq_adc_topk")
    assert plan.count("BroadcastNestedLoopJoin") == 1  # bounded LUT fan-out
    assert "BroadcastHashJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "WindowGroupLimit" in plan


def test_anomaly_stats_broadcast_no_fact_shuffle(spark, sf_dir):
    # pass-2 must join the KEYS-sized stats relation by broadcast — the
    # events fact table is filtered map-side, never shuffled for the join
    plan = plan_of(spark, sf_dir, "anomaly_zscore_flags")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_observation_metrics_piggyback(spark, sf_dir):
    # Spark's Observation API: pipeline health metrics (row counts, sums)
    # collected as a side effect of the SAME job — no second scan, the
    # pattern a production pipeline uses to audit ingest volume without
    # paying an extra pass over 100 TB
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from flock_spark.catalog import tbl

    obs = Observation("ingest_audit")
    e = tbl(spark, sf_dir, "events").observe(
        obs, F.count(F.lit(1)).alias("n_rows"), F.sum("user_id").alias("uid_sum")
    )
    out = e.filter(F.col("event_id") % 2 == 0).count()
    got = obs.get
    # the observation sees the PRE-filter stream: full table row count
    assert got["n_rows"] == tbl(spark, sf_dir, "events").count()
    assert got["n_rows"] >= out


def test_bm25_topk_is_take_ordered(spark, sf_dir):
    # the per-doc score relation must reach the driver through a partial
    # top-k (TakeOrderedAndProject), never a global sort of all scored docs;
    # the rank window then runs over only K rows
    plan = plan_of(spark, sf_dir, "text_bm25_doc_ranking")
    assert "TakeOrderedAndProject" in plan


def test_quality_resample_single_exchange(spark, sf_dir):
    # the keep decision is a pure per-row projection: exactly ONE exchange
    # (the final source×tier audit aggregate), nothing before it
    plan = plan_of(spark, sf_dir, "corpus_quality_resample", execute=True)
    # an executed AQE plan prints Final + Initial sections; count only the
    # final one (AQEShuffleRead mentions no Exchange, so the count is clean)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1, final


def test_lm_score_proxy_joins_on_bigram_only(spark, sf_dir):
    # the count table joins back on the bigram key — no cartesian/nested
    # loop, no broadcast of the exploded corpus side
    plan = plan_of(spark, sf_dir, "corpus_lm_score_proxy")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_join_is_blocked_equi_join(spark, sf_dir):
    # candidates come from the prefix-block equi-join; the levenshtein
    # predicate must run as a post-join filter, never a nested loop
    plan = plan_of(spark, sf_dir, "join_fuzzy_levenshtein")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pattern_single_user_shuffle(spark, sf_dir):
    # the whole pattern matcher is ONE user-keyed window: exactly one
    # hash exchange (on user_id) in the final plan
    plan = plan_of(spark, sf_dir, "events_pattern_3step", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1, final


def test_quality_checks_single_table_pass(spark, sf_dir):
    # five rules, ONE scan: the audit must not re-scan orders per rule
    plan = plan_of(spark, sf_dir, "table_quality_checks")
    assert plan.count("FileScan parquet") == 1, plan


def test_incremental_dedup_probe_is_equi_join(spark, sf_dir):
    # the new-batch probe against the band index must be a keyed equi-join
    # on (band_idx, band_val) — never a nested loop or cartesian (the
    # all-pairs shape that dies at 100 TB)
    plan = plan_of(spark, sf_dir, "dedup_incremental_new_batch")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "band_val" in plan


def test_filter_funnel_single_scan_single_exchange(spark, sf_dir):
    # all per-doc rule stats come from higher-order functions in one narrow
    # projection: ONE documents scan, ONE exchange (the per-lang aggregate).
    # Count in the FINAL AQE section only — the plan string repeats the
    # tree under "== Initial Plan ==".
    plan = plan_of(spark, sf_dir, "corpus_filter_funnel", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1, final
    assert final.count("Exchange hashpartitioning") == 1, final


def test_stagger_window_single_exchange(spark, sf_dir):
    # the staggered window start is a pure projection; the whole operator
    # is one grouped aggregate — exactly one exchange, like plain tumbling
    plan = plan_of(spark, sf_dir, "stagger_window_agg", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1, final


def test_ivfpq_queries_broadcast_corpus_never(spark, sf_dir):
    # per-query state (cells + integer LUT) broadcasts; the codes corpus
    # must NOT be broadcast and must never fan out as a nested loop
    plan = plan_of(spark, sf_dir, "ann_ivfpq_topk")
    assert "BroadcastHashJoin" in plan  # query cells + LUT joins
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_kcore_rounds_are_clamped_and_colocated(spark, sf_dir):
    # each peel round iterates on the keyed, bounded-width cached relation
    # (the registered entry checkpoints the result, which collapses its
    # plan to an RDD scan — pin the PRE-checkpoint plan instead): the
    # cached edges feed the rounds via InMemoryTableScan, and no round
    # degenerates to a cartesian
    from flock_spark.operators.graph import _kcore_peeled

    out, edges = _kcore_peeled(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    edges.unpersist()
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan


def test_tcloseness_single_corpus_scan(spark, sf_dir):
    # every histogram (cell totals, global lang, grand total) is a rollup
    # of the ONE pinned finest-grain aggregate — the corpus scan runs once
    # inside the eager per-invocation localCheckpoint, so the final plan
    # reads the pinned RDD and contains NO parquet scan at all; the
    # densifying cross joins touch only audit-sized relations
    plan = plan_of(spark, sf_dir, "privacy_t_closeness", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 0, final
    assert "Scan ExistingRDD" in final, final
    assert "CartesianProduct" not in final


def test_ngram_diversity_two_level_agg_no_self_join(spark, sf_dir):
    # one scan, explode over indexed slices, (lang,gram) agg then lang
    # rollup — never a token-stream self-join or pairwise doc product
    plan = plan_of(spark, sf_dir, "corpus_ngram_diversity", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1, final
    assert "CartesianProduct" not in final
    assert "BroadcastNestedLoopJoin" not in final


def test_bpe_apply_broadcasts_winner_topk_partial(spark, sf_dir):
    # the winning pair rides along as a broadcast 1-row relation (never a
    # driver collect), and both rankings plan as TakeOrderedAndProject
    plan = plan_of(spark, sf_dir, "tokenizer_bpe_apply", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1, final
    assert "TakeOrderedAndProject" in final
    assert "CartesianProduct" not in final


def test_compaction_plan_is_metadata_sized(spark, sf_dir):
    # planning runs on the |files|-row inventory: one corpus scan builds
    # it (map-side partial agg), windows and the union reuse the exchange
    plan = plan_of(spark, sf_dir, "maintenance_compaction_plan", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1, final
    assert "CartesianProduct" not in final
    assert "BroadcastNestedLoopJoin" not in final


def test_ivm_agg_delta_no_cartesian_joins_keyed(spark, sf_dir):
    # signed partial merge: base and delta aggregate independently (map-
    # side partials), then ONE keyed full-outer merge on the group key
    plan = plan_of(spark, sf_dir, "ivm_agg_delta", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert "FullOuter" in final
    assert "CartesianProduct" not in final
    assert "BroadcastNestedLoopJoin" not in final


def test_cdc_chunking_single_scan_no_product(spark, sf_dir):
    # Two corpus scans by design since the skinny-exchange rework: the
    # boundary pass explodes positions and windows on (doc_id, p) ONLY —
    # the O(n²/8)-bytes-per-doc alternative shuffles the full token array
    # once per boundary — and a second scan re-attaches the arrays via one
    # doc_id equi-join (each array moves once). The boundary test itself
    # stays a per-row hash: keyed join yes, pairwise product never.
    plan = plan_of(spark, sf_dir, "doc_chunk_content_defined", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 2, final
    assert "CartesianProduct" not in final
    assert "BroadcastNestedLoopJoin" not in final
    assert ("SortMergeJoin" in final) or ("ShuffledHashJoin" in final) or (
        "BroadcastHashJoin" in final
    )


def test_chunk_shared_is_keyed_equi_join(spark, sf_dir):
    # candidates come from an equi-join on chunk_hash (banded discipline):
    # a keyed join operator must appear and no pairwise product may exist
    plan = plan_of(spark, sf_dir, "dedup_chunk_shared", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    assert "BroadcastNestedLoopJoin" not in final
    assert ("SortMergeJoin" in final) or ("ShuffledHashJoin" in final) or (
        "BroadcastHashJoin" in final
    )


def test_hll_intersect_scans_events_twice_only(spark, sf_dir):
    # sketch pass + exact-membership audit pass; the only cross join
    # multiplies two single-row aggregates
    plan = plan_of(spark, sf_dir, "hll_intersect_estimate", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") <= 2, final


def test_ivm_distinct_refcount_merge_is_keyed(spark, sf_dir):
    # base refcounts and signed delta partials merge on the (type, user)
    # key — one full-outer keyed join, no product, no driver collect
    plan = plan_of(spark, sf_dir, "ivm_distinct_delta", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert "FullOuter" in final
    assert "CartesianProduct" not in final


def test_phash_near_dup_banded_equi_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "mm_phash_near_dup", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    assert "BroadcastNestedLoopJoin" not in final
    assert "MapInPandas" in final  # the phash extraction stays Arrow-batched


def test_pattern_kleene_one_window_pass_no_product(spark, sf_dir):
    # star matching is gaps-and-islands: user-keyed windows + one keyed
    # join of the run summary; no per-length self-join of the event log
    plan = plan_of(spark, sf_dir, "events_pattern_kleene", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    assert "BroadcastNestedLoopJoin" not in final


def test_file_skipping_plan_metadata_sized(spark, sf_dir):
    # inventory simulation is the only scan; decisions are CASE over the
    # |files|-row zone-map aggregate
    plan = plan_of(spark, sf_dir, "maintenance_file_skipping_plan", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1, final
    assert "CartesianProduct" not in final


def test_wordpiece_greedy_topk_then_pandas(spark, sf_dir):
    # word selection plans as TakeOrderedAndProject (never a global sort);
    # the greedy loop runs as one Arrow-batched pandas stage
    plan = plan_of(spark, sf_dir, "tokenizer_wordpiece_greedy", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert "TakeOrderedAndProject" in final
    assert "MapInPandas" in final
    assert "CartesianProduct" not in final


def test_contamination_overlap_broadcasts_eval_grams(spark, sf_dir):
    # the eval shingle set broadcasts; the training corpus never shuffles
    # its gram stream for the join
    plan = plan_of(spark, sf_dir, "corpus_contamination_overlap", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    assert "CartesianProduct" not in final


def test_mad_flags_broadcast_stats_no_fact_shuffle_twice(spark, sf_dir):
    # both stats relations (median, MAD) broadcast back; the fact table
    # never becomes a shuffle-join side
    plan = plan_of(spark, sf_dir, "anomaly_mad_flags", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("BroadcastHashJoin") >= 2, final
    assert "SortMergeJoin" not in final
    assert "CartesianProduct" not in final


def test_snapshot_drift_two_histogram_partials(spark, sf_dir):
    # drift metrics are arithmetic over the |bins|-row histogram; the only
    # cross join multiplies it by the single-row totals
    plan = plan_of(spark, sf_dir, "table_snapshot_drift", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1, final


def test_cooccurrence_pairs_form_inside_baskets(spark, sf_dir):
    # pair generation is a keyed self-join on the basket key; output is
    # the ordered top-k (TakeOrderedAndProject), never a global sort
    plan = plan_of(spark, sf_dir, "items_cooccurrence_jaccard", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    assert "TakeOrderedAndProject" in final


def test_ab_test_single_user_aggregate(spark, sf_dir):
    # one user-keyed aggregate with map-side partials; z-test is
    # arithmetic over the 2-row arm pivot
    plan = plan_of(spark, sf_dir, "events_ab_test_zstat", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1, final
    assert "partial_" in final  # map-side partial aggregation
    assert "CartesianProduct" not in final


def test_asof_nearest_single_union_pass(spark, sf_dir):
    # both directional carries run in ONE window sort over the union —
    # no join operator anywhere (the oracle's join+rank is the quadratic
    # formulation this lowering exists to avoid)
    plan = plan_of(spark, sf_dir, "asof_join_nearest", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert "Join" not in final, final
    assert final.count("Window") == 1, final


def test_rake_islands_one_window_then_wordcount(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "text_rake_keywords", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1, final
    assert "TakeOrderedAndProject" in final
    assert "CartesianProduct" not in final


def test_streaming_kleene_shares_batch_lowering(spark, sf_dir):
    # the staged-replay twin must reuse the batch matcher's plan shape:
    # no product joins regardless of the staging source
    plan = plan_of(spark, sf_dir, "streaming_pattern_kleene", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    assert "BroadcastNestedLoopJoin" not in final


def test_scene_cut_single_arrow_pass_then_window(spark, sf_dir):
    # frame energies come from ONE mapInPandas pass; the cut test is a
    # doc-keyed lag window — no joins over frames
    plan = plan_of(spark, sf_dir, "mm_scene_cut_detect", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("MapInPandas") == 1, final
    assert "Join" not in final, final


def test_cluster_weights_reuse_memoized_components(spark, sf_dir):
    # the cluster relation must come from the memoized localCheckpoint
    # (InMemory/Existing RDD scan), not a fresh fixpoint per entry
    plan = plan_of(spark, sf_dir, "corpus_cluster_sample_weights", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert ("Scan ExistingRDD" in final) or ("InMemoryTableScan" in final), final
    assert "CartesianProduct" not in final


def test_mm_clusters_iterate_over_pair_relation(spark, sf_dir):
    # the fixpoint iterates over the (tiny) phash pair relation with
    # checkpointed lineage — never a product, never the payload bytes
    plan = plan_of(spark, sf_dir, "mm_dedup_clusters", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    assert "Scan ExistingRDD" in final  # localCheckpoint truncated lineage


def test_recall_audit_joins_pair_lists_only(spark, sf_dir):
    # audit cost is O(truth ∪ candidates): one keyed full-outer join of
    # two pair lists, single-row aggregate output
    plan = plan_of(spark, sf_dir, "dedup_lsh_recall_audit", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert "FullOuter" in final
    assert "CartesianProduct" not in final


def test_modularity_audit_joins_pair_relation_only(spark, sf_dir):
    # three keyed joins over the pair/components relations; reuses the
    # memoized components (no fresh fixpoint), no product joins
    plan = plan_of(spark, sf_dir, "graph_modularity_audit", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    assert "Scan ExistingRDD" in final  # memoized, checkpointed components


def test_mode_window_runs_over_aggregate_not_rows(spark, sf_dir):
    # count partials map-side combine; the rank window sees only the
    # |group x distinct-value| aggregate
    plan = plan_of(spark, sf_dir, "agg_mode_deterministic", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert "partial_count" in final or "partial_" in final, final
    assert "CartesianProduct" not in final


def test_asof_tolerance_single_union_window_no_join(spark, sf_dir):
    # tolerance is a post-carry filter, not a join predicate: the plan
    # must stay the linear union+window shape with zero join operators
    plan = plan_of(spark, sf_dir, "asof_join_tolerance", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert "Join" not in final, final
    assert final.count("Window") == 1, final


def test_recursive_cte_executes_natively(spark, sf_dir):
    # Spark 4 executes WITH RECURSIVE as an iterative union loop — pin
    # that the native operator is used (no driver-side loop in this entry)
    plan = plan_of(spark, sf_dir, "recursive_cte_hierarchy", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert ("UnionLoop" in final) or ("Recursion" in final) or ("CTERecursion" in final), final


def test_pipe_syntax_compiles_to_classic_plan(spark, sf_dir):
    # pipe operators are analysis-time sugar: pushdown and partial agg
    # must appear exactly as in the classic formulation
    plan = plan_of(spark, sf_dir, "pipe_syntax_funnel", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert "PushedFilters: [" in plan
    assert "partial_" in final, final
    assert "TakeOrderedAndProject" in final


def test_variant_shred_single_parse_pass(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "variant_json_shred", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1, final
    assert "partial_" in final, final


def test_table_arg_udtf_partitions_and_sorts_input(spark, sf_dir):
    # the TABLE argument's PARTITION BY/ORDER BY must become a keyed
    # exchange + sort feeding the Python eval loop — the same physical
    # shape as the window-algebra sessionization
    plan = plan_of(spark, sf_dir, "udtf_table_arg_sessionize", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert "Sort" in final, final
    assert "PythonUDTF" in final or "BatchEvalPythonUDTF" in final or "EvalPython" in final, final
    assert "CartesianProduct" not in final


def test_header_parsers_single_scan_arrow_batched(spark, sf_dir):
    # both new header parsers must stay one narrow mapInPandas pass over
    # one parquet scan — no keyed shuffle, no per-row Python UDF (the only
    # allowed Exchange is catalog.spread()'s RoundRobin input balancing,
    # same convention as the codec-family pins)
    for name in ("mm_jpeg_header_dims", "mm_wav_header_audio"):
        plan = plan_of(spark, sf_dir, name, execute=True)
        final = plan.split("== Initial Plan ==")[0]
        assert final.count("FileScan parquet") == 1, (name, final)
        assert "MapInPandas" in final, (name, final)
        assert "hashpartitioning" not in final, (name, final)
        assert "BatchEvalPython" not in final, (name, final)


def test_sql_udf_is_inlined_no_python_boundary(spark, sf_dir):
    # a SQL UDF (CREATE FUNCTION ... RETURN expr) must be inlined by
    # Catalyst — the plan has the usual two-phase aggregate and NO Python
    # eval node (that's the whole 100 TB argument vs a Python UDF)
    plan = plan_of(spark, sf_dir, "sql_udf_scalar")
    assert "EvalPython" not in plan
    assert plan.count("HashAggregate") >= 2


def test_session_variable_binds_as_pushed_literal(spark, sf_dir):
    # the SET VARIABLE value is a plan-time literal in the consuming
    # statement, so the >= filter reaches the parquet scan as a pushed
    # predicate (a temp-view/scalar-subquery formulation could not)
    plan = plan_of(spark, sf_dir, "session_variable_param")
    pushed = plan.split("PushedFilters: [")[1][:300]
    assert "GreaterThanOrEqual(n_chars" in pushed


def test_parameterized_sql_binds_as_pushed_literals(spark, sf_dir):
    # :param markers bind before analysis; both the IN-list and the value
    # bound push to the scan
    plan = plan_of(spark, sf_dir, "parameterized_sql_query")
    pushed = plan.split("PushedFilters: [")[1][:300]
    assert "event_type" in pushed and "value" in pushed


def test_melt_expands_aggregate_not_raw_table(spark, sf_dir):
    # melt lowers to Expand; it must sit ABOVE the grouped aggregate (the
    # tiny relation), never below it over the raw documents scan — Expand
    # multiplies row count by the number of value columns
    plan = plan_of(spark, sf_dir, "unpivot_melt_wide")
    assert "Expand" in plan
    expand_pos = plan.index("Expand")
    agg_pos = plan.index("HashAggregate")
    # executedPlan prints top-down: Expand (later stage) appears BEFORE the
    # aggregate feeding it
    assert expand_pos < agg_pos


def test_seasonal_baseline_joins_broadcast(spark, sf_dir):
    # pass 2 joins the |types|x24 cell table back BROADCAST — the raw
    # events must never shuffle for the baseline comparison
    plan = plan_of(spark, sf_dir, "timeseries_seasonal_baseline")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_line_hash_boilerplate_equi_join_only(spark, sf_dir):
    # the boilerplate membership join is keyed on the block hash — any
    # nested-loop fallback would be quadratic in blocks at scale
    plan = plan_of(spark, sf_dir, "dedup_line_hash_boilerplate")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_hashed_linear_quality_single_exchange(spark, sf_dir):
    # the per-doc score is a row-local HOF fold — the only hash Exchange
    # is the final (lang, qclass) rollup
    plan = plan_of(spark, sf_dir, "text_hashed_linear_quality")
    assert plan.count("Exchange hashpartitioning") == 1


def test_runtime_bloom_filter_injected(spark, sf_dir):
    # the join_runtime_bloom_filter entry materializes under lowered
    # thresholds; replicate its conf block and pin that Catalyst actually
    # injects the bloom creation + scan-side probe into the plan
    import pyspark.sql.functions as F

    from flock_spark.catalog import tbl

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        o = tbl(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        l = tbl(spark, sf_dir, "lineitem")  # noqa: E741
        j = l.join(o, l.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan.lower()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_lateral_topk_decorrelates_to_group_limit(spark, sf_dir):
    # the LATERAL ORDER BY ... LIMIT 3 must decorrelate into WindowGroupLimit
    # with a Partial stage — each map task prunes to its local top-3 per
    # group BEFORE the shuffle; the exchange then carries ~groups x k rows,
    # not the table. A plan that re-correlates (one subquery execution per
    # outer row) or full-sorts per group loses the 100 TB property.
    plan = plan_of(spark, sf_dir, "sql_lateral_topk_per_group")
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan.split("WindowGroupLimit")[-1][:200] or \
        plan.count("WindowGroupLimit") >= 2


def test_mm_tile_stats_no_shuffle_before_emit(spark, sf_dir):
    # per-tile stats are finalized inside mapInPandas per document — the
    # plan must not hash-exchange pixel- or tile-level rows (the only
    # allowed Exchange is catalog.spread()'s RoundRobin input balancing)
    plan = plan_of(spark, sf_dir, "mm_image_tile_stats")
    assert "hashpartitioning" not in plan


def test_matryoshka_audit_broadcasts_query_side(spark, sf_dir):
    # the bounded query set must broadcast; the corpus must never be on the
    # build side of a nested-loop against itself — and the per-dim top-k
    # must prune map-side (WindowGroupLimit Partial) before its shuffle, so
    # the exchange carries ~queries x k x dims rows, not the scored pairs.
    # All truncation widths INCLUDING the full-dim ground truth score in
    # ONE corpus pass (ann_topk_bruteforce's shape: broadcast query matrix,
    # per-partition GEMM + band preselect in mapInPandas — never a
    # corpus x queries pair-row expansion) and rank under ONE window (the
    # old form ran a second full scoring pass via the ann_topk_bruteforce
    # sub-query).
    from flock_spark.operators.similarity import _mrl_scored_topk

    scoring = _mrl_scored_topk(spark, sf_dir)
    plan = scoring._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Join" not in plan  # no pair-row join of the corpus with itself
    assert plan.count("Scan parquet") == 1  # one corpus pass
    assert plan.count("WindowGroupLimit") >= 2  # Partial + Final
    assert "Partial" in plan
    # the recall aggregation reads the checkpointed ~dims x queries x k
    # relation — no second scoring pass, no parquet re-scan, and the tiny
    # spine joins stay broadcast
    final = plan_of(spark, sf_dir, "embedding_matryoshka_recall_audit")
    assert "Scan parquet" not in final
    assert "MapInPandas" not in final and "ArrowEvalPython" not in final
    assert "SortMergeJoin" not in final


def test_codec_decodes_are_shuffle_free_single_scan(spark, sf_dir):
    # the codec family's scale claim: embarrassingly parallel across
    # objects — one parquet scan feeding mapInPandas, never a shuffle
    # (the only allowed Exchange is catalog.spread()'s RoundRobin input
    # balancing), and no pixel/byte-level row expansion JVM-side
    for name in ("mm_gif_lzw_decode", "mm_png_inflate_stored",
                 "mm_zlib_inflate_dynamic"):
        plan = plan_of(spark, sf_dir, name)
        assert "hashpartitioning" not in plan, name
        assert "MapInPandas" in plan, name
        assert plan.count("Scan parquet") == 1, name


def test_tdigest_rank_check_broadcasts_digest_side(spark, sf_dir):
    # the 5-row digest must be the broadcast side of the rank-check join;
    # the events table must never be nested-loop build side. At 100 TB the
    # raw-data side streams once past a handful of broadcast estimates.
    plan = plan_of(spark, sf_dir, "sketch_tdigest_quantile_audit")
    assert "BroadcastNestedLoopJoin" in plan
    assert "BuildRight" in plan


def test_space_saving_merge_joins_on_bounded_summaries(spark, sf_dir):
    # the audit join operates on the k*segments summary rows and the 8-row
    # per-segment minima (broadcast), never re-shuffling the raw stream for
    # the merge. The grouped (seg, item, c) relation is pinned with a
    # per-invocation eager checkpoint so the explode+md5 stream derivation
    # runs exactly once per run — every downstream consumer (per-segment
    # summary, exact counts, stream size) must read the checkpoint, so the
    # post-checkpoint plan may contain NO parquet scan of the corpus.
    plan = plan_of(spark, sf_dir, "sketch_space_saving_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Scan parquet" not in plan, plan
    # the exact-count path must keep map-side partial aggregation over the
    # checkpointed grouped rows
    assert "partial_sum" in plan or "partial_count" in plan


def test_round10_codec_walks_are_shuffle_free_single_scan(spark, sf_dir):
    # WARC walk and JPEG decode inherit the codec family's scale claim:
    # one scan feeding mapInPandas, no hash exchange anywhere (only the
    # RoundRobin spread), decode embarrassingly parallel per object
    for name in ("mm_warc_record_walk", "mm_jpeg_baseline_decode"):
        plan = plan_of(spark, sf_dir, name)
        assert "hashpartitioning" not in plan, name
        assert "MapInPandas" in plan, name
        assert plan.count("Scan parquet") == 1, name


def test_parquet_format_walks_single_binary_scan_no_shuffle(spark, sf_dir):
    # footer/page walks read raw file bytes once; nothing shuffles — the
    # 100 TB shape is one task per file reading the tail/pages it needs
    for name in ("scan_parquet_footer_thrift_walk", "scan_parquet_page_decode"):
        plan = plan_of(spark, sf_dir, name)
        assert "hashpartitioning" not in plan, name
        assert "MapInPandas" in plan, name
        assert "binaryFile" in plan or "Scan binaryFile" in plan, name


def test_boilerplate_filter_is_pure_jvm_sql(spark, sf_dir):
    # the extraction pipeline's scale claim: zero Python, explode + two
    # keyed aggregates, scan pruned to the two referenced columns
    plan = plan_of(spark, sf_dir, "text_boilerplate_linefilter")
    assert "Python" not in plan  # no UDF of any kind
    assert "Generate" in plan    # the posexplode
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_robots_match_broadcasts_rules_and_partial_aggregates(spark, sf_dir):
    # rule relation broadcasts (corpus never shuffles for the join) and the
    # longest-match tournament partial-aggregates map-side: the exchange
    # carries one row per URL, not one row per matching rule
    plan = plan_of(spark, sf_dir, "text_robots_longest_match")
    assert "BroadcastNestedLoopJoin" in plan
    assert "BuildRight" in plan
    assert plan.count("SortAggregate") >= 2 or "partial" in plan.lower()
    assert "ReadSchema: struct<doc_id:bigint>" in plan  # only doc_id read


def test_rank_statistics_aggregate_before_global_window(spark, sf_dir):
    # the nonparametric family's scale claim: the ordered cumulative window
    # runs over the pooled SUPPORT (grouped first), never raw events — a
    # hash aggregate must sit below every unpartitioned window
    for name in ("analytics_wilcoxon_signed_rank", "analytics_friedman_test"):
        plan = plan_of(spark, sf_dir, name)
        assert "HashAggregate" in plan, name
        assert "ReadSchema: struct<event_type:string,user_id" in plan or (
            "user_id" in plan and "value" in plan
        ), name


def test_round11_new_entries_plan_shapes(spark, sf_dir):
    # wildcard robots: rule relation broadcasts, LIKE-join never shuffles
    # the corpus, tournament partial-aggregates map-side (one row per URL
    # crosses the exchange), scan pruned to doc_id
    plan = plan_of(spark, sf_dir, "text_robots_wildcard_match")
    assert "BroadcastNestedLoopJoin" in plan
    assert "ReadSchema: struct<doc_id:bigint>" in plan
    assert plan.count("SortAggregate") >= 2 or "partial" in plan.lower()
    # SURT index: pure-JVM (no Python), single hash aggregation on the
    # canonical key with map-side partials, no explode
    plan = plan_of(spark, sf_dir, "text_cdx_surt_dedup")
    assert "Python" not in plan and "Generate" not in plan
    assert "HashAggregate" in plan
    # file-true ingests + progressive JPEG + gzip-page decode: one binary
    # scan feeding mapInPandas, no hash exchange
    for name in ("mm_warc_file_ingest", "scan_parquet_gzip_page_decode"):
        p = plan_of(spark, sf_dir, name)
        assert "hashpartitioning" not in p, name
        assert "MapInPandas" in p, name
        assert "binaryFile" in p or "Scan binaryFile" in p, name
    for name in ("mm_jpeg_progressive_decode", "mm_png_filter_suite_decode"):
        p = plan_of(spark, sf_dir, name)
        assert "hashpartitioning" not in p, name
        assert "MapInPandas" in p, name
        assert p.count("Scan parquet") == 1, name


def test_round11_second_wave_plan_shapes(spark, sf_dir):
    # LZ4 entries: codec family plan — binary single scan / parquet single
    # scan feeding mapInPandas, no hash exchange
    p = plan_of(spark, sf_dir, "scan_parquet_lz4_page_decode")
    assert "hashpartitioning" not in p and "MapInPandas" in p
    p = plan_of(spark, sf_dir, "mm_lz4_block_roundtrip")
    assert "MapInPandas" in p and p.count("Scan parquet") == 1
    # punycode: same per-object decode family
    p = plan_of(spark, sf_dir, "text_punycode_idna_roundtrip")
    assert "MapInPandas" in p and "hashpartitioning" not in p
    # robots file parse: pure JVM — windows over host partitions, no Python
    p = plan_of(spark, sf_dir, "text_robots_file_parse")
    assert "Python" not in p and "Window" in p
    # frontier schedule: keyed window + one global window + keyed rollup,
    # no Python anywhere
    p = plan_of(spark, sf_dir, "crawl_frontier_politeness_schedule")
    assert "Python" not in p and p.count("Window") >= 2
    assert "HashAggregate" in p
    # sitemap: xpath evaluates JVM-side (no Python UDF), one aggregation
    # keyed on host
    p = plan_of(spark, sf_dir, "crawl_sitemap_xml_walk")
    assert "Python" not in p and "xpath" in p.lower()
    # url resolve: the remove_dot_segments fold is a single JVM expression
    # — no Python, no recursion operators, no join
    p = plan_of(spark, sf_dir, "crawl_url_resolve_rfc3986")
    assert "Python" not in p and "aggregate(" in p
    assert "Join" not in p
    # unigram viterbi: pandas fold over the bounded word sample only — the
    # corpus aggregates JVM-side before Python sees anything
    p = plan_of(spark, sf_dir, "tokenizer_unigram_viterbi")
    assert "MapInPandas" in p and "TakeOrderedAndProject" in p


def test_round12_zstd_plan_shapes(spark, sf_dir):
    # zstd roundtrip: codec family plan — one parquet scan feeding
    # mapInPandas, no hash exchange anywhere (per-object decode)
    p = plan_of(spark, sf_dir, "mm_zstd_frame_roundtrip")
    assert "MapInPandas" in p and "hashpartitioning" not in p
    assert p.count("Scan parquet") == 1
    # zstd-paged parquet walk: one binary scan per staged file, no shuffle
    p = plan_of(spark, sf_dir, "scan_parquet_zstd_page_decode")
    assert "hashpartitioning" not in p and "MapInPandas" in p
    assert "binaryFile" in p or "Scan binaryFile" in p


def test_arrow_ipc_walk_single_binary_scan_no_shuffle(spark, sf_dir):
    # wire-format family plan: one binary scan of the staged .arrows
    # stream feeding mapInPandas, no exchange anywhere
    p = plan_of(spark, sf_dir, "scan_arrow_ipc_stream_walk")
    assert "hashpartitioning" not in p and "MapInPandas" in p
    assert "binaryFile" in p or "Scan binaryFile" in p


def test_arena_audit_pure_jvm_two_phase(spark, sf_dir):
    # arena completeness audit: zero Python, two keyed aggregations with
    # map-side partials, scan pruned to the one key column
    p = plan_of(spark, sf_dir, "arena_window_completeness_audit")
    assert "Python" not in p
    assert "HashAggregate" in p
    assert "ReadSchema: struct<o_orderkey:bigint>" in p


def test_crawl_chain_single_python_stage_broadcast_rules(spark, sf_dir):
    # the chain's composition proof: ONE Python stage (the WARC ingest) —
    # executed once inside a per-invocation eager localCheckpoint and
    # REUSED by all four downstream consumers, which read the pinned RDD
    # (Scan ExistingRDD); every downstream stage pure JVM; the robots rule
    # relation broadcasts; one per-host window. (The previous .cache()
    # form leaked an InMemoryRelation across invocations — Spark's
    # CacheManager substitutes it into any later identical plan, which is
    # cross-run result caching.)
    p = plan_of(spark, sf_dir, "crawl_chain_end_to_end")
    # the ingest AND the verdicts stage are pinned: downstream consumers
    # scan the checkpointed RDDs
    assert "Scan ExistingRDD" in p
    # the Python ingest stage never appears in the final plan — it already
    # ran inside the eager pin; no other Python operator exists either
    assert "MapInPandas" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "FlatMapGroupsInPandas" not in p
    assert "Window" in p
    # the robots rule tournament (the LIKE non-equi join -> broadcast
    # nested loop) runs ONCE, inside the pinned verdicts stage — it must
    # appear in the standalone verdicts plan and NOT in the final plan
    # (pre-split it planned twice: once under the frontier, once under
    # the robots stats)
    assert "BroadcastNestedLoopJoin" not in p
    from flock_spark.operators.text import _CHAIN_SPARK_VERDICTS
    from flock_spark.registry import REGISTRY

    REGISTRY["crawl_chain_end_to_end"].fn(spark, sf_dir)  # registers views
    vp = spark.sql(_CHAIN_SPARK_VERDICTS)
    vplan = vp._sc._jvm.PythonSQLUtils.explainString(
        vp._jdf.queryExecution(), "formatted")
    assert "BroadcastNestedLoopJoin" in vplan
    # one operator = two mentions in formatted explain (tree + details)
    assert vplan.count("BroadcastNestedLoopJoin") == 2


def test_zstd_encode_entry_plan_shape(spark, sf_dir):
    p = plan_of(spark, sf_dir, "mm_zstd_encode_roundtrip")
    assert "MapInPandas" in p and "hashpartitioning" not in p
    assert p.count("Scan parquet") == 1


def test_parquet_v2_delta_single_binary_scan(spark, sf_dir):
    p = plan_of(spark, sf_dir, "scan_parquet_v2_delta_decode")
    assert "hashpartitioning" not in p and "MapInPandas" in p
    assert "binaryFile" in p or "Scan binaryFile" in p


def test_arrow_file_and_streaming_twin_plan_shapes(spark, sf_dir):
    p = plan_of(spark, sf_dir, "scan_arrow_ipc_file_walk")
    assert "hashpartitioning" not in p and "MapInPandas" in p
    assert "binaryFile" in p or "Scan binaryFile" in p


def test_page_index_prune_plan_shape(spark, sf_dir):
    p = plan_of(spark, sf_dir, "scan_parquet_page_index_prune")
    assert "hashpartitioning" not in p and "MapInPandas" in p
    assert "binaryFile" in p or "Scan binaryFile" in p


def test_orc_stripe_decode_plan_shape(spark, sf_dir):
    p = plan_of(spark, sf_dir, "scan_orc_stripe_decode")
    assert "hashpartitioning" not in p and "MapInPandas" in p
    assert "binaryFile" in p or "Scan binaryFile" in p


def test_epoch_shuffle_and_consensus_plan_shapes(spark, sf_dir):
    # epoch shuffle: pure JVM — hash projection + keyed rank, no Python
    p = plan_of(spark, sf_dir, "corpus_epoch_shuffle_audit")
    assert "Python" not in p
    assert "Window" in p
    # consensus: three binary file scans, no shuffle before the union
    p = plan_of(spark, sf_dir, "scan_formats_consensus")
    assert "MapInPandas" in p and "hashpartitioning" not in p


def test_bzip2_entry_plan_shape(spark, sf_dir):
    p = plan_of(spark, sf_dir, "mm_bzip2_decode")
    assert "MapInPandas" in p and "hashpartitioning" not in p
    assert p.count("Scan parquet") == 1


def test_avro_container_decode_plan_shape(spark, sf_dir):
    # wire-format family plan: one binary scan of the staged .avro
    # containers feeding mapInPandas, no exchange anywhere
    p = plan_of(spark, sf_dir, "scan_avro_container_decode")
    assert "hashpartitioning" not in p and "MapInPandas" in p
    assert "binaryFile" in p or "Scan binaryFile" in p


def test_xz_decode_entry_plan_shape(spark, sf_dir):
    # codec family plan: one parquet scan feeding mapInPandas, no shuffle
    p = plan_of(spark, sf_dir, "mm_xz_lzma_decode")
    assert "MapInPandas" in p and "hashpartitioning" not in p
    assert p.count("Scan parquet") == 1


def test_parquet_own_writer_entry_pure_jvm(spark, sf_dir):
    # the write-side certification reads OUR bytes with a pure-JVM plan:
    # one parquet scan, two-phase aggregate, zero Python anywhere
    p = plan_of(spark, sf_dir, "scan_parquet_own_writer_roundtrip")
    assert "Python" not in p and "MapInPandas" not in p
    assert "HashAggregate" in p or "SortAggregate" in p
    assert "Scan parquet" in p


def test_orc_own_writer_entry_pure_jvm(spark, sf_dir):
    # the ORC write-side certification reads OUR bytes with a pure-JVM
    # plan: one ORC scan, two-phase aggregate, zero Python anywhere
    p = plan_of(spark, sf_dir, "scan_orc_own_writer_roundtrip")
    assert "Python" not in p and "MapInPandas" not in p
    assert "HashAggregate" in p or "SortAggregate" in p
    assert "Scan orc" in p or "OrcScan" in p or "Format: ORC" in p or "orc" in p.lower()


def test_own_writers_consensus_plan_shape(spark, sf_dir):
    # four single-file binary scans, per-object decode, no shuffle
    p = plan_of(spark, sf_dir, "scan_own_writers_consensus")
    assert "MapInPandas" in p and "hashpartitioning" not in p
    assert "binaryFile" in p or "Scan binaryFile" in p


def test_parquet_v2_writer_entry_pure_jvm(spark, sf_dir):
    p = plan_of(spark, sf_dir, "scan_parquet_own_writer_v2_roundtrip")
    assert "Python" not in p and "MapInPandas" not in p
    assert "Scan parquet" in p


def test_archive_chain_plan_shape(spark, sf_dir):
    # 16 shard files -> binary scan + per-object decode, no shuffle
    p = plan_of(spark, sf_dir, "archive_ingest_chain_end_to_end")
    assert "MapInPandas" in p and "hashpartitioning" not in p
    assert "binaryFile" in p or "Scan binaryFile" in p


def test_label_prop_argmax_is_hash_aggregate(spark, sf_dir, monkeypatch):
    # round-13: the per-round arg-max (most votes, smallest label on ties)
    # runs as a single-BIGINT hash aggregate — the struct-max form paid a
    # Sort + SortAggregate pair over the edge-sized vote relation per round.
    # The query returns an eager localCheckpoint, so stub it (and the edge
    # cache teardown) to expose the full build plan.
    import pyspark.sql.classic.dataframe as cdf

    monkeypatch.setattr(cdf.DataFrame, "localCheckpoint", lambda self, eager=True: self)
    monkeypatch.setattr(cdf.DataFrame, "unpersist", lambda self, blocking=False: self)
    plan = plan_of(spark, sf_dir, "graph_label_prop_communities")
    assert "SortAggregate" not in plan, plan
    assert "CartesianProduct" not in plan, plan
