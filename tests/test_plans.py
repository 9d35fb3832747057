"""Physical-plan quality gates.

Correctness says WHAT a query returns; these tests pin HOW — the plan
properties that decide whether the same query survives a 100x scale-up:

- dimension joins must broadcast (no shuffle of the fact side onto a
  small dim);
- scans must carry pushed filters / pruned read schemas (Catalyst
  pushdown reaching parquet);
- aggregates must have a map-side partial phase;
- the hot row path must stay inside WholeStageCodegen (no Python in
  relational queries).

A refactor that silently turns a broadcast join into a sort-merge
shuffle, or un-pushes a filter, fails here even though results stay
identical.
"""

import re

import pytest

from xdlake_spark import queries as Q

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    fn, _ = Q.REGISTRY[name]
    df = fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(spark, name: str) -> str:
    fn, _ = Q.REGISTRY[name]
    df = fn(spark, SF)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


class TestBroadcasts:
    """Small dims broadcast; the lineitem/orders side never shuffles
    into a dimension join."""

    @pytest.mark.parametrize("name, min_broadcasts", [
        ("q3_shipping_priority", 1),
        ("q5_revenue_by_nation", 1),
        ("q7_volume_shipping", 2),
        ("q8_market_share", 3),
        ("q9_product_profit", 2),
        ("q10_returned_items", 1),
        ("q14_promo_revenue", 1),
        ("q19_discounted_revenue", 1),
    ])
    def test_dim_joins_broadcast(self, spark, name, min_broadcasts):
        plan = plan_of(spark, name)
        n = len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoop", plan))
        assert n >= min_broadcasts, \
            f"{name}: expected >= {min_broadcasts} broadcast joins:\n{plan}"

    def test_semi_and_anti_join_shapes(self, spark):
        # EXISTS / NOT EXISTS must stay semi/anti joins, not materialize
        # the subquery side
        assert "LeftSemi" in plan_of(spark, "q4_order_priority_semijoin")
        assert "LeftAnti" in plan_of(spark, "antijoin_no_big_orders")
        assert "LeftSemi" in plan_of(spark, "q20_excess_shippers")
        assert "LeftAnti" in plan_of(spark, "q22_dormant_accounts")


class TestPushdown:
    def test_filter_reaches_parquet_scan(self, spark):
        plan = formatted_plan(spark, "q6_forecast_revenue")
        assert "PushedFilters:" in plan
        m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
        assert m and "l_shipdate" in m.group(1), plan

    def test_projection_prunes_read_schema(self, spark):
        # q6 touches 4 lineitem columns; the parquet ReadSchema must not
        # carry the other 7
        plan = formatted_plan(spark, "q6_forecast_revenue")
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m, plan
        cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        assert "l_extendedprice" in cols
        assert "l_comment" not in cols and "l_partkey" not in cols, cols

    def test_manifest_prune_precedes_spark(self, spark, tmp_table_dir,
                                           lineitem):
        # file skipping happens before a plan exists: a partition
        # predicate shrinks the number of parquet files in the scan
        from xdlake_spark import DeltaTable
        t = DeltaTable(spark, tmp_table_dir).write(
            lineitem.limit(2000), partition_by=["l_returnflag"])
        all_files = t.to_df().inputFiles()
        pruned = t.to_df(where="l_returnflag = 'R'").inputFiles()
        assert len(pruned) < len(all_files)


class TestAggregation:
    @pytest.mark.parametrize("name", [
        "q1_pricing_summary", "q5_revenue_by_nation", "agg_by_flag",
    ])
    def test_partial_aggregation(self, spark, name):
        # two HashAggregate phases = map-side combine before the shuffle
        plan = plan_of(spark, name)
        assert len(re.findall(r"HashAggregate", plan)) >= 2, plan


class TestCodegen:
    @pytest.mark.parametrize("name", [
        "q1_pricing_summary", "q3_shipping_priority", "q6_forecast_revenue",
        "filter_predicate_ops", "text_stats", "q12_priority_class",
        "events_json_extract", "quality_classifier_scores",
        "asof_join_nearest",
    ])
    def test_no_python_in_relational_path(self, spark, name):
        # relational + text queries are pure JVM: no Python UDF
        # evaluation nodes anywhere in the plan; the row path runs
        # inside WholeStageCodegen spans (visible once AQE finalizes)
        fn, _ = Q.REGISTRY[name]
        df = fn(spark, SF)
        df.collect()  # finalize THIS df's adaptive plan (count() would
        # build a separate query execution)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        # codegen spans render as "*(n) Operator" in the final plan
        assert re.search(r"\*\(\d+\)", plan), plan


class TestSkewSafeJoins:
    """The new-round scale guarantees: no cartesian products anywhere in
    the bucketed self-joins, and paragraph-dedup's first-occurrence
    choice partial-aggregates map-side (no window over a hot key)."""

    @pytest.mark.parametrize("name", [
        "dedup_minhash_pairs", "dedup_simhash_pairs",
        "dedup_ngram_jaccard_pairs", "dedup_winnow_pairs",
        "embedding_neardup_lsh", "contamination_check",
        "substring_dup_stats", "corpus_prep_pipeline",
        "incremental_dedup_keepers",
    ])
    def test_bucket_self_joins_never_cartesian(self, spark, name):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan

    def test_paragraph_dedup_partial_aggregates(self, spark):
        plan = plan_of(spark, "dedup_paragraphs")
        # the min(struct(doc,pos)) keeper choice and the per-doc rebuild
        # both run with a partial (map-side) phase before the shuffle
        assert "partial_min" in plan or "partial" in plan.lower(), plan
        assert "Window" not in plan, plan

    def test_pii_and_repetition_stay_jvm(self, spark):
        for name in ("pii_stats", "text_repetition"):
            plan = plan_of(spark, name)
            assert "BatchEvalPython" not in plan, plan
            assert "ArrowEvalPython" not in plan, plan


class TestTopK:
    def test_sort_limit_is_take_ordered(self, spark):
        # ORDER BY + LIMIT must run as TakeOrderedAndProject (k rows per
        # partition), never a global sort
        plan = plan_of(spark, "q3_shipping_priority")
        assert "TakeOrderedAndProject" in plan, plan
        plan = plan_of(spark, "similarity_topk_cosine")
        assert "TakeOrderedAndProject" in plan, plan


class TestArrowGateNoJob:
    """The JVM-vs-Arrow strategy gates must decide from Catalyst plan
    statistics, never by running a count job at plan-build time (an
    eager count on a derived input recomputes the whole upstream)."""

    def test_gate_runs_no_job(self, spark):
        from xdlake_spark.operators import dedup as D
        from xdlake_spark.operators import text as X

        d = spark.read.parquet(f"{SF}/documents.parquet")
        sc = spark.sparkContext
        sc.setJobGroup("arrow-gate-probe", "plan build must be job-free")
        try:
            D.minhash_signature_df(d)         # build only — no action
            D.simhash_df(d)
            X.winnow_fingerprints(d)
        finally:
            sc.setJobGroup(None, None)
        tracker = sc.statusTracker()
        jobs = tracker.getJobIdsForGroup("arrow-gate-probe")
        assert list(jobs) == [], f"gate ran Spark jobs: {list(jobs)}"

    def test_gate_picks_by_scale(self, spark):
        from xdlake_spark.operators import plan_row_estimate

        small = spark.read.parquet(f"{SF}/documents.parquet")
        est = plan_row_estimate(small)
        assert est is not None and est < 2000  # 500 docs, ~65 KB file


class TestPivotShape:
    def test_unpivot_is_single_scan(self, spark):
        """Native unpivot expands wide->long inside one scan; the
        3-measure melt must not read lineitem three times."""
        plan = plan_of(spark, "lineitem_unpivot")
        assert plan.count("FileScan parquet") == 1, plan
        assert "Expand" in plan, plan

    def test_pivot_has_no_distinct_job_and_one_agg_pair(self, spark):
        """With the type vocabulary pinned, pivot plans as one
        partial+final aggregate pair — no extra distinct-values scan,
        no join."""
        plan = plan_of(spark, "events_pivot_types")
        assert plan.count("FileScan parquet") == 1, plan
        assert "Join" not in plan, plan

    def test_cube_single_shuffle(self, spark):
        plan = plan_of(spark, "cube_counts")
        assert "Expand" in plan, plan
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, \
            plan


class TestRangeFrameWindow:
    def test_trailing_avg_single_shuffle_window(self, spark):
        """The RANGE-frame trailing average is one Exchange on user_id
        plus one Window — no join, no extra shuffle."""
        plan = plan_of(spark, "events_trailing_avg")
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, \
            plan
        assert plan.count("Window") == 1 and "Join" not in plan, plan


class TestTopNBeforeRankWindow:
    """Ranked-vocabulary reports must select their top-N with a
    distributed TakeOrderedAndProject BEFORE the (single-reducer)
    rank/coverage window — the window may only ever see <= N rows."""

    @pytest.mark.parametrize("name", ["vocab_coverage",
                                      "bpe_pair_counts"])
    def test_take_ordered_feeds_window(self, spark, name):
        plan = plan_of(spark, name)
        assert "TakeOrderedAndProject" in plan, plan


class TestTotalsAttachment:
    """Queries that attach a 1-row aggregate (corpus totals, bucket
    range) to every row: a BroadcastNestedLoopJoin whose build side is
    the broadcast single row is the CORRECT plan (it is what Spark
    itself emits for scalar subqueries) — but it must be the ONLY
    nested-loop in the plan and a true CartesianProduct is still
    banned."""

    @pytest.mark.parametrize("name", [
        "text_tfidf_top_terms", "unigram_logprob_scores",
        "bigram_logprob_scores",
        "vocab_coverage", "corpus_mix_report", "events_gapfill_locf",
    ])
    def test_only_single_row_broadcast_loops(self, spark, name):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, plan
        # every BNLJ must build on the broadcast (1-row) side
        for line in plan.splitlines():
            if "BroadcastNestedLoopJoin" in line:
                assert "BuildRight" in line or "BuildLeft" in line, line


class TestRound6PlanShapes:
    """Plan pins for the round-6 operators."""

    def test_bpe_pair_counts_partial_aggregation(self, spark):
        from xdlake_spark.operators import bpe
        from xdlake_spark.sources.readers import read_parquet_any
        d = read_parquet_any(spark, f"{SF}/documents.parquet")
        words = bpe._init_symbols(bpe._word_freq(d, "text", True))
        plan = bpe._pair_counts(words)._jdf.queryExecution() \
            .executedPlan().toString()
        # pair counts map-side combine before shuffling on the pair key
        assert len(re.findall(r"HashAggregate", plan)) >= 2, plan

    def test_dv_scan_is_broadcast_anti_join(self, spark, tmp_path):
        import json as _json

        from xdlake_spark import DeltaTable
        from xdlake_spark.log import dv as _dv
        from xdlake_spark.sources.readers import read_parquet_any
        from xdlake_spark.sources.storage import Location
        li = read_parquet_any(spark, f"{SF}/lineitem.parquet").limit(100)
        loc = str(tmp_path / "t")
        DeltaTable(spark, loc).write(li.coalesce(1))
        desc = _dv.write_dv_file(Location.resolve(loc), [0, 1])
        log0 = f"{loc}/_delta_log/{0:020d}.json"
        lines = []
        for line in open(log0):
            obj = _json.loads(line)
            if "add" in obj:
                obj["add"]["deletionVector"] = desc
            lines.append(_json.dumps(obj))
        open(log0, "w").write("\n".join(lines) + "\n")
        df = DeltaTable(spark, loc).to_df()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # small DV -> broadcast hash LEFT ANTI, never a shuffle join
        assert re.search(r"BroadcastHashJoin.*LeftAnti", plan), plan
        assert "SortMergeJoin" not in plan, plan

    def test_first_fit_exact_single_shuffle(self, spark):
        plan = plan_of(spark, "pack_first_fit_exact")
        # one exchange for the groupBy-bucket applyInPandas, one for the
        # stats groupBy — no extra repartitions snuck in
        assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2, \
            plan


class TestGraphPlans:
    """Round-7 graph operators: no cartesian products, no Python in
    the row path — everything hash-join + partial-agg shaped."""

    def test_triangle_census_no_cartesian(self, spark):
        plan = plan_of(spark, "graph_triangle_census")
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan
        # the 1-row stats x triangles join is a broadcast, not a CP
        assert "BroadcastNestedLoopJoin" in plan \
            or "BroadcastHashJoin" in plan

    def test_rrf_fusion_is_pure_jvm(self, spark):
        plan = plan_of(spark, "hybrid_rrf_ranking")
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan
        assert "TakeOrderedAndProject" in plan  # top-k never sorts all

    def test_label_propagation_hash_joins_only(self, spark):
        fn, _ = Q.REGISTRY["graph_label_propagation"]
        df = fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan


class TestRound8PlanShapes:
    """Plan pins for the round-8 operators: the bloom probe broadcasts
    its word table (never shuffles the candidate stream), the SQ and
    bloom paths stay pure JVM, top-k paths run as TakeOrdered, and the
    per-row transforms introduce no exchange."""

    def test_bloom_screen_broadcasts_the_filter(self, spark):
        plan = plan_of(spark, "bloom_incremental_screen")
        assert re.search(r"BroadcastHashJoin|BroadcastNestedLoop",
                         plan), plan
        assert "CartesianProduct" not in plan

    @pytest.mark.parametrize("name", [
        "bloom_incremental_screen",
        "similarity_sq_topk",
        "dedup_paragraphs_within",
        "text_script_profile",
        "events_cohort_retention",
    ])
    def test_no_python_in_round8_relational_paths(self, spark, name):
        fn, _ = Q.REGISTRY[name]
        df = fn(spark, SF)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "MapInPandas" not in plan

    def test_sq_topk_is_take_ordered(self, spark):
        plan = plan_of(spark, "similarity_sq_topk")
        assert "TakeOrderedAndProject" in plan, plan

    def test_paragraph_dedup_within_has_no_exchange(self, spark):
        """The intra-doc fold is per-row: zero shuffles in the whole
        plan (the orderBy in the registry query is the only sort and
        rides the final collect)."""
        fn, _ = Q.REGISTRY["dedup_paragraphs_within"]
        from xdlake_spark.operators.dedup import paragraph_dedup_within
        d = fn(spark, SF)  # registry wrapper adds an orderBy; inspect
        # the raw operator instead for the no-exchange claim
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        raw = paragraph_dedup_within(docs.select("doc_id", "text"))
        plan = raw._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan

    def test_cohort_retention_broadcasts_sizes(self, spark):
        plan = plan_of(spark, "events_cohort_retention")
        assert re.search(r"BroadcastHashJoin", plan), plan


class TestRound9PlanShapes:
    """Round-9 fixes: the last two unpartitioned rank windows over
    unbounded inputs (corpus_zipf_fit over the full vocabulary,
    hybrid_rrf_ranking over the full scored sets) now take their
    top-N with TakeOrderedAndProject FIRST; any rank window in these
    plans only ever sees <= N pre-limited rows."""

    @pytest.mark.parametrize("name", ["corpus_zipf_fit",
                                      "hybrid_rrf_ranking"])
    def test_take_ordered_precedes_rank_window(self, spark, name):
        plan = plan_of(spark, name)
        assert "TakeOrderedAndProject" in plan, plan
        # Spark prints children BELOW parents: every Window must have
        # a TakeOrderedAndProject somewhere beneath it (its input is
        # pre-limited), i.e. no window consumes an unlimited input
        for m in re.finditer(r"\bWindow\b", plan):
            assert "TakeOrderedAndProject" in plan[m.end():], plan

    def test_auc_windows_are_bin_partitioned(self, spark):
        """classifier_auc_eval's prefix sums must run PARTITIONED BY
        the coarse score bin (bounded per-partition state) — never an
        unpartitioned window over the distinct-score table."""
        plan = plan_of(spark, "classifier_auc_eval")
        specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        assert specs, plan
        for s in specs:
            assert "__bin" in s, plan


class TestRound10PlanShapes:
    """Round-10 scale pins: incremental clustered OPTIMIZE no-op is
    zero Spark jobs (pure manifest work), and the variant-write stats
    fallback runs exactly ONE aggregation job no matter how many
    stat-less files the commit staged."""

    def _jobs_during(self, spark, group, fn):
        sc = spark.sparkContext
        sc.setJobGroup(group, group)
        try:
            out = fn()
        finally:
            sc.setJobGroup(None, None)
        return out, list(
            sc.statusTracker().getJobIdsForGroup(group))

    def test_clustered_optimize_noop_runs_zero_jobs(self, spark,
                                                    tmp_path):
        from xdlake_spark import DeltaTable
        loc = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i, float(i)) for i in range(200)], "a long, b double")
        t = DeltaTable(spark, loc).write(df.repartition(4))
        t = t.cluster_by(["a", "b"])
        t = t.optimize(target_file_size=1 << 14, min_cube_size=0)
        v = t.version
        t2, jobs = self._jobs_during(
            spark, "opt-noop",
            lambda: t.optimize(target_file_size=1 << 14,
                               min_cube_size=0))
        assert t2.version == v
        assert jobs == [], \
            f"no-op clustered OPTIMIZE ran {len(jobs)} Spark jobs"

    def test_variant_stats_fallback_job_count_is_flat(self, spark,
                                                      tmp_path):
        """The fallback is ONE aggregation over ALL stat-less files
        of the commit (explicit schema: no footer-inference job) —
        its Spark job count must not grow with the file count."""
        from xdlake_spark import DeltaTable

        def run(n_files, tag):
            loc = str(tmp_path / f"t{n_files}")
            df = spark.sql(
                "SELECT id, parse_json(concat('[', id, ']')) AS v "
                "FROM range(400)").repartition(n_files)
            t = DeltaTable(spark, loc).write(df)
            adds = list(t.adds.values())
            assert len(adds) == n_files
            for a in adds:
                a.stats = None
            _, jobs = self._jobs_during(
                spark, tag,
                lambda: t._stats_via_spark(
                    adds, t.to_df().schema, []))
            assert all(a.stats for a in adds)
            return len(jobs)

        j2 = run(2, "vstats-2")
        j8 = run(8, "vstats-8")
        assert j8 == j2 <= 2, (j2, j8)
