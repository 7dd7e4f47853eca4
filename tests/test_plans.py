"""Plan-introspection tests — the Spark-native versions of the
reference's optimizer golden tests (src/optimizer/mod.rs:161-236):
instead of asserting plan strings we assert the *behavior* Catalyst
must produce — column pruning reaching the parquet scan, predicate
pushdown, broadcast joins for small dims."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_query_engine.plans import (
    pushed_filters,
    scan_read_schema,
    uses_broadcast_join,
    wholestage_codegen_spans,
)


def test_projection_pushdown_prunes_scan(spark, sf_dir):
    """Equivalent of ProjectionPushDownRule (reference:
    src/optimizer/mod.rs:32-99): projecting 2 of 5 customer columns
    must narrow the parquet ReadSchema to exactly those columns."""
    df = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey", "c_name")
    assert scan_read_schema(df) == ["c_custkey", "c_name"]


def test_filter_columns_retained_in_scan(spark, sf_dir):
    """Reference behavior: filter-referenced columns are read even if
    not projected out (src/optimizer/mod.rs:204 golden)."""
    df = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    assert set(scan_read_schema(df)) == {"c_custkey", "c_mktsegment"}


def test_predicate_pushdown_reaches_scan(spark, sf_dir):
    """Beyond the reference (it has no predicate pushdown): the
    equality predicate must appear in the parquet PushedFilters."""
    df = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    assert "EqualTo(c_mktsegment,BUILDING)" in pushed_filters(df)


def test_small_dim_join_is_broadcast(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    df = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    assert uses_broadcast_join(df)


def test_filter_project_wholestage_codegen(spark, sf_dir):
    """The hot path stays inside whole-stage codegen (no Python in
    the loop)."""
    df = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_quantity") > 10)
        .select("l_orderkey", (F.col("l_extendedprice") * 0.9).alias("p"))
    )
    assert wholestage_codegen_spans(df) >= 1


def test_explain_string_has_three_stages(ctx, sf_dir):
    df = ctx.parquet(f"{sf_dir}/customer.parquet").project(F.col("c_custkey"))
    s = df.explain_string()
    assert "== Logical ==" in s and "== Optimized ==" in s and "== Physical ==" in s


def test_tpch_q1_scan_prunes_and_pushes(spark):
    """The flagship agg query reads only its 7 columns and pushes the
    shipdate predicate into the parquet scan."""
    from spark_query_engine.queries import queries

    df = queries()["tpch_q1"](spark, "/root/testdata/sf0.001")
    cols = set(scan_read_schema(df))
    assert cols == {
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    }
    assert "LessThanOrEqual(l_shipdate" in pushed_filters(df)


def test_ivf_probe_broadcasts_codebook(spark):
    """IVF assignment must broadcast the centroid codebook — the scan
    side never shuffles for the assignment."""
    from spark_query_engine.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = S.ivf_assign(emb, "vec_id", "embedding", n_centroids=8)
    assert uses_broadcast_join(df)


def test_window_topk_uses_group_limit(spark):
    """rank<=k windows must plan WindowGroupLimit (per-partition top-k
    before the shuffle — the difference between sorting k rows and
    sorting every group at 100 TB)."""
    from spark_query_engine.queries import queries
    from spark_query_engine.plans import format_plan

    df = queries()["window_topk_per_group"](spark, "/root/testdata/sf0.001")
    plan = format_plan(df, "physical")
    assert "WindowGroupLimit" in plan


def test_sql_broadcast_hint_forces_broadcast(spark, sf_dir):
    """The /*+ BROADCAST */ hint must override the size-threshold
    decision — the escape hatch when statistics undersell a side."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        spark.read.parquet(f"{sf_dir}/customer.parquet").createOrReplaceTempView(
            "c_hint"
        )
        spark.read.parquet(f"{sf_dir}/nation.parquet").createOrReplaceTempView(
            "n_hint"
        )
        df = spark.sql(
            """
            SELECT /*+ BROADCAST(n_hint) */ c_custkey, n_name
            FROM c_hint JOIN n_hint ON c_nationkey = n_nationkey
            """
        )
        assert uses_broadcast_join(df)
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_correlated_subqueries_decorrelate_to_semi_anti(spark):
    """The TPC-H subquery suite must lower to joins, never per-row
    re-execution: q4's EXISTS → LeftSemi with the non-equi date
    residual; q21's stacked EXISTS/NOT EXISTS → LeftSemi + LeftAnti
    probes on l_orderkey (RewritePredicateSubquery)."""
    from spark_query_engine.queries import queries
    from spark_query_engine.plans import format_plan

    sf = "/root/testdata/sf0.001"
    q4 = format_plan(queries()["tpch_q4"](spark, sf), "physical")
    assert "LeftSemi" in q4
    q21 = format_plan(queries()["tpch_q21"](spark, sf), "physical")
    assert "LeftSemi" in q21 and "LeftAnti" in q21


def test_q7_q8_broadcast_dims_no_cartesian(spark):
    """Q7/Q8 plan shape: the nation/region/part dims must land as
    BroadcastHashJoin probes (never shuffles of the fact side against
    a 25-row table), and the bi-directional nation-pair disjunction in
    q7 must not degrade to a cartesian product."""
    from spark_query_engine.plans import format_plan
    from spark_query_engine.queries import queries

    sf = "/root/testdata/sf0.001"
    for name in ("tpch_q7", "tpch_q8"):
        plan = format_plan(queries()[name](spark, sf), "physical")
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_embedding_dedup_is_bucketed_not_nested_loop(spark):
    """``dedup_embedding_scaled`` (near-dup threshold, CP-LSH
    blocking) must generate its candidates through an EQUI-join on
    the cross-polytope (band, key) — never the all-pairs id_a < id_b
    theta-join. BroadcastNestedLoopJoins are allowed only as
    bounded-side broadcasts (the bands-row rotation-matrix relation —
    model state — and the 1-row candidate_fraction aggregate), never
    data-plane joins."""
    from spark_query_engine.plans import format_plan
    from spark_query_engine.queries import queries

    df = queries()["dedup_embedding_scaled"](spark, "/root/testdata/sf0.001")
    plan = format_plan(df, "physical")
    assert "CartesianProduct" not in plan
    # every nested-loop line is the BuildRight Cross of a bounded
    # broadcast (plan text may repeat cached subtrees, so check
    # shape, not count)
    for ln in plan.splitlines():
        if "BroadcastNestedLoopJoin" in ln:
            assert "BuildRight, Cross" in ln, ln.strip()
    # the candidate join itself is a hash/merge equi-join
    assert any(
        op in plan
        for op in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )


def test_embedding_cosine_exact_is_tiled_gemm(spark):
    """``dedup_embedding_cosine`` (round-7 exact rewrite): the tile
    grid must assemble through EQUI-joins on block id — zero
    BroadcastNestedLoopJoin, zero CartesianProduct anywhere — with
    the GEMM prefilter running as one Arrow-batched MapInPandas and
    the block relation cached once and served to both grid roles
    (two InMemoryTableScans), so the n-row blocking shuffle runs
    once, not twice."""
    from spark_query_engine.queries import queries

    df = queries()["dedup_embedding_cosine"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("MapInPandas") == 1
    # >= 2, not == 2 (r7 advice row): the property under test is that
    # the cached block relation serves BOTH grid roles; an exact count
    # is brittle against Spark formatting/AQE cache-node variations
    assert plan.count("InMemoryTableScan") >= 2, (
        "block cache must serve both grid roles"
    )
    assert any(
        op in plan
        for op in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )


def test_semdedup_pairs_join_is_cluster_blocked(spark):
    """SemDeDup's pair comparison must be an equi-join on the k-means
    cluster key (hash-partitioned, O(n²/k) pairs) — never a cartesian
    of the corpus. The kept/pruned decision join must also stay a hash
    join."""
    from spark_query_engine.plans import format_plan
    from spark_query_engine.queries import queries

    df = queries()["corpus_semdedup"](spark, "/root/testdata/sf0.001")
    plan = format_plan(df, "physical")
    assert "CartesianProduct" not in plan
    # the only nested-loop lines allowed: the broadcast 1-row codebook
    # (model state — the assignment shape since round 7)
    for ln in plan.splitlines():
        if "BroadcastNestedLoopJoin" in ln:
            assert "BuildRight, Cross" in ln, ln.strip()
    # the pair comparison itself stays a hash equi-join on centroid
    assert any(
        op in plan
        for op in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )


def test_kmeans_assignment_has_no_shuffle(spark):
    """Centroids ship as a BROADCAST 1-row codebook relation (the
    round-7 fix for the ∝k F.lit construction cost): the assignment
    scan is that single bounded BuildRight-Cross broadcast plus one
    projection — NO data-plane shuffle, no hash-partitioned
    exchange, no cartesian."""
    from spark_query_engine.operators import clustering as C
    from spark_query_engine.plans import format_plan

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    v = C._vectors(emb, "vec_id", "embedding")
    cents = [[0.1] * 64, [0.2] * 64]
    plan = format_plan(C.assign_to_centroids(v, cents), "physical")
    assert "CartesianProduct" not in plan
    for ln in plan.splitlines():
        if "BroadcastNestedLoopJoin" in ln:
            assert "BuildRight, Cross" in ln, ln.strip()
    # widen()'s RoundRobin repartition is parallelism, not data
    # movement keyed by the codebook — no hash-partitioned shuffle
    assert "HashPartitioning" not in plan


def test_repetition_metrics_single_gram_relation(spark):
    """The three n-gram relations union BEFORE aggregation, so the
    whole metric computes in two hash aggregations — no join between
    per-n branches, no window over the raw gram stream."""
    from spark_query_engine.operators.textanalysis import repetition_metrics
    from spark_query_engine.plans import format_plan

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = format_plan(repetition_metrics(docs, "doc_id", "text"), "physical")
    assert "Join" not in plan
    assert "Window" not in plan


def test_runtime_bloom_filter_prunes_shuffle_join_probe(spark, sf_dir):
    """The 100 TB fact-fact join knob: when the build side is
    selective but too big to broadcast, Spark's runtime bloom filter
    (spark.sql.optimizer.runtime.bloomFilter.enabled) injects
    might_contain(xxhash64(key)) into the PROBE side's scan — probe
    rows drop before the shuffle instead of after the join. The
    sizeThresholds exist so it only fires where it pays (probe scan
    ≥10 GB by default); zeroed here to demonstrate the rewrite on
    test-scale data."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        j = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        from spark_query_engine.plans import format_plan

        assert "might_contain" in format_plan(j, "optimized")
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_pq_probe_never_shuffles_table(spark):
    """PQ encode + ADC ranking must be scan → project →
    TakeOrderedAndProject: codebooks and lookup tables are literals,
    so no join and no hash-partitioned exchange of the corpus."""
    from spark_query_engine.plans import format_plan
    from spark_query_engine.queries import queries

    df = queries()["corpus_pq_topk"](spark, "/root/testdata/sf0.001")
    plan = format_plan(df, "physical")
    assert "Join" not in plan
    assert "HashPartitioning" not in plan
    assert "TakeOrderedAndProject" in plan


def test_headline_plans_have_no_scale_killers(spark):
    """Every bench headline query must be free of plan shapes that
    cannot survive a 100× scale-up: no CartesianProduct ever, and
    BroadcastNestedLoopJoin only where the broadcast side is a
    single-row/few-row aggregate relation (percentile bounds, global
    metric rows) — never a corpus-sized side."""
    from bench import HEADLINE
    from spark_query_engine.plans import format_plan
    from spark_query_engine.queries import queries

    # queries whose plan legitimately carries a BNLJ against a 1-row
    # (or |langs|-row) aggregate: the cross join IS the broadcast of a
    # scalar bound, not a data-plane join
    one_row_bnlj_ok = {
        "corpus_curate_full",
        "data_quality_checks",
        # the 1-row total-count aggregate crosses the 9-row digit
        # relation — scalar broadcast, constant-bounded both sides
        "data_benford_audit",
        # sources × (V+1)-symbol dense fan-out: the broadcast side is
        # the bounded symbol alphabet (top-V + OOV), never documents
        "text_source_jsd",
        # the 1-row global doc count broadcast into the per-doc
        # position map — scalar model state
        "corpus_quantile_normalize",
        # 3-row weight table × 1-row confusion aggregate — both sides
        # bounded model state
        "linkage_fellegi_sunter",
        # B-row replicate fan-out and the 1-row point/lo/hi assembly:
        # every BNLJ side is O(B)=32 rows, constant at any data size
        "stats_poisson_bootstrap",
        # langs × bounded-support fan-out and the 1-row reference
        # count broadcast — both BNLJ sides are bounded relations
        "stats_ks_drift",
        # 1-row hits × 1-row test-count × 1-row train-count assembly
        "graph_linkpred_eval",
        # 1-row sampled-edge count × 1-row sampled-triangle count
        # assembly (the DOULION estimator's final projection) — both
        # BNLJ sides are single-row aggregates
        "graph_triangle_sampled",
        # 1-row min-day / counts / psi-total broadcasts into the
        # bucket grid — every BNLJ side is O(1) or O(buckets)
        "stats_psi_drift",
        # 1-row reference-count broadcast into the |langs|-row
        # rank-sum aggregate — both BNLJ sides bounded
        "stats_auc_mannwhitney",
        # 1-row totals / chi2-total broadcasts into the k-row
        # contingency relation — every BNLJ side is O(1) or O(k)
        "stats_chi2_drift",
        # 1-row min/max-day and moment aggregates crossed with the
        # O(days)/O(lags) grid — all BNLJ sides bounded
        "events_acf_lags",
        # 1-row distinct-user count broadcast onto the k²-row pair
        # relation — BNLJ side is O(1)
        "events_item_cooccurrence",
        # 1-row moment aggregate emits the final row; rank marginals
        # broadcast onto the O(days) series — all sides bounded
        "stats_spearman_daily",
        # 1-row min/max-day and MAE broadcasts onto the O(days)
        # forecast relation — all BNLJ sides bounded
        "events_holt_backtest",
        # the C(days,2) pair fan-out broadcasts the O(days) daily
        # aggregate — the Theil-Sen bounded-relation pattern
        "stats_kendall_tau",
        # the |sources|² pair grid (a<b on the per-source aggregate)
        # and the 1-row est/exact assembly — every BNLJ side is an
        # O(sources)-row aggregate or O(1), never the shingle plane
        "agg_kmv_jaccard",
        # the 1-row exact-count × 1-row sketch-estimate assembly —
        # both BNLJ sides are scalar aggregates of the CMS cells
        "join_cardinality_sketch",
        # the 1-row max-normalizer aggregates broadcast back into each
        # HITS half-round — scalar model state, never the edge plane
        "graph_hits_bipartite",
        # 1-row total/leak-count aggregates crossed into the 3-row
        # per-split census — every BNLJ side is O(1)
        "data_group_split_audit",
        # the 1-row total/target aggregate broadcast into the O(files)
        # catalog relation — scalar model state
        "data_compaction_plan",
        # the 1-row global-max-day / total aggregates broadcast into
        # the user relation and O(days) risk table — scalar state
        "events_survival_km",
        # the 1-row min-day broadcast into the event scan and the
        # 1-row moment aggregate crossed with the 2-row arm census —
        # every BNLJ side is scalar model state
        "stats_cuped_adjusted",
        # 1-row totals crossed into the O(days) bucket relation and
        # the final 1-row assembly — every BNLJ side is O(1)/O(days)
        "stats_jackknife_ratio",
        # the 2-row arm literal crossed with the O(days) grid — both
        # BNLJ sides bounded model relations
        "stats_msprt_sequential",
        # the 1-row n_total aggregate crossed into the bounded
        # ctx x action policy grid — scalar model state
        "events_policy_replay",
        # the 1-row min-day broadcast into the event scan — scalar
        # model state; the curve window runs on the bounded score grid
        "stats_qini_uplift",
        # the broadcast anchor batch is the bounded build side — the
        # ann_batch_topk shape
        "ann_hard_negatives",
        # 1-row node/edge/moment aggregates assembled by crossJoin —
        # every BNLJ side is O(1)
        "graph_assortativity",
        # the 1-row global-moment aggregate crossed into the bounded
        # |types| x folds encoding grid — scalar model state
        "data_target_encoding",
        # the 1-row word/char grand totals crossed into the word-TYPE
        # relation — scalar model state (the BPE trainer's shape)
        "corpus_unigram_prune",
        # the 1-row watermark aggregate crossed into the |types|-row
        # census — scalar model state
        "data_freshness_audit",
        # ivf_assign scores every vector against all k centroids: the
        # BNLJ broadcast side is the k-row codebook (model state)
        "ann_ivf_topk",
        # the 1-row vocab-size aggregate crosses the |alphabet|²-row
        # model relation — a scalar broadcast, not a data-plane join
        "corpus_lm_score",
        # 1-row distribution stats × 5-row heavy-hitter list: both
        # sides are aggregates of the key-frequency relation
        "data_skew_report",
        # 1-row corpus stats (N, avgdl) broadcast into the scoring agg
        "text_bm25_search",
        # 1-row sketch/percentile aggregate crossed with the rank audit
        "corpus_sketch_quantiles",
        # the 1-row total-basket-count aggregate (norders) broadcasts
        # into support/lift scoring; the pair self-join itself plans a
        # BroadcastHashJoin on o_orderkey with the part< part residual
        "basket_association_rules",
        # the 1-row quartile-bounds aggregate broadcasts into the
        # value-comparison bucketing (replaced the global NTILEs)
        "customer_rfm_segments",
        # the BNLJ broadcast side is the 8-row query-vector batch —
        # the batch is the small side by construction
        "ann_batch_topk",
        # 1-row totals (N_target, N_raw, |vocab|) cross the bigram
        # model relation — scalar broadcast, same shape as lm_score
        "corpus_dsir_select",
        # ground-truth pass scores the corpus against the broadcast
        # 8-row query batch (same bounded build side as ann_batch_topk)
        "ann_recall_eval",
        # the token stream crosses the broadcast 4-row hash-function
        # dimension (d = 0..3) — a constant-width fan-out, the CMS
        # sketch's definition, never a data-plane join
        "corpus_sketch_cms",
        # the k-row occupancy relation crosses its own 1-row total —
        # scalar broadcast over an aggregate, like data_skew_report
        "corpus_ivf_occupancy",
        # per-table census rows: each is a 1-row COUNT aggregate
        # crossed with another 1-row COUNT aggregate
        "data_gdpr_cascade_delete",
        # n_nodes/n_edges/n_wedges/n_triangles are four 1-row
        # aggregates assembled by crossJoin — the wedge and closing
        # joins themselves are hash equi-joins
        "graph_triangle_count",
        # the 1-row tercile-bounds aggregate broadcasts into the
        # phase bucketing scan (the RFM percentile-bounds pattern)
        "corpus_curriculum_order",
        # the 1-row corpus grand total broadcasts into the lift scan;
        # the census row is a 1-row x 1-row aggregate cross
        "corpus_topic_keywords",
        # envelope census (manifest-sized) crossed with the 1-row
        # ground-truth count aggregate
        "data_skipping_audit",
        # 1-row tercile-bounds broadcast over the scored relation
        # (the curriculum/RFM pattern) + the |alphabet|²-row LM model
        # crossing its 1-row vocab total (the lm_score shape)
        "corpus_ccnet_buckets",
        # member/bit/probe censuses: 1-row aggregates crossJoined
        "data_bloom_fpr_audit",
        # the k-row PQ codebook broadcasts into encode/ADC scans
        # (the ann_ivf_topk model-state shape)
        "corpus_pq_recall_eval",
        # same codebook-broadcast shape via kmeans assignment
        "corpus_knn_classify",
        # 1-row p80 bound broadcast (the percentile-bounds pattern)
        "customer_pareto_report",
        # two bounded BNLJ broadcasts: the bands-row rotation-matrix
        # relation (model state, the ann_ivf_topk codebook shape) into
        # the signature scan, and the 1-row candidate_fraction
        # aggregate into the verified-pairs output; the candidate join
        # itself is a hash equi-join on (band, key).
        # (dedup_embedding_cosine left this list in round 7: its exact
        # tiled-GEMM plan is pure equi-joins — see
        # test_embedding_cosine_exact_is_tiled_gemm)
        "dedup_embedding_scaled",
        # the bands-row cross-polytope rotation relation (model state,
        # 32 rows, F.broadcast()'d at operators/similarity.py) fans
        # into the signature scan — the same bounded rotation-matrix
        # broadcast as dedup_embedding_cosine; the candidate probe
        # join is a hash equi-join on (band, key)
        "ann_cp_topk",
        # same rotation-relation broadcast feeding the per-band bucket
        # census; the occupancy stats are 1-row aggregate crosses
        "dedup_cp_band_balance",
        # the 4-row Matryoshka prefix-length dimension crosses the
        # embedding scan — a constant-width fan-out (the CMS
        # hash-dimension shape), never a data-plane join
        "vec_matryoshka_audit",
        # the 16-row shard census crosses its own 1-row max/min
        # aggregate (the data_skew_report shape)
        "data_shard_balance",
        # the bounded candidate relation (1 + rounds·l rows of model
        # state) crosses its 1-row phi-audit aggregate
        "corpus_kmeanspp_init",
        # the quasi-identifier class census crosses its own 1-row
        # total (the data_skew_report shape)
        "data_kanonymity_audit",
        "data_ldiversity_audit",
        # the four 1-row stage-census aggregates assemble by crossJoin
        # (the graph_triangle_count census shape); every data-plane
        # stage join is a hash equi-join or left-anti
        "pipeline_dedup_cascade",
        # ground-truth pass scores the corpus against the broadcast
        # 8-row query batch (the ann_batch_topk/ann_recall_eval shape)
        "ann_ndcg_eval",
        # the 1-row global vocab/mass aggregate broadcasts into the
        # per-(source, token) scorer (the corpus_lm_score shape)
        "text_source_kl_divergence",
        # three 1-row audit aggregates (moments, bucket census, max
        # degree) assemble by crossJoin — the triangle-census shape
        "graph_degree_powerlaw",
        # the 5-row reliability-bin census crosses its own 1-row
        # ECE-numerator aggregate (the data_skew_report shape)
        "text_langid_calibration",
        # the |sources|-row plan relation crosses its 1-row budget/
        # denominator and allocation-total aggregates — scalar
        # broadcasts over aggregates, never data-plane joins
        "corpus_epoch_plan",
        # the |sources|-row stratum relation crosses its 1-row
        # mass/variance totals (the epoch-plan shape)
        "corpus_neyman_allocation",
        # the broadcast 10-row checkpoint dimension fans into the
        # per-doc-count and type relations via a bounded non-equi
        # range predicate (the CMS hash-dimension shape), and the
        # 10-point regression aggregate crosses back as a 1-row
        # scalar broadcast
        "text_heaps_law",
        # each multiplicative-weights round crosses the |sources|-row
        # weight relation with its own 1-row normalization sum, plus
        # the 1-row global vocab/mass aggregate of the KL pass (the
        # text_source_kl_divergence shape)
        "corpus_domain_mixture",
        # --- round 6: HEADLINE extended to the full registry; the
        # --- pre-r6 queries below were audited when first registered
        # --- and re-audited now — every build side is 1-row or a
        # --- bounded dimension/model relation
        # every-vector-vs-broadcast-k-centroids fan-out (the
        # assignment shape; build side = k rows of model state)
        "ann_centroid_margin_audit",
        # the broadcast 1-row k-means codebook (model state) crosses
        # the vector scan — the round-7 assignment shape, replacing
        # the ∝k F.lit literal (measured ~9 s/call at k=313); every
        # data-plane join in these stays a hash equi-join
        "corpus_kmeans",
        "corpus_semdedup",
        "corpus_ivf_learned",
        "corpus_cluster_cohesion",
        "ann_ivf_pq_topk",
        "corpus_ivf_occupancy",
        # precision/recall census: three 1-row aggregates crossJoin
        "corpus_dedup_eval",
        # the per-doc gate crosses the 1-row corpus-percentile row
        "corpus_length_gate",
        # |sources|-row mixture relation × its 1-row totals
        "corpus_mixture_plan",
        # two 1-row mergeable-sketch aggregates crossJoin for the
        # exact-vs-merged comparison
        "corpus_sketch_merge",
        # the |sources|-row census crosses itself (|s|² ≤ 100 cells)
        # and its 1-row total — Gini needs all pairwise gaps
        "corpus_source_balance_gini",
        # head-coverage census crosses the 1-row vocab total
        "corpus_vocab_coverage",
        # the broadcast ~9-row threshold dimension fans into the
        # verified-pair relation via a bounded theta-join (pricing
        # every threshold off ONE pass is the point of the query)
        "dedup_threshold_sweep",
        # three 1-row funnel-stage counts crossJoin (census shape)
        "events_funnel",
        # pair-lift relation crosses its 1-row user total
        "events_type_affinity",
        # region × nation (5 × 25 rows) — the deliberate CROSS JOIN
        # demonstration query; both sides are static dimensions
        "join_cross_count",
        # non-equi band-interval join against the broadcast bounded
        # band dimension — the range-join shape, inherently BNLJ
        "join_range_bands",
        # aging buckets cross the 1-row reference-date aggregate
        "orders_backlog_aging",
        # rollup census crosses its 1-row revenue total
        "region_revenue_rollup",
        # tf·idf crosses the 1-row corpus doc-count aggregate
        "text_tfidf",
        # length histogram crosses its 1-row token total
        "text_word_length_profile",
        # label census crosses its 1-row corpus total
        "vec_label_balance",
    }
    # queries whose plan carries an UNPARTITIONED window over a
    # provably bounded relation (top-k candidate lists, tiny rollups)
    # — never over a corpus-scaled row count
    small_window_ok = {
        # SUM() OVER () runs on the per-language aggregate (|langs|
        # rows) to derive mixture weights — bounded by the language
        # inventory, not the corpus
        "corpus_curate_full",
        # row_number() runs on the already-extracted 5-row heavy-hitter
        # list (TakeOrderedAndProject feeds it) — the top-k itself is
        # distributed
        "data_skew_report",
        # RRF rank fusion windows run over the per-modality top-K
        # candidate lists (≤50 rows each, TakeOrderedAndProject feeds
        # them) — never over the corpus
        "ann_hybrid_search",
        # the top-5 rank runs over the path census — bounded by the
        # event-type inventory cubed (≤125 rows), never by events
        "events_path_topk",
        # the rank + regression run over the top-200 vocabulary
        # relation (TakeOrderedAndProject feeds it)
        "text_zipf_fit",
        # the weighted top-k rank runs over the bounded k-means||
        # candidate relation (1 + rounds·l rows of driver model
        # state), never the corpus
        "corpus_kmeanspp_init",
        # the CI order statistic ranks the B=32-row replicate-mean
        # relation — O(B) regardless of data size, never the rows
        "stats_poisson_bootstrap",
        # the reference-CDF running sum orders the DISTINCT-support
        # relation (bounded for discretized scores; bucket first if
        # the support were unbounded — see docstring)
        "stats_ks_drift",
        # same KS-pattern running sum over the bounded DISTINCT
        # length-value support for the below-v reference mass
        "stats_auc_mannwhitney",
        # midrank running sums over the O(days) value-count relations
        "stats_spearman_daily",
        # sorted-cumsum packing over the O(files) catalog relation —
        # aggregated metadata, never the document plane
        "data_compaction_plan",
        # at-risk cumsum over the O(days) risk table — bounded
        # aggregated metadata, never the event plane
        "events_survival_km",
        # threshold cumsums over the bounded O(|scores|) grid — the
        # per-score cells aggregate on the data plane first
        "stats_qini_uplift",
        # 7-day moving window over the bounded O(days) daily-count
        # grid — the day-keyed count aggregates on the data plane
        "events_seasonal_decompose",
        # --- round 6 HEADLINE extension ---
        # share/cum-share windows over the AGGREGATED (lang, source)
        # cell relation (≤ |langs|·|sources| rows), never documents
        "corpus_source_mix",
        # temperature weights window over the same aggregated
        # (lang, source) cell relation
        "corpus_temperature_sample",
        # head-rank window over the word-TYPE (vocabulary) relation —
        # vocab-bounded, the text_zipf_fit shape
        "corpus_vocab_coverage",
        # global ntile/cume_dist is DEFINITIONALLY a total order over
        # the input — the API-demonstration query keeps the exact
        # semantics; at corpus scale quartiles come from
        # percentile_approx boundaries instead (documented trade)
        "window_ntile_cume",
        # --- round 9: global_rank offsets became a relation ---
        # running sum over the p-row partition-count aggregate,
        # p ≤ 4·parallelism — bounded by CLUSTER, not data (see
        # operators/linkage.py:global_rank and the matching
        # GLOBAL_WINDOW_ALLOWLIST entries)
        "pipeline_entity_resolution",
        "linkage_sorted_neighborhood",
        "linkage_fellegi_sunter",
        "stats_psi_drift",
        "corpus_quantile_normalize",
    }

    def global_windows(plan: str) -> list[str]:
        # WindowExec prints `Window [exprs], [part?], [order?]` with
        # empty groups omitted. Unpartitioned shapes — the ones behind
        # "WindowExec: No Partition Defined … single partition"
        # warnings — are: 2 groups whose trailer is an ORDER spec
        # (global-ordered: trailer carries ASC/DESC), or 1 group
        # (global-unordered). 2 groups with a plain-column trailer is
        # partitioned-unordered, and 3 groups partitioned-ordered —
        # both scale fine.
        bad = []
        for ln in plan.splitlines():
            s = ln.strip()
            if "Window [" not in s or "WindowGroupLimit" in s:
                continue
            groups = s.split("], [")
            if len(groups) == 1 or (
                len(groups) == 2
                and ("ASC" in groups[1] or "DESC" in groups[1])
            ):
                bad.append(s)
        return bad

    qs = queries()
    sf = "/root/testdata/sf0.001"
    bad = []
    for name in HEADLINE:
        plan = format_plan(qs[name](spark, sf), "physical")
        if "CartesianProduct" in plan:
            bad.append((name, "CartesianProduct"))
        if "BroadcastNestedLoopJoin" in plan and name not in one_row_bnlj_ok:
            bad.append((name, "BroadcastNestedLoopJoin"))
        gw = global_windows(plan)
        if gw and name not in small_window_ok:
            bad.append((name, f"single-partition Window: {gw[0][:80]}"))
    assert not bad, bad


def test_analyze_table_feeds_optimizer_statistics(spark, sf_dir):
    """The CBO workflow at lake scale: ANALYZE TABLE materializes
    size/row statistics into the catalog, and the optimizer sees them
    (logical-plan stats carry the exact row count, not a file-size
    guess) — what drives stats-based join reordering and broadcast
    decisions when relations are views/derived rather than raw files."""
    import shutil

    spark.sql("DROP TABLE IF EXISTS cbo_nation")
    shutil.rmtree("spark-warehouse/cbo_nation", ignore_errors=True)
    try:
        spark.read.parquet(f"{sf_dir}/nation.parquet").write.mode(
            "overwrite"
        ).saveAsTable("cbo_nation")
        spark.sql("ANALYZE TABLE cbo_nation COMPUTE STATISTICS")
        stats_row = (
            spark.sql("DESCRIBE EXTENDED cbo_nation")
            .where("col_name = 'Statistics'")
            .head()
        )
        assert "25 rows" in stats_row["data_type"]
        # row-count statistics surface to the optimizer under CBO
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            jstats = (
                spark.table("cbo_nation")
                ._jdf.queryExecution()
                .optimizedPlan()
                .stats()
            )
            assert str(jstats.rowCount().get()) == "25"
        finally:
            spark.conf.unset("spark.sql.cbo.enabled")
    finally:
        spark.sql("DROP TABLE IF EXISTS cbo_nation")


def test_ohlc_downsample_is_single_shuffle(spark):
    """events_downsample_ohlc claims one hash-partition of
    (bucket, type) shared by both rank windows AND the final
    aggregation: exactly one Exchange in the physical plan — the
    second window re-sorts but must not re-shuffle, and the groupBy
    must reuse the window's partitioning."""
    from spark_query_engine.plans import format_plan
    from spark_query_engine.queries import queries

    df = queries()["events_downsample_ohlc"](spark, "/root/testdata/sf0.001")
    plan = format_plan(df, "physical")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_hybrid_search_fuses_topk_lists_without_global_window(spark):
    """ann_hybrid_search must (a) broadcast the query-document token
    list into the lexical overlap join — never shuffle the corpus by
    token against a one-document side, and (b) reduce each modality
    via TakeOrderedAndProject (top-K), not a whole-corpus Window/Sort:
    the only Window operators allowed are over the two K-row
    candidate lists, which sit above the top-K limits in the plan."""
    from spark_query_engine.plans import format_plan
    from spark_query_engine.queries import queries

    df = queries()["ann_hybrid_search"](spark, "/root/testdata/sf0.001")
    plan = format_plan(df, "physical")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
