"""Source/sink tests: parquet/csv/json roundtrips, partitioned writes
with partition pruning, and the debug CSV sink (the reference's only
sink, src/datatypes/mod.rs:308-328)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_query_engine.plans import formatted_explain


def test_parquet_roundtrip(ctx, sf_dir, tmp_path):
    out = str(tmp_path / "cust")
    src = ctx.parquet(f"{sf_dir}/customer.parquet")
    src.write_parquet(out)
    back = ctx.parquet(out)
    assert back.count() == src.count()
    assert back.schema() == src.schema()


def test_partitioned_write_enables_pruning(ctx, sf_dir, tmp_path):
    out = str(tmp_path / "orders_by_status")
    ctx.parquet(f"{sf_dir}/orders.parquet").write_parquet(
        out, partition_by=["o_orderstatus"]
    )
    pruned = ctx.parquet(out).filter(F.col("o_orderstatus") == "F")
    # partition filter must be applied at scan planning, not post-scan
    assert "PartitionFilters" in formatted_explain(pruned.to_spark())
    full = ctx.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderstatus") == "F"
    )
    assert pruned.count() == full.count()


def test_csv_roundtrip_all_string(ctx, tmp_path):
    out = str(tmp_path / "csv_out")
    df = ctx.memory([{"id": "1", "name": "bob"}, {"id": "2", "name": "ann"}])
    df.write_csv(out)
    back = ctx.csv(out)  # reference semantics: all-string read
    assert back.count() == 2
    assert [f.dataType.typeName() for f in back.schema().fields] == ["string", "string"]


def test_json_roundtrip(ctx, tmp_path):
    out = str(tmp_path / "json_out")
    df = ctx.memory([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
    df.write_json(out)
    back = ctx.json(out)
    assert {tuple(sorted(r.asDict().items())) for r in back.collect()} == {
        (("a", 1), ("b", "x")),
        (("a", 2), ("b", "y")),
    }


def test_debug_csv_sink(ctx):
    df = ctx.memory([{"id": "1", "x": "a"}, {"id": "2", "x": "b"}]).sort("id")
    assert df.to_csv() == "1,a\n2,b\n"


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Bucketed tables co-located on the join key: the join reads both
    sides pre-hashed, so the plan has NO shuffle Exchange — the 100 TB
    pattern for repeatedly-joined fact tables."""
    # spark.sql.warehouse.dir is static — tables land in the default
    # warehouse; managed tables are dropped (files removed) in finally
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    spark.read.parquet(f"{sf_dir}/orders.parquet").write.bucketBy(
        8, "o_custkey"
    ).sortBy("o_custkey").saveAsTable("b_orders")
    spark.read.parquet(f"{sf_dir}/customer.parquet").write.bucketBy(
        8, "c_custkey"
    ).sortBy("c_custkey").saveAsTable("b_customer")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_orc_roundtrip(ctx, sf_dir, tmp_path):
    out = str(tmp_path / "cust_orc")
    src = ctx.parquet(f"{sf_dir}/customer.parquet")
    src.write_orc(out)
    back = ctx.orc(out)
    assert back.count() == src.count()
    assert back.schema() == src.schema()


def test_compaction_reduces_file_count(spark, sf_dir, tmp_path):
    """Small-file compaction: a 40-file directory (streaming-ingest
    shape) rewrites to the byte-sized file count with identical data."""
    import glob

    from spark_query_engine.operators.maintenance import compact_parquet

    src = str(tmp_path / "small")
    dst = str(tmp_path / "compacted")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.repartition(40).write.parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 40

    n = compact_parquet(spark, src, dst, target_file_bytes=1 << 30)
    assert n == 1
    assert len(glob.glob(f"{dst}/*.parquet")) == 1
    assert (
        spark.read.parquet(dst).count() == orders.count()
    )


def test_python_datasource_synth_docs(spark):
    """The custom Python DataSource (Spark 4 DataSource API) must (a)
    register and read through the normal reader path, (b) split into
    the declared number of input partitions (executor-side generation,
    nothing driver-materialized), (c) produce deterministic,
    seed-addressed content on repeated reads, and (d) compose with
    ordinary Catalyst ops (filter + agg) downstream."""
    from spark_query_engine.pysource import SynthDocsDataSource, _doc

    spark.dataSource.register(SynthDocsDataSource)
    df = (
        spark.read.format("synth_docs")
        .option("n", 500)
        .option("seed", 7)
        .option("numPartitions", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    rows = {r["doc_id"]: r for r in df.collect()}
    assert len(rows) == 500
    # deterministic + pure-function contract
    did, text, lang, n_tokens = _doc(7, 123)
    assert rows[123]["text"] == text and rows[123]["lang"] == lang
    again = {r["doc_id"]: r["text"] for r in df.collect()}
    assert again == {k: v["text"] for k, v in rows.items()}
    # catalyst composes downstream
    agg = (
        df.where("n_tokens >= 30")
        .groupBy("lang")
        .count()
        .collect()
    )
    assert sum(r["count"] for r in agg) == sum(
        1 for r in rows.values() if r["n_tokens"] >= 30
    )


def test_python_datasource_paged_api(spark):
    """The REST-paginated connector shape: page-number addressing
    parallelizes into page-range partitions, each page fetch happens
    executor-side, the synthetic endpoint serves the deterministic
    generator corpus, and Catalyst composes downstream."""
    from spark_query_engine.pysource import PagedApiDataSource, _doc

    spark.dataSource.register(PagedApiDataSource)
    df = (
        spark.read.format("paged_api")
        .option("endpoint", "synthetic:7")
        .option("pages", 8)
        .option("pageSize", 25)
        .option("numPartitions", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    rows = {r["doc_id"]: r for r in df.collect()}
    assert len(rows) == 8 * 25
    # page assignment is doc_id // pageSize; content matches the
    # generator pure function
    did, text, lang, n_tokens = _doc(7, 123)
    assert rows[123]["text"] == text and rows[123]["page"] == 123 // 25
    # filters compose (and would prune pages server-side in a real
    # connector via options)
    assert df.where("page = 3").count() == 25


def test_python_datasource_paged_api_stream(spark, tmp_path):
    """Streaming half of the paged connector: the page index is the
    offset, micro-batches advance it, and the committed offset log
    makes replays exact — reading 3 batches of 2 pages covers exactly
    pages 0-5 with no gaps or duplicates."""
    from spark_query_engine.pysource import PagedApiDataSource

    spark.dataSource.register(PagedApiDataSource)
    stream = (
        spark.readStream.format("paged_api")
        .option("endpoint", "synthetic:3")
        .option("pageSize", 10)
        .option("pagesPerBatch", 2)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("paged_api_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        import time as _t

        deadline = _t.time() + 60
        while _t.time() < deadline:
            n = spark.sql("SELECT COUNT(*) c FROM paged_api_sink").head()["c"]
            if n >= 60:
                break
            _t.sleep(0.5)
        got = spark.sql(
            "SELECT doc_id, page FROM paged_api_sink ORDER BY doc_id"
        ).collect()
    finally:
        q.stop()
    ids = [r["doc_id"] for r in got[:60]]
    assert ids == list(range(60)), "pages replayed with gaps or dups"
    assert all(r["page"] == r["doc_id"] // 10 for r in got[:60])


def test_decode_image_pillow_branch():
    """Compressed-codec tier: with Pillow absent the branch refuses
    with NotImplementedError (documented environment gate); with
    Pillow present it decodes a real PNG. Skips rather than fakes —
    the assertion matches whichever environment runs it."""
    import importlib.util

    from spark_query_engine.operators import multimodal as MM

    if importlib.util.find_spec("PIL") is None:
        import pytest as _pytest

        with _pytest.raises(NotImplementedError):
            MM.decode_image(b"\x89PNG\r\n\x1a\n....")
    else:
        import io

        import numpy as np
        from PIL import Image

        img = np.zeros((4, 4, 3), dtype=np.uint8)
        img[0, 0] = (255, 0, 0)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        out = MM.decode_image(buf.getvalue())
        assert (out == img).all()


def test_schema_evolution_merge_and_union(spark, sf_dir, tmp_path):
    """Schema evolution across file generations: an old snapshot
    (3 columns) and a new one (4 columns, one added) must read as one
    relation both ways a lake handles drift — parquet mergeSchema at
    scan time, and unionByName(allowMissingColumns) at plan time —
    with NULLs backfilling the added column for old rows."""
    import pyspark.sql.functions as F

    old_dir = tmp_path / "gen=1"
    new_dir = tmp_path / "gen=2"
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    o.select("o_orderkey", "o_custkey", "o_totalprice").where(
        F.col("o_orderkey") % 2 == 0
    ).write.parquet(str(old_dir))
    o.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    ).where(F.col("o_orderkey") % 2 == 1).write.parquet(str(new_dir))

    merged = spark.read.option("mergeSchema", "true").parquet(
        str(old_dir), str(new_dir)
    )
    assert set(merged.columns) == {
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority",
    }
    n_total = o.count()
    assert merged.count() == n_total
    # old-generation rows surface the added column as NULL
    nulls = merged.where(F.col("o_orderpriority").isNull()).count()
    assert nulls == o.where(F.col("o_orderkey") % 2 == 0).count()

    # plan-time evolution: unionByName with missing columns allowed
    u = spark.read.parquet(str(old_dir)).unionByName(
        spark.read.parquet(str(new_dir)), allowMissingColumns=True
    )
    assert u.count() == n_total
    assert (
        u.where(F.col("o_orderpriority").isNotNull()).count()
        == n_total - nulls
    )


def test_text_source_reads_lines(ctx, tmp_path):
    p = tmp_path / "raw.log"
    p.write_text("alpha 1\nbeta 2\ngamma 3\n")
    df = ctx.text(str(p))
    rows = [r["value"] for r in df.to_spark().collect()]
    assert sorted(rows) == ["alpha 1", "beta 2", "gamma 3"]


def test_ivf_index_write_prunes_probe_partitions(spark, sf_dir, tmp_path):
    """The IVF index BUILD story end-to-end: assign the corpus to
    learned k-means centroids, write PARTITIONED BY centroid (the
    inverted lists become a physical layout), and verify a probe of
    one list plans a PartitionFilters-pruned scan that reads only that
    list's files — list probes cost 1/k of the corpus at ANY scale,
    which is the claim ann_ivf_topk's docstring makes and this test
    pins to the physical plan."""
    from spark_query_engine.operators import clustering as C

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assigned = C.kmeans_assign(spark, emb, "vec_id", "embedding", k=4, iters=1)
    out = str(tmp_path / "ivf_index")
    assigned.select("id", "vec", "centroid").write.partitionBy(
        "centroid"
    ).parquet(out)

    index = spark.read.parquet(out)
    probe = index.where(F.col("centroid") == 1)
    plan = formatted_explain(probe)
    assert "PartitionFilters" in plan
    assert "centroid" in plan.split("PartitionFilters", 1)[1][:200]
    # the probe reads only its list: row count equals that list's size
    want = assigned.where(F.col("centroid") == 1).count()
    assert probe.count() == want


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_dir, tmp_path):
    """Dynamic partition pruning — the runtime half of partition
    pruning: the fact side is partitioned on the join key, the dim
    side carries a selective NON-partition filter, and Spark injects
    a dynamicpruning subquery so the fact scan reads only the
    partitions the filtered dim can match, decided at RUNTIME from
    the dim's build side. This is the plan feature that turns a
    star-schema month filter into a 1/12th fact scan at 100 TB
    without the fact query mentioning the month at all."""
    out = str(tmp_path / "lineitem_by_suppkey_band")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumn(
        "supp_band", (F.col("l_suppkey") % 8).cast("int")
    )
    li.write.partitionBy("supp_band").mode("overwrite").parquet(out)

    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").withColumn(
        "supp_band", (F.col("s_suppkey") % 8).cast("int")
    )
    fact = spark.read.parquet(out)
    dim = supp.where(F.col("s_nationkey") == 3).select(
        "supp_band", "s_suppkey", "s_nationkey"
    ).distinct()
    joined = fact.join(dim, "supp_band")

    plan = formatted_explain(joined)
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    # correctness: identical to the unpartitioned join
    want = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .withColumn("supp_band", (F.col("l_suppkey") % 8).cast("int"))
        .join(dim, "supp_band")
        .count()
    )
    assert joined.count() == want
