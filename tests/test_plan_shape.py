"""Plan-shape regression tests — the scale contract, asserted.

Correctness says the operators compute the right rows; these tests pin
HOW: filters reach the Parquet scan, projections prune columns, small
dims broadcast, aggregation is two-phase, top-N uses the bounded heap,
and relational operators never fall off the JVM into Python.  Each
assertion is an invariant that must survive a 100x scale-up — the
analogs of the reference's extent elimination / PM-join / 2-phase-agg
design decisions (SURVEY §4).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod


@pytest.fixture(scope="module")
def queries():
    return entry_mod.queries()


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushed_to_parquet_scan(queries, spark, sf_dir):
    plan = _physical(queries["scan_filter_project"](spark, sf_dir))
    assert "PushedFilters: [" in plan and "IsNotNull" in plan, plan
    # the scan must not read all columns for a narrow projection
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema  # never projected anywhere


def test_q1_two_phase_aggregation(queries, spark, sf_dir):
    plan = _physical(queries["q1_pricing_summary"](spark, sf_dir))
    assert "partial_sum" in plan, "map-side partial aggregation missing"
    assert plan.count("HashAggregate") >= 2, "expected partial+final HashAggregate"
    assert "Batched: true" in plan, "vectorized parquet reader not engaged"


def test_dim_join_broadcasts(queries, spark, sf_dir):
    plan = _physical(queries["join_inner_broadcast"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_multiway_join_no_cartesian(queries, spark, sf_dir):
    plan = _physical(queries["join_multiway"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_topn_uses_bounded_heap(queries, spark, sf_dir):
    plan = _physical(queries["topn_order_limit"](spark, sf_dir))
    # TakeOrderedAndProject == the reference's LimitedOrderBy priority
    # queue (dbcon/joblist/limitedorderby.h:43) - never a global sort
    assert "TakeOrderedAndProject" in plan, plan


def test_relational_corpus_stays_jvm_side(queries, spark, sf_dir):
    """No relational/window/agg query may contain a Python eval node —
    UDFs are quarantined to the pipeline/multimodal modules."""
    for name in (
        "q1_pricing_summary",
        "groupby_join_agg",
        "window_rank",
        "agg_distinct",
        "group_concat",
        "scalar_subquery",
        "agg_rollup",
    ):
        plan = _physical(queries[name](spark, sf_dir))
        assert "EvalPython" not in plan, f"{name} fell off the JVM:\n{plan}"


def test_semi_join_rewrite(queries, spark, sf_dir):
    """EXISTS subqueries must decorrelate to a semi join (Catalyst
    RewritePredicateSubquery ≅ reference jlf_subquery.cpp:339)."""
    plan = _optimized(queries["join_semi"](spark, sf_dir))
    assert "LeftSemi" in plan, plan


def test_not_in_null_aware_anti(queries, spark, sf_dir):
    plan = _optimized(queries["join_not_in_nullaware"](spark, sf_dir))
    assert "LeftAnti" in plan, plan


def test_always_false_filter_short_circuits(spark, sf_dir):
    """WHERE FALSE must collapse to an empty LocalRelation with NO file
    scan (≅ TupleConstantBooleanStep, tupleconstantstep.h:137)."""
    from infinidb_spark.session import load_tables

    li = load_tables(spark, sf_dir, names=("lineitem",))["lineitem"]
    df = li.filter("1 = 0").select("l_orderkey")
    plan = _physical(df)
    assert "FileScan" not in plan, plan
    assert df.count() == 0


def test_broadcast_hint_is_honored(spark, sf_dir):
    """Join-strategy hints ≅ the reference's infinidb_ordered session
    hint (ha_calpont_execplan.cpp:4126) — user can force the PM-join."""
    from infinidb_spark.session import load_tables

    t = load_tables(spark, sf_dir, names=("lineitem", "orders"))
    saved_bht = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hinted = t["lineitem"].join(
            t["orders"].hint("broadcast"),
            t["lineitem"].l_orderkey == t["orders"].o_orderkey,
        )
        assert "BroadcastHashJoin" in _physical(hinted)
        unhinted = t["lineitem"].join(
            t["orders"], t["lineitem"].l_orderkey == t["orders"].o_orderkey
        )
        assert "BroadcastHashJoin" not in _physical(unhinted)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved_bht)


def test_no_accidental_cartesian_anywhere(queries, spark, sf_dir):
    """Sweep EVERY registered query's physical plan: no CartesianProduct
    or BroadcastNestedLoopJoin except the intentional cross join —
    quadratic plans at 100 TB are outages, not slowdowns."""
    # join_cross is the intentional cross join; ann_batch_topk scores
    # corpus × query-batch by design — the product is bounded by the
    # BROADCAST query batch (a handful of vectors), not data × data
    # ann_batch_topk / ann_recall_attest: corpus × BROADCAST query batch
    # (a handful of vectors), not data × data
    allowed = {"join_cross", "ann_batch_topk", "ann_recall_attest"}
    offenders = []
    for name, fn in sorted(queries.items()):
        if name in allowed:
            continue
        plan = _physical(fn(spark, sf_dir))
        if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
            offenders.append(name)
    assert not offenders, f"quadratic join plans in: {offenders}"


def test_cache_using_operators_leave_nothing_cached(queries, spark, sf_dir):
    """The dedup and bulk-load operators must release (or never take)
    executor storage: after materializing them the SQL cache manager is
    empty, and no source file converts a DataFrame to an RDD to probe
    partition counts (regression: minhash persists never unpersisted;
    fan_out's df.rdd probe)."""
    import os
    import infinidb_spark

    spark.catalog.clearCache()
    queries["dedup_minhash_lsh"](spark, sf_dir).count()
    queries["dedup_simhash"](spark, sf_dir).count()
    queries["bulk_load_csv_roundtrip"](spark, sf_dir).count()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()

    import ast

    src_root = os.path.dirname(os.path.abspath(infinidb_spark.__file__))
    offenders = []
    for dirpath, _, files in os.walk(src_root):
        for fn in files:
            if fn.endswith(".py"):
                p = os.path.join(dirpath, fn)
                tree = ast.parse(open(p).read())
                if any(
                    isinstance(n, ast.Attribute) and n.attr == "rdd"
                    for n in ast.walk(tree)
                ):
                    offenders.append(p)
    assert not offenders, f"df.rdd probe in: {offenders}"


def test_runtime_bloom_filter_prunes_shuffle_join(spark, sf_dir):
    """When neither side broadcasts, Spark can inject a runtime Bloom
    filter from the selective side into the big side's scan (the
    shuffle-join analog of extent elimination) — the scale path for
    fact-fact joins; assert the rewrite engages when enabled."""
    from infinidb_spark.session import load_tables

    t = load_tables(spark, sf_dir, names=("orders", "lineitem"))
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # sf-test-sized relations are far below the production thresholds
        conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
        conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = t["lineitem"].join(
            t["orders"].filter("o_totalprice > 500000"),
            t["lineitem"].l_orderkey == t["orders"].o_orderkey,
        )
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter" in plan.lower()
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_ann_batch_broadcasts_queries_single_topk_shuffle(queries, spark, sf_dir):
    """Batched ANN: the query batch must BROADCAST (the corpus scan is
    the only big input) and the per-query top-k window is the sole
    shuffle of scored triples — no vector payload crosses an exchange."""
    plan = _physical(queries["ann_batch_topk"](spark, sf_dir))
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    # the shuffle carries (qid, vec_id, cosine) — never the embeddings
    import re

    for m in re.finditer(r"Exchange hashpartitioning[^\n]*", plan):
        assert "embedding" not in m.group(0), m.group(0)


def test_minhash_incremental_no_corpus_text_read(queries, spark, sf_dir):
    """Incremental near-dup dedup must read corpus SIGNATURES only —
    the batch side shingles text, the corpus side never re-reads it.
    Here both sides come from the same table, so the assertion is that
    text-bearing scans are filtered to the batch (pushed doc_id filter)
    and the signature union is the only place the corpus appears."""
    df = queries["dedup_minhash_incremental"](spark, sf_dir)
    plan = _physical(df)
    assert "CartesianProduct" not in plan
    # both relations pre-aggregate to signatures before the band shuffle
    assert plan.count("HashAggregate") >= 2


def test_minhash_verify_shares_one_broadcast_build(queries, spark, sf_dir):
    """The exact-verify stage of MinHash LSH builds the candidate
    shingle-set relation ONCE and probes it from both pair sides: the
    executed (adaptive, post-run) plan must show exactly two broadcast
    builds (candidate-id semi-join filter + the shared shingle sets)
    with the second probe reusing the build, and the candidate
    re-shingle must be fanned out (RoundRobin repartition), never run
    on the scan's single input partition inside the broadcast job."""
    df = queries["dedup_minhash_lsh"](spark, sf_dir)
    df.collect()  # AQE: reuse decisions exist only in the final plan
    final = _physical(df).split("+- == Initial Plan ==")[0]
    lines = final.split("\n")
    builds = sum(1 for l in lines if "+- BroadcastExchange" in l)
    reused = sum(
        1 for l in lines if "ReusedExchange" in l and "BroadcastExchange" in l
    )
    assert builds == 2, final
    assert reused >= 1, final
    # fan_out on BOTH text scans: corpus signature pass + candidate verify
    assert final.count("RoundRobinPartitioning") >= 2, final


def test_multi_table_update_no_target_duplication(spark, sf_dir):
    """_join_qualified: pair qualification aggregates back to ONE row
    per target row (no row multiplication of the target), with the
    existential EXISTS decided over EVERY matching joined row."""
    from pyspark.sql import functions as F

    from infinidb_spark.operators.dml import _join_qualified
    from infinidb_spark.session import load_tables

    t = load_tables(spark, sf_dir, names=("supplier",))["supplier"]
    n = load_tables(spark, sf_dir, names=("nation",))["nation"]
    joined, qual = _join_qualified(
        t.select("s_suppkey", "s_nationkey"), n, "s_nationkey", "n_nationkey",
        None, "inner",
    )
    plan = _physical(joined)
    # the per-target-row EXISTS/min-qualifying-row aggregate is present
    assert "HashAggregate" in plan or "SortAggregate" in plan or "ObjectHashAggregate" in plan
    assert joined.count() == t.count()  # no duplication
    # every supplier's nation exists → all rows qualify
    assert joined.filter(qual).count() == t.count()


def test_multi_table_update_existential_where(spark):
    """MySQL semantics: a target row qualifies when ANY matching joined
    row satisfies the WHERE — not just a pinned representative.  With
    duplicate join keys where only the lexicographically-GREATER row
    passes the WHERE, the pinned-row design would skip the update."""
    from pyspark.sql import functions as F

    from infinidb_spark.operators.dml import _join_qualified

    t = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    o = spark.createDataFrame(
        [(1, 0), (1, 5), (2, 0)], "ok int, c int"
    )
    joined, qual = _join_qualified(
        t, o, "k", "ok", F.col("_idb_r.c") == 5, "inner"
    )
    got = {r["k"]: r["q"] for r in joined.select("k", qual.alias("q")).collect()}
    assert got == {1: True, 2: False}
    # SET values come from the least QUALIFYING row (c=5, not min c=0)
    row = joined.filter(F.col("k") == 1).select("_idb_r.c").collect()[0][0]
    assert row == 5


def test_keep_best_single_keeper_window_shuffle(spark):
    """keep_best_in_clusters: ONE hash-partitioned window on cluster_id
    picks the keeper — no sort-merge join of the corpus against itself,
    no cartesian, and the corpus join on id broadcasts the (small)
    label relation."""
    from pyspark.sql import functions as F

    from infinidb_spark.operators.dedup import keep_best_in_clusters

    docs = spark.range(2000).select(
        F.col("id").cast("bigint").alias("doc_id"),
        (F.rand(7)).alias("q"),
    )
    pairs = spark.createDataFrame(
        [(i, i + 1000) for i in range(20)], "id_a bigint, id_b bigint"
    )
    df = keep_best_in_clusters(docs, pairs, F.col("q"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("Window") == 1, "expected exactly one keeper window"
    assert "BroadcastHashJoin" in plan, "label relation should broadcast"


def test_quality_gate_routing_is_map_only(spark):
    """The streaming gate's per-batch scoring+routing must be MAP-ONLY:
    no Exchange (shuffle) anywhere — per-epoch work is O(batch) with no
    state store at any scale."""
    from infinidb_spark.streaming.quality_gate import score_and_route

    docs = spark.createDataFrame(
        [(1, "the and is of to good text"), (2, "zz")],
        "doc_id bigint, text string",
    )
    from pyspark.sql import functions as F

    scored = score_and_route(docs, 0.6, ("en",))
    for side in ("accepted", "rejected"):
        part = scored.filter(
            (F.col("status") == "accepted")
            if side == "accepted"
            else (F.col("status") != "accepted")
        )
        plan = part._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, (side, plan)


def test_ngram_jaccard_prefix_no_cartesian(spark):
    """The PPJoin candidate path must plan as an equi-join on the
    prefix gram (+ bucket key) — never a cartesian/broadcast-nested-
    loop over the corpus against itself (the quadratic shape the r08
    sweep caught in the all-pairs form)."""
    from pyspark.sql import functions as F

    from infinidb_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.range(500).select(
        F.col("id").cast("bigint").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta epsilon zeta "),
                 F.col("id").cast("string")).alias("text"),
        (F.col("id") % 3).cast("string").alias("source"),
    )
    df = ngram_jaccard_pairs(docs, n=3, threshold=0.8, prefilter_col="source")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "_pgram" in plan, "candidate join should key on the prefix gram"
