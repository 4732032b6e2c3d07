"""Physical-plan quality gates — the 100 TB posture, asserted.

Correct results with a bad plan fail these tests: filters must reach
the parquet scan, projections must prune the read schema, dim joins
must broadcast, hot paths must stay in whole-stage codegen.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sparkstreamingproject_spark.plans.inspect import (
    explain_str, has_broadcast_join, has_whole_stage_codegen,
    pushed_filters, scan_columns,
)
from sparkstreamingproject_spark.queries import REGISTRY

pytestmark = pytest.mark.smoke  # ~5-min preflight tier (COVERAGE.md)


def test_point_lookup_pushes_down(spark, sf_dir):
    df = REGISTRY["kv_get"].fn(spark, sf_dir)
    assert "c_custkey" in pushed_filters(df)


def test_range_scan_pushes_down(spark, sf_dir):
    df = REGISTRY["kv_range_scan"].fn(spark, sf_dir)
    pf = pushed_filters(df)
    assert "GreaterThanOrEqual" in pf and "LessThan" in pf


def test_projection_prunes_scan(spark, sf_dir):
    df = REGISTRY["source_file_batch"].fn(spark, sf_dir)
    cols = set(scan_columns(df))
    assert cols == {"l_orderkey", "l_partkey", "l_quantity"}, cols


def test_dim_join_broadcasts(spark, sf_dir):
    df = REGISTRY["join_broadcast_dim_enrich"].fn(spark, sf_dir)
    assert has_broadcast_join(df)


def test_q5_broadcasts_dims(spark, sf_dir):
    df = REGISTRY["join_local_supplier_volume"].fn(spark, sf_dir)
    assert has_broadcast_join(df)


def test_flagship_stays_in_codegen(spark, sf_dir):
    df = REGISTRY["split_5way_log"].fn(spark, sf_dir)
    assert has_whole_stage_codegen(df)
    assert "BatchEvalPython" not in explain_str(df)  # no row-at-a-time Python


def test_no_python_udfs_in_relational_core(spark, sf_dir):
    for name in ["agg_pricing_summary", "join_shipping_priority",
                 "window_running_sum", "dedup_minhash_lsh", "dedup_simhash",
                 "text_quality_score"]:
        plan = explain_str(REGISTRY[name].fn(spark, sf_dir))
        assert "BatchEvalPython" not in plan, f"{name} fell off the JVM path"


def test_topn_uses_heap_not_global_sort(spark, sf_dir):
    df = REGISTRY["sort_limit_topn"].fn(spark, sf_dir)
    assert "TakeOrderedAndProject" in explain_str(df)


def test_date_filter_pushes_down(spark, sf_dir):
    df = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .filter(F.col("l_shipdate") > "1998-03-15")
          .select("l_orderkey"))
    assert "l_shipdate" in pushed_filters(df)


def test_codegen_everywhere_cheap(spark, sf_dir):
    for name in ["json_parse", "ts_tumbling_window", "kv_zset_ops"]:
        assert has_whole_stage_codegen(REGISTRY[name].fn(spark, sf_dir)), name


def test_q6_predicates_reach_parquet_scan(spark, sf_dir):
    """Q6 is the pushdown showcase: ship-date band + discount band +
    quantity bound must all appear as PushedFilters on the scan (at
    scale these become row-group min/max skips)."""
    plan = explain_str(REGISTRY["q6_forecast_revenue"].fn(spark, sf_dir))
    assert "PushedFilters" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    joined = " ".join(pushed)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in joined, f"{col} not pushed: {joined}"


def test_kmv_topk_uses_heap_not_global_sort(spark, sf_dir):
    """The KMV bottom-k must plan as TakeOrdered (per-partition heap +
    driver merge), never a full sort of the distinct-hash relation."""
    plan = explain_str(REGISTRY["sketch_kmv_distinct"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_zorder_key_stays_in_codegen(spark, sf_dir):
    plan = explain_str(REGISTRY["zorder_layout_key"].fn(spark, sf_dir))
    assert "BatchEvalPython" not in plan


# Deliberate non-broadcast joins, documented at the join site: sides
# that sit under the broadcast threshold at TEST SF but are
# data-sized at scale (broadcasting them is the 100 TB anti-pattern
# the hint exists to prevent). The small-side gate below skips these.
_DELIBERATE_JOIN_HINTS = {"graph_hyperanf_reachable_pairs"}


def _small_unbroadcast_joins(qe, thresh: int) -> int:
    """Count logical Join nodes whose BUILDABLE side's plan-stats size
    is under the broadcast threshold (exactly JoinSelection's input),
    skipping join types that cannot broadcast-hash (full outer) and
    joins carrying an explicit strategy hint."""
    n_small = 0

    def walk(node):
        nonlocal n_small
        if node.nodeName() == "UnionLoop":
            # recursive-CTE body: its joins stay LOGICAL here and are
            # re-planned per iteration by the recursion machinery with
            # fresh runtime stats — no physical join to hold them to
            return
        if node.nodeName() == "Join":
            jt = node.joinType().toString()
            hint = node.hint().toString()
            ls = node.left().stats().sizeInBytes()
            rs = node.right().stats().sizeInBytes()
            small = (min(ls, rs) if jt in ("Inner", "Cross")
                     else rs if jt in ("LeftOuter", "LeftSemi", "LeftAnti")
                     or jt.startswith("Existence")
                     else ls if jt == "RightOuter" else thresh + 1)
            if small <= thresh and "strategy=" not in hint:
                n_small += 1
        ch = node.children()
        for i in range(ch.length()):
            walk(ch.apply(i))

    walk(qe.optimizedPlan())
    return n_small


@pytest.mark.slow
def test_no_plan_antipatterns_across_registry(spark, sf_dir):
    """Whole-registry sweep (round-close gate — it plans every
    registered query, so it grows with the registry): no
    row-at-a-time Python UDFs and no
    cartesian products in ANY registered query's executed plan.
    (BroadcastNestedLoopJoin is allowed — it is Spark's plan for the
    1-row scalar-subquery broadcast idiom, O(N) work.)

    VERDICT r14 §next 6 extension: every join whose plan-stats
    buildable side is under `autoBroadcastJoinThreshold` must resolve
    to a Broadcast*Join in the physical plan — a small-side join that
    shuffles instead is invisible to the 2× bench gate at sf0.1 but a
    needless exchange at every scale (accidental hints, conf drift,
    or a stats-destroying rewrite all surface here)."""
    from sparkstreamingproject_spark.queries import REGISTRY
    thresh = int(spark._jsparkSession.sessionState().conf()
                 .autoBroadcastJoinThreshold())
    offenders = {}
    for n, s in REGISTRY.items():
        qe = s.fn(spark, sf_dir)._jdf.queryExecution()
        plan = qe.executedPlan().toString()
        flags = [f for f, marker in
                 [("python-udf", "BatchEvalPython"),
                  ("cartesian", "CartesianProduct")]
                 if marker in plan]
        if n not in _DELIBERATE_JOIN_HINTS:
            n_small = _small_unbroadcast_joins(qe, thresh)
            n_bcast = (plan.count("BroadcastHashJoin")
                       + plan.count("BroadcastNestedLoopJoin"))
            if n_bcast < n_small:
                flags.append(
                    f"small-side-not-broadcast ({n_small} small joins, "
                    f"{n_bcast} broadcast)")
        if flags:
            offenders[n] = flags
    assert not offenders, f"plan anti-patterns: {offenders}"


def test_join_strategy_hints_take_effect(spark, sf_dir):
    """Join-strategy hints are the manual override when statistics
    mislead the planner at scale: shuffle_hash avoids the sort of a
    sort-merge join for large-but-uniform sides; merge forces
    sort-merge when hash tables would spill. Both must actually change
    the physical plan, and broadcast must be suppressible."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sh = li.join(o.hint("shuffle_hash"),
                 li.l_orderkey == o.o_orderkey).select("l_quantity")
    assert "ShuffledHashJoin" in explain_str(sh)
    sm = li.join(o.hint("merge"),
                 li.l_orderkey == o.o_orderkey).select("l_quantity")
    assert "SortMergeJoin" in explain_str(sm)


def test_observe_collects_pipeline_metrics(spark, sf_dir):
    """df.observe: pipeline health metrics ride along with the job —
    no second scan, no separate count query (at 100 TB a separate
    metrics pass doubles the read)."""
    from pyspark.sql import Observation
    obs = Observation("li_metrics")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = (li.observe(obs, F.count(F.lit(1)).alias("rows_seen"),
                      F.sum("l_quantity").alias("qty_sum"))
           .filter(F.col("l_quantity") > 25))
    kept = out.count()
    m = obs.get
    assert m["rows_seen"] == li.count()
    assert kept < m["rows_seen"]
    assert m["qty_sum"] > 0


def test_round4_query_plan_shapes(spark, sf_dir):
    """Pin the plan shapes the round-4 docstrings promise: one shuffle
    for sessionization (the user_id partitioning serves both windows
    and both aggregations), broadcast medians for the MAD outlier
    query, and a broadcast (never shuffled-cartesian) nested-loop for
    the 10-row centroid cross join."""
    import re

    def executed(name):
        df = REGISTRY[name].fn(spark, sf_dir)
        return df._jdf.queryExecution().executedPlan().toString()

    sess = executed("events_gap_sessionize")
    assert len(re.findall(r"Exchange hashpartitioning", sess)) == 1, sess

    mad = executed("events_outliers_mad")
    assert mad.count("HashedRelationBroadcastMode") >= 2, mad

    cls = executed("embedding_centroid_classify")
    assert "IdentityBroadcastMode" in cls, cls       # broadcast side...
    assert "CartesianProduct" not in cls, cls        # ...never shuffled


def test_round7_wave_query_plan_shapes(spark, sf_dir):
    """Pin the plan shapes this round's docstrings promise: priority
    sampling is heap-based TakeOrdered (never a global sort over the
    weights), the prefix-dimension sweep plans ONE q_id exchange for
    all seven rank windows, and the k-core survivor joins obey the
    shuffle-hash hint (no broadcast of a vertex-cardinality list, no
    sort-merge)."""
    import re

    def executed(name):
        df = REGISTRY[name].fn(spark, sf_dir)
        return df._jdf.queryExecution().executedPlan().toString()

    pr = executed("sample_priority_topk")
    assert "TakeOrderedAndProject" in pr, pr
    # the only Sorts allowed are inside the k+1-row window, which sits
    # above TakeOrdered — no Exchange rangepartitioning (global sort)
    assert "rangepartitioning" not in pr, pr

    mp = executed("sim_ann_dim_prefix_recall")
    assert len(re.findall(
        r"Exchange hashpartitioning\(q_id", mp)) == 1, mp

    # the k-core rounds are materialized eagerly (localCheckpoint per
    # round), so the returned plan no longer contains them — pin the
    # delta-peeling round's shape on a directly-constructed round
    # instead (r09 rewrite): the per-round work is ONE join of the
    # edge relation against the just-removed vertex list plus a
    # delta aggregate, and it must never plan a cartesian product;
    # join strategy is AQE's runtime choice (broadcast when the
    # removed list is small — asserted on the executed plan in
    # test_round8_heavy_kernel_plan_shapes)
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select("l_orderkey", "l_partkey").distinct())
    e = (li.alias("a").join(
        li.alias("b"),
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .select(F.col("a.l_partkey").alias("na"),
                F.col("b.l_partkey").alias("nb")))
    removed = (e.groupBy(F.col("na").alias("nb"))
               .agg(F.count("*").alias("d"))
               .filter(F.col("d") < 3).select("nb"))
    rnd = (e.join(removed, "nb")
           .groupBy("na").agg(F.count("*").alias("lost")))
    kc = rnd._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in kc, kc
    assert "BroadcastNestedLoopJoin" not in kc, kc


def test_round8_heavy_kernel_plan_shapes(spark, sf_dir):
    """VERDICT r07 §next 4 — pin the round-7 heavy kernels' promised
    plan shapes on EXECUTED (AQE-finalized) plans, so a future AQE
    re-plan can't silently break them:

    - k-core delta round (r09 delta-peeling rewrite): AQE's runtime
      size of the removed list decides the join — a SMALL removed
      list must convert to BroadcastHashJoin in the finalized plan
      (the whole point of delta peeling: typical rounds never
      shuffle-join the full edge relation on a vertex list, which
      was the sf0.1 OOM shape of 79679a3 when hinted wrong);
    - OHLC bars: ONE fact-side exchange, with min/max/sum partials
      below it (map-side combine — the property ohlc_maintain.py's
      mergeable fold relies on);
    - RVQ ADC scoring: no Python anywhere in the executed plan, and
      the scoring stages stay in whole-stage codegen."""
    import re

    def final_plan(df):
        # collect() executes THIS DataFrame's queryExecution (count()
        # would plan a different query and leave this one unfinalized);
        # keep only the "== Final Plan ==" section — the string also
        # embeds the initial plan, which would double every count
        df.collect()
        p = df._jdf.queryExecution().executedPlan().toString()
        return p.split("== Initial Plan ==")[0]

    # k-core delta round under AQE: same construction as the peeling
    # rounds (queries/analytics23.py) — edge relation and degree
    # relation checkpointed, then one round's removed-list join —
    # executed so AQE decides the strategy from the REAL removed size
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select("l_orderkey", "l_partkey").distinct())
    e = (li.alias("a").join(
        li.alias("b"),
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .select(F.col("a.l_partkey").alias("u"),
                F.col("b.l_partkey").alias("v")).distinct())
    dirn = (e.select(F.col("u").alias("na"), F.col("v").alias("nb"))
            .unionAll(e.select(F.col("v").alias("na"),
                               F.col("u").alias("nb")))
            .localCheckpoint())
    degrees = (dirn.groupBy(F.col("na").alias("node"))
               .agg(F.count("*").cast("long").alias("d"))
               .localCheckpoint())
    kk = (degrees.agg((F.expr("(3 * sum(d)) div (4 * count(*))") + 1)
                      .cast("long").alias("k")).localCheckpoint())
    removed = (degrees.crossJoin(F.broadcast(kk))
               .filter(F.col("d") < F.col("k"))
               .select(F.col("node").alias("nb")))
    rnd = (dirn.join(removed, "nb")
           .groupBy(F.col("na").alias("node"))
           .agg(F.count("*").alias("lost")))
    kc = final_plan(rnd)
    assert "isFinalPlan=true" in kc, kc
    # the removed list is a small fraction of the vertex set here, so
    # AQE must have converted the edge⋈removed join to broadcast —
    # the delta-peeling payoff (no sort-merge of the edge relation,
    # no cartesian anywhere)
    assert re.search(r"BroadcastHashJoin \[nb#", kc), kc
    assert "SortMergeJoin" not in kc, kc
    assert "CartesianProduct" not in kc, kc

    ohlc = final_plan(REGISTRY["ts_ohlc_bars"].fn(spark, sf_dir))
    assert len(re.findall(r"Exchange hashpartitioning", ohlc)) == 1, ohlc
    for fn_name in ("partial_min", "partial_max", "partial_sum"):
        assert fn_name in ohlc, (fn_name, ohlc)

    rq = final_plan(REGISTRY["sim_ann_rq_adc"].fn(spark, sf_dir))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF",
                   "CartesianProduct"):
        assert marker not in rq, (marker, rq)
    # codegen'd stages appear as "*(n) Op" in the finalized plan
    assert re.search(r"\*\(\d+\)", rq), rq


def test_round8_wave_query_plan_shapes(spark, sf_dir):
    """Pin the plan shapes the round-8 wave docstrings promise:
    the bottom-k sample is a TakeOrdered heap (no global sort), the
    SCAN-MATCH glob reaches the parquet scan as a pushed contains
    filter, the DQ orphan audit broadcasts its dim-sized parents, and
    the aHash band join is a hash join (never cartesian)."""
    import re

    bk = explain_str(REGISTRY["sample_bottomk_uniform"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in bk, bk
    assert "Exchange rangepartitioning" not in bk, bk

    sm = REGISTRY["kv_scan_match_cursor"].fn(spark, sf_dir)
    assert "StringContains" in pushed_filters(sm), pushed_filters(sm)

    dq = explain_str(REGISTRY["dq_referential_orphans"].fn(spark, sf_dir))
    assert dq.count("BroadcastHashJoin") >= 3, dq  # dim-sized parents

    ah = explain_str(REGISTRY["multimodal_ahash_dedup"].fn(spark, sf_dir))
    assert "CartesianProduct" not in ah, ah
    assert re.search(r"(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin)",
                     ah), ah


def test_round13_paragraph_dedup_plan_shape(spark, sf_dir):
    """Pin dedup_paragraph_reconstruct's docstring claims: NO pairwise
    stage (no join of any kind — the keep-first decision is a window,
    not a self-join) and exactly the two promised shuffles (chunk-hash
    window + doc_id reconstruction, modulo an AQE final coalesce)."""
    import re

    plan = explain_str(REGISTRY["dedup_paragraph_reconstruct"]
                       .fn(spark, sf_dir))
    assert "Join" not in plan, plan          # no pairwise stage at all
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2, plan
    keys = {k.split("#")[0].strip() for k in
            re.findall(r"hashpartitioning\(([^,]+)", plan)}
    assert "doc_id" in keys and len(keys) == 2, (keys, plan)


def test_round14_report_plan_shapes(spark, sf_dir):
    """Pin the r14 eval-report queries' scale claims (queries/llm21.py):
    the top-dup report is a heap top-k (TakeOrderedAndProject, never a
    global sort), the leakage matrix broadcasts its <=3-row split
    totals, the token-mix corpus total is a 1-row broadcast
    (BroadcastNestedLoopJoin on an aggregate build side — not a
    cartesian), and the retention funnel's only join key is doc_id
    (no pairwise stage anywhere)."""
    import re

    td = explain_str(REGISTRY["report_top_duplicated_chunks"]
                     .fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in td, td
    assert "Exchange rangepartitioning" not in td, td

    lm = explain_str(REGISTRY["report_split_leakage_matrix"]
                     .fn(spark, sf_dir))
    assert lm.count("BroadcastHashJoin") >= 2, lm
    assert "CartesianProduct" not in lm, lm

    tm = explain_str(REGISTRY["report_token_mix_by_quality"]
                     .fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in tm, tm
    assert "CartesianProduct" not in tm, tm

    fu = explain_str(REGISTRY["report_dedup_retention_funnel"]
                     .fn(spark, sf_dir))
    keys = {m.split("#")[0] for m in re.findall(
        r"(?:SortMergeJoin|ShuffledHashJoin) \[(\w+)#", fu)}
    assert keys <= {"doc_id"}, (keys, fu)
    assert "CartesianProduct" not in fu, fu
