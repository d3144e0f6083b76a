"""Headline benchmark (driver contract: one JSON line on stdout).

Runs the BASELINE.md-comparable queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]:

* q_group_count    — the reference's ~4 s `feedName` GROUP BY (README.md:206-215)
* q_key_expansion  — the reference's ~10 s DISTINCT type × jsonb_object_keys
                     (README.md:238-242)
* q_flagship       — projection + LIKE + CAST filter + ORDER BY (README.md:142-155)
* q_cdc_apply      — bulk change-apply (merge core); `docs_per_sec` compares
                     against the reference's tuned 626 docs/s sync rate
* q_dedup_minhash  — MinHash LSH candidate pairs over documents
* q_ann_topk       — brute-force cosine top-k over embeddings
* q_text_features  — full text-analysis pass
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from couch_to_postgres_spark.extensions import dedup as X_dedup  # noqa: E402
from couch_to_postgres_spark.extensions import similarity as X_sim  # noqa: E402
from couch_to_postgres_spark.extensions import text as X_text  # noqa: E402
from couch_to_postgres_spark.operators import query as Q  # noqa: E402
from couch_to_postgres_spark.operators.cdc import apply_changes  # noqa: E402
from couch_to_postgres_spark.operators.mirror import docs_mirror  # noqa: E402
from couch_to_postgres_spark.session import get_spark, load_table  # noqa: E402
from couch_to_postgres_spark.streaming.windows import (  # noqa: E402
    sessionize_batch,
    windowed_type_counts,
)


def lineitem_mirror(spark, sf_dir):
    """The big doc table: each lineitem row as a couch doc (~600k docs at
    sf0.1 — 10× the reference's 63,838-doc corpus)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.concat_ws("-", "l_orderkey", "l_linenumber").alias("id"),
        F.to_json(F.struct(*li.columns)).alias("doc"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    # Split-size note: the materialized mirror is ~100-200 MB at sf0.1; the
    # default 128 MB maxPartitionBytes would scan it with 2-3 tasks and idle
    # 29 of 32 cores. 8 MB splits ≈ cores×(a few) tasks here, and is the
    # same knob a 1000-executor cluster tunes against its scan volume.
    # Late-r14 completion of this note (guide §6): the 8 MB READ splits
    # only materialize if the WRITE side emits row groups that small — a
    # parquet split is served by the task whose range holds the row
    # group's midpoint, so one jumbo row group is unsplittable no matter
    # the split size. The prep previously wrote the mirror as ONE
    # 600k-row row group (single upstream task × default 128 MB
    # parquet.block.size), which serialized EVERY corpus scan onto one
    # core — stage forensics (plans/r14/q_bm25_stage_forensics_*.json)
    # show the 8.6 s tokenize stage with task cpu ≈ stage wall at both 8
    # and 32 cores, i.e. one worker and 10 no-op tasks, the true cause
    # of q_bm25's 8↔32-core flatness. The mirror (and the variant/CDC
    # mirrors derived from it) is now written with parquet.block.size =
    # the session's maxPartitionBytes so stored state is as splittable
    # as the scans assume — one knob, both sides; production keeps both
    # at 128 MB+ where file COUNT supplies the parallelism. This changes
    # the stored-state layout every mirror-scanning leg reads, so their
    # numbers step-change at the r14 boundary (disclosed in the
    # methodology note); the timed regions are untouched.
    mirror_block_size = 8 << 20
    spark = get_spark(
        app_name="bench",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(mirror_block_size),
        },
    )
    # warm the JVM + parquet footers so timings measure the queries
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_lineitem = load_table(spark, sf_dir, "lineitem").count()

    # Materialize the big mirror once (replication output is stored state;
    # BASELINE's query numbers are against the stored table, not against
    # on-the-fly doc serialization).
    tmp = tempfile.mkdtemp(prefix="bench_mirror_")
    mirror_path = os.path.join(tmp, "lineitem_mirror.parquet")
    lineitem_mirror(spark, sf_dir).write.mode("overwrite").option(
        "parquet.block.size", mirror_block_size
    ).parquet(mirror_path)
    big_mirror = spark.read.parquet(mirror_path)
    # touch the freshly-written mirror so the first TIMED query doesn't pay
    # the cold page-cache read (measured: first query on a cold mirror is
    # 3-6x its warm time; the reference's numbers are likewise against an
    # OS-cached stored table)
    big_mirror.count()

    timings: dict[str, float] = {}
    # non-timing evidence (e.g. the incremental compaction's
    # affected-bucket counts) — lands in the FULL bench_out.json doc,
    # never the slim stdout payload
    extras: dict = {}

    def bench(name: str, fn) -> None:
        # flush pending writeback from prep/previous queries BEFORE the
        # timer: dirty-page flushes overlapping a timed query inflate it
        # 2-4x with high variance (measured on q_cdc_incremental_5x)
        os.sync()
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    def bench_median(name: str, fn, n: int = 3, setup=None) -> None:
        # partitioned-WRITE benches ride OS writeback noise (±20-50%
        # run-to-run on this box); a median of 3 is the honest point
        # estimate. Each rep is a real steady-state micro-batch against
        # the same mirror, so later reps also exercise the accumulated
        # delta log, exactly like a long-running daemon. `setup` (r14)
        # runs UNTIMED before each rep for legs whose timed operation
        # consumes its input (e.g. the incremental fold consumes the
        # tail it folds): it recreates the identical pre-rep state so
        # every timed rep does the same work as the leg's original
        # single-shot definition — the timed region itself is unchanged.
        reps = []
        for _ in range(n):
            if setup is not None:
                setup()
            os.sync()
            t0 = time.time()
            fn()
            reps.append(time.time() - t0)
        timings[name] = round(sorted(reps)[n // 2], 3)
        # rep spread (VERDICT r13 #6): the full artifact records every
        # rep so a contended-host round is separable from code movement
        # without a second full run. Full document only — the slim
        # stdout payload is size-capped.
        extras.setdefault("rep_spread", {})[name] = [round(r, 3) for r in reps]

    # BASELINE.md comparables on the big mirror (reference: 63k docs)
    bench_median(
        "q_group_count",
        lambda: Q.group_count(big_mirror, "l_returnflag").collect(),
    )
    bench_median(
        "q_key_expansion",
        lambda: Q.key_expansion(big_mirror, "l_returnflag").collect(),
    )
    bench_median("q_flagship", lambda: Q.flagship(docs_mirror(spark, sf_dir)).collect())

    # variant-stored mirror: parse-once layout (the jsonb analog)
    from couch_to_postgres_spark.operators.variant import (
        group_count_variant,
        key_expansion_variant,
        write_variant_mirror,
    )

    vpath = os.path.join(tmp, "variant_mirror.parquet")
    write_variant_mirror(big_mirror, vpath)
    vmirror = spark.read.parquet(vpath)
    bench(
        "q_group_count_variant",
        lambda: group_count_variant(vmirror, "l_returnflag").collect(),
    )
    bench_median(
        "q_key_expansion_variant",
        lambda: key_expansion_variant(vmirror, "l_returnflag").collect(),
    )

    def cdc_apply() -> None:
        """Bulk change-apply: every lineitem doc arrives as an insert change
        against an empty mirror — the reference's initial-full-sync shape."""
        mirror = lineitem_mirror(spark, sf_dir).limit(0)
        changes = lineitem_mirror(spark, sf_dir).select(
            F.monotonically_increasing_id().alias("seq"),
            "id",
            F.lit(False).alias("deleted"),
            "doc",
        )
        apply_changes(mirror, changes, broadcast_changes=False).count()

    bench_median("q_cdc_apply", cdc_apply)

    def cdc_incremental(mode: str = "auto") -> None:
        """Steady-state micro-batch: 1000 updates against the stored 600k
        mirror via the partitioned sink. ``mode="auto"`` picks the
        merge-on-read delta append (production default); ``"rewrite"``
        forces the touched-bucket rewrite — benching both isolates what
        the delta log costs/saves per batch."""
        from couch_to_postgres_spark.streaming.partitioned import (
            upsert_partitioned_mirror,
            write_partitioned_mirror,
        )

        part_path = os.path.join(tmp, "part_mirror")
        if not os.path.exists(part_path):
            write_partitioned_mirror(big_mirror, part_path, 64)
        batch = big_mirror.limit(1000).select(
            F.monotonically_increasing_id().alias("seq"),
            "id",
            F.lit(False).alias("deleted"),
            "doc",
        )
        upsert_partitioned_mirror(spark, part_path, batch, 64, mode=mode)

    # prepare outside the timer (layout cost is the one-time initial load)
    cdc_incremental()
    bench_median("q_cdc_incremental", cdc_incremental)
    # delta-log cost isolation: same batch, forced touched-bucket rewrite
    bench_median(
        "q_cdc_incremental_rewrite", lambda: cdc_incremental("rewrite")
    )

    def cdc_incremental_5x() -> None:
        """The O(touched) scaling claim, measured: the SAME 1000-update
        batch against a 5× (≈3M-doc) mirror. If the sink is O(touched),
        this stays ≈flat vs q_cdc_incremental; the old flat sink grew
        linearly with mirror size. Bucket count auto-sized from the load
        (auto_num_buckets), so per-bucket work stays constant too."""
        from couch_to_postgres_spark.streaming.partitioned import (
            auto_num_buckets,
            upsert_partitioned_mirror,
            write_partitioned_mirror,
        )

        part_path = os.path.join(tmp, "part_mirror_5x")
        if not os.path.exists(part_path):
            big5 = None
            for i in range(5):
                rep = big_mirror.select(
                    F.concat_ws("#", "id", F.lit(str(i))).alias("id"), "doc"
                )
                big5 = rep if big5 is None else big5.unionByName(rep)
            write_partitioned_mirror(
                big5, part_path, auto_num_buckets(5 * n_lineitem)
            )
        batch = big_mirror.limit(1000).select(
            F.monotonically_increasing_id().alias("seq"),
            F.concat_ws("#", "id", F.lit("0")).alias("id"),
            F.lit(False).alias("deleted"),
            "doc",
        )
        upsert_partitioned_mirror(spark, part_path, batch)

    cdc_incremental_5x()
    # flush the ~1 GB mirror build's dirty pages before timing: OS
    # writeback overlapping the timed append inflates it 3-4x (measured)
    os.sync()
    bench_median("q_cdc_incremental_5x", cdc_incremental_5x)


    from couch_to_postgres_spark.sources.changes import (
        changes_from_events,
        write_change_log,
    )
    from couch_to_postgres_spark.streaming.pipeline import follow

    # prepare the change log outside the timer (it is the SOURCE data the
    # feed already holds, not catch-up work — same rule as cdc_incremental)
    catchup_log_dir = os.path.join(tmp, "catchup_log")
    write_change_log(changes_from_events(spark, sf_dir), catchup_log_dir, num_files=8)

    # warm the streaming machinery (query planner, foreachBatch bridge,
    # merge codegen) on a 100-row log so the timed run measures catch-up
    # throughput, not one-time JIT — the reference's catch-up numbers are
    # likewise from a long-running daemon, not a cold process (measured:
    # cold first streaming query ~10 s of fixed overhead, warm ~2.5 s for
    # the full 100k-row drain)
    warm_log = os.path.join(tmp, "warm_log")
    write_change_log(
        changes_from_events(spark, sf_dir).limit(100), warm_log, num_files=1
    )
    follow(
        spark,
        warm_log,
        os.path.join(tmp, "warm_mirror"),
        os.path.join(tmp, "warm_ckpt"),
    ).awaitTermination(120)

    def stream_catchup() -> None:
        """BASELINE comparable #4: streaming catch-up — drain a change log
        of |events| rows through the checkpointed pipeline into a mirror."""
        q = follow(
            spark,
            catchup_log_dir,
            os.path.join(tmp, "catchup_mirror"),
            os.path.join(tmp, f"catchup_ckpt_{time.time_ns()}"),
        )
        q.awaitTermination(300)

    bench("q_stream_catchup", stream_catchup)
    bench_median(
        "q_dedup_minhash",
        lambda: X_dedup.minhash_candidate_pairs(docs, num_bands=4).count(),
    )

    emb = load_table(spark, sf_dir, "embeddings")
    bench(
        "q_ann_topk",
        lambda: X_sim.cosine_topk(emb.filter(F.col("vec_id") < 5), emb, k=5).collect(),
    )

    # the ANN scale path: query a prebuilt IVF index (build outside the
    # timer — it's the amortized one-time cost, like the couch view build)
    from couch_to_postgres_spark.extensions.ann import build_ivf_index, ivf_topk_indexed

    ivf_path = os.path.join(tmp, "ivf_index")
    build_ivf_index(emb, ivf_path)
    bench(
        "q_ann_ivf_indexed",
        lambda: ivf_topk_indexed(
            emb.filter(F.col("vec_id") < 5), spark, ivf_path, k=5, nprobe=4
        ).collect(),
    )

    # the LIVE vector index (r11): CDC-maintained twin with churn on top
    # of a compacted base — the query merges base + tail + tombstones
    # (the steady-state read shape between watchdog folds), and the
    # maintenance leg is the churn-proportional fold itself
    from couch_to_postgres_spark.streaming.vector_stream import (
        compact_vector_index_incremental,
        init_vector_index,
        vector_index_batch,
        vector_topk_live,
    )

    vlive_path = os.path.join(tmp, "vector_live_index")
    vlive_anchors = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()
    ]
    init_vector_index(spark, vlive_path, centroids=vlive_anchors)
    vector_index_batch(spark, vlive_path, emb.select(
        F.col("vec_id").cast("long").alias("seq"), "vec_id",
        F.lit(False).alias("deleted"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    ))
    compact_vector_index_incremental(spark, vlive_path)  # lays the base
    vector_index_batch(spark, vlive_path, emb.filter(
        F.col("vec_id") % 10 == 3
    ).select(
        (F.lit(10_000_000) + F.col("vec_id")).alias("seq"), "vec_id",
        F.lit(False).alias("deleted"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    ))
    bench_median(
        "q_vector_topk_live",
        lambda: vector_topk_live(
            spark, vlive_path,
            emb.filter(F.col("vec_id") < 5).select("vec_id", "embedding"),
            k=5, nprobe=4,
        ).collect(),
    )

    vlive_seq = [20_000_000]

    def vector_fold() -> None:
        vlive_seq[0] += 1_000_000
        vector_index_batch(spark, vlive_path, emb.filter(
            F.col("vec_id") % 50 == 7
        ).select(
            (F.lit(vlive_seq[0]) + F.col("vec_id")).alias("seq"), "vec_id",
            F.lit(False).alias("deleted"),
            F.col("embedding").cast("array<double>").alias("embedding"),
        ))
        out = compact_vector_index_incremental(spark, vlive_path)
        assert out["mode"] == "incremental", out

    bench_median("q_vector_fold_incr", vector_fold)

    # hybrid retrieval (r11): RRF over a documents-table BM25 twin and
    # the vector index above (shared long-id space — docs without a
    # vector ride the lexical list alone). Setup indexes the documents
    # once (outside the timer, like every other index build's
    # amortization argument); the timed query is the fused read:
    # pruned postings probe + nprobe cell probe + broadcast-sized RRF
    from couch_to_postgres_spark.extensions.hybrid import hybrid_topk_live
    from couch_to_postgres_spark.streaming.search_stream import (
        search_index_batch as _sib_h,
    )

    hsidx = os.path.join(tmp, "hybrid_search_index")
    _sib_h(spark, hsidx, docs.select(
        F.col("doc_id").cast("long").alias("seq"),
        "doc_id", F.lit(False).alias("deleted"), "text",
    ))
    # fold the bulk load into the token-bucket base (outside the timer,
    # the same amortization as every other index build here): a live
    # deployment's watchdog compacts after initial ingest, so the
    # steady-state lexical leg is the base-is-live fast path — the
    # TAIL-merge read shape under churn is what the vector leg of this
    # same fused query exercises (its index carries a post-compaction
    # tail by construction above)
    from couch_to_postgres_spark.streaming.search_stream import (
        compact_index_incremental as _cii_h,
    )

    _cii_h(spark, hsidx)
    hterms = spark.createDataFrame(
        [(10_000_001, w) for w in ("spark", "window", "merge")]
        + [(10_000_002, w) for w in ("vector", "filter", "join")],
        "query_id long, term string",
    )
    hvecs = emb.filter(F.col("vec_id").isin(100, 200)).select(
        F.when(F.col("vec_id") == 100, F.lit(10_000_001))
        .otherwise(F.lit(10_000_002)).cast("long").alias("vec_id"),
        "embedding",
    )
    bench_median(
        "q_hybrid_topk",
        lambda: hybrid_topk_live(
            spark, hsidx, vlive_path, hterms, hvecs,
            k=20, depth=50, nprobe=4,
        ).collect(),
    )

    # recall/latency trade tracked per round (outside the timers): how much
    # of the EXACT top-5 the nprobe=4 probed search recovers for a 50-query
    # panel. The number that justifies q_ann_ivf_indexed's speed.
    recall_queries = emb.filter(F.col("vec_id") < 50)
    exact_pairs = {
        (r["query_id"], r["neighbor_id"])
        for r in X_sim.cosine_topk(recall_queries, emb, k=5).collect()
    }
    def recall_at(nprobe: int) -> float:
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk_indexed(
                recall_queries, spark, ivf_path, k=5, nprobe=nprobe
            ).collect()
        }
        return round(len(exact_pairs & approx) / max(1, len(exact_pairs)), 4)

    # two operating points: the benched nprobe=4 and the recall-leaning
    # nprobe=8 — the latency/recall dial a deployment actually turns
    ivf_recall = recall_at(4)
    ivf_recall_8 = recall_at(8)

    # end-to-end dedup pipelines (candidates → verify → connected
    # components → drop), not just candidate generation. (b=8, r=2, KM
    # double hashing) is the tuned operating point for the 0.8-jaccard
    # default: S-curve midpoint 0.35, measured identical verified-pair set
    # to the loose (b=4, r=1) setting at 32× fewer candidates, and one md5
    # per shingle instead of k (see near_dedup / km_minhash_signatures)
    bench_median(
        "q_near_dedup_e2e",
        lambda: X_dedup.near_dedup(
            docs, num_bands=8, rows_per_band=2, hash_family="km"
        ).count(),
    )
    bench_median(
        "q_semantic_dedup_e2e",
        # vectorized = the production in-cell scorer (numpy GEMM per
        # Arrow batch); the HOF scorer is the oracle-parity variant and
        # ≡-pinned in test_extensions
        lambda: X_dedup.semantic_dedup(
            emb, n_cells=16, threshold=0.99, scorer="vectorized"
        ).count(),
    )
    # span-level dedup: winnowing fingerprint buckets shared by >1 doc
    # (the substring complement to whole-document minhash; one doc-keyed
    # shuffle + one fingerprint-keyed agg)
    bench_median(
        "q_winnow_spans",
        lambda: X_dedup.shared_span_buckets(docs).count(),
    )
    bench("q_text_features", lambda: X_text.text_features(docs).count())

    ev = load_table(spark, sf_dir, "events")
    bench(
        "q_windowed_counts",
        lambda: windowed_type_counts(ev, "6 hours").collect(),
    )
    bench("q_sessionize", lambda: sessionize_batch(ev, 60).count())

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    bench(
        "q_join_nation",
        lambda: orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum("o_totalprice").alias("revenue"))
        .collect(),
    )
    li = load_table(spark, sf_dir, "lineitem")
    # training-loader layout pass over the big corpus: global token offsets
    # for every stored doc via the distributed prefix scan. Reads the
    # MATERIALIZED mirror: the prefix scan's jobs then scan cheap columnar
    # parquet instead of re-serializing to_json per job (measured ~2x).
    id_parts = F.split(F.col("id"), "-")
    bench_median(
        "q_pack",
        lambda: X_text.pack_documents(
            big_mirror.select(
                (
                    id_parts.getItem(0).cast("long") * 10
                    + id_parts.getItem(1).cast("long")
                ).alias("doc_id"),
                F.col("doc").alias("text"),
            ),
            budget=512,
        ).count(),
    )
    # ranked retrieval over the full 600k-doc mirror: tokenize the stored
    # JSON (separator strip is one map) and BM25-rank for 3 terms — the
    # corpus-search capability, timed at corpus scale
    from couch_to_postgres_spark.extensions.search import (
        bm25_topk,
        bm25_topk_batch,
    )

    search_corpus = big_mirror.select(
        "id",
        F.regexp_replace(F.col("doc"), '[,:"{}]', " ").alias("text"),
    )
    # r12 FIDELITY FIX: the original terms (RAIL/TRUCK/AIR — TPC-H ship
    # modes) matched NOTHING because the synthetic lineitem has no
    # l_shipmode column, so every q_bm25* leg since r03 ranked an EMPTY
    # hit set (timings measured tokenize/stats work only). Terms now
    # come from the REAL doc-token vocabulary (returnflag/linestatus
    # letters ~33-50% df, discount tokens ~22%, quantity tokens ~2%),
    # results are asserted non-empty, and the numbers are NOT
    # comparable to r11 and earlier for these legs.
    bm25_terms = ["R", "42.0", "0.05"]  # ~33% / ~2% / ~22% df

    def _nonempty(rows):
        assert rows, "bm25 leg matched nothing — vocabulary drifted?"
        return rows

    bench_median(
        "q_bm25",
        lambda: _nonempty(bm25_topk(
            search_corpus, bm25_terms, k=20, id_col="id"
        ).collect()),
    )

    # the batch-amortization claim, measured: 100 queries (3 terms each,
    # drawn from the value vocabulary) against the same 600k docs in ONE
    # plan — wall time should sit near q_bm25's, not 100x it
    vocab_terms = [
        "F", "O", "N", "R", "A", "0.01", "0.03", "0.05", "0.07", "0.09",
        "42.0", "22.0", "9.0", "45.0", "12.0",
    ]
    qrows = [
        (qid, vocab_terms[(qid + j) % len(vocab_terms)])
        for qid in range(100)
        for j in range(3)
    ]

    def bm25_batch100() -> None:
        qtab = spark.createDataFrame(qrows, "query_id int, term string")
        _nonempty(
            bm25_topk_batch(search_corpus, qtab, k=10, id_col="id").collect()
        )

    bench_median("q_bm25_batch100", bm25_batch100)

    # the index-amortization claim, measured: build the streaming search
    # index ONCE over the same 600k docs (the cost q_bm25 pays on every
    # query), then answer the same 3-term query FROM the index — the
    # corpus text is never re-read, so the query path should sit far
    # below q_bm25, and the build amortizes across every later query
    # and every incremental batch
    import shutil as _shutil
    import tempfile as _tempfile

    from couch_to_postgres_spark.streaming.search_stream import (
        bm25_topk_from_index,
        search_index_batch,
    )

    idx_dir = _tempfile.mkdtemp(prefix="bench_bm25_idx_")
    idx_changes = search_corpus.select(
        F.monotonically_increasing_id().alias("seq"),
        F.col("id").alias("doc_id"),
        F.lit(False).alias("deleted"),
        "text",
    )
    bench_median(
        "q_bm25_index_build",
        lambda: search_index_batch(spark, idx_dir, idx_changes, id_col="doc_id"),
        # per-rep untimed reset: a repeated build would otherwise APPEND
        # a duplicate tail and hand the compaction leg below a different
        # input; each rep builds the index from the same empty dir
        setup=lambda: _shutil.rmtree(idx_dir, ignore_errors=True),
    )
    idx_qtab = spark.createDataFrame(
        [(1, t) for t in bm25_terms], "query_id int, term string"
    )
    # r13 METHODOLOGY CHANGE (comparability break vs r12 for this leg):
    # q_bm25_from_index now reads the COMPACTED index — the state the
    # daemon actually leaves an index in (a bulk build is 100%
    # compaction debt, so the first watchdog pass compacts it; pinned
    # by x_compact_auto). The raw never-compacted read r12 measured
    # (4.89 s) is a pre-first-watchdog transient, not the steady state;
    # the base+tail merge shape it exercised is still measured by the
    # tail_small/tail_large legs below. On the compacted base the
    # two-level cost gate decides between the MaxScore/block-max
    # pruned path (VERDICT r12 #1 — exact top-k from provably-
    # sufficient posting blocks) and the exact full path, from the
    # stored impact histograms; this single 3-term query passes the
    # per-query screen (the ~2%-df "42.0" seeds a θ that prices the
    # two common terms out of phase B) but its ~0.3M net pairs cannot
    # cover the pruned plan's fixed driver actions at 600k docs, so
    # the global floor correctly keeps it on the full fast path — the
    # engagement regime (query batches, where pair savings are many
    # millions) is measured by the scaling harness's sel-batch A/B
    # (sf0.1: pruned 6.0 s vs unpruned 9.9 s on a 20-query batch).
    from couch_to_postgres_spark.streaming.search_stream import compact_index

    lsm_root = _tempfile.mkdtemp(prefix="bench_bm25_lsm_")
    lsm_dir = os.path.join(lsm_root, "idx")
    compact_index(spark, idx_dir, lsm_dir, token_buckets=64)
    _shutil.rmtree(idx_dir, ignore_errors=True)
    bench_median(
        "q_bm25_from_index",
        lambda: _nonempty(
            bm25_topk_from_index(spark, lsm_dir, idx_qtab, k=20).collect()
        ),
    )

    # The LSM claim under CHURN, measured (r05 verdict ask): watch the
    # from-index query as the post-compaction tail grows —
    # search_stream's docstring claims read cost is bounded by the
    # UPDATE RATE between compactions, not corpus size, and that
    # re-compacting restores the read-mostly fast path. Each churn batch
    # re-writes ~1k of the 600k docs (new seq, new rev text) — a
    # realistic steady-state micro-batch.

    def churn_batch(batch_no: int) -> None:
        # ids are couch-style strings ('31521-6'): select ~1k docs per
        # batch by hash bucket, not arithmetic on the id
        ch = search_corpus.filter(
            F.abs(F.hash("id")) % 600 == batch_no
        ).select(
            # seq strictly above every base seq (monotonically_increasing_id
            # reaches ~partition<<33 ≈ 1e12 < 1e15) and increasing per batch
            (F.lit((batch_no + 1) * 10**15) + F.abs(F.hash("id"))).alias("seq"),
            F.col("id").alias("doc_id"),
            F.lit(False).alias("deleted"),
            F.concat(
                F.col("text"), F.lit(f" churn{batch_no} rail")
            ).alias("text"),
        )
        search_index_batch(spark, lsm_dir, ch, id_col="doc_id")

    bench("q_bm25_lsm_ingest", lambda: churn_batch(0))
    bench_median(
        "q_bm25_from_index_tail_small",  # tail = 1 micro-batch (~1k docs)
        lambda: bm25_topk_from_index(spark, lsm_dir, idx_qtab, k=20).collect(),
    )
    for b in range(1, 6):
        churn_batch(b)
    bench_median(
        "q_bm25_from_index_tail_large",  # tail = 6 micro-batches (~6k docs)
        lambda: bm25_topk_from_index(spark, lsm_dir, idx_qtab, k=20).collect(),
    )
    # r12: the SELECTIVE from-index read under the same churn — a
    # rare-price + one-quantity query whose hit slice is ~2% of docs;
    # with the broad 3-term leg above this brackets the between-folds
    # read across selectivities. (A slice-scoped liveness variant for
    # this read was built and A/B'd at 600k and 6M docs — the global
    # skinny merge won both; see bm25_topk_from_index's in-code note.)
    sel_price = big_mirror.select(
        F.get_json_object("doc", "$.l_extendedprice").alias("p")
    ).first()["p"]
    sel_qtab = spark.createDataFrame(
        [(1, str(sel_price)), (1, "42.0")], "query_id int, term string"
    )
    bench_median(
        "q_bm25_from_index_selective",
        lambda: _nonempty(
            bm25_topk_from_index(spark, lsm_dir, sel_qtab, k=20).collect()
        ),
    )
    lsm_dir2 = os.path.join(lsm_root, "idx2")
    bench_median(
        # median-able as-is: every rep reads the same (unchanging)
        # lsm_dir and mode("overwrite")-rewrites lsm_dir2 — identical
        # work per rep, and the post-leg lsm_dir2 state is the same as
        # after a single run
        "q_bm25_lsm_compact",
        lambda: compact_index(spark, lsm_dir, lsm_dir2, token_buckets=64),
    )
    bench_median(
        "q_bm25_from_index_recompacted",  # compaction restores the fast path
        lambda: bm25_topk_from_index(spark, lsm_dir2, idx_qtab, k=20).collect(),
    )

    # r09 (VERDICT r08 #2): bucket-scoped compaction against the SAME
    # layout q_bm25_lsm_compact just rebuilt (64 token buckets x the
    # auto-sized id_sub fan-out — 4 at 600k docs since r10; the
    # sub-bucket level is what keeps a Zipf-head token's bucket from
    # dragging the whole corpus into every churn, and its fan-out now
    # grows with the corpus instead of paying 16's write overhead at
    # every scale; see SCALING.md r09/r10). A 3-doc
    # micro-batch (a trickle feed's steady state) lands as tail, then
    # compact_index_incremental folds it into only the (token_bucket,
    # id_sub) pairs it touches — the honest comparator is the full
    # rewrite above.
    from couch_to_postgres_spark.streaming.search_stream import (
        compact_index_incremental,
    )

    churn_ids = [r["id"] for r in search_corpus.select("id").limit(3).collect()]
    incr_rep = [0]

    def ingest_small_churn() -> None:
        # per-rep UNTIMED setup (the fold consumes its tail): re-ingest
        # the same 3 docs with the same churn text — only the seq base
        # bumps per rep so each new version wins — so every timed rep
        # folds an identical 3-doc tail into the compacted base, exactly
        # the leg's original single-shot definition
        incr_rep[0] += 1
        small_churn = search_corpus.filter(F.col("id").isin(churn_ids)).select(
            (F.lit((8 + incr_rep[0]) * 10**15) + F.abs(F.hash("id"))).alias(
                "seq"
            ),
            F.col("id").alias("doc_id"),
            F.lit(False).alias("deleted"),
            F.concat(F.col("text"), F.lit(" churn9 rail")).alias("text"),
        )
        search_index_batch(spark, lsm_dir2, small_churn, id_col="doc_id")

    incr_stats = {}
    bench_median(
        "q_bm25_lsm_compact_incr",
        lambda: incr_stats.update(compact_index_incremental(spark, lsm_dir2)),
        setup=ingest_small_churn,
    )
    # the pruning evidence rides the full doc (bench_out.json), not the
    # slim stdout payload (affected_dirs dropped there: pair-count and
    # bucket-count tell the story)
    incr_stats.pop("affected_dirs", None)
    extras["compact_incr"] = incr_stats

    # r14 (VERDICT r13 #3): the MaxScore ENGAGEMENT regime, in the
    # driver's bench — 20 queries of (two common terms + one distinct
    # mid-rare term each) against the post-fold read-mostly index. The
    # single 3-term q_bm25_from_index leg is correctly gate-REFUSED at
    # 600k docs (its net pair savings can't cover the pruned plan's
    # fixed jobs), so the bench had been showing only the impact
    # layer's write costs and none of its read win (previously only in
    # scaling_out_r13.json: pruned 3.82 s vs 7.82 s at 600k). The
    # rare seeds come from the index's own dfs table (untimed setup):
    # 20 lowest tokens with df in [50, 2000] — every query then
    # carries a high-idf seed whose θ prices the common terms out of
    # phase B, and the batch clears every gate level; the _unpruned
    # twin is the same batch forced onto the exact full path, whose
    # ranked-pair space multiplies the shared common terms across all
    # 20 queries. Asserted: engagement actually happens (the leg must
    # measure the pruned plan, not a silent refusal) and both paths
    # return rows.
    rare_seeds = [
        r["token"]
        for r in spark.read.parquet(os.path.join(lsm_dir2, "base", "dfs"))
        .groupBy("token")
        .agg(F.sum("dft").alias("dft"))
        .filter((F.col("dft") >= 50) & (F.col("dft") <= 2000))
        .orderBy("token")
        .limit(20)
        .collect()
    ]
    assert len(rare_seeds) == 20, f"rare-seed vocab drifted: {rare_seeds}"
    batch20_qtab = spark.createDataFrame(
        [
            (qid, t)
            for qid, rare in enumerate(rare_seeds)
            for t in ("F", "O", rare)
        ],
        "query_id int, term string",
    )

    def bm25_batch20(pruned: bool) -> None:
        diag: dict = {}
        rows = bm25_topk_from_index(
            spark, lsm_dir2, batch20_qtab, k=10, pruned=pruned, diag=diag
        ).collect()
        _nonempty(rows)
        if pruned:
            # engagement is the leg's point at the driver's sf0.1
            # scale (600k docs: 60 pairs x 600k live = 36M-pair bound,
            # far over the gate floor, and the rare seeds clear every
            # gate level). At the tiny correctness SFs (<=60k rows)
            # the SAME shape is provably under the floor and the gate's
            # meta-only short-circuit refuses with zero extra jobs —
            # the correct decision there, accepted explicitly so the
            # leg still runs end-to-end at those SFs; any OTHER
            # refusal (an estimate-level gate change at sf0.1) fails
            # loudly rather than silently measuring the wrong path.
            gate = diag.get("gate") or {}
            assert diag.get("pruned") is True or (
                gate.get("short_circuit") is True
                and gate["bound_pairs"] < gate["floor"]
            ), gate

    bench_median(
        "q_bm25_from_index_batch20", lambda: bm25_batch20(True)
    )
    bench_median(
        "q_bm25_from_index_batch20_unpruned", lambda: bm25_batch20(False)
    )

    # r08 (VERDICT r07 #3): index-assisted phrase search on a RARE
    # phrase — a specific key-value word sequence ('l_extendedprice
    # <one price>', the price token's df ≈ 1 in 600k docs). The full
    # scan runs the position-verify HOF on every doc; the indexed path
    # reads the compacted base's df table, probes ONLY the rare term's
    # token bucket (the ubiquitous 'l_extendedprice' key token is
    # df-capped out of the probe), semi-joins the handful of candidate
    # ids, and verifies positions on those docs alone. Setup (untimed):
    # the corpus deduped by id (the synthetic mirror has duplicate ids;
    # the index keeps one live version per id, so equal results need
    # one row per id on the scan side too) + its own compacted index.
    from couch_to_postgres_spark.extensions.phrase import (
        phrase_hits,
        phrase_hits_indexed,
    )

    phrase_corpus_path = os.path.join(tmp, "phrase_corpus.parquet")
    search_corpus.dropDuplicates(["id"]).write.mode("overwrite").parquet(
        phrase_corpus_path
    )
    phrase_corpus = spark.read.parquet(phrase_corpus_path)
    phrase_corpus.count()  # warm page cache
    phrase_idx_raw = os.path.join(lsm_root, "phrase_raw")
    phrase_idx = os.path.join(lsm_root, "phrase_idx")
    search_index_batch(
        spark,
        phrase_idx_raw,
        phrase_corpus.select(
            F.monotonically_increasing_id().alias("seq"),
            F.col("id").alias("doc_id"),
            F.lit(False).alias("deleted"),
            "text",
        ),
        id_col="doc_id",
    )
    compact_index(spark, phrase_idx_raw, phrase_idx, token_buckets=64)
    rare_price = li.select("l_extendedprice").first()[0]
    rare_phrase = f"l_extendedprice {rare_price}"
    bench_median(
        "q_phrase_scan",
        lambda: phrase_hits(
            phrase_corpus, rare_phrase, id_col="id"
        ).count(),
    )
    bench_median(
        "q_phrase_indexed",
        lambda: phrase_hits_indexed(
            spark, phrase_idx, phrase_corpus, rare_phrase,
            id_col="id", index_id_col="doc_id",
        ).count(),
    )
    _shutil.rmtree(lsm_root, ignore_errors=True)

    # the r06 quota-selection engine at 600k rows with a 75%-dominant
    # group: selection decides map-side against broadcast thresholds,
    # only the ~√n boundary band is ever sorted (the pre-r06 plan
    # funneled the dominant group through ONE task)
    from couch_to_postgres_spark.extensions.sampling import resample_to_mix

    def target_mix_bench() -> None:
        d = big_mirror.select(
            "id",
            F.when(
                F.substring(F.md5("id"), 1, 1).isin(*"0123456789ab"),
                "hot",
            )
            .otherwise("cold")
            .alias("grp"),
        )
        resample_to_mix(
            d, {"hot": 0.5, "cold": 0.5}, group_col="grp", id_col="id"
        ).count()

    bench_median("q_target_mix", target_mix_bench)

    # r06 session-2 families at sf0.1: the Gopher table is a pure map +
    # one doc-key aggregate; the KMV sketch moves only k-length arrays
    # through its two shuffles; content_diff's full-outer join carries
    # (id, fp) — never the ~200-byte docs
    from couch_to_postgres_spark.extensions.dedup import word_shingles
    from couch_to_postgres_spark.extensions.lines import gopher_rules
    from couch_to_postgres_spark.extensions.sketch import bottomk_sketch
    from couch_to_postgres_spark.operators.mirror import content_diff

    bench("q_gopher_rules", lambda: gopher_rules(docs).count())
    bench_median(
        "q_bottomk_sketch",
        lambda: bottomk_sketch(
            docs.select(
                "source", F.explode(word_shingles("text", 3)).alias("sh")
            ),
            "source",
            F.col("sh"),
            k=64,
        ).count(),
    )
    bench_median(
        "q_content_diff",  # 600k-row mirror vs a damaged copy
        lambda: content_diff(
            big_mirror,
            big_mirror.filter(
                F.substring(F.md5("id"), 1, 1) != F.lit("0")
            ).withColumn(
                "doc",
                F.when(
                    F.substring(F.md5("id"), 2, 1) == F.lit("0"),
                    F.concat(F.col("doc"), F.lit("x")),
                ).otherwise(F.col("doc")),
            ),
        ).count(),
    )

    # r07 legs (VERDICT r06 asks #2/#3): the line-hygiene family gets its
    # first bench rows (re-lined so the line ops do real multi-line work;
    # the LM's count tables are vocab-bounded and AQE-broadcast — the
    # Zipf-keyed join measured, not asserted), and the KMV sketch is
    # timed UNDER CHURN: per-batch merge cost must stay flat as the
    # accumulated state grows (state is O(groups·k); replay idempotent)
    from couch_to_postgres_spark.extensions.lines import (
        as_lines,
        c4_line_clean,
        line_lm_clean,
    )
    from couch_to_postgres_spark.extensions.sketch import sketch_stream

    relined = docs.select(
        "doc_id", as_lines("text").alias("text")
    ).persist()
    relined.count()
    bench("q_c4_clean", lambda: c4_line_clean(relined).count())
    bench_median("q_line_lm_clean", lambda: line_lm_clean(relined).count())
    relined.unpersist()

    # DSIR at a corpus-fraction k, DECOMPOSED (VERDICT r07 #1): the r07
    # leg timed scoring + cut through one lambda and its two same-round
    # reps differed 7.8x (3.9 s vs 30.3 s). Quiet-box reruns of the
    # identical r07 code measure 2.7-4.7 s across 3 in-process reps —
    # the 30.3 s rep was host contention landing on the combined leg
    # (nothing in it was cache-reuse-dependent: the scores were already
    # localCheckpoint-materialized before the cut's passes). Decomposed,
    # each measurement is single-purpose: q_dsir_score_bigk times the
    # scoring pipeline alone (one action); the scored table is then
    # written to parquet UNTIMED and q_dsir_cut_bigk times the FORCED
    # threshold-refinement cut (the r06 weak item's fix — k = 40% of
    # the corpus, where TakeOrdered's driver heap-merge stops being a
    # plan) + the payload join over the stored scores, ~0.8 s and
    # stable.
    from couch_to_postgres_spark.extensions.sampling import (
        select_topk_by_key,
    )
    from couch_to_postgres_spark.extensions.selection import dsir_importance

    dsir_docs = docs.select("doc_id", "source", "text")
    dsir_target = dsir_docs.filter(F.col("source") == "src0")
    bench_median(
        "q_dsir_score_bigk",
        lambda: dsir_importance(dsir_docs, dsir_target).count(),
    )
    dsir_scores_path = os.path.join(tmp, "dsir_scores.parquet")
    dsir_importance(dsir_docs, dsir_target).write.mode("overwrite").parquet(
        dsir_scores_path
    )
    dsir_scores = spark.read.parquet(dsir_scores_path)
    dsir_scores.count()  # warm the freshly-written scores (page cache)
    k_big = int(n_docs * 0.4)
    bench(
        "q_dsir_cut_bigk",
        lambda: dsir_docs.join(
            select_topk_by_key(dsir_scores, "log_ratio", k_big), "doc_id"
        ).count(),
    )

    sk_state = os.path.join(tmp, "sketch_state")

    def sketch_batch(i: int) -> None:
        b = docs.filter(F.col("doc_id") % 6 == i).select(
            "source", F.explode(word_shingles("text", 3)).alias("sh")
        )
        sketch_stream(spark, sk_state, b, "source", F.col("sh"), k=64)

    # warm the streaming-merge pipeline on a throwaway state so batch-1
    # timing measures the merge, not one-time codegen
    warm_state = os.path.join(tmp, "sketch_state_warm")
    sketch_stream(
        spark,
        warm_state,
        docs.limit(50).select(
            "source", F.explode(word_shingles("text", 3)).alias("sh")
        ),
        "source",
        F.col("sh"),
        k=64,
    )
    bench("q_sketch_stream_batch1", lambda: sketch_batch(0))
    for i in range(1, 5):
        sketch_batch(i)
    bench("q_sketch_stream_batch6", lambda: sketch_batch(5))

    bench(
        "q_lineitem_pricing",
        lambda: li.filter(F.col("l_quantity") < 48)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
        .collect(),
    )

    total = round(sum(timings.values()), 3)
    # change-apply throughput vs the reference's 626 docs/s tuned sync
    out = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # The artifact states what it measures so rounds stay comparable:
        # all timings are WARM-process numbers — the JVM, parquet footers,
        # the materialized mirror page cache, and (since r01) the streaming
        # machinery (planner + foreachBatch bridge + merge codegen, ~10 s
        # one-time) are warmed before any timer starts. Matches BASELINE.md,
        # whose reference numbers come from a long-running daemon and an
        # OS-cached Postgres table, not a cold process.
        "methodology": "warm-process: JVM/page-cache/streaming-planner warmed before timers; partitioned-write benches (q_cdc_incremental*, *_rewrite) report MEDIAN of 3 reps (OS-writeback noise); matches BASELINE's long-running-daemon measurement. Shared-host caveat: single-shot timings on this box vary up to 2x run-to-run on the heavy queries (observed same-code spread e.g. q_winnow_spans 3.7-13.6 s) - compare trends/geomean across rounds, not single numbers. Since r06 a SECOND same-round run is committed as bench_out_rep2.json so per-round spread is separable from code movement. r08 note: r07's combined q_dsir_select_bigk leg (3.9 s vs 30.3 s reps, 7.8x) was host contention on a multi-second leg, not cache reuse - quiet-box reruns of the identical r07 code measured 2.7-4.7 s over 3 in-process reps; the leg is now DECOMPOSED into q_dsir_score_bigk (scoring alone) and q_dsir_cut_bigk (threshold cut + payload join over parquet-materialized scores, untimed setup) so each number is single-purpose. r09 note: q_bm25_lsm_compact now builds the two-level (token_bucket x id_sub) base with the per-doc buckets column and partial-dfs (+~60% vs r08's flat layout, mostly 1024-dir write overhead at this scale) - that machinery is what makes the NEW q_bm25_lsm_compact_incr leg churn-proportional (flat 1.2x at 10x data, SCALING.md r09), and steady-state maintenance runs the incremental leg, not the full rewrite. r10 note: the id_sub fan-out is now corpus-adaptive (_auto_id_subbuckets: 4 at 600k docs vs r09's fixed 16), recovering most of the r09 compact-leg regression while keeping the incremental fold's rewrite unit bounded (sf0.1 sweep: full 18.6s@4 vs 29.1s@16, fold 12.2s@4 vs 14.6s@1); both compact legs' layouts therefore changed meaning again in r10 - compare against the r10 sweep, not r08's flat numbers. r10 second wave (bench_out_rep2.json refreshed to this code): 1-row meta tables moved off Spark jobs onto driver-side pyarrow (meta_io), micro-batch stats folded into single aggregates (write-time Observations were tried and reverted: runtime-empty CollectMetrics elimination corrupts the session), the fold's staged dfs/doclen writes overlapped on two driver threads, and the from-index read-mostly path dropped its two provable-no-op shuffles - quiet-box effects: compact_incr 10.8->5.4s, lsm_compact 21->12.6s, from_index 2.9->2.2s, stream catchup ~61k changes/s. r12 note: the two r11 both-rep drifts were A/B-exonerated in one interleaved session (r10 code vs r12 HEAD, 3 rounds each, fresh process per run): q_cdc_apply r10 1.37/1.45/1.46s vs HEAD 1.33/1.33/1.57s (cdc_docs_per_sec 411-439k vs 381-452k) and q_bm25_batch100 r10 6.92/7.24/7.36s vs HEAD 7.09/7.29/7.53s - version-independent, host-state only; neither touches a code path changed since r10. r12 FIDELITY note: the q_bm25* legs' query terms (RAIL/TRUCK/AIR, TPC-H ship modes) had matched NOTHING since r03 - the synthetic lineitem has no l_shipmode column - so those legs ranked an empty hit set and their history measured tokenize/stats work only. Terms now come from the real doc-token vocabulary (asserted non-empty); q_bm25/q_bm25_batch100/q_bm25_from_index* numbers are NOT comparable across the r11->r12 boundary. New leg q_bm25_from_index_selective times a selective (rare-price) between-folds read next to the broad 3-term legs. A slice-scoped liveness variant (meta+churn-delta stats, hit-bucket doclen opens) was built and A/B'd this round at 600k AND 6M docs on both index twins and REVERTED: the global corpus-skinny partial-aggregate merge won every cell (bm25 selective 3.2-3.8s global vs 5.5-5.8s scoped; vector 1.97s vs 2.26s at 6M vectors) - hashed ids defeat bucket-level read pruning and the scoped plans pay constant extra driver-action latency. Negative result recorded in the module notes. r13 note: q_bm25_from_index now reads the COMPACTED index (the daemon's steady state - a bulk build is 100% debt and the first watchdog pass compacts it, pinned by x_compact_auto) instead of the raw never-compacted transient r03-r12 measured; NOT comparable across the r12->r13 boundary for that leg (the raw base+tail merge shape is still measured by tail_small/tail_large). On the compacted base a TWO-LEVEL cost gate (16-bin impact histograms stored in dfs) decides between the MaxScore/block-max pruned path (VERDICT r12 #1: exact top-k, per-query-candidate-restricted rescoring) and the exact full path: a per-query screen (est phase-B + rescore rows <= 0.5x full pairs), a global floor (net pair savings must cover phase C's duplicate scans + ~3M pairs of fixed driver actions), and an ABSOLUTE candidate cap (500k - the broadcast/map-side regime). All three are calibration responses to measured losses (SCALING.md r13): ungated all-engaged lost 18.3 vs 12.3 s at 6M docs; honestly-screened small wins lost ~3 s to fixed jobs; fractionally-selective (2%-df) seeds won at 600k but lost 15.4 vs 13.2 s at 6M. Final quiet-box A/B (scaling_out_r13.json): refused regime pruned ~= unpruned at both scales (no regression); engagement regime (20 queries x 2 common + 1 absolutely-rare term) pruned 3.82 vs 7.82 s at 600k and 9.38 vs 14.93 s at 6M. q_bm25_from_index itself is gate-refused at 600k docs (net 0.3M pairs < the floor) and rides the compacted fast path. Both compact legs got slower (~11->20s full): compaction now denormalizes dl, stores sorted per-posting impact bounds, per-pair top-G impact arrays and 16-bin impact histograms - the write-side cost the pruned read and its gate are bought with; steady-state maintenance remains the incremental fold. r14 note (RE-BASELINE): BENCH_r14 is the new compaction-cost baseline - the r12 comparison is retired for the compact legs (the impact bound layer changed what compaction writes) and for q_bm25_from_index (redefined to the compacted index in r13). This round's changes: (1) the incremental fold's dfs is computed by an Arrow partial-merge aggregator (per-split partials merged per (pair,token)) instead of a posting-scale Exchange+Sort+Window - interleaved fresh-process A/B at sf0.1: fold 11.1/13.0 s arrow vs 12.8/13.6 s window; the FULL rewrite keeps the r13 persist+window shape which won its side of the same A/B (28.8/33.7 s vs 33.4/36.1 s arrow) because its exchange+sort is paid anyway for the impact-ordered partitioned write; (2) gated reads now REFUSE from compaction-exported meta planning stats alone (1-row pyarrow read, no per-query dfs collect) - the engagement decision is unchanged and test-pinned; (3) NEW legs q_bm25_from_index_batch20 (pruned) and q_bm25_from_index_batch20_unpruned put the MaxScore engagement regime (20 queries x 2 common + 1 rare term) in the driver's bench; (4) MEDIAN-of-3 reporting extended from the partitioned-write benches to all multi-second legs, with per-rep spreads recorded in bench_out.json (rep_spread) so a contended-host round is separable from code movement; late-r14 this was completed for the last single-shot multi-second legs — q_bm25, q_bm25_batch100, q_bm25_index_build, q_bm25_lsm_compact, q_bm25_lsm_compact_incr — after same-session same-code runs measured the compact legs at 15.4/30.7/40.2 s (fold) purely from end-of-day writeback state; legs whose timed operation consumes its input get an UNTIMED per-rep setup (index_build: rebuild from an empty dir so reps don't append a duplicate tail; compact_incr: re-ingest the identical 3-doc churn with only the seq base bumped) so each timed rep does exactly the work of the leg's original single-shot definition — the timed region is unchanged and values remain comparable with r13-and-earlier single-shot numbers (q_stream_catchup, 2-3 s and stateful, stays single-shot); (5) late-r14 STORED-STATE FIX: the prep now writes the lineitem mirror with parquet.block.size = the session's 8 MB maxPartitionBytes — it was ONE 600k-row row group before (a parquet split is served by the task holding the row group's midpoint, so every corpus scan of the mirror ran effectively single-task at ANY core count; the true limiter behind q_bm25's 8<->32-core flatness, stage forensics committed) — every mirror-scanning leg's numbers step-change at this boundary (in-session layout A/B: q_bm25 shape 2.4-3.1x, q_group_count shape ~3x, 6/6 pairs each, checksums identical; plans/r14/mirror_rowgroups_ab.log); timed regions untouched, and production keeps block size at 128 MB+ where file count supplies the parallelism; (6) bm25_topk_batch scores ONE representative per distinct query-term set and expands ranked rows back with a broadcast map join (identical sets provably produce identical rows; ABAB A/B won 6/6 pairs both orders, checksums identical) — q_bm25_batch100's cost now scales with its distinct sets",
        "ivf_recall_at_5": ivf_recall,
        "ivf_recall_at_5_nprobe8": ivf_recall_8,
        "docs": n_docs,
        "lineitem_docs": n_lineitem,
        "cdc_docs_per_sec": round(n_lineitem / timings["q_cdc_apply"], 1)
        if timings.get("q_cdc_apply")
        else None,
        "stream_changes_per_sec": round(
            load_table(spark, sf_dir, "events").count() / timings["q_stream_catchup"], 1
        )
        if timings.get("q_stream_catchup")
        else None,
        **extras,
    }
    shutil.rmtree(tmp, ignore_errors=True)

    # Artifact robustness (VERDICT r03 #1 + r07 #2): BENCH_r03 came back
    # "parsed": null from executor-shutdown stderr noise; the fixes below
    # (stop streams → spark.stop() → silence fd 2 → print last) handled
    # that, yet BENCH_r07 was null AGAIN for a different reason: the
    # driver retains only the LAST 2000 characters of stdout as its
    # parse window, and the full document (40 query timings + the long
    # methodology note) had grown to 2016 bytes — the head of the JSON
    # fell off the window and the parse failed on a truncated line.
    # stdout therefore carries a SLIM payload (compact separators, no
    # methodology/extras — asserted < 1900 bytes with auto-shedding of
    # optional keys) while the FULL document goes to bench_out.json.
    full_payload = json.dumps(out)
    slim = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "queries": out["queries"],
        "sf": out["sf"],
        "docs": out["docs"],
        "cdc_docs_per_sec": out["cdc_docs_per_sec"],
        "stream_changes_per_sec": out["stream_changes_per_sec"],
    }
    payload = json.dumps(slim, separators=(",", ":"))
    # shedding ladder, cheapest-information-loss first; the full-precision
    # document is already safe in bench_out.json either way
    if len(payload) >= 1900:
        # 1) coarsen per-query timings to 2 decimals (ms precision is
        # noise on this box anyway — see the methodology note)
        slim["queries"] = {k: round(v, 2) for k, v in slim["queries"].items()}
        payload = json.dumps(slim, separators=(",", ":"))
    for optional in ("stream_changes_per_sec", "cdc_docs_per_sec", "docs"):
        if len(payload) < 1900:
            break
        slim.pop(optional, None)
        payload = json.dumps(slim, separators=(",", ":"))
    # 3) last resort: drop the OLDEST query legs (front of the dict —
    # newest rounds' legs are the round-over-round signal) and record how
    # many were shed so the truncation is visible, never silent
    dropped = 0
    while len(payload) >= 1900 and slim["queries"]:
        slim["queries"].pop(next(iter(slim["queries"])))
        dropped += 1
        slim["qdropped"] = dropped
        payload = json.dumps(slim, separators=(",", ":"))
    # the guard the r08 comment claimed but never enforced: the driver
    # parses only the LAST 2000 bytes of stdout — an oversized payload
    # reproduces the BENCH parsed:null failure, so fail loudly instead
    assert len(payload) < 1900, f"bench stdout payload {len(payload)}B >= 1900"
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_out.json")
    try:
        with open(out_path, "w") as fh:
            fh.write(full_payload + "\n")
    except OSError:
        pass  # file copy is belt-and-braces; stdout remains the contract
    sys.stdout.flush()
    sys.stderr.flush()
    try:
        devnull = os.open(os.devnull, os.O_WRONLY)
        os.dup2(devnull, 2)
    except OSError:
        pass
    for q in spark.streams.active:
        try:
            q.stop()
        except Exception:
            pass
    spark.stop()
    print(payload, flush=True)


if __name__ == "__main__":
    main()
