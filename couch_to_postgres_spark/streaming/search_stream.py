"""Streaming-incremental BM25: keep a ranked-retrieval index maintained
under the CDC change feed instead of re-tokenizing the corpus per query.

The batch search stack (:mod:`couch_to_postgres_spark.extensions.search`)
rebuilds doc lengths, term frequencies, and df(t) from the corpus on every
call — correct, but a live pipeline ingesting a change feed (reference
lib/index.js follow loop) should pay tokenization once per CHANGED doc,
not once per query over 100 TB. This module maintains the searchable
state append-only (the `streaming/dedup_stream.py` index pattern) and
answers BM25 top-k from the state alone.

State (all plain parquet; the tail is append-only — no rewrite of
accumulated state between compactions):

* ``<index>/doclen``   — (doc_id, dl, seq): one row per ingested doc
  VERSION (seq = the change's sequence number);
* ``<index>/postings`` — (doc_id, token, tf, seq): per-version term
  frequencies — the inverted-index rows;
* ``<index>/tombstones`` — (doc_id, seq): delete markers;
* ``<index>/base/`` (optional, written by :func:`compact_index`) — the
  compacted BASE: ``base/doclen`` (live rows only), ``base/postings``
  laid out in ``token_bucket=N`` partition directories, ``base/meta``
  (1-row parquet: bucket count + live-corpus stats ``n_live``/``sum_dl``
  for the read-mostly query fast path). The tail dirs above keep
  receiving appends AFTER compaction — reads merge base ∪ tail (the
  log-structured-merge shape).

Liveness rule (evaluated at query time, no state rewrite): a doc's live
version is its max-seq doclen row, unless a tombstone with a higher seq
exists — updates simply append the new version (higher seq supersedes),
deletes append a tombstone. This is exactly the rev-wins merge discipline
of the CDC mirror (operators/cdc.py), re-expressed over append-only files.

Plan shape at 100 TB:

* ingest cost is O(changed docs): tokenize + one skinny append per batch
  — the corpus is never rescanned;
* query-time liveness is ONE partial-aggregated groupBy over the skinny
  doclen/tombstone files (bytes per doc-version, not corpus bytes);
* the postings scan is filtered to the query terms BEFORE any shuffle;
  on the compacted base the scan additionally prunes to the
  ``token_bucket`` partition directories holding the query terms
  (PartitionFilters, verified by test), so only
  terms/token_buckets-worth of the base is ever opened — everything
  downstream is query-hit-proportional;
* the live-version join is hint-free: AQE broadcasts the query-hit
  slice when it is genuinely small and falls back to a shuffle join for
  high-df (stop-word-like) terms instead of OOMing a forced broadcast;
  ``max_df_frac`` applies the batch path's classic df cap when
  near-zero-idf terms should be dropped from scoring outright;
* scoring reuses :func:`extensions.search.bm25_rank_components`, so the
  index path and the fresh-build path cannot drift numerically — the
  equivalence is pinned by tests and by the ``x_bm25_incremental``
  cross-engine oracle.

At-least-once safety: a replayed micro-batch re-appends byte-identical
(doc, token, tf, seq) and (doc, dl, seq) rows; liveness takes max/max_by
over seq (duplicate-insensitive) and the query path applies
``dropDuplicates`` on the pruned, query-hit-proportional slice — so
replays change nothing (same idempotence argument as the CDC merge).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from couch_to_postgres_spark.extensions.search import bm25_rank_components
from couch_to_postgres_spark.extensions.text import _words
from couch_to_postgres_spark.streaming.meta_io import (
    read_meta_rows,
    write_meta_rows,
)


@dataclass
class SearchIndexBatchStats:
    arrived: int
    upserts: int
    deletes: int
    postings_rows: int


def _read_or_empty(spark: SparkSession, path: str, schema) -> DataFrame:
    # probe by attempting the read (PATH_NOT_FOUND / empty-dir schema
    # inference both raise AnalysisException) rather than a driver-local
    # os.path.exists — the index may live on any Hadoop-supported
    # filesystem (HDFS/S3), where a local stat is always false and would
    # silently read an existing index as empty
    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return spark.createDataFrame([], schema)


def _read_components(
    spark: SparkSession, specs: list[tuple[str, str]], id_col: str
) -> list[DataFrame]:
    """Read sibling index components ``[(path, fallback_schema), …]``;
    a MISSING component's id column takes the dtype of whichever sibling
    exists. The index must never cast ids: a string-id corpus (couch doc
    ids like ``'100009-6'``) with, say, no tombstones yet must not get a
    long-typed empty tombstone frame — the later join/union would
    ANSI-cast the real ids to bigint and throw mid-query."""
    reads: list[DataFrame | None] = []
    like = None
    for path, _ in specs:
        try:
            df = spark.read.parquet(path)
            if like is None:
                like = df
        except AnalysisException:
            df = None
        reads.append(df)
    out = []
    for df, (_, schema) in zip(reads, specs):
        if df is None:
            if like is not None and id_col in dict(like.dtypes):
                id_t = dict(like.dtypes)[id_col]
                fields = [f.strip() for f in schema.split(",")]
                schema = ", ".join(
                    f"{id_col} {id_t}" if f.startswith(f"{id_col} ") else f
                    for f in fields
                )
            df = spark.createDataFrame([], schema)
        out.append(df)
    return out


def _all_attrs(
    spark: SparkSession, index_path: str, id_col: str = "doc_id"
) -> DataFrame | None:
    """EVERY attrs row an index carries: the flat append ``attrs`` tail
    (``stats_index_batch`` writes there) ∪ the id-bucketed ``base/attrs``
    a compaction laid down (latest-per-live-doc rows — compaction
    collapses attr version history, the documented append-log caveat).
    Attr column sets are dynamic, so this reads-attempts both components
    and unions by name; ``None`` when the index has no attrs at all."""
    frames = []
    for p in (
        os.path.join(index_path, "attrs"),
        os.path.join(index_path, "base", "attrs"),
    ):
        try:
            df = spark.read.parquet(p)
        except AnalysisException:
            continue
        if "id_bucket" in df.columns:
            df = df.drop("id_bucket")
        frames.append(df)
    if not frames:
        return None
    out = frames[0]
    for df in frames[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def _has_partition_prefix(root: str, prefix: str) -> bool:
    """True when ``root`` holds ``prefix``-style partition dirs —
    the layout probe that decides whether a by-name pruned open is
    possible. Local-FS dir probe, like the swap machinery; on HDFS/S3
    this is a FileSystem listStatus / table-format manifest read."""
    try:
        return any(e.startswith(prefix) for e in os.listdir(root))
    except OSError:
        return False


def _open_partition_dirs(spark, root: str, rel_dirs) -> DataFrame | None:
    """Construct a reader over ONLY the named partition dirs of a
    bucketed component (``basePath`` keeps the partition columns).
    Constructing a reader over the whole root pays a full file LISTING
    at DataFrame-construction time — measured 10-15 s on a 5 k-dir
    dataset (SCALING.md r09) — even when execution would partition-prune
    every other dir; when the caller already knows the bucket set (query
    terms → token buckets via meta, churned ids → id buckets), opening
    the dirs by name skips the listing entirely. A missing dir just
    means that bucket never materialized. Returns ``None`` when none of
    the named dirs exist (caller supplies its empty frame)."""
    dirs = [
        d
        for d in (os.path.join(root, rel) for rel in rel_dirs)
        if os.path.exists(d)
    ]
    if not dirs:
        return None
    return spark.read.option("basePath", root).parquet(*dirs)


def _paths(index_path: str) -> tuple[str, str, str]:
    return (
        os.path.join(index_path, "doclen"),
        os.path.join(index_path, "postings"),
        os.path.join(index_path, "tombstones"),
    )


def _base_paths(index_path: str) -> tuple[str, str, str]:
    base = os.path.join(index_path, "base")
    return (
        os.path.join(base, "doclen"),
        os.path.join(base, "postings"),
        os.path.join(base, "meta"),
    )


def search_index_batch(
    spark: SparkSession,
    index_path: str,
    changes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_col: str = "seq",
    deleted_col: str = "deleted",
) -> SearchIndexBatchStats:
    """Apply one micro-batch of changes to the search index.

    ``changes`` rows are (seq, id, deleted, text) — inserts and updates
    carry the new text, deletes carry ``deleted=true`` (text ignored).
    Multiple changes to one doc within a batch collapse to the max-seq
    one (same last-write-wins discipline as ``operators.cdc``). Cost is
    O(changed docs): tokenize the batch, append three skinny files.

    Write-order INVARIANT (load-bearing): ``doclen`` is appended BEFORE
    ``postings``. :func:`bm25_topk_from_index`'s read-mostly fast path
    decides "no tail" from tail-doclen absence alone — with this order a
    crash between the two appends leaves doclen present (fast path off,
    exact merge path sees the partial batch's doclen rows, which is
    harmless at-least-once state the replay overwrites); the reverse
    order could leave tail postings that a doclen-only probe misses.
    Do not reorder the appends.

    Appends run under the per-path lock (same registry as the
    partitioned mirror's merges) so the daemon watchdog's IN-PLACE
    compaction (:func:`compact_index_inplace`) can never swap the index
    out from under a half-written batch."""
    from couch_to_postgres_spark.streaming.partitioned import _path_lock

    with _path_lock(index_path):
        return _search_index_batch_locked(
            spark, index_path, changes, text_col, id_col, seq_col, deleted_col
        )


def _search_index_batch_locked(
    spark: SparkSession,
    index_path: str,
    changes: DataFrame,
    text_col: str,
    id_col: str,
    seq_col: str,
    deleted_col: str,
) -> SearchIndexBatchStats:
    doclen_path, postings_path, tomb_path = _paths(index_path)

    latest = (
        changes.groupBy(id_col)
        .agg(
            F.max_by(
                F.struct(
                    F.col(seq_col).alias("seq"),
                    F.col(deleted_col).cast("boolean").alias("deleted"),
                    F.col(text_col).alias("text"),
                ),
                F.col(seq_col),
            ).alias("c"),
            F.count(F.lit(1)).alias("_n_changes"),
        )
        # tokenize ONCE, into the cache (r14, guide §2.4/§1.2): the
        # stats aggregate, the doclen rows and the postings explode all
        # consumed `_words(text)` from the cached TEXT, so a bulk build
        # ran the tokenizer over the whole batch three times (three
        # jobs over the persisted frame, each re-splitting every doc).
        # Caching the token array instead runs it once at cache
        # materialization; deleted/NULL-text rows hold NULL (the
        # downstream coalesce/greatest guards are unchanged).
        # `_TOKENIZE_ONCE` is the r14 A/B knob (False = cache text).
        .select(
            id_col,
            "c.seq",
            "c.deleted",
            "_n_changes",
            (
                F.when(~F.col("c.deleted"), _words(F.col("c.text"))).alias(
                    "toks"
                )
                if _TOKENIZE_ONCE
                else F.col("c.text")
            ),
        )
        .persist()
    )
    # ONE job yields every batch stat — including the postings count,
    # which equals Σ per-upsert distinct tokens (exactly what the
    # (id, token, seq) groupBy below emits one row per) — and
    # materializes the persist. A micro-batch used to pay 6-7 job
    # launches here, pure fixed overhead at trickle-feed batch sizes.
    # (An Observation on the postings write would be one job fewer
    # still, but a runtime-empty observed write — a delete-only batch —
    # gets its CollectMetrics optimizer-eliminated and the dangling
    # observation corrupts the session for later RDD-closure jobs;
    # found by test_quality_classifier after the delete-all-churn test.)
    words = F.col("toks") if _TOKENIZE_ONCE else _words("text")
    counts = latest.agg(
        F.coalesce(F.sum("_n_changes"), F.lit(0)).alias("arrived"),
        F.coalesce(
            F.sum(F.when(~F.col("deleted"), 1).otherwise(0)), F.lit(0)
        ).alias("n_up"),
        F.coalesce(
            F.sum(F.when(F.col("deleted"), 1).otherwise(0)), F.lit(0)
        ).alias("n_del"),
        F.coalesce(
            F.sum(
                F.when(
                    ~F.col("deleted"),
                    # a NULL-text upsert (custom search_text hook) holds
                    # zero postings; bare size(NULL) is -1 (legacy
                    # sizeOfNull) and would skew the stat (ADVICE r10)
                    F.greatest(
                        F.coalesce(
                            F.size(F.array_distinct(words)), F.lit(0)
                        ),
                        F.lit(0),
                    ),
                )
            ),
            F.lit(0),
        ).alias("n_postings"),
    ).collect()[0]
    arrived, n_up, n_del, n_postings = (
        int(counts["arrived"]), int(counts["n_up"]),
        int(counts["n_del"]), int(counts["n_postings"]),
    )

    upserts = latest.filter(~F.col("deleted"))
    doclen_rows = upserts.select(
        F.col(id_col),
        # NULL-text upserts hold zero tokens (same guard as n_postings)
        F.greatest(F.coalesce(F.size(words), F.lit(0)), F.lit(0))
        .cast("double")
        .alias("dl"),
        F.col("seq").cast("long").alias("seq"),
    )
    postings_rows = (
        upserts.select(
            F.col(id_col), F.col("seq"), F.explode(words).alias("token")
        )
        .groupBy(id_col, "token", "seq")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
        .select(id_col, "token", "tf", F.col("seq").cast("long").alias("seq"))
    )
    # doclen FIRST — the from-index fast path's safety depends on this
    # order (see the docstring's write-order invariant)
    doclen_rows.write.mode("append").parquet(doclen_path)
    postings_rows.write.mode("append").parquet(postings_path)

    if n_del:
        latest.filter(F.col("deleted")).select(
            F.col(id_col), F.col("seq").cast("long").alias("seq")
        ).write.mode("append").parquet(tomb_path)

    latest.unpersist()
    return SearchIndexBatchStats(
        arrived=arrived, upserts=n_up, deletes=n_del, postings_rows=n_postings
    )


def live_doclen(
    spark: SparkSession, index_path: str, id_col: str = "doc_id"
) -> DataFrame:
    """(id, dl, seq) for the LIVE version of every indexed doc: max-seq
    doclen row per doc — over the compacted base (if present) UNION the
    append tail — minus docs whose max tombstone seq is higher.
    One partial-aggregated groupBy over the skinny doclen files + a
    skinny left join — never touches postings or corpus text.
    Replay-duplicate rows collapse inside the max/max_by aggregates."""
    doclen_path, _, tomb_path = _paths(index_path)
    base_doclen_path, _, _ = _base_paths(index_path)
    schema = f"{id_col} long, dl double, seq long"
    tail, base, tomb = _read_components(
        spark,
        [
            (doclen_path, schema),
            (base_doclen_path, schema),
            (tomb_path, f"{id_col} long, seq long"),
        ],
        id_col,
    )
    doclen = tail.select(id_col, "dl", "seq").unionByName(
        base.select(id_col, "dl", "seq")
    )
    latest = doclen.groupBy(id_col).agg(
        F.max("seq").alias("seq"), F.max_by("dl", "seq").alias("dl")
    )
    tomb_max = tomb.groupBy(id_col).agg(F.max("seq").alias("_tomb_seq"))
    return (
        latest.join(tomb_max, id_col, "left")
        .filter(
            F.col("_tomb_seq").isNull() | (F.col("_tomb_seq") < F.col("seq"))
        )
        .select(id_col, "dl", "seq")
    )


def _spark_hash_str(s: str, seed: int = 42) -> int:
    """Driver-side twin of ``F.hash`` over ONE string column: Spark's
    ``Murmur3_x86_32.hashUnsafeBytes`` on the UTF-8 bytes, seed 42,
    signed-int32 result. Spark deviates from canonical murmur3 in the
    tail — each remaining byte (SIGNED) runs through the full
    mixK1/mixH1 round individually — replicated here. The drift hazard
    of reimplementing an engine hash is pinned by
    ``test_search_stream.test_spark_hash_str_matches_engine``: any Spark
    upgrade that changed this hash would fail that test loudly, not
    probe wrong buckets silently."""
    data = s.encode("utf-8")
    n = len(data)
    mask = 0xFFFFFFFF
    c1, c2 = 0xCC9E2D51, 0x1B873593

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (32 - r))) & mask

    def mix(h1: int, k1: int) -> int:
        k1 = rotl((k1 * c1) & mask, 15)
        k1 = (k1 * c2) & mask
        h1 ^= k1
        return (rotl(h1, 13) * 5 + 0xE6546B64) & mask

    h1 = seed & mask
    for i in range(0, n - n % 4, 4):
        h1 = mix(h1, int.from_bytes(data[i:i + 4], "little"))
    for i in range(n - n % 4, n):
        b = data[i]
        h1 = mix(h1, b - 256 if b >= 128 else b)
    h1 ^= n
    h1 = ((h1 ^ (h1 >> 16)) * 0x85EBCA6B) & mask
    h1 = ((h1 ^ (h1 >> 13)) * 0xC2B2AE35) & mask
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def _term_buckets(
    spark: SparkSession, terms: list[str], n_buckets: int
) -> list[int]:
    """The ``pmod(hash(token), n_buckets)`` bucket ids for the query
    terms — driver-side (:func:`_spark_hash_str`, engine-equality
    pinned), so planning a bucket-pruned probe launches no Spark job.
    ``% n_buckets`` with a positive modulus matches ``F.pmod`` on a
    negative hash."""
    del spark  # kept for call-site compatibility; no job is launched
    return sorted({_spark_hash_str(t) % n_buckets for t in terms})


def _full_postings(
    spark: SparkSession, index_path: str, id_col: str = "doc_id"
) -> DataFrame:
    """ALL (id, token, tf, seq) postings rows: compacted base ∪ append
    tail, no term filter — for whole-index consumers (compaction, the
    corpus-stats reports), not the query path."""
    _, postings_path, _ = _paths(index_path)
    _, base_postings_path, _ = _base_paths(index_path)
    schema = f"{id_col} long, token string, tf double, seq long"
    tail, base = _read_components(
        spark, [(postings_path, schema), (base_postings_path, schema)], id_col
    )
    return tail.select(id_col, "token", "tf", "seq").unionByName(
        base.select(id_col, "token", "tf", "seq")
    )


def live_postings(
    spark: SparkSession,
    index_path: str,
    id_col: str = "doc_id",
    terms: list[str] | None = None,
) -> DataFrame:
    """(id, token, tf, seq) postings restricted to LIVE doc versions,
    with at-least-once replay copies removed — THE reader every
    postings consumer must go through (VERDICT r08 #1: the replay-dedup
    discipline had three hand-rolled copies and one missing one —
    ``decontaminate_from_index`` double-counted replayed rows — so the
    discipline now has exactly one owner).

    Two invariants every row of the result satisfies:

    * **live**: the row belongs to the doc's max-seq non-tombstoned
      version (:func:`live_doclen`'s seq-wins rule);
    * **unique**: one row per (id, token, seq) — a replayed micro-batch
      re-appends byte-identical tail rows, and any count/sum over raw
      postings would double-count them.

    On a read-mostly index (:func:`base_is_live`: compacted base, no
    tail, no tombstones) both invariants hold by construction of
    :func:`compact_index`, so the postings come back with NO dedup
    shuffle and NO live-version join. ``terms`` narrows the read to the
    query terms via :func:`query_postings` (token-IN pushdown +
    ``token_bucket`` partition pruning) BEFORE the dedup/join, so a
    term-probe consumer pays term-frequency-proportional bytes, never
    index-proportional."""
    if terms is not None:
        postings = query_postings(spark, index_path, terms, id_col)
    else:
        postings = _full_postings(spark, index_path, id_col)
    if base_is_live(spark, index_path):
        return postings
    live = live_doclen(spark, index_path, id_col).select(id_col, "seq")
    return postings.dropDuplicates([id_col, "token", "seq"]).join(
        live, on=[id_col, "seq"]
    )


def base_is_live(spark: SparkSession, index_path: str) -> bool:
    """True when the compacted base IS the live corpus: stats-bearing
    meta present, no tail doclen, no tombstones — the same read-mostly
    test ``bm25_topk_from_index``'s fast path applies (safe on tail-
    DOCLEN absence alone because ``search_index_batch`` appends doclen
    before postings — its documented write-order invariant). Callers
    can then skip the live-version merge entirely: every base postings
    row is live and unique (compaction dropped dead versions and
    deduplicated replays)."""

    def _has(p: str) -> bool:
        try:
            spark.read.parquet(p)
            return True
        except AnalysisException:
            return False

    doclen_path, _, tomb_path = _paths(index_path)
    _, _, meta_path = _base_paths(index_path)
    return (
        bool(read_meta_rows(spark, meta_path))
        and not _has(doclen_path)
        and not _has(tomb_path)
    )


#: BM25 parameters the compacted base's impact bounds are STAMPED with
#: (the library-wide defaults). The MaxScore pruned read requires the
#: query's (k1, b) to equal the stamp — any other pair falls back to the
#: exact full path, so non-default calls stay correct, just unpruned.
IMPACT_K1 = 1.2
IMPACT_B = 0.75

#: per-(token_bucket, id_sub, token) top-impact array length stored in
#: ``base/dfs``. Partials are doc-disjoint, so merging a token's partial
#: arrays yields the EXACT global top-G impacts; a query's k must be
#: <= G for the threshold seed to be provable (k above G falls back).
IMPACT_TOP_G = 32

#: safety slack subtracted from the MaxScore threshold, covering every
#: rounding step between the stored raw impacts and the scorer's final
#: numbers: bm25_rank_components rounds each contribution to 6 decimals
#: (±5e-7 per term, summed exactly as decimal) and the final score to 4
#: (±5e-5) — 2e-3 dominates both for any query up to ~1000 terms, and
#: costs nothing against score gaps at 1e-1 scale.
IMPACT_EPS = 2e-3

#: bin count of the per-(token_bucket, id_sub, token) stored-impact
#: histogram in ``base/dfs`` (equi-width over impact0's (0, 1] range;
#: partial counts sum exactly across a token's doc-disjoint partials).
#: The histogram exists for the pruned read's COST GATE, never for
#: correctness: it estimates how many postings a term's cut actually
#: skips, so the planner can refuse pruning in the regime where it
#: provably reads ~everything anyway (all-common-term queries — the
#: known WAND/MaxScore degenerate case, where phase B + the rescore
#: would COST more than the exact full path; measured r13: a 20-query
#: all-common batch ran 18.3 s pruned vs 12.3 s full at 6M docs).
IMPACT_HIST_BINS = 16

#: cost-gate PER-QUERY screen: a query is an engagement candidate only
#: when its estimated pruned work (phase-B rows + per-query rescore
#: rows, both from the stored histograms) is below this fraction of its
#: full-path pair count (Σ dft over its terms). Queries that fail ride
#: the full path — in a batch, PER QUERY, so one stop-word query never
#: drags a rare-term query off its fast plan (or vice versa).
IMPACT_GATE_ALPHA = 0.5

#: cost-gate GLOBAL floor, in estimated ranked-pair rows: the screened
#: candidate set actually engages only when its predicted net pair
#: savings ALSO clear (phase-C's duplicate scan rows + this floor).
#: The floor prices the pruned plan's FIXED costs — ~4 extra driver
#: actions (dfs-stats collect, phase-B scan, candidate materialization,
#: the pair semi-join) ≈ 1.5-2 s of pure job latency on this class of
#: box, which the measured ~1.5-2M-pairs/s ranking throughput equates
#: to ~3M pairs. Calibration is empirical and regression-averse (r13
#: diag: engaging 2 queries with ~0.6M net-pair savings measured a
#: ~3 s LOSS; the same batch unpruned was optimal): below the floor the
#: full path is the measured winner, and at the corpus sizes MaxScore
#: exists for (100 TB: net savings in the billions of pairs) the floor
#: is noise. Tests that pin engagement mechanics monkeypatch this to 0.
IMPACT_GATE_FLOOR_ROWS = 3_000_000

#: cost-gate candidate cap: the engaged plan's candidate structures
#: (phase-B rows → the global id set and the per-query pair table)
#: must stay in the broadcast/map-side-join regime, because every one
#: of its extra joins (the tf-cand semi join, the per-query pair
#: restriction, the pair-table distinct) shuffles rows AT candidate
#: scale — beyond a few hundred thousand rows those shuffles rival the
#: full path's single partial-aggregated pass and the plan loses even
#: with millions of ranked pairs provably saved (measured r13: a
#: 20-query batch seeded by ~2%-df terms WON 2× at 600k docs with a
#: 240k-candidate union but LOST at 6M docs where the same fractional
#: selectivity meant 2.4M candidates — 15.4 s vs 13.2 s unpruned).
#: "Selective" must be ABSOLUTE, not fractional: real rare-term
#: queries keep bounded candidate sets at any corpus size, which is
#: exactly the workload MaxScore exists for. Calibrated on local[32];
#: a cluster deployment would scale it with executor broadcast budget.
IMPACT_GATE_MAX_CANDIDATES = 500_000


def _impact0_expr(k1: float, b: float, avgdl: float):
    """The idf-free BM25 term of one posting under the stamped
    parameters: ``tf / (tf + k1*(1 - b + b*dl/avgdl))`` ∈ (0, 1],
    computed from the row's ``tf`` and denormalized ``dl``. Monotone in
    the true contribution given fixed corpus stats; under avgdl drift
    (incremental folds) the true current value is bracketed by
    ``impact0 * [min(1, avgdl/avgdl0), max(1, avgdl/avgdl0)]`` — the
    correction factors the pruned read derives from meta's
    ``impact_avgdl_min/max``."""
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
    )
    return (F.col("tf") / denom).alias("impact0")


def query_postings(
    spark: SparkSession,
    index_path: str,
    terms: list[str],
    id_col: str = "doc_id",
    with_dl: bool = False,
) -> DataFrame:
    """(id, token, tf, seq) rows matching the query terms: compacted
    base ∪ append tail. The term filter pushes into both parquet scans;
    on a bucketed base the ``token_bucket=N`` partition dirs holding the
    query terms are opened BY NAME (bucket ids from ``base/meta``;
    r10, VERDICT r09 #6) — constructing a reader over the whole base
    root pays a full file listing at scaled bucket counts even though
    execution would prune, so the probe's planning cost now scales with
    the term set, not the directory count. An un-compacted-since append
    tail is the only unpruned bytes — bounded by the update rate
    between compactions, not corpus size.

    ``with_dl=True`` additionally returns the base's DENORMALIZED
    per-doc length column (written by impacts-mode compaction) so the
    scoring stage can skip its doclen join (r14 dl-carry) — honored
    only when the base actually carries ``dl`` AND no tail exists
    (tail rows have no stored dl); otherwise the column is silently
    omitted and callers fall back to the join by checking
    ``"dl" in result.columns``. A tail append racing the caller's
    no-tail probe therefore degrades to the join shape, never to NULL
    lengths."""
    _, postings_path, _ = _paths(index_path)
    _, base_postings_path, meta_path = _base_paths(index_path)
    schema = f"{id_col} long, token string, tf double, seq long"
    meta = read_meta_rows(spark, meta_path)
    base = None
    if meta and _has_partition_prefix(base_postings_path, "token_bucket="):
        n_buckets = int(meta[0]["token_buckets"])
        base = _open_partition_dirs(
            spark,
            base_postings_path,
            [
                f"token_bucket={b}"
                for b in _term_buckets(spark, terms, n_buckets)
            ],
        )
    else:
        # legacy flat base (or a non-local FS where the dir probe is
        # blind): read-attempt the whole component as before
        try:
            base = spark.read.parquet(base_postings_path)
        except AnalysisException:
            base = None
    try:
        tail = spark.read.parquet(postings_path)
    except AnalysisException:
        tail = None
    # never-cast-ids: whichever component is missing takes the id dtype
    # of the sibling that exists (the _read_components discipline)
    like = base if base is not None else tail
    if like is not None and id_col in dict(like.dtypes):
        id_t = dict(like.dtypes)[id_col]
        schema = f"{id_col} {id_t}, token string, tf double, seq long"
    # dl passthrough contract (see docstring): base must carry the
    # denormalized column and there must be no tail rows to merge
    want_dl = (
        with_dl
        and tail is None
        and base is not None
        and "dl" in dict(base.dtypes)
    )
    if want_dl:
        schema += ", dl double"
    sel = [id_col, "token", "tf", "seq"] + (["dl"] if want_dl else [])
    if base is None:
        base = spark.createDataFrame([], schema)
    if tail is None:
        tail = spark.createDataFrame([], schema)
    tail = tail.filter(F.col("token").isin(terms)).select(*sel)
    base = base.filter(F.col("token").isin(terms)).select(*sel)
    return base.unionByName(tail)


def _bm25_pruned_topk(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    m: dict,
    terms: list[str],
    k: int,
    k1: float,
    b: float,
    id_col: str,
    query_id_col: str,
    term_col: str,
    max_df_frac: float | None,
    diag: dict | None,
    force: bool = False,
    dft_out: dict | None = None,
    q_pairs: list[tuple] | None = None,
) -> tuple[DataFrame, DataFrame | None] | None:
    """MaxScore / block-max top-k over the compacted base — EXACT BM25
    top-k at sub-df-proportional cost (Turtle & Flood 1995 MaxScore;
    Ding & Suel 2011 block-max — public knowledge, re-expressed on
    columnar statistics instead of postings cursors). Returns ``None``
    whenever any precondition fails, and the caller runs the exact
    full path — the pruned read is an optimization gate, never a
    semantics fork.

    Exact BM25 scores every posting of every query term, so a 33%-df
    term at 100 TB scores a third of the corpus's postings per query
    (VERDICT r12 #1). This read instead:

    1. **plans driver-side from dfs bounds** — per query it derives a
       provable lower bound θ of the k-th best final score (the k-th
       highest stored impact of any one query term: one posting per
       (doc, token) means those k impacts belong to k distinct docs,
       each of whose final scores is at least its own impact), then
       per-term MaxScore cuts over the ub-ascending term order:
       ``cut_{t_j} = (θ − Σ_{i<j} ub_{t_i}) / scale_{t_j}`` — a doc
       whose every present term's posting falls below its cut has, at
       its HIGHEST-ranked present term t_j, contribution < θ −
       prefix_j, hence score < θ strictly: it cannot enter (or tie
       into) the top-k;
    2. **phase B (candidates)**: scans only postings with
       ``token = t AND impact0 ≥ cut_t`` — pushed predicates over the
       (token, impact0 desc)-sorted base, so parquet row-group/page
       statistics skip the provably-losing blocks at the storage layer;
    3. **phase C (exact rescore)**: re-reads the query terms' postings
       semi-joined to the candidate ids and scores them through the
       SHARED :func:`bm25_rank_components` — numerically identical to
       the full path, so the two can never drift.

    Safety under avgdl drift (incremental folds stamp rows under
    different corpus averages): all bounds are corrected by
    ``r_max = max(1, avgdl/impact_avgdl_min)`` (upper) and
    ``s_min = min(1, avgdl/impact_avgdl_max)`` (lower) from meta's
    stamp bracket, and θ carries :data:`IMPACT_EPS` slack dominating
    the scorer's 6/4-decimal rounding — pruning only ever removes docs
    strictly below the k-th best ROUNDED score, so ties at the boundary
    always survive.

    **Cost gate** (r13): MaxScore's known degenerate regime is the
    all-common-term query — similar per-term upper bounds leave every
    term but one with cut 0, phase B reads ~everything, and the pruned
    plan COSTS more than the exact full path (measured: a 20-query
    all-common batch 18.3 s pruned vs 12.3 s full at 6M docs). Two
    levels, both planned from the stored per-term impact histograms:

    * **per-query screen**: est(phase-B rows + per-query rescore rows)
      must fall below :data:`IMPACT_GATE_ALPHA` × (Σ dft over the
      query's terms);
    * **global decision**: the screened set engages only when its net
      predicted pair savings also cover phase C's duplicate scans
      (engaged terms a refused query's full path scans anyway) plus
      :data:`IMPACT_GATE_FLOOR_ROWS` — the fixed driver actions the
      pruned plan costs regardless of size. In a columnar engine the
      rescore cannot avoid re-reading the engaged terms' postings, so
      pruning pays exactly when the RANKED-PAIR reduction (the per-
      query shuffle/window work a batch multiplies) dominates that
      scan — the 100 TB regime; at small corpora the gate correctly
      leaves everything on the full path (measured optimal).

    Engaged queries run here with cuts min-merged over the engaged set
    only (a refused stop-word query can no longer zero a shared term's
    cut) and the rescore restricted to each query's OWN candidates
    (the MaxScore theorem is per query); refused queries return to the
    caller, which runs them through the exact full path and unions.
    ``force=True`` (the ``pruned="force"`` escape hatch) skips both
    estimates and engages every query with any positive cut — the
    exactness-pinning tests' mode, never the planner's.

    Returns ``None`` when NO query engages (or a structural gate
    fails), else ``(topk_df, remaining_queries_df | None)`` where the
    second element carries the refused queries (``None`` when all
    engaged).

    Structural gates (→ ``None``): stamped (k1, b) differ from the
    query's, k > stored top-G, legacy base without the impact layer or
    histograms, no positive cut anywhere (pruning would read
    everything the full path reads), or an empty live corpus.
    ``candidates=`` filtering is gated by the CALLER: θ bounds the
    k-th best index-wide score, which is not a bound for the k-th best
    within an arbitrary candidate subset."""
    if m.get("impact_k1") is None or m.get("impact_topg") is None:
        return None
    if float(m["impact_k1"]) != float(k1) or float(m["impact_b"]) != float(b):
        return None
    if int(k) > int(m["impact_topg"]):
        return None
    n_live = int(m["n_live"])
    if n_live <= 0:
        return None
    if q_pairs is None:
        # direct callers without the caller-collected pairs: one
        # collect of the tiny query table (the caller path shares its
        # first collect instead)
        q_pairs = [
            (r[query_id_col], r["t"])
            for r in queries.select(
                query_id_col, F.col(term_col).alias("t")
            ).distinct().collect()
        ]
    # META-ONLY refusal short-circuit (r14, VERDICT r13 #4): the global
    # decision needs net predicted pair savings ≥ extra_scan + FLOOR,
    # and net_pairs ≤ Σ_q Σ_{t∈q} dft_t ≤ |(query, term) pairs| ×
    # n_live (df of any term is at most the live doc count) while
    # extra_scan ≥ 0 — so when that bound is already under the floor,
    # refusal is PROVABLE from meta alone and the planning collect
    # over the dfs dirs (a full Spark action the r13 bench paid on
    # every refused read: recompacted leg 2.5 → 3.5 s) never runs.
    # The caller's exact full path then reads dfs inside its main job,
    # exactly the pre-gate r12 plan. Same decision, zero extra jobs;
    # ``force`` (the exactness-test mode) skips every gate as before.
    if not force and len(q_pairs) * n_live < IMPACT_GATE_FLOOR_ROWS:
        if diag is not None:
            diag["gate"] = {
                "short_circuit": True,
                "bound_pairs": int(len(q_pairs) * n_live),
                "floor": int(IMPACT_GATE_FLOOR_ROWS),
            }
        return None
    dfs_root = os.path.join(index_path, "base", "dfs")
    _, base_postings_path, _ = _base_paths(index_path)
    if not _has_partition_prefix(dfs_root, "token_bucket="):
        return None
    if not _has_partition_prefix(base_postings_path, "token_bucket="):
        return None
    import math

    n_buckets = int(m["token_buckets"])
    n = float(n_live)
    avgdl = (float(m["sum_dl"]) / n_live) if n_live else 0.0
    lo = float(m["impact_avgdl_min"] or 0.0)
    hi = float(m["impact_avgdl_max"] or 0.0)
    if lo <= 0.0 or hi <= 0.0:
        return None
    r_max = max(1.0, avgdl / lo)
    s_min = min(1.0, avgdl / hi)
    bucket_dirs = [
        f"token_bucket={tb}" for tb in _term_buckets(spark, terms, n_buckets)
    ]
    dfs_df = _open_partition_dirs(spark, dfs_root, bucket_dirs)
    try:
        rows = (
            dfs_df.filter(F.col("token").isin(terms))
            .select(
                "token", "dft", "max_impact0", "top_impacts", "impact_hist"
            )
            .collect()
            if dfs_df is not None
            else []
        )
    except AnalysisException:
        return None  # dfs partials predate the impact layer / histograms
    # merge partials per term: dft sums exactly (integral doubles),
    # partial maxes max, partial top arrays concatenate+sort to the
    # exact global top list, histogram bins sum elementwise (partials
    # are doc-disjoint)
    agg: dict[str, list] = {}
    for r in rows:
        dft_p, max_p, tops_p, hist_p = (
            float(r["dft"]),
            r["max_impact0"],
            r["top_impacts"] or [],
            r["impact_hist"],
        )
        if max_p is None or hist_p is None:
            return None
        got = agg.setdefault(
            r["token"], [0.0, 0.0, [], [0] * IMPACT_HIST_BINS]
        )
        got[0] += dft_p
        got[1] = max(got[1], float(max_p))
        got[2].extend(float(x) for x in tops_p)
        for i, c in enumerate(hist_p):
            got[3][i] += int(c)
    if dft_out is not None:
        # the collect above IS the full path's dft aggregate (same dfs
        # slice, same token filter; integral-double partials sum
        # exactly in any order). Export it — populated only once the
        # WHOLE slice merged cleanly — so a gate-refused query's exact
        # full path reuses it instead of re-scanning the dfs dirs
        # inside its main job (the gate's planning collect otherwise
        # duplicates that subtree on every refused read).
        dft_out["__collected__"] = True
        for t, (dft_t, _m, _tops, _h) in agg.items():
            dft_out[t] = dft_t
    scale = 1.0 + float(k1)
    term_stats: dict[str, dict] = {}
    for t, (dft_t, max0_t, tops, hist) in agg.items():
        if max_df_frac is not None and not (dft_t <= max_df_frac * n):
            continue  # df-capped out of scoring, exactly like the dft filter
        idf_t = math.log((n - dft_t + 0.5) / (dft_t + 0.5) + 1.0)
        tops.sort(reverse=True)
        term_stats[t] = {
            "dft": dft_t,
            "ub": idf_t * scale * max0_t * r_max,
            "seed": (
                idf_t * scale * tops[k - 1] * s_min
                if len(tops) >= k
                else None
            ),
            "denorm": idf_t * scale * r_max,
            "max0": max0_t,
            "hist": hist,
        }

    def _est_above(t: str, cut: float) -> float:
        """Estimated postings of ``t`` at stored impact ≥ cut, from the
        merged histogram — the straddling bin counts FULLY (a
        conservative over-estimate of the read, so the gate only ever
        errs toward the exact full path)."""
        if cut <= 0.0:
            return term_stats[t]["dft"]
        lo_bin = min(
            IMPACT_HIST_BINS - 1, int(cut * IMPACT_HIST_BINS)
        )
        return float(sum(term_stats[t]["hist"][lo_bin:]))

    # per-query term sets from the caller-collected (query, term)
    # pairs — plan-time driver data, no second collect
    q_terms: dict = {}
    all_qids: set = set()
    for qid, t in q_pairs:
        all_qids.add(qid)
        if t in term_stats:
            q_terms.setdefault(qid, set()).add(t)
    # per-query MaxScore cuts + the cost-gate PER-QUERY screen; the
    # candidates then face the GLOBAL decision below, and merged cuts
    # are min'd over the finally-ENGAGED queries only
    candidate_cuts: dict = {}  # qid -> per-query cuts
    candidate_est: dict = {}  # qid -> (full_rows, b_rows, c_rows)
    gate_diag: dict = {}
    for qid, tq in q_terms.items():
        seeds = [term_stats[t]["seed"] for t in tq]
        seeds = [s for s in seeds if s is not None]
        theta = (max(seeds) - IMPACT_EPS) if seeds else 0.0
        # MaxScore's essential-suffix structure, per term: sort the
        # query's terms by upper bound ASCENDING; a doc's score is at
        # most (its contribution from its highest-ranked present term
        # t_j) + (the prefix sum of bounds strictly below t_j), so
        # every top-k doc passes t_j's cut = (θ − prefix_j)/scale_j and
        # the union of per-term filtered postings is a provable
        # candidate superset. (The naive "θ − Σ of ALL other bounds"
        # cut is valid too but never fires when one rare high-idf term
        # rides along with a common one — the exact query shape this
        # path exists for.)
        ordered = sorted(tq, key=lambda t: (term_stats[t]["ub"], t))
        prefix = 0.0
        q_cuts: dict[str, float] = {}
        for t in ordered:
            cut_qt = (
                (theta - prefix) / term_stats[t]["denorm"]
                if theta > 0.0
                else 0.0
            )
            q_cuts[t] = max(0.0, cut_qt)
            prefix += term_stats[t]["ub"]
        if all(c <= 0.0 for c in q_cuts.values()):
            continue  # nothing provably skippable — full path is optimal
        # the per-query screen: phase-B rows (terms whose cut clears
        # their max impact contribute nothing — they cannot seed a
        # candidate) + the per-query rescore's ranked rows (each term
        # bounded by THIS query's candidate count — the rescore is
        # candidate_pairs-restricted, so a batch's shared common terms
        # never multiply another query's candidates), vs the full
        # path's Σ dft pair count
        full_rows = sum(term_stats[t]["dft"] for t in tq)
        b_rows = sum(
            _est_above(t, c)
            for t, c in q_cuts.items()
            if c <= term_stats[t]["max0"]
        )
        c_rows = sum(
            min(term_stats[t]["dft"], b_rows) for t in tq
        )
        ok = force or (
            b_rows + c_rows <= IMPACT_GATE_ALPHA * full_rows
        )
        gate_diag[qid] = {
            "full_rows": int(full_rows),
            "phase_b_est": int(b_rows),
            "rescore_est": int(c_rows),
            "engaged": bool(ok),
        }
        if not ok:
            continue
        candidate_cuts[qid] = q_cuts
        candidate_est[qid] = (full_rows, b_rows, c_rows)
    # the GLOBAL decision: screened candidates engage only when their
    # net predicted pair savings also pay for what engagement COSTS the
    # whole batch — phase C re-scans the engaged terms' postings (a
    # duplicate read wherever a refused query's full path scans the
    # same term anyway) and the pruned plan's fixed driver actions
    # (priced by IMPACT_GATE_FLOOR_ROWS). This is what the per-query
    # screen alone missed (r13 diag: two honestly-screened queries
    # still measured a ~3 s loss — their savings couldn't cover the
    # duplicate F/O scans + the fixed jobs).
    engaged: set = set(candidate_cuts)
    global_info = None
    if engaged and not force:
        t_engaged = {t for qid in engaged for t in q_terms[qid]}
        t_rest = {
            t
            for qid, tq in q_terms.items()
            if qid not in engaged
            for t in tq
        }
        net_pairs = sum(f - b - c for f, b, c in candidate_est.values())
        b_total = sum(b for _, b, _ in candidate_est.values())
        extra_scan = b_total + sum(
            term_stats[t]["dft"] for t in t_engaged & t_rest
        )
        global_ok = (
            net_pairs >= extra_scan + IMPACT_GATE_FLOOR_ROWS
            and b_total <= IMPACT_GATE_MAX_CANDIDATES
        )
        global_info = {
            "net_pairs": int(net_pairs),
            "extra_scan": int(extra_scan),
            "floor": int(IMPACT_GATE_FLOOR_ROWS),
            "b_total": int(b_total),
            "cap": int(IMPACT_GATE_MAX_CANDIDATES),
            "engaged": bool(global_ok),
        }
        if not global_ok:
            engaged = set()
    if diag is not None:
        diag["gate"] = {
            "alpha": IMPACT_GATE_ALPHA,
            "forced": bool(force),
            "queries": gate_diag,
            "global": global_info,
        }
    if not engaged:
        return None  # every query rides the exact full path
    cuts: dict[str, float] = {}
    for qid in engaged:
        for t, c in candidate_cuts[qid].items():
            cuts[t] = min(cuts.get(t, float("inf")), c)
    # phase B: the candidate scan. Terms whose cut exceeds their max
    # stored impact cannot seed a candidate — skipped entirely (their
    # postings still return in phase C for candidates found elsewhere).
    base = _open_partition_dirs(spark, base_postings_path, bucket_dirs)
    if base is None:
        return None
    phase_b_preds = [
        (F.col("token") == F.lit(t)) & (F.col("impact0") >= F.lit(c))
        for t, c in cuts.items()
        if c <= term_stats[t]["max0"]
    ]
    if not phase_b_preds:
        # every engaged query provably has fewer than k docs above θ
        # only via terms it seeded from — cannot happen (the seed's own
        # k docs always pass); defensively fall back
        return None
    pred = phase_b_preds[0]
    for p in phase_b_preds[1:]:
        pred = pred | p
    bscan = base.filter(pred).select("token", id_col).persist()
    cand = bscan.select(id_col).distinct().persist()
    # PER-QUERY candidate pairs — the MaxScore theorem is per query
    # (every true top-k doc of q passes a cut of one of q's OWN terms),
    # so a doc seeded by term t is a candidate only for the engaged
    # queries CONTAINING t. Scoring the global candidate union against
    # every query (the first r13 cut) let a batch's shared common
    # terms multiply the rescore's pair space by the whole union —
    # candidates × queries — instead of Σ_q (q's own candidates).
    q_token_rows = [
        (qid, t) for qid in sorted(engaged, key=str) for t in q_terms[qid]
    ]
    qid_t = dict(queries.dtypes)[query_id_col]  # never-cast-ids rule
    q_tokens = spark.createDataFrame(
        q_token_rows, f"{query_id_col} {qid_t}, token string"
    )
    cand_pairs = (
        bscan.join(F.broadcast(q_tokens), on="token")
        .select(query_id_col, id_col)
        .distinct()
    )
    # phase C: exact rescore over the ENGAGED queries' scored terms,
    # through the shared scoring stage, restricted to each query's own
    # candidate pairs — numerically identical for the surviving pairs
    # (pinned by the equivalence tests)
    scored_terms = sorted(
        {t for qid in engaged for t in q_terms[qid]}
    )
    tf_cand = (
        base.filter(F.col("token").isin(scored_terms))
        .select(id_col, "token", "tf", "dl")
        .join(cand, on=id_col, how="left_semi")
    )
    stats = spark.createDataFrame(
        [(n, avgdl)], "n double, avgdl double"
    )
    dft_frame = spark.createDataFrame(
        [(t, term_stats[t]["dft"]) for t in scored_terms],
        "token string, dft double",
    )
    engaged_queries = queries.filter(
        F.col(query_id_col).isin(sorted(engaged, key=str))
    )
    # r14 dl-carry: tf_cand already holds the stored denormalized dl —
    # pass it through instead of reconstructing a doclen frame with a
    # distinct() and joining it back (two shuffles of the rescore slice)
    out = bm25_rank_components(
        tf_cand
        if _DL_CARRY_INDEX
        else tf_cand.select(id_col, "token", "tf"),
        None
        if _DL_CARRY_INDEX
        else tf_cand.select(id_col, "dl").distinct(),
        stats,
        dft_frame,
        engaged_queries,
        k=k,
        k1=k1,
        b=b,
        id_col=id_col,
        query_id_col=query_id_col,
        term_col=term_col,
        candidate_pairs=cand_pairs,
    )
    if diag is not None:
        diag.update(
            pruned=True,
            cuts={t: round(c, 6) for t, c in cuts.items()},
            candidates=cand.count(),
            r_max=r_max,
            s_min=s_min,
            engaged_queries=len(engaged),
            fallback_queries=len(all_qids) - len(engaged),
            # the executed phase-B plan — tests pin that the impact
            # cut reaches the parquet scan as a pushed filter (the
            # block-skipping contract)
            phase_b_plan=(
                cand._jdf.queryExecution().executedPlan().toString()
            ),
        )
    cand.unpersist()
    bscan.unpersist()
    rest = all_qids - engaged
    remaining = (
        queries.filter(F.col(query_id_col).isin(sorted(rest, key=str)))
        if rest
        else None
    )
    return out, remaining


def bm25_topk_from_index(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    term_col: str = "term",
    max_df_frac: float | None = None,
    candidates: DataFrame | None = None,
    diag: dict | None = None,
    pruned: bool | str = True,
) -> DataFrame:
    """BM25 top-k answered from the maintained index — the corpus text is
    never read. Same (query_id, id, score, rank) contract, same numbers
    as :func:`extensions.search.bm25_topk_batch` over the equivalent
    corpus snapshot (shared scoring stage; equivalence pinned by tests
    and the ``x_bm25_incremental`` oracle). ``max_df_frac`` mirrors the
    batch path's df cap: terms present in more than that fraction of
    live docs are dropped from scoring.

    ``candidates`` (optional, an id frame) restricts RANKED documents
    to the given set — metadata-filtered retrieval ("top BM25 hits
    among docs with lang=en"), the lexical mirror of
    ``vector_topk_live(candidates=…)``. The semi-join applies to the
    query-hit slice, so the filter pays hit cost, never corpus cost;
    scoring stats (N, avgdl, df) stay CORPUS-global — idf is a corpus
    property, the standard filtered-retrieval semantics (filtering the
    stats too would re-weight terms by how the filter correlates with
    them).

    On a read-mostly compacted base the read takes the MaxScore /
    block-max pruned path (:func:`_bm25_pruned_topk` — exact top-k from
    provably-sufficient posting blocks; VERDICT r12 #1) for each query
    whose histogram-estimated win clears the cost gate; gate-refused
    queries (the all-common-term shape, where pruning provably reads
    ~everything and the pruned plan is a measured LOSS) ride the exact
    full path, and a mixed batch unions the two — per query, so one
    stop-word query never drags a rare-term query off its fast plan.
    ``pruned=False`` forces the exact full path for everything;
    ``pruned="force"`` skips the cost estimate and engages every query
    with a positive cut (the exactness-pinning tests' mode). ``diag``
    (optional dict) receives ``pruned`` (True iff ANY query engaged),
    ``gate`` (per-query row estimates + decisions) plus, when pruning
    engaged, the per-term cuts / candidate count / engaged & fallback
    query counts / avgdl-drift factors."""
    # one collect of the tiny caller-built query table yields BOTH the
    # distinct term set (prunes every postings scan) and the
    # (query, term) pairs the pruned path's gate plans from — the gate
    # then needs no second collect, and its meta-only refusal
    # short-circuit (see _bm25_pruned_topk) costs zero Spark jobs
    q_pairs = [
        (r[query_id_col], r["token"])
        for r in queries.select(
            query_id_col, F.col(term_col).alias("token")
        ).distinct().collect()
    ]
    terms = sorted({t for _, t in q_pairs})
    if not terms:
        raise ValueError("bm25_topk_from_index: queries must be non-empty")

    def _try(p: str) -> DataFrame | None:
        try:
            return spark.read.parquet(p)
        except AnalysisException:
            return None

    # read-mostly fast path: a compacted base with NO tail and NO
    # tombstones IS the live set (unique row per doc, stats in meta) —
    # take N/avgdl from meta and skip the per-query corpus-wide doclen
    # aggregate; per-doc dl is then a scan+join, never a wide groupBy.
    # Any tail append or delete falls back to the exact merge path.
    # Deciding "no tail" from tail-DOCLEN absence alone is safe because
    # search_index_batch appends doclen BEFORE postings (its documented
    # write-order invariant): tail postings can never exist without a
    # tail doclen having landed first.
    doclen_path, _, tomb_path = _paths(index_path)
    base_doclen_path, _, meta_path = _base_paths(index_path)
    meta_rows = read_meta_rows(spark, meta_path)
    has_stats = bool(meta_rows) and "n_live" in meta_rows[0]
    fast = (
        has_stats
        and _try(doclen_path) is None
        and _try(tomb_path) is None
    )
    # MaxScore / block-max early termination (VERDICT r12 #1): on the
    # read-mostly base with the impact layer present, answer from the
    # provably-sufficient posting blocks instead of scoring every
    # posting of every term — exact top-k, sub-df-proportional reads.
    # The candidate-filtered call stays on the full path: θ bounds the
    # index-wide k-th best, not the k-th best within a candidate set.
    # ``pruned=False`` forces the full path — an operator escape hatch
    # and the A/B comparator the scaling harness measures against.
    pruned_out = None
    dft_reuse: dict = {}
    if pruned and fast and candidates is None:
        got = _bm25_pruned_topk(
            spark, index_path, queries, meta_rows[0], terms,
            k, k1, b, id_col, query_id_col, term_col, max_df_frac, diag,
            force=(pruned == "force"), dft_out=dft_reuse,
            q_pairs=q_pairs,
        )
        if got is not None:
            pruned_out, remaining = got
            if remaining is None:
                return pruned_out
            # partial engagement: the cost-gate-refused queries ride
            # the exact full path below, scoped to THEIR terms only;
            # results union at the end (both paths emit the same
            # (query_id, id, score, rank) contract)
            queries = remaining
            terms = sorted(
                r["token"]
                for r in queries.select(
                    F.col(term_col).alias("token")
                ).distinct().collect()
            )
    if diag is not None and pruned_out is None:
        diag["pruned"] = False
    # NOTE (r12 measured negative, kept for the record): a
    # slice-scoped variant of this read was built and A/B'd — stats
    # EXACT from meta ± a churned-docs delta, per-candidate doclen from
    # the hit ids' id_bucket dirs opened by name, df-routed by a dfs
    # hit-fraction estimate. GLOBAL won at 600k AND 6M docs (selective
    # 2-term query, warm medians: scoped 5.5-5.8 s vs global 3.2-3.8 s
    # at both scales) because hit/churn ids hash across every bucket
    # (no read pruning), the corpus-skinny doclen merge is one
    # partial-aggregated columnar pass Spark parallelizes perfectly,
    # and the scoped plan pays ~6 extra driver actions of pure job
    # latency. Bucket-name pruning pays for REWRITES (the incremental
    # fold) and for point discovery (phrase probes), not for per-query
    # liveness reads.
    if fast:
        m = meta_rows[0]
        n_live = float(m["n_live"])
        stats = spark.createDataFrame(
            [(n_live, (m["sum_dl"] / n_live) if n_live else 0.0)],
            "n double, avgdl double",
        )
        # used once below (the per-candidate dl join) — no persist
        live = spark.read.parquet(base_doclen_path).select(
            id_col, "dl", "seq"
        )
    else:
        live = live_doclen(spark, index_path, id_col).persist()
        stats = live.agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.avg("dl").alias("avgdl"),
        )
    # token IN (...) reaches the parquet scans as pushed filters (plus
    # token_bucket partition pruning on the compacted base); the
    # surviving slice is query-hit-proportional.
    hit = query_postings(
        spark,
        index_path,
        terms,
        id_col,
        # r14 dl-carry: on an impacts-mode compacted base (meta stamps
        # impact_k1) with no tail, the postings' denormalized dl IS the
        # live per-doc length — ride it into scoring and skip the
        # doclen join there (query_postings silently omits the column
        # if a tail append raced the fast probe, degrading to the join)
        with_dl=(
            _DL_CARRY_INDEX
            and fast
            and meta_rows[0].get("impact_k1") is not None
        ),
    )
    if fast:
        # base-is-live invariant: every base postings row is live and
        # unique (compaction dropped dead versions and deduplicated
        # replays) and the tail is empty (the fast gate, plus the
        # doclen-before-postings write-order invariant) — the replay
        # dedup and the live-version join are provable no-ops here, so
        # skip their two shuffles outright.
        tf_live = hit.select(
            id_col, "token", "tf",
            *(["dl"] if "dl" in hit.columns else []),
        )
    else:
        # dropDuplicates absorbs at-least-once replay copies
        # (byte-identical rows) on the hit slice, never corpus-wide.
        # Live-version filter: deliberately hint-free — for rare terms
        # the hit slice is tiny and AQE broadcasts it; for a high-df
        # (stop-word-like) term the slice is corpus-proportional and a
        # forced broadcast would OOM at scale — AQE keeps it a shuffle
        # join instead.
        tf_live = (
            hit.dropDuplicates([id_col, "token", "seq"])
            .join(live.select(id_col, "seq"), on=[id_col, "seq"])
            .select(id_col, "token", "tf")
            .persist()
        )
    # per-token document frequency over the live set. Read-mostly fast
    # path: the compacted base's precomputed dfs table (written at
    # compaction, exactly the live set's frequencies when no tail or
    # tombstone exists) — skips a groupBy over the hit slice, which is
    # corpus-proportional for a stop-word-like term. Any churn since
    # compaction falls back to the exact aggregate.
    dfs_root = os.path.join(index_path, "base", "dfs")
    dfs_df = None
    dft_local = None
    if fast and dft_reuse.pop("__collected__", False):
        # the cost gate already collected and merged exactly this dfs
        # slice driver-side (same token filter, integral-double partial
        # sums — order-independent); build dft locally instead of
        # re-scanning the dfs dirs in the main job. Terms absent from
        # the slice have no dfs row on either route. The dft snapshot
        # is GATE-time: on the unlocked-daemon race (compaction swap
        # between the gate collect and the main job) it can be one
        # snapshot older than the postings scanned below — covered by
        # the compact_index_inplace swap-race recovery-window contract.
        dft_local = spark.createDataFrame(
            [(t, float(dft_reuse[t])) for t in terms if t in dft_reuse],
            "token string, dft double",
        )
    elif fast:
        if _has_partition_prefix(dfs_root, "token_bucket="):
            # bucketed dfs layout: open ONLY the query terms' bucket
            # dirs by name (r10, VERDICT r09 #6 — a whole-root reader
            # pays a full listing at scaled bucket counts)
            dfs_df = _open_partition_dirs(
                spark,
                dfs_root,
                [
                    f"token_bucket={b}"
                    for b in _term_buckets(
                        spark, terms, int(m["token_buckets"])
                    )
                ],
            )
            if dfs_df is None:
                # the terms' buckets never materialized: no live doc
                # holds any query term — an empty dfs is the exact
                # statement of that, keeping the fast path
                dfs_df = spark.createDataFrame([], "token string, dft double")
        else:
            dfs_df = _try(dfs_root)  # legacy flat dfs
    if dft_local is not None:
        dft = dft_local
    elif dfs_df is not None:
        # two-level layout stores per-(bucket, id_sub) PARTIAL counts;
        # summing is also correct (a no-op) on a single-row-per-token dfs
        dft = (
            dfs_df.filter(F.col("token").isin(terms))
            .groupBy("token")
            .agg(F.sum("dft").cast("double").alias("dft"))
        )
    else:
        # this branch references tf_live twice (df counting + scoring):
        # make sure it is cached — the fast path above skips the persist
        # because the normal fast route (precomputed dfs) scans it once
        tf_live = tf_live.persist()
        dft = tf_live.groupBy("token").agg(
            F.count(F.lit(1)).cast("double").alias("dft")
        )
    if max_df_frac is not None:
        dft = dft.crossJoin(F.broadcast(stats)).filter(
            F.col("dft") <= F.lit(max_df_frac) * F.col("n")
        ).select("token", "dft")
    # candidate restriction AFTER the df aggregate (stats stay
    # corpus-global by contract) and BEFORE scoring (the ranking window
    # and the dl join shrink with the filter)
    tf_scored = (
        tf_live.join(
            candidates.select(id_col).distinct(), id_col, "left_semi"
        )
        if candidates is not None
        else tf_live
    )
    out = bm25_rank_components(
        tf_scored, live.select(id_col, "dl"), stats, dft, queries,
        k=k, k1=k1, b=b, id_col=id_col,
        query_id_col=query_id_col, term_col=term_col,
    )
    live.unpersist()
    tf_live.unpersist()
    return out if pruned_out is None else out.unionByName(pruned_out)


def _auto_id_subbuckets(n_live: int) -> int:
    """Corpus-adaptive ``id_sub`` fan-out for the two-level base layout
    (VERDICT r09 #1): the sub-bucket level caps the incremental
    compactor's rewrite unit on Zipf-head token buckets — churn vocab
    ALWAYS contains the ubiquitous JSON-key tokens, so the affected
    bucket set always includes the head buckets and ``n_sub`` is the
    only lever on how much of them one churned doc drags into a fold.
    It trades directly against full-rewrite + listing overhead
    (token_buckets × n_sub output dirs), so it must grow with the
    corpus and stay small below it. Fit to the measured points
    (sf0.1 sweep, r10; 6 M-doc SCALING, r09): a fixed 16 at 600 k docs
    cost +59% full-rewrite time for nothing; n_sub=1 at 60 k docs
    (fixed job costs dominate any fold there), n_sub≈4 at 600 k (full
    rewrite 18.6 s vs 29.1 s at 16, fold 12.2 s vs 14.6 s at 1), and
    n_sub=16 at 6 M (the flat-at-10× fold) lie on ``(n_live/60k)^0.6``
    — ×4 fan-out per ×10 docs. Power-of-two steps keep dir counts
    tidy; 256 caps driver-side pair enumeration (token_buckets × n_sub
    ints) at any corpus this layout precedes re-sharding for."""
    import math

    if n_live <= 60_000:
        return 1
    raw = (n_live / 60_000) ** 0.6
    return min(256, 2 ** round(math.log2(raw)))


def _dfs_rows(staged_po: DataFrame, impacts: bool = True) -> DataFrame:
    """Per-(token_bucket, id_sub, token) dfs partials derived from
    just-written base postings: the document-frequency partial plus
    (``impacts=True``) the impact-bound columns the MaxScore pruned
    read plans with — the partial ``max_impact0`` and the EXACT top-G
    impacts (partials are doc-disjoint, so merging a token's partial
    arrays yields the exact global top-G). The row_number pre-pass
    bounds per-group state at G doubles no matter how many postings a
    Zipf-head token puts in one pair — a bare collect_list would grow
    with bucket_rows/n_sub, which rises ~×2.5 per ×10 docs under the
    auto fan-out.

    ``impacts=False`` (fingerprint-token indexes — the shingle/stats
    twin, whose md5 "tokens" are only ever probed by equality, never
    BM25-ranked) writes the plain df partial and SKIPS the whole bound
    layer: the per-pair sort the window needs is the dominant write
    cost of the r13 impact layer, and for an index nothing will ever
    rank it is pure overhead."""
    if not impacts:
        return staged_po.groupBy("token_bucket", "id_sub", "token").agg(
            F.count(F.lit(1)).cast("double").alias("dft"),
        )
    w = Window.partitionBy("token_bucket", "id_sub", "token").orderBy(
        F.desc("impact0")
    )
    # equi-width stored-impact histogram bin (impact0 ∈ (0, 1], so
    # impact0 == 1.0 clamps into the top bin) — the pruned read's cost
    # gate sums a token's partial histograms to estimate how many
    # postings a cut skips
    hist_bin = F.least(
        F.lit(IMPACT_HIST_BINS - 1),
        F.floor(F.col("impact0") * IMPACT_HIST_BINS).cast("int"),
    )
    return (
        staged_po.withColumn("_rn", F.row_number().over(w))
        .withColumn("_ib", hist_bin)
        .groupBy("token_bucket", "id_sub", "token")
        .agg(
            F.count(F.lit(1)).cast("double").alias("dft"),
            F.max("impact0").alias("max_impact0"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("_rn") <= IMPACT_TOP_G, F.col("impact0"))
                ),
                asc=False,
            ).alias("top_impacts"),
            F.array(
                *[
                    F.sum(
                        F.when(F.col("_ib") == i, F.lit(1)).otherwise(
                            F.lit(0)
                        )
                    )
                    for i in range(IMPACT_HIST_BINS)
                ]
            ).alias("impact_hist"),
        )
    )


def _dfs_rows_arrow(staged_po: DataFrame) -> DataFrame:
    """Arrow-native impacts-mode dfs derivation (r14, guide §4): the
    same rows as :func:`_dfs_rows(impacts=True)` — bit-exact, pinned by
    ``test_dfs_rows_arrow_equals_window`` — computed WITHOUT pushing
    every posting row through an Exchange + Sort + window.

    The window formulation needs ClusteredDistribution on
    (token_bucket, id_sub, token) plus an impact0-desc sort, which on
    the incremental fold's dir-clustered staged postings (never
    hash-exchanged — the keep side deliberately preserves its read
    clustering) costs a full shuffle and sort of every affected-pair
    row, and the top-G/histogram aggregate rides ObjectHashAggregate.
    Every statistic here is MERGEABLE though: counts and histogram bins
    sum, maxes max, and the union of partial top-Gs contains the global
    top-G. So stage 1 computes per-Arrow-batch partials with vectorized
    numpy (lexsort + run boundaries — no Python loop over groups) and
    stage 2 merges them with a vocab-sized SQL aggregate: the exchange
    carries ~one skinny partial row per (pair, token, batch) instead of
    every posting row, and the posting-scale sort disappears entirely.
    (The all-SQL two-phase variant was measured 2× SLOWER in r13 — its
    per-partition ``collect_list`` partials push posting-scale state
    through ObjectHashAggregate twice; the numpy partials are exactly
    what that shape was missing.)

    Input may be any frame with (token_bucket, id_sub, token, impact0)
    — extra columns are pruned here, keeping the Python boundary to the
    four columns the statistics need (guide §4.1)."""
    topg = IMPACT_TOP_G
    bins = IMPACT_HIST_BINS
    part_schema = (
        "token_bucket int, id_sub int, token string, cnt long, "
        "mx double, topg array<double>, hist array<long>"
    )

    def _partials(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            tb = batch.column(0).to_numpy(zero_copy_only=False)
            sb = batch.column(1).to_numpy(zero_copy_only=False)
            tok = batch.column(2)
            x = batch.column(3).to_numpy(zero_copy_only=False)
            codes = (
                pc.dictionary_encode(tok)
                .indices.to_numpy(zero_copy_only=False)
            )
            # one vectorized grouping pass: order rows by (tb, sb,
            # token-code, impact desc), find run boundaries
            order = np.lexsort((-x, codes, sb, tb))
            ts, ssb, cs = tb[order], sb[order], codes[order]
            xs = x[order]
            newg = np.empty(n, dtype=bool)
            newg[0] = True
            newg[1:] = (
                (ts[1:] != ts[:-1])
                | (ssb[1:] != ssb[:-1])
                | (cs[1:] != cs[:-1])
            )
            starts = np.flatnonzero(newg)
            ng = len(starts)
            gidx = np.cumsum(newg) - 1
            counts = np.diff(np.append(starts, n))
            # impacts are desc within each run, so the run head is the
            # max and the first min(count, G) elements are the top-G
            mx = xs[starts]
            rank = np.arange(n) - starts[gidx]
            topg_vals = xs[rank < topg]
            topg_counts = np.minimum(counts, topg)
            topg_offsets = np.zeros(ng + 1, dtype=np.int32)
            np.cumsum(topg_counts, out=topg_offsets[1:])
            # equi-width histogram — same double arithmetic as the SQL
            # expression (floor(impact0*BINS) clamped into the top bin)
            hbin = np.minimum(
                bins - 1, np.floor(xs * bins).astype(np.int64)
            )
            hist_flat = np.bincount(
                gidx * bins + hbin, minlength=ng * bins
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ts[starts].astype("int32"), type=pa.int32()),
                    pa.array(ssb[starts].astype("int32"), type=pa.int32()),
                    tok.take(pa.array(order[starts])),
                    pa.array(counts.astype("int64"), type=pa.int64()),
                    pa.array(mx, type=pa.float64()),
                    pa.ListArray.from_arrays(
                        pa.array(topg_offsets, type=pa.int32()),
                        pa.array(topg_vals, type=pa.float64()),
                    ),
                    pa.ListArray.from_arrays(
                        pa.array(
                            np.arange(ng + 1, dtype=np.int32) * bins,
                            type=pa.int32(),
                        ),
                        pa.array(hist_flat, type=pa.int64()),
                    ),
                ],
                names=[
                    "token_bucket", "id_sub", "token",
                    "cnt", "mx", "topg", "hist",
                ],
            )

    partials = staged_po.select(
        "token_bucket", "id_sub", "token", "impact0"
    ).mapInArrow(_partials, part_schema)
    return partials.groupBy("token_bucket", "id_sub", "token").agg(
        F.sum("cnt").cast("double").alias("dft"),
        F.max("mx").alias("max_impact0"),
        # each partial carries its own top-G; the global top-G is the
        # top-G of their union (doc-disjoint [split-disjoint] partials)
        F.slice(
            F.sort_array(F.flatten(F.collect_list("topg")), asc=False),
            1,
            topg,
        ).alias("top_impacts"),
        F.array(
            *[F.sum(F.element_at("hist", i + 1)) for i in range(bins)]
        ).alias("impact_hist"),
    )


#: base/meta schema for a compacted search index. The ``impact_*``
#: columns stamp the bound layer: the (k1, b) the stored impacts were
#: computed under, the avgdl-stamp bracket across live base partitions
#: (full compaction resets both ends to the current avgdl; each
#: incremental fold widens them with its own stamp), and the stored
#: top-array length.
_SEARCH_META_SCHEMA = (
    "token_buckets int, id_subbuckets int, n_live long, sum_dl double, "
    "impact_k1 double, impact_b double, impact_avgdl_min double, "
    "impact_avgdl_max double, impact_topg int, impact_hist_bins int"
)


#: full-compaction dfs engine (r14 A/B knob): "window_cache" (the r13
#: shape: persist the staged exchange+sort, window over the cache) vs
#: "arrow_readback" (no staged persist; dfs from the Arrow
#: partial-merge aggregator over a column-pruned read-back of the
#: written base). MEASURED (interleaved fresh-process pairs, sf0.1,
#: r14): window_cache wins the FULL rewrite both pairs (28.8/33.7 s vs
#: arrow 33.4/36.1 s) while arrow wins the INCREMENTAL fold both pairs
#: (11.1/13.0 s vs window 12.8/13.6 s) — structurally consistent: the
#: full rewrite must exchange+sort staged postings anyway for the
#: impact-ordered partitioned write, so its dfs window rides that cache
#: nearly free and the arrow read-back adds a whole extra scan +
#: Python boundary; the fold's staged postings are dir-clustered with
#: NO exchange, so there the window ADDS a posting-scale Exchange+Sort
#: that the arrow partials avoid. Production default: the measured
#: winner per path (this knob for the full rewrite; the fold always
#: uses the arrow aggregator).
_FULL_COMPACT_DFS = "window_cache"

#: r14 knob — INDEX-side dl-carry: on an impacts-mode compacted base
#: with no tail, ride the postings' stored DENORMALIZED ``dl`` column
#: into scoring instead of scanning base/doclen and joining it back by
#: id (full fast path), and pass the pruned rescore's ``tf_cand.dl``
#: through instead of reconstructing a doclen frame with distinct()+
#: join (MaxScore path). Unlike the scan-path carry (measured negative,
#: see extensions.search._DL_CARRY), the stored dl costs NO aggregate
#: state — it is parquet column bytes on rows the scan already reads —
#: and the avoided work is a corpus-skinny doclen scan + join per
#: query. MEASURED: in-process alternating A/B at sf0.1 won all 4
#: pairs on q_bm25_from_index (2.57/3.45, 3.63/4.46, 3.38/3.70,
#: 3.02/3.26 s carry/join). Exactness pinned by
#: test_bm25_dl_carry_equals_doclen_join.
_DL_CARRY_INDEX = True

#: r14 A/B knob — order of the full rewrite's replay dedup relative to
#: the live join. True (default): join first, dedup second — the dedup
#: aggregate's ClusteredDistribution on (id, token, seq) is satisfied
#: by the join's HashPartitioning on the subset (id, seq), so the
#: dedup rides the join exchange instead of paying its own
#: posting-scale Exchange, and it deduplicates the post-join LIVE rows
#: only. False = the r03-r13 dedup-first order. Exactly commutative
#: (replay copies byte-identical; live is 1 row per (id, seq)); see
#: OPTIMIZATION_r14.md for the measurement.
_DEDUP_AFTER_JOIN = True

#: r14 A/B knob — tokenize each micro-batch ONCE into the persisted
#: `latest` cache (token arrays) instead of caching text and letting
#: the stats job, the doclen write and the postings write each re-run
#: `_words(text)` over the cache. False = the r03-r13 cache-text shape.
#: MEASURED scale trade (in-process alternating A/Bs, both pair
#: orders): at the bench's 600k-doc bulk build tokenize-once won all 4
#: pairs (~−15%: 6.1–6.7 vs 7.0–8.6 s); at a 6M-doc bulk build it LOST
#: (~+25%: mirrored pairs 50.0/57.5, 37.4/46.4, 35.3/48.9 s old/new) —
#: columnar-caching array<string> rows costs more than the two saved
#: tokenizer passes once the cache outgrows memory-friendly sizes. The
#: daemon's steady state is trickle micro-batches (both arms trivial),
#: so the default serves the common regimes; flip to False for a
#: giant single-batch backfill (or shard it, which the feed reader
#: does anyway). Numbers in OPTIMIZATION_r14.md §6 / SCALING.md r14.
_TOKENIZE_ONCE = True


def compact_index(
    spark: SparkSession,
    index_path: str,
    out_path: str,
    id_col: str = "doc_id",
    token_buckets: int = 64,
    id_subbuckets: int | None = None,
    impacts: bool = True,
) -> None:
    """Rewrite the index keeping only LIVE rows, into ``out_path/base``:
    ``base/doclen`` (live rows only), ``base/postings`` laid out in
    ``pmod(hash(token), token_buckets)`` partition directories so
    query-term scans prune to the buckets holding the query's terms
    (bucket count recorded in ``base/meta`` for the read path), no
    tombstones (no dead versions survive). ``out_path``'s tail dirs
    start absent — :func:`search_index_batch` keeps appending there and
    :func:`bm25_topk_from_index` reads base ∪ tail (the
    log-structured-merge discipline): the append-only tail stays cheap
    to write, the compacted base cheap to read; read amplification
    between compactions is bounded by the update rate, not corpus size.
    ``index_path`` may itself carry a base — compaction merges it.

    Base layout (everything the incremental compactor's cost model
    depends on — see :func:`compact_index_incremental`):

    * ``base/postings`` partitioned by ``(token_bucket, id_sub)`` —
      token hash bucket × id hash sub-bucket. Query-term reads prune on
      ``token_bucket`` alone; the ``id_sub`` level exists for the
      INCREMENTAL compactor: posting volume per token bucket is
      frequency-weighted, so a stop-word-like token (JSON keys here,
      Zipf heads in real text) makes ONE bucket hold a corpus-scale row
      count and any churned doc touches it — measured 69% of all rows
      behind 46/5120 "affected buckets". Sub-bucketing by id caps the
      rewrite unit at bucket_rows/id_subbuckets, and a churned doc
      lands in exactly ONE id_sub. ``id_subbuckets=None`` (the
      default) sizes the fan-out from the live doc count
      (:func:`_auto_id_subbuckets`): 1 at small corpora — where the
      layout degenerates to the flat one and the fan-out would be pure
      write overhead — growing ×4 per ×10 docs (4 at 600 k, 16 at 6 M);
    * ``base/dfs`` partitioned the same way, holding PARTIAL per-token
      document frequencies (readers sum partials over a token's
      sub-dirs — vocab-slice cheap) so the incremental compactor can
      recount exactly the pair dirs it rewrote; a flat dfs rewrite
      would otherwise be the hidden corpus-proportional job on corpora
      whose vocabulary grows with the data;
    * ``base/doclen`` partitioned by ``id_bucket = pmod(hash(id), n)``
      and carrying a ``buckets`` column — the doc's distinct token
      buckets. A churned doc's OLD rows can then be located without any
      postings scan: read the doc's doclen row (id-bucket-pruned) and
      explode ``buckets``.

    Every partitioned write clusters rows by the partition column
    first: without the repartition every shuffle task writes a file
    into every bucket dir (tasks × buckets tiny files — measured 7×
    slower at 512 buckets), and bucket-pruned reads open ~1 file per
    bucket instead of one per task.

    ``impacts=False`` (r13) skips the MaxScore bound layer — the
    denormalized dl/impact0 posting columns, the per-pair impact sort,
    the top-G arrays and histograms — and stamps the meta's impact
    columns ``NULL`` as an explicit "disabled by choice" sentinel (a
    LEGACY base, whose meta predates the columns entirely, still
    upgrades via one full rewrite). Use it for fingerprint-token
    indexes (the shingle/decontamination twin): their md5 tokens are
    probed by equality, never BM25-ranked, so the bound layer is pure
    write cost in the steady-state fold; every ranked read gates off
    the sentinel and takes the exact full path.

    ``out_path`` must not share component directories with
    ``index_path``: the dfs/doclen derivations read back files this
    function has already written under ``out_path`` (and the r13
    ``window_cache`` A/B shape can lazily recompute its staged cache
    through lineage that re-reads ``index_path``), so an overlapping
    target would mix half-written state into its own inputs.
    :func:`compact_index_inplace` (staging sibling + atomic swap) is
    the supported same-path flow and guarantees this."""
    base_doclen_path, base_postings_path, meta_path = _base_paths(out_path)
    live = live_doclen(spark, index_path, id_col).persist()
    # corpus stats up front: n_live sizes the id_sub fan-out and avgdl
    # stamps the per-posting impact bounds written below
    st = live.agg(
        F.count(F.lit(1)).alias("n_live"), F.sum("dl").alias("sum_dl")
    ).collect()[0]
    n_live_now = int(st["n_live"])
    sum_dl_now = float(st["sum_dl"] or 0.0)
    avgdl_now = (sum_dl_now / n_live_now) if n_live_now else 1.0
    if id_subbuckets is None:
        id_subbuckets = _auto_id_subbuckets(n_live_now)
    postings = _full_postings(spark, index_path, id_col)
    # the inner join against live (id, seq) both restricts to live
    # versions and DENORMALIZES dl onto every posting row — the read
    # path then never joins doclen for per-doc length, and the stored
    # ``impact0`` (idf-free BM25 term under the stamped k1/b/avgdl)
    # gives the MaxScore pruned read its block-skippable bound column.
    # Rows sort (token, impact0 desc) within each partition dir so
    # parquet row-group/page statistics carry tight (token, impact0)
    # ranges — a pushed ``token = t AND impact0 >= cut`` predicate
    # skips the provably-losing blocks at the storage layer (block-max
    # pruning, Ding & Suel 2011 / Turtle & Flood 1995 — public
    # knowledge, re-expressed as columnar statistics).
    # replay dedup AFTER the live join (r14, guide §2.4): the join
    # already hash-exchanges postings by (id, seq), and HashPartitioning
    # on a SUBSET of the dedup keys satisfies the dedup aggregate's
    # ClusteredDistribution on (id, token, seq) — so ordered this way
    # the dedup rides the join's exchange instead of paying its own
    # full posting-scale Exchange (3 → 2 posting-scale exchanges in the
    # full rewrite), and it runs on the post-join LIVE rows (dead
    # versions already dropped) instead of every replay/dead row.
    # Semantics are unchanged: replay copies are byte-identical, live
    # has exactly one row per (id, seq), and the inner join is 1:1 —
    # dedup before or after commutes exactly. `_DEDUP_AFTER_JOIN` is
    # the r14 A/B knob (False = the r03-r13 dedup-first order).
    joined = (
        postings.join(live.select(id_col, "seq", "dl"), on=[id_col, "seq"])
        .dropDuplicates([id_col, "token", "seq"])
        if _DEDUP_AFTER_JOIN
        else postings.dropDuplicates([id_col, "token", "seq"]).join(
            live.select(id_col, "seq", "dl"), on=[id_col, "seq"]
        )
    )
    staged = (
        joined
        .withColumn(
            "token_bucket", F.pmod(F.hash("token"), F.lit(token_buckets))
        )
        .withColumn(
            "id_sub", F.pmod(F.hash(F.col(id_col)), F.lit(id_subbuckets))
        )
    )
    if impacts and _FULL_COMPACT_DFS == "window_cache":
        staged = staged.withColumn(
            "impact0", _impact0_expr(IMPACT_K1, IMPACT_B, avgdl_now)
        ).repartition(
            F.col("token_bucket"), F.col("id_sub")
        ).sortWithinPartitions(
            "token_bucket", "id_sub", "token", F.desc("impact0")
        )
        # Production default (r13 shape, re-measured the winner in the
        # r14 A/B — see _FULL_COMPACT_DFS): persist the staged
        # (exchanged + impact-sorted) postings so the dfs window and
        # doc_buckets consume the cache instead of re-reading the
        # written files. The exchange+sort is paid anyway for the
        # impact-ordered partitioned write, so the window rides it
        # nearly free.
        from pyspark.storagelevel import StorageLevel

        staged = staged.persist(StorageLevel.MEMORY_AND_DISK)
    elif impacts:
        # A/B comparator arm: no persist — dfs comes from the Arrow
        # partial-merge aggregator over a column-pruned read-back of
        # the files just written (see ``written`` below). Measured
        # ~10-15% SLOWER than window_cache for the full rewrite (the
        # read-back + Python boundary costs more than the cache saves
        # when the exchange+sort exists anyway); kept so the r14
        # interleaved A/B stays reproducible. NOTE the fold
        # (compact_index_incremental) is the opposite regime — its
        # staged rows are dir-clustered with no exchange — and always
        # uses the arrow aggregator, where it measured the winner.
        staged = staged.withColumn(
            "impact0", _impact0_expr(IMPACT_K1, IMPACT_B, avgdl_now)
        ).repartition(
            F.col("token_bucket"), F.col("id_sub")
        ).sortWithinPartitions(
            "token_bucket", "id_sub", "token", F.desc("impact0")
        )
    else:
        # no bound layer: skinny rows (no dl/impact0), no impact sort —
        # the per-pair ordering only exists for block-max skipping
        staged = staged.drop("dl").repartition(
            F.col("token_bucket"), F.col("id_sub")
        ).sortWithinPartitions("token_bucket", "id_sub", "token")
    (
        staged.write.mode("overwrite")
        .partitionBy("token_bucket", "id_sub")
        .parquet(base_postings_path)
    )
    # per-token document frequencies over the compacted base — the
    # probe-planning statistic (rarest-term selection in
    # phrase_candidate_ids; the read-mostly BM25 df fast path). Derived
    # from the base postings just written (read back page-cache-hot and
    # column-pruned — the impacts-mode Arrow aggregator ships only
    # (token, impact0) file bytes plus the two dir-name partition
    # columns across the Python boundary) so it is exactly consistent
    # with them; tail appends after this compaction are simply unknown
    # to it, which only ever makes a term LOOK rarer — safe for probe
    # selection, never used for correctness.
    if impacts and _FULL_COMPACT_DFS == "window_cache":
        written = staged
        dfs_frame = _dfs_rows(written, impacts=True)
    else:
        written = spark.read.parquet(base_postings_path)
        dfs_frame = (
            _dfs_rows_arrow(written)
            if impacts
            else _dfs_rows(written, impacts=False)
        )
    (
        dfs_frame
        .repartition(F.col("token_bucket"), F.col("id_sub"))
        .write.mode("overwrite")
        .partitionBy("token_bucket", "id_sub")
        .parquet(os.path.join(out_path, "base", "dfs"))
    )
    # doclen with the per-doc token-bucket set (zero-postings docs get
    # an empty array) in the id-hash partition layout
    doc_buckets = written.groupBy(id_col).agg(
        F.collect_set("token_bucket").alias("buckets")
    )
    (
        live.join(doc_buckets, id_col, "left")
        .select(
            id_col,
            "dl",
            "seq",
            F.coalesce(F.col("buckets"), F.array().cast("array<int>")).alias(
                "buckets"
            ),
            F.pmod(F.hash(F.col(id_col)), F.lit(token_buckets)).alias(
                "id_bucket"
            ),
        )
        .repartition(F.col("id_bucket"))
        .write.mode("overwrite")
        .partitionBy("id_bucket")
        .parquet(base_doclen_path)
    )
    # carry per-doc attribute state (stats_stream's doc→source map, or
    # any other seq-wins attrs file) through compaction: keep the max-seq
    # row per LIVE doc, written into ``base/attrs`` partitioned by the
    # SAME id hash bucket as doclen (r10: the flat attrs rewrite was the
    # incremental compactor's last doc-count-proportional residual — a
    # bucketed base lets the fold rewrite only the id buckets its churn
    # touched). Future ``stats_index_batch`` appends land in the flat
    # ``attrs`` tail and win by max-seq in every reader.
    attrs = _all_attrs(spark, index_path, id_col)
    if attrs is not None:
        other = [c for c in attrs.columns if c not in (id_col, "seq")]
        latest = attrs.groupBy(id_col).agg(
            F.max("seq").alias("seq"),
            *[F.max_by(c, "seq").alias(c) for c in other],
        )
        (
            latest.join(live.select(id_col), id_col)
            .select(
                id_col,
                *other,
                "seq",
                F.pmod(F.hash(F.col(id_col)), F.lit(token_buckets)).alias(
                    "id_bucket"
                ),
            )
            .repartition(F.col("id_bucket"))
            .write.mode("overwrite")
            .partitionBy("id_bucket")
            .parquet(os.path.join(out_path, "base", "attrs"))
        )
    live.unpersist()
    if impacts and _FULL_COMPACT_DFS == "window_cache":
        staged.unpersist()
    # corpus stats ride the meta file (computed up front, before the
    # postings write needed avgdl): with no tail yet, a query takes
    # N/avgdl from here and skips the per-query corpus-wide doclen
    # aggregate entirely — the read-mostly fast path. A full compaction
    # stamps every partition with TODAY's avgdl, so the impact bracket
    # collapses to a point (r_max = s_min = 1 until the first fold).
    # 1-row meta parquet (not a driver-side json write): same directory
    # layout on whatever filesystem the index lives on — pyarrow-direct
    # on a local path, Spark job elsewhere (meta_io)
    write_meta_rows(
        spark,
        meta_path,
        [(
            int(token_buckets),
            int(id_subbuckets),
            n_live_now,
            sum_dl_now,
            float(IMPACT_K1) if impacts else None,
            float(IMPACT_B) if impacts else None,
            avgdl_now if impacts else None,
            avgdl_now if impacts else None,
            int(IMPACT_TOP_G) if impacts else None,
            int(IMPACT_HIST_BINS) if impacts else None,
        )],
        _SEARCH_META_SCHEMA,
    )


def compact_index_inplace(
    spark: SparkSession,
    index_path: str,
    id_col: str = "doc_id",
    token_buckets: int | None = None,
    id_subbuckets: int | None = None,
    impacts: bool | None = None,
) -> None:
    """Compact an LSM search index IN PLACE — the daemon watchdog's
    maintenance step when ``compaction_debt`` crosses its threshold:
    :func:`compact_index` into a staging sibling, then swap directories.

    Runs under the same per-path lock as :func:`search_index_batch`, so
    a concurrent micro-batch either lands fully before the snapshot or
    fully after the swap — never half in a directory that is about to
    be replaced. ``token_buckets`` defaults to the bucket count already
    recorded in the index's base meta (layout continuity; 64 when the
    index has never been compacted). ``id_subbuckets`` is deliberately
    NOT carried over from meta: a full rewrite re-lays every dir anyway,
    so it re-sizes from the CURRENT live doc count
    (:func:`_auto_id_subbuckets`) — the corpus may have grown (or
    shrunk) since the fan-out was last picked, and the stale value is
    exactly the fixed-16-at-600 k mistake the auto-sizing exists to
    avoid. The incremental compactor, which must preserve the layout it
    folds into, keeps reading n_sub from meta.

    Swap discipline (the daemon watchdog triggers this automatically,
    so UNLOCKED readers — ``bm25_topk_from_index``, ``index_status`` —
    can race it): the index ROOT is never renamed or removed; instead
    each COMPONENT directory (base/doclen/postings/tombstones) is
    retired into the index's hidden ``.trash`` (grace-window GC, the
    exact mechanism of ``partitioned._retire``) and the staged
    replacement renamed into place. A reader planning mid-swap can see
    a component transiently absent — ``_read_components`` degrades that
    to an empty frame, not a path-not-found crash — and a reader that
    PLANNED before the swap races file replacement exactly as
    partitioned.py documents for its bucket swaps: recovery window, not
    snapshot isolation. The former implementation renamed the root away
    (a window where ``index_path`` did not exist) and ``rmtree``'d the
    old tree instantly. On HDFS swap via the FileSystem API (rename is
    atomic there); on S3 stage to a new prefix and move a pointer, as
    in ``ann.compact_ivf_index``."""
    import shutil

    from couch_to_postgres_spark.streaming.partitioned import (
        _path_lock,
        _retire,
    )

    with _path_lock(index_path):
        _, _, meta_path = _base_paths(index_path)
        meta_rows = read_meta_rows(spark, meta_path)
        if token_buckets is None:
            token_buckets = (
                int(meta_rows[0]["token_buckets"]) if meta_rows else 64
            )
        if impacts is None:
            # mode continuity: an index compacted without the impact
            # layer (the explicit NULL sentinel) stays that way across
            # rewrites; a legacy or fresh index defaults to impacts
            impacts = not (
                meta_rows
                and "impact_hist_bins" in meta_rows[0]
                and meta_rows[0]["impact_hist_bins"] is None
            )
        staging = index_path.rstrip("/") + ".compacting"
        shutil.rmtree(staging, ignore_errors=True)
        compact_index(
            spark, index_path, staging, id_col=id_col,
            token_buckets=token_buckets, id_subbuckets=id_subbuckets,
            impacts=impacts,
        )
        # component-level swap under the live root: retire old pieces
        # into .trash (grace-window recovery, never instant delete),
        # move staged pieces in. The root itself never vanishes.
        for comp in ("base", "doclen", "postings", "tombstones", "attrs"):
            old_comp = os.path.join(index_path, comp)
            new_comp = os.path.join(staging, comp)
            _retire(old_comp, index_path)
            if os.path.exists(new_comp):
                os.rename(new_comp, old_comp)
        shutil.rmtree(staging, ignore_errors=True)


def compact_index_incremental(
    spark: SparkSession,
    index_path: str,
    id_col: str = "doc_id",
    diag: dict | None = None,
    impacts_default: bool = True,
) -> dict:
    """Fold the append tail into ONLY the partition directories it
    touches — the maintenance step that keeps recurring compaction cost
    churn-proportional instead of corpus-proportional (VERDICT r08 #2;
    the precedent is ``ann.compact_ivf_index``'s affected-cell-only
    compaction). :func:`compact_index_inplace` rewrites the WHOLE base
    even when a micro-batch touched a handful of tokens; at 100 TB the
    base is the corpus and that rewrite is the one remaining repeated
    corpus-proportional job.

    Cost model — every stage is churn- or affected-slice-proportional
    (grow bucket counts with the corpus, the way IVF grows cells, so
    slices stay bounded):

    * **affected units are (token_bucket, id_sub) PAIRS**, not token
      buckets: posting volume per token bucket is frequency-weighted,
      so one stop-word-like token (JSON keys here; Zipf heads in real
      text) puts a corpus-scale row count behind a single bucket and
      ANY churned doc touches it — measured 69% of all rows behind
      46/5120 "affected buckets". A churned doc lands in exactly one
      ``id_sub``, so the rewrite unit is ``bucket_rows/id_subbuckets``;
    * **discovery is churn-proportional**: a churned doc's old pairs
      come from its base DOCLEN row's ``buckets`` column
      (id-bucket-pruned read) × its own ``id_sub`` — never a postings
      scan (a column-pruned id scan was measured corpus-proportional
      and replaced);
    * **reads open only the affected dirs by name** (``basePath``
      keeps the partition columns): constructing a reader over the
      whole dataset pays a full file listing — measured 10-15 s per
      dataset at 5120 buckets;
    * **liveness is churn-scoped**: non-churned rows in affected pairs
      are live and unique by the compaction invariant and pass through
      with no join and no dedup; only churned-doc rows (tail-sized) pay
      the max-seq merge;
    * **dfs holds per-pair partial counts** (readers sum a token's
      partials), so the compactor recounts exactly the pair dirs it
      rewrote; doclen swaps per affected ``id_bucket``; meta updates by
      exact delta — no corpus-wide aggregate anywhere.

    Residuals, documented: a LEGACY base (flat dfs / un-sub-bucketed
    postings) upgrades via one full rewrite, and a legacy FLAT ``attrs``
    file migrates into the id-bucketed ``base/attrs`` layout with one
    final doc-count-sized pass — after which the attrs fold is
    churn-scoped like everything else (r10: this was the last
    doc-count-proportional residual).

    Falls back to a FULL :func:`compact_index_inplace` when the index
    has never been compacted or carries the legacy layout; returns a
    stats dict (``mode`` = ``full`` | ``noop`` | ``incremental``,
    pair/bucket counts, affected dir lists) the daemon watchdog logs."""
    import shutil
    import time as _time

    from couch_to_postgres_spark.streaming.partitioned import (
        _path_lock,
        _retire,
    )

    _t0 = [_time.monotonic()]

    def _mark(phase: str) -> None:
        if diag is not None:
            now = _time.monotonic()
            diag[phase] = round(now - _t0[0], 3)
            _t0[0] = now

    def _swap_dirs(old_root: str, staged_root: str, rel_dirs) -> None:
        for rel in rel_dirs:
            old_d = os.path.join(old_root, rel)
            new_d = os.path.join(staged_root, rel)
            _retire(old_d, index_path)
            if os.path.exists(new_d):
                os.makedirs(os.path.dirname(old_d), exist_ok=True)
                os.rename(new_d, old_d)

    with _path_lock(index_path):
        doclen_path, postings_path, tomb_path = _paths(index_path)
        base_doclen_path, base_postings_path, meta_path = _base_paths(
            index_path
        )
        meta_rows = read_meta_rows(spark, meta_path)
        if not meta_rows:
            # first compaction of a fresh index: ``impacts_default``
            # picks the mode (the daemon passes False for the
            # fingerprint-token shingle twin); thereafter the meta
            # sentinel carries it
            compact_index_inplace(
                spark, index_path, id_col=id_col, impacts=impacts_default
            )
            return {"mode": "full"}
        n_buckets = int(meta_rows[0]["token_buckets"])
        n_sub = meta_rows[0].get("id_subbuckets")

        schema_dl = f"{id_col} long, dl double, seq long"
        schema_tb = f"{id_col} long, seq long"
        tail_dl, tomb = _read_components(
            spark, [(doclen_path, schema_dl), (tomb_path, schema_tb)], id_col
        )
        if tail_dl.isEmpty() and tomb.isEmpty():
            return {
                "mode": "noop",
                "churned_docs": 0,
                "affected_pairs": 0,
                "total_buckets": n_buckets,
            }

        # layout check WITHOUT a full dataset listing: the current base
        # writes id_bucket=/token_bucket= partition dirs and records
        # id_subbuckets in meta; anything else is a legacy or
        # half-written base → one full rewrite upgrades it. A base
        # whose meta predates the impact-bound layer (no ``impact_k1``)
        # upgrades the same way — folding new impact-bearing rows into
        # impact-less dirs would leave the base schema-mixed, and the
        # pruned read must be all-or-nothing per index. An EMPTY base
        # (n_live 0) also takes the full path: there is no prior avgdl
        # to stamp fold rows with, and the rewrite is tail-sized anyway.
        if (
            n_sub is None
            or "impact_k1" not in meta_rows[0]
            or "impact_hist_bins" not in meta_rows[0]
            or int(meta_rows[0]["n_live"]) == 0
            or not _has_partition_prefix(base_doclen_path, "id_bucket=")
            or not _has_partition_prefix(base_postings_path, "token_bucket=")
        ):
            compact_index_inplace(
                spark, index_path, id_col=id_col, impacts=impacts_default
            )
            return {"mode": "full"}
        n_sub = int(n_sub)
        # the explicit-NULL sentinel (r13): an index compacted with
        # ``impacts=False`` (the shingle/fingerprint twin) carries the
        # impact meta columns as NULL — its folds stay impact-less
        # forever (no bound columns, no per-pair impact sort, plain df
        # partials), which is the whole point: the bound layer is the
        # dominant write cost and nothing ever BM25-ranks those tokens
        has_impacts = meta_rows[0]["impact_hist_bins"] is not None
        # the avgdl this fold stamps its rewritten rows with (the
        # PRE-fold corpus average — known without any job; post-fold
        # meta widens the [impact_avgdl_min, impact_avgdl_max] bracket
        # to include it, keeping every stored impact0 provably
        # correctable at read time)
        avgdl_stamp = (
            float(meta_rows[0]["sum_dl"] or 0.0)
            / int(meta_rows[0]["n_live"])
            if has_impacts
            else None
        )

        def _pruned_read(root, rel_dirs, schema):
            """:func:`_open_partition_dirs` with an empty-frame fallback
            (a missing dir just means that bucket never materialized)."""
            got = _open_partition_dirs(spark, root, rel_dirs)
            return got if got is not None else spark.createDataFrame([], schema)

        _mark("probe")
        # churned docs: any doc with a tail version or a tombstone.
        # Tail-sized; persisted — it anchors every churn-scoped join.
        churned = (
            tail_dl.select(id_col)
            .unionByName(tomb.select(id_col))
            .distinct()
            .persist()
        )
        # one job materializes the persist AND yields both discovery
        # outputs: the churn count (headline `/_status` telemetry) and
        # the affected id buckets (driver-bounded: <= n_buckets rows)
        bucket_counts = churned.groupBy(
            F.pmod(F.hash(F.col(id_col)), F.lit(n_buckets)).alias("b")
        ).count().collect()
        n_churned = sum(int(r["count"]) for r in bucket_counts)
        aff_id_buckets = sorted(r["b"] for r in bucket_counts)
        id_t = dict(tail_dl.dtypes).get(id_col, "long")
        # the affected id buckets' doclen rows — opened by dir name,
        # never a full doclen listing
        base_dl_aff = _pruned_read(
            base_doclen_path,
            [f"id_bucket={b}" for b in aff_id_buckets],
            f"{id_col} {id_t}, dl double, seq long, "
            "buckets array<int>, id_bucket int",
        ).persist()
        # churned docs' OLD doclen rows — the discovery source for
        # their old (token_bucket × own id_sub) pairs AND the
        # old-version seq for liveness
        base_dl_churned = (
            base_dl_aff.join(churned, on=id_col, how="left_semi")
            .select(id_col, "dl", "seq", "buckets")
            .persist()
        )
        _mark("churned_discovery")
        schema_po = f"{id_col} {id_t}, token string, tf double, seq long"
        tail_po = _read_or_empty(spark, postings_path, schema_po).select(
            id_col, "token", "tf", "seq"
        )
        sub_of_id = F.pmod(F.hash(F.col(id_col)), F.lit(n_sub))
        tail_pairs = tail_po.select(
            F.pmod(F.hash("token"), F.lit(n_buckets)).alias("tb"),
            sub_of_id.alias("sb"),
        ).distinct()
        old_pairs = base_dl_churned.select(
            F.explode("buckets").alias("tb"), sub_of_id.alias("sb")
        ).distinct()
        pairs = sorted(
            (r["tb"], r["sb"])
            for r in tail_pairs.unionByName(old_pairs).distinct().collect()
        )  # driver-bounded: <= token_buckets × id_subbuckets ints
        pair_dirs = [f"token_bucket={tb}/id_sub={sb}" for tb, sb in pairs]

        _mark("affected_pairs")
        # churn-scoped liveness: max-seq over (old base version ∪ tail
        # versions) minus higher-seq tombstones — tail-sized everywhere
        cand = base_dl_churned.select(id_col, "dl", "seq").unionByName(
            tail_dl.select(id_col, "dl", "seq")
        )
        latest = cand.groupBy(id_col).agg(
            F.max("seq").alias("seq"), F.max_by("dl", "seq").alias("dl")
        )
        tomb_max = tomb.groupBy(id_col).agg(F.max("seq").alias("_tomb_seq"))
        churned_live = (
            latest.join(tomb_max, id_col, "left")
            .filter(
                F.col("_tomb_seq").isNull()
                | (F.col("_tomb_seq") < F.col("seq"))
            )
            .select(id_col, "dl", "seq")
            .persist()
        )

        _mark("churned_live")
        staging = index_path.rstrip("/") + ".compacting-incr"
        shutil.rmtree(staging, ignore_errors=True)

        # affected-pair postings — opened by dir name. Non-churned rows
        # in these pairs are live and unique by the compaction invariant
        # and pass through with no join and no dedup; only churned-doc
        # rows (old base slice ∪ the whole tail, both churn-proportional)
        # pay the replay dedup and the live-version filter.
        impact_cols = ["dl", "impact0"] if has_impacts else []
        base_schema_po = (
            f"{id_col} {id_t}, token string, tf double, seq long, "
            + ("dl double, impact0 double, " if has_impacts else "")
            + "token_bucket int, id_sub int"
        )
        base_aff = _pruned_read(
            base_postings_path, pair_dirs, base_schema_po
        ).select(id_col, "token", "tf", "seq", *impact_cols)
        # keep side passes through with its STORED dl/impact0 — those
        # rows were stamped under some earlier fold/compaction's avgdl,
        # which the meta bracket already covers; re-stamping them would
        # turn the pass-through into a recompute
        keep = base_aff.join(churned, on=id_col, how="left_anti")
        # churn side: live versions only, then the inner join against
        # churned_live's (id, seq) both enforces liveness and (impact
        # mode) carries the live dl onto every surviving posting row
        # (tail rows have no stored dl); impact0 is stamped fresh under
        # avgdl_stamp
        churn_rows = (
            base_aff.select(id_col, "token", "tf", "seq")
            .unionByName(tail_po.select(id_col, "token", "tf", "seq"))
            .join(churned, on=id_col, how="left_semi")
            .dropDuplicates([id_col, "token", "seq"])
        )
        if has_impacts:
            churn_rows = (
                churn_rows.join(
                    churned_live.select(id_col, "seq", "dl"),
                    on=[id_col, "seq"],
                )
                .withColumn(
                    "impact0",
                    _impact0_expr(IMPACT_K1, IMPACT_B, avgdl_stamp),
                )
                .select(id_col, "token", "tf", "seq", "dl", "impact0")
            )
        else:
            churn_rows = churn_rows.join(
                churned_live.select(id_col, "seq"), on=[id_col, "seq"]
            ).select(id_col, "token", "tf", "seq")
        merged = (
            keep.unionByName(churn_rows)
            .withColumn(
                "token_bucket", F.pmod(F.hash("token"), F.lit(n_buckets))
            )
            .withColumn("id_sub", sub_of_id)
        )
        staged_postings = os.path.join(staging, "postings")
        # no repartition before the partitioned write: the keep side —
        # ~all of the data — was READ dir-clustered from the affected
        # pair dirs and only passed through broadcast joins against the
        # tiny churn set (map-side, partitioning preserved), so each
        # write task already holds rows of ~one pair and a shuffle here
        # would move the whole affected slice to restore a clustering it
        # never lost. The churn slice's rows fan a handful of extra
        # small files across its pairs — rewritten away by the next fold
        # that touches those dirs, never accumulated.
        # sortWithinPartitions (no shuffle — the keep side's dir
        # clustering survives): each written file holds (token, impact0
        # desc) runs, so parquet row-group/page statistics stay tight
        # for the pruned read's pushed (token, impact0) predicates
        sort_keys = ["token_bucket", "id_sub", "token"] + (
            [F.desc("impact0")] if has_impacts else []
        )
        merged.sortWithinPartitions(*sort_keys).write.mode(
            "overwrite"
        ).partitionBy("token_bucket", "id_sub").parquet(staged_postings)
        # empty-read fallback schema carries the tail's ACTUAL id type
        # (never-cast-ids rule): if churn deleted every live row in the
        # affected pairs, a hardcoded bigint empty frame joining
        # string-id `churned` would ANSI-cast-throw mid-compaction
        staged_po = _read_or_empty(spark, staged_postings, base_schema_po)
        _mark("staged_postings")
        # dfs + doclen are INDEPENDENT derivations of the staged
        # postings (both read the files just written, never each
        # other's output) — run their write jobs concurrently on two
        # driver threads; Spark schedules concurrent actions in one
        # session natively. The meta delta (a tiny churn-sized
        # aggregate, see below) overlaps on the main thread.
        from concurrent.futures import ThreadPoolExecutor

        staged_dfs = os.path.join(staging, "dfs")

        def _write_dfs() -> None:
            # recount ONLY the affected pairs from the staged postings
            # (partial per-pair counts + impact bounds — readers sum a
            # token's dft partials and merge its top-impact arrays);
            # unaffected dfs pair dirs are never touched. Impacts mode
            # uses the Arrow partial-merge aggregator (r14): the staged
            # files are dir-clustered, never hash-exchanged, so the
            # window formulation paid a full Exchange + Sort of every
            # affected-pair row here — the fold's dominant write cost;
            # the aggregator's exchange carries only vocab-sized
            # partials and reads just (token, impact0) file bytes.
            (
                (
                    _dfs_rows_arrow(staged_po)
                    if has_impacts
                    else _dfs_rows(staged_po, impacts=False)
                )
                .repartition(F.col("token_bucket"), F.col("id_sub"))
                .write.mode("overwrite")
                .partitionBy("token_bucket", "id_sub")
                .parquet(staged_dfs)
            )

        # doclen: rewrite ONLY the affected id buckets — their
        # non-churned rows pass through, churned docs re-enter with
        # their LIVE version + fresh token-bucket sets (from the staged
        # postings, which hold every live churned row by construction)
        dl_keep = base_dl_aff.join(churned, on=id_col, how="left_anti").select(
            id_col, "dl", "seq", "buckets"
        )
        churned_buckets = (
            staged_po.join(churned, on=id_col, how="left_semi")
            .groupBy(id_col)
            .agg(F.collect_set("token_bucket").alias("buckets"))
        )
        dl_new = (
            churned_live.join(churned_buckets, id_col, "left")
            .select(
                id_col,
                "dl",
                "seq",
                F.coalesce(
                    F.col("buckets"), F.array().cast("array<int>")
                ).alias("buckets"),
            )
        )
        staged_doclen = os.path.join(staging, "doclen")

        def _write_doclen() -> None:
            (
                dl_keep.unionByName(dl_new)
                .withColumn(
                    "id_bucket",
                    F.pmod(F.hash(F.col(id_col)), F.lit(n_buckets)),
                )
                .repartition(F.col("id_bucket"))
                .write.mode("overwrite")
                .partitionBy("id_bucket")
                .parquet(staged_doclen)
            )

        with ThreadPoolExecutor(max_workers=2) as pool:
            dfs_f = pool.submit(_write_dfs)
            dl_f = pool.submit(_write_doclen)
            # meta by exact CHURN-sized delta, overlapped with the two
            # staged writes: non-churned rows pass through both sides of
            # the bucket rewrite untouched, so the net change is
            # (churned docs' live rows in) minus (their old base rows
            # out) — one tiny union-aggregate over two persisted
            # churn-sized frames. No Observation on the doclen write: a
            # runtime-empty observed write (churn deleting every doc in
            # the affected buckets) gets its CollectMetrics optimizer-
            # eliminated and the dangling observation corrupts the
            # session for later RDD-closure jobs.
            delta = (
                base_dl_churned.select(
                    F.lit(-1).alias("sgn"), F.col("dl")
                )
                .unionByName(
                    churned_live.select(F.lit(1).alias("sgn"), F.col("dl"))
                )
                .agg(
                    F.coalesce(F.sum("sgn"), F.lit(0)).alias("dn"),
                    F.coalesce(
                        F.sum(F.col("sgn") * F.col("dl")), F.lit(0.0)
                    ).alias("ds"),
                )
                .collect()[0]
            )
            dfs_f.result()
            _mark("staged_dfs")
            dl_f.result()
        _mark("staged_doclen")
        n_live = int(meta_rows[0]["n_live"]) + int(delta["dn"])
        sum_dl = float(meta_rows[0]["sum_dl"] or 0.0) + float(delta["ds"])
        staged_meta = os.path.join(staging, "meta")
        # widen the impact avgdl bracket with THIS fold's stamp; the
        # impact params and top-G carry forward unchanged (the gate
        # above guarantees they exist). The bracket only ever widens
        # between full compactions — each full rewrite re-stamps every
        # row and collapses it back to a point.
        write_meta_rows(
            spark,
            staged_meta,
            [(
                n_buckets,
                n_sub,
                n_live,
                sum_dl,
                float(meta_rows[0]["impact_k1"]) if has_impacts else None,
                float(meta_rows[0]["impact_b"]) if has_impacts else None,
                min(float(meta_rows[0]["impact_avgdl_min"]), avgdl_stamp)
                if has_impacts
                else None,
                max(float(meta_rows[0]["impact_avgdl_max"]), avgdl_stamp)
                if has_impacts
                else None,
                int(meta_rows[0]["impact_topg"]) if has_impacts else None,
                int(meta_rows[0]["impact_hist_bins"])
                if has_impacts
                else None,
            )],
            _SEARCH_META_SCHEMA,
        )
        _mark("meta_delta")
        # attrs (if present): latest per live doc. Since r10 the base
        # attrs live id-bucketed next to doclen, so the steady-state
        # fold rewrites ONLY the affected id buckets (churn-scoped —
        # this was the last doc-count-proportional residual); a legacy
        # FLAT attrs file migrates into the bucketed layout with one
        # final doc-count-sized pass.
        staged_attrs = None
        attrs_mode = None
        base_attrs_root = os.path.join(index_path, "base", "attrs")
        has_base_attrs = _has_partition_prefix(base_attrs_root, "id_bucket=")
        try:
            tail_attrs = spark.read.parquet(os.path.join(index_path, "attrs"))
        except AnalysisException:
            tail_attrs = None
        if has_base_attrs:
            aff_dirs_a = [f"id_bucket={b}" for b in aff_id_buckets]
            base_a_aff = _open_partition_dirs(
                spark, base_attrs_root, aff_dirs_a
            )
            if base_a_aff is not None:
                base_a_aff = base_a_aff.drop("id_bucket")
            parts = [
                df for df in (base_a_aff, tail_attrs) if df is not None
            ]
        if has_base_attrs and parts:
            attrs_mode = "pruned"
            staged_attrs = os.path.join(staging, "attrs")
            like_a = base_a_aff if base_a_aff is not None else tail_attrs
            other = [
                c for c in like_a.columns if c not in (id_col, "seq")
            ]
            cand_a = parts[0]
            for df in parts[1:]:
                cand_a = cand_a.unionByName(df, allowMissingColumns=True)
            # every attrs tail row's doc is churned (stats_index_batch
            # writes attrs only alongside an ingest that also wrote the
            # doclen tail), so: non-churned affected-bucket rows pass
            # through; churned docs re-enter with their max-seq attrs,
            # restricted to the live set
            keep_a = (
                base_a_aff.join(churned, on=id_col, how="left_anti")
                if base_a_aff is not None
                else None
            )
            new_a = (
                cand_a.join(churned, on=id_col, how="left_semi")
                .groupBy(id_col)
                .agg(
                    F.max("seq").alias("seq"),
                    *[F.max_by(c, "seq").alias(c) for c in other],
                )
                .join(churned_live.select(id_col), id_col, "left_semi")
                .select(id_col, *other, "seq")
            )
            staged_a = (
                keep_a.select(id_col, *other, "seq").unionByName(new_a)
                if keep_a is not None
                else new_a
            )
            (
                staged_a.withColumn(
                    "id_bucket",
                    F.pmod(F.hash(F.col(id_col)), F.lit(n_buckets)),
                )
                .repartition(F.col("id_bucket"))
                .write.mode("overwrite")
                .partitionBy("id_bucket")
                .parquet(staged_attrs)
            )
        elif tail_attrs is not None:
            # one-time migration: the flat file holds latest rows for
            # EVERY doc (old-layout compaction output ∪ appends), so
            # this last pass is doc-count-sized by necessity; every
            # later fold is churn-scoped
            attrs_mode = "migrated"
            staged_attrs = os.path.join(staging, "attrs")
            other = [
                c for c in tail_attrs.columns if c not in (id_col, "seq")
            ]
            latest_a = tail_attrs.groupBy(id_col).agg(
                F.max("seq").alias("seq"),
                *[F.max_by(c, "seq").alias(c) for c in other],
            )
            alive = (
                spark.read.parquet(base_doclen_path)
                .select(id_col)
                .join(churned, on=id_col, how="left_anti")
                .unionByName(churned_live.select(id_col))
            )
            (
                latest_a.join(alive, id_col, "left_semi")
                .select(
                    id_col,
                    *other,
                    "seq",
                    F.pmod(F.hash(F.col(id_col)), F.lit(n_buckets)).alias(
                        "id_bucket"
                    ),
                )
                .repartition(F.col("id_bucket"))
                .write.mode("overwrite")
                .partitionBy("id_bucket")
                .parquet(staged_attrs)
            )
        _mark("attrs")
        churned.unpersist()
        base_dl_aff.unpersist()
        base_dl_churned.unpersist()
        churned_live.unpersist()

        _mark("unpersist")
        # swap — base components first (per affected dir: everything
        # else is never touched), tail dirs retire LAST so "no tail" can
        # only become true after the fresh meta and doclen are in place
        # (the fast path's consistency), and tombstones retire only
        # after the dead rows are really gone from the swapped-in base
        _swap_dirs(base_postings_path, staged_postings, pair_dirs)
        _swap_dirs(
            os.path.join(index_path, "base", "dfs"), staged_dfs, pair_dirs
        )
        _swap_dirs(
            base_doclen_path,
            staged_doclen,
            [f"id_bucket={b}" for b in aff_id_buckets],
        )
        _retire(meta_path, index_path)
        os.rename(staged_meta, meta_path)
        if attrs_mode == "pruned":
            # only the churn's id-bucket dirs move; every other
            # base/attrs dir is never touched (bit-identical, by test)
            _swap_dirs(
                base_attrs_root,
                staged_attrs,
                [f"id_bucket={b}" for b in aff_id_buckets],
            )
        elif attrs_mode == "migrated":
            os.makedirs(os.path.dirname(base_attrs_root), exist_ok=True)
            os.rename(staged_attrs, base_attrs_root)
        _mark("swaps")
        tails = [doclen_path, postings_path, tomb_path]
        if attrs_mode is not None:
            # the flat attrs tail is folded into base/attrs above —
            # retire it with the other tails (after the base swaps, so
            # a racing reader sees base∪tail or base-only, never neither)
            tails.append(os.path.join(index_path, "attrs"))
        for tail_dir in tails:
            _retire(tail_dir, index_path)
        shutil.rmtree(staging, ignore_errors=True)
        _mark("tail_retire")
        return {
            "mode": "incremental",
            "churned_docs": n_churned,
            "attrs_mode": attrs_mode,
            "affected_pairs": len(pairs),
            "affected_buckets": len({tb for tb, _ in pairs}),
            "total_buckets": n_buckets,
            "id_subbuckets": n_sub,
            "affected_dirs": pair_dirs,
            "affected_id_buckets": aff_id_buckets,
        }


def search_index_stream(
    spark: SparkSession,
    changes_stream: DataFrame,
    index_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_col: str = "seq",
    deleted_col: str = "deleted",
    trigger: dict | None = None,
) -> StreamingQuery:
    """Attach incremental index maintenance to any streaming DataFrame of
    changes (readStream frame with seq/id/deleted/text columns) —
    checkpointed, at-least-once, replay-safe (see module docstring)."""

    def _step(batch: DataFrame, epoch_id: int) -> None:
        search_index_batch(
            batch.sparkSession,
            index_path,
            batch,
            text_col=text_col,
            id_col=id_col,
            seq_col=seq_col,
            deleted_col=deleted_col,
        )

    writer = (
        changes_stream.writeStream.foreachBatch(_step)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if trigger is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(**trigger)
    return writer.start()


def _live_delta_for_churn(
    spark: SparkSession, index_path: str, id_col: str, n_buckets: int
) -> int:
    """EXACT net change in live-doc count contributed by the
    post-compaction churn (tail appends + tombstones), computed
    churn-proportionally: the churned ids' old base doclen rows are
    opened id-bucket-pruned (never a full base listing or scan) and
    their current liveness resolved with the same max-seq-minus-
    tombstone rule the compactor uses. Every frame here is churn- or
    affected-bucket-sized; ``index_status`` adds the result to the
    meta's ``n_live`` so a watchdog tick never aggregates the corpus."""
    doclen_path, _, tomb_path = _paths(index_path)
    base_doclen_path, _, _ = _base_paths(index_path)
    tail_dl, tomb = _read_components(
        spark,
        [
            (doclen_path, f"{id_col} long, dl double, seq long"),
            (tomb_path, f"{id_col} long, seq long"),
        ],
        id_col,
    )
    churned = (
        tail_dl.select(id_col).unionByName(tomb.select(id_col)).distinct()
    ).persist()
    try:
        aff = [
            r["b"]
            for r in churned.select(
                F.pmod(F.hash(F.col(id_col)), F.lit(n_buckets)).alias("b")
            ).distinct().collect()
        ]
        base_aff = _open_partition_dirs(
            spark, base_doclen_path, [f"id_bucket={b}" for b in aff]
        )
        if base_aff is None:
            id_t = dict(tail_dl.dtypes).get(id_col, "long")
            base_aff = spark.createDataFrame(
                [], f"{id_col} {id_t}, dl double, seq long"
            )
        # base rows are unique per doc by the compaction invariant
        base_churned = base_aff.join(churned, id_col, "left_semi").select(
            id_col, "seq"
        )
        latest = (
            base_churned.unionByName(tail_dl.select(id_col, "seq"))
            .groupBy(id_col)
            .agg(F.max("seq").alias("seq"))
        )
        tmax = tomb.groupBy(id_col).agg(F.max("seq").alias("_t"))
        live_now = latest.join(tmax, id_col, "left").filter(
            F.col("_t").isNull() | (F.col("_t") < F.col("seq"))
        )
        return live_now.count() - base_churned.count()
    finally:
        churned.unpersist()


def index_status(
    spark: SparkSession, index_path: str, id_col: str = "doc_id"
) -> dict:
    """Operator health numbers for one LSM search index — the payload the
    daemon's `/_status` control plane surfaces per search-flagged feed:

    * ``live_docs`` — current live corpus size, EXACT and
      churn-proportional: on a stats-bearing compacted base it is the
      meta's ``n_live`` adjusted by the churned ids' live delta (their
      old base rows read id-bucket-pruned, their live status resolved
      tail-side — the incremental compactor's exact discovery
      discipline), so a watchdog tick never aggregates the corpus; a
      never-compacted / legacy index falls back to the two skinny
      aggregates of :func:`live_doclen` (still never postings or text);
    * ``tail_doclen_rows`` / ``tombstones`` — post-compaction churn:
      the read path merges these on every query, so together they ARE
      the compaction-debt signal (``compaction_debt`` = churn rows per
      live doc, the number an operator alarms on);
    * ``base_present`` / ``token_buckets`` — whether the read-mostly
      compacted base (and its partition-pruned postings layout) exists.

    All probes are read-attempt (:func:`_read_or_empty`) — correct on
    HDFS/S3, never a driver-local stat."""
    doclen_path, _, tomb_path = _paths(index_path)
    base_doclen_path, _, meta_path = _base_paths(index_path)
    tail_rows = _read_or_empty(
        spark, doclen_path, f"{id_col} string, dl double, seq long"
    ).count()
    n_tomb = _read_or_empty(
        spark, tomb_path, f"{id_col} string, seq long"
    ).count()
    meta_rows = read_meta_rows(spark, meta_path)
    token_buckets = (
        int(meta_rows[0]["token_buckets"]) if meta_rows else None
    )
    n_live = None
    if (
        meta_rows
        and "n_live" in meta_rows[0]
        and _has_partition_prefix(base_doclen_path, "id_bucket=")
    ):
        if tail_rows == 0 and n_tomb == 0:
            # read-mostly steady state: meta IS the live count
            n_live = int(meta_rows[0]["n_live"])
        else:
            n_live = int(meta_rows[0]["n_live"]) + _live_delta_for_churn(
                spark, index_path, id_col, int(meta_rows[0]["token_buckets"])
            )
    if n_live is None:
        # never-compacted or legacy base: exact skinny aggregate
        n_live = live_doclen(spark, index_path, id_col).count()
    churn = tail_rows + n_tomb
    return {
        "live_docs": n_live,
        "tail_doclen_rows": tail_rows,
        "tombstones": n_tomb,
        "base_present": token_buckets is not None,
        "token_buckets": token_buckets,
        "compaction_debt": round(churn / n_live, 4) if n_live else None,
    }


def search_index_fsck(
    spark: SparkSession,
    index_path: str,
    id_col: str = "doc_id",
    sample_pairs: int = 8,
    seed: int = 13,
) -> dict:
    """Integrity report for one LSM search index's COMPACTED BASE — the
    invariants every pruned read depends on, verified at BOUNDED cost
    (the vector twin's :func:`vector_stream.vector_index_fsck` sibling;
    surfaced per search-flagged feed on `/_fsck`).

    Full-corpus checks run only on SKINNY frames:

    * **meta exactness** — ``n_live``/``sum_dl`` equal one aggregate
      over ``base/doclen`` (what every read-mostly BM25 fast path
      scores with);
    * **base uniqueness** — one doclen row per doc.

    The postings-side checks are SAMPLED — a full postings↔dfs↔doclen
    audit is corpus-sized by definition, which is exactly the cost an
    fsck must not impose at 100 TB. ``sample_pairs`` existing
    ``(token_bucket, id_sub)`` dirs are drawn deterministically
    (seeded) and opened BY NAME; within each:

    * **dfs agreement** — the pair's partial df counts equal a fresh
      per-token count of its postings (a drifted dfs silently
      mis-plans phrase probes and mis-scores the df fast path);
    * **doclen discovery agreement** — every posting's doc has a base
      doclen row whose ``buckets`` column contains the pair's
      token_bucket (the incremental compactor's old-pair discovery
      reads exactly this; a miss makes churn folds leave stale rows).

    Returns ``{"ok": bool|None, ...detail}``; ``ok=None`` when the
    index has no compacted base (tail-only indexes have no pruned-read
    invariants to check — every read merges everything)."""
    import random

    base_doclen_path, base_postings_path, meta_path = _base_paths(
        index_path
    )
    meta_rows = read_meta_rows(spark, meta_path)
    if not meta_rows or not _has_partition_prefix(
        base_doclen_path, "id_bucket="
    ):
        return {"ok": None, "reason": "no compacted base"}
    dl = spark.read.parquet(base_doclen_path)
    agg = dl.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("dl"), F.lit(0.0)).alias("s"),
        F.coalesce(
            F.sum(F.when(F.col("dl") < 0, 1).otherwise(0)), F.lit(0)
        ).alias("neg_dl"),
    ).collect()[0]
    n_live_actual = int(agg["n"])
    sum_dl_actual = float(agg["s"])
    dup_docs = (
        dl.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .count()
    )
    meta_live_ok = int(meta_rows[0]["n_live"]) == n_live_actual
    meta_dl_ok = (
        abs(float(meta_rows[0]["sum_dl"] or 0.0) - sum_dl_actual) < 1e-6
    )

    # deterministic sample of existing pair dirs (local listing, the
    # swap machinery's filesystem assumption; HDFS/S3 = listStatus)
    pair_dirs = []
    try:
        for tb in os.listdir(base_postings_path):
            if not tb.startswith("token_bucket="):
                continue
            for sb in os.listdir(os.path.join(base_postings_path, tb)):
                if sb.startswith("id_sub="):
                    pair_dirs.append(f"{tb}/{sb}")
    except OSError:
        pair_dirs = []
    rng = random.Random(seed)
    sampled = sorted(
        rng.sample(sorted(pair_dirs), min(sample_pairs, len(pair_dirs)))
    )
    dfs_mismatch_tokens = 0
    undiscoverable_rows = 0
    id_t = dict(dl.dtypes).get(id_col, "string")
    for rel in sampled:
        po = _open_partition_dirs(spark, base_postings_path, [rel])
        if po is None:
            continue
        fresh = po.groupBy("token").agg(
            F.count(F.lit(1)).cast("double").alias("dft_fresh")
        )
        stored = _open_partition_dirs(
            spark, os.path.join(index_path, "base", "dfs"), [rel]
        )
        if stored is None:
            dfs_mismatch_tokens += int(
                fresh.count()
            )  # whole pair's dfs partials missing
        else:
            dfs_mismatch_tokens += int(
                fresh.join(
                    stored.select("token", "dft"), "token", "full_outer"
                )
                .filter(
                    F.col("dft_fresh").isNull()
                    | F.col("dft").isNull()
                    | (F.col("dft_fresh") != F.col("dft"))
                )
                .count()
            )
        # discovery agreement: the pair's docs, looked up in THEIR
        # id-bucket doclen dirs (opened by name — bounded by the
        # sample's doc set, never a full doclen read)
        tb_val = int(rel.split("/")[0].split("=")[1])
        n_buckets = int(meta_rows[0]["token_buckets"])
        doc_buckets = sorted(
            r["b"]
            for r in po.select(
                F.pmod(F.hash(F.col(id_col)), F.lit(n_buckets)).alias("b")
            ).distinct().collect()
        )
        dl_aff = _open_partition_dirs(
            spark, base_doclen_path,
            [f"id_bucket={b}" for b in doc_buckets],
        )
        if dl_aff is None:
            undiscoverable_rows += int(po.count())
            continue
        undiscoverable_rows += int(
            po.select(id_col)
            .distinct()
            .join(
                dl_aff.filter(
                    F.array_contains("buckets", F.lit(tb_val))
                ).select(id_col),
                id_col,
                "left_anti",
            )
            .count()
        )
    ok = (
        meta_live_ok
        and meta_dl_ok
        and dup_docs == 0
        and int(agg["neg_dl"]) == 0
        and dfs_mismatch_tokens == 0
        and undiscoverable_rows == 0
    )
    return {
        "ok": ok,
        "n_live_meta": int(meta_rows[0]["n_live"]),
        "n_live_actual": n_live_actual,
        "meta_live_ok": meta_live_ok,
        "meta_sum_dl_ok": meta_dl_ok,
        "multi_row_docs_in_base": dup_docs,
        "negative_dl_rows": int(agg["neg_dl"]),
        "sampled_pair_dirs": sampled,
        "total_pair_dirs": len(pair_dirs),
        "dfs_mismatch_tokens": dfs_mismatch_tokens,
        "undiscoverable_posting_docs": undiscoverable_rows,
    }
