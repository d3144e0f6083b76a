"""Streaming-incremental vector search: keep an IVF ANN index maintained
under the CDC change feed, with full UPDATE/DELETE/replay semantics.

The batch ANN stack (:mod:`couch_to_postgres_spark.extensions.ann`)
persists an IVF index with append-only growth and id-tombstone deletes —
the right contract for its consumer (incremental SemDeDup admission,
where admitted vectors never change). A CouchDB change feed is harder:
a doc UPDATE replaces its embedding, and the new vector may land in a
DIFFERENT cell than the old one, so an id-only tombstone would kill the
new version along with the old and "tombstone then re-append" cannot
express supersession. This module re-expresses the search index's
seq-wins liveness (:mod:`search_stream` — the rev-wins merge discipline
of operators/cdc.py over append-only files) for vectors:

State (all plain parquet under one index root):

* ``<index>/centroids``  — (cell, centroid) coarse quantizer, written
  once at :func:`init_vector_index` (KMeans fit or caller-fixed
  anchors) and FROZEN — appends and queries reuse it (standard IVF
  maintenance; monitor drift and rebuild off-peak, as
  ``ann.ivf_index_stats`` documents);
* ``<index>/quantizer``  — 1-row config marker (assigner, n_cells),
  recorded write-once so a later batch or query declaring a different
  quantizer fails loudly instead of probing wrong cells silently (the
  ``shingle_n`` lesson, ADVICE r09);
* ``<index>/ids``        — TAIL (vec_id, seq): one skinny row per
  ingested vector VERSION — the liveness sidecar (``doclen``'s role);
* ``<index>/cells``      — TAIL (vec_id, seq, embedding, cell) in
  ``cell=N`` partition dirs, append-only;
* ``<index>/tombstones`` — (vec_id, seq) delete markers;
* ``<index>/base/``      — compacted base: ``base/cells`` (live rows
  only, one per doc, ``cell=N`` dirs), ``base/ids`` (their skinny
  (vec_id, seq)), ``base/meta`` (1-row: n_cells, n_live — the
  read-mostly fast-path stats).

Liveness rule (query-time, no state rewrite): a doc's live vector is
its max-seq version unless a higher-seq tombstone exists. Updates
append; deletes append a tombstone; replays re-append byte-identical
rows that max/dropDuplicates absorb — the exact idempotence argument of
the search index and the CDC merge.

Plan shape at 100 TB:

* ingest is O(changed docs): assign cells for the batch (one Arrow
  pass), three skinny appends — the corpus is never rescanned;
* a query probes ``nprobe`` cells: the base dirs are opened BY NAME
  (never a full listing — VERDICT r09 #6), the tail is
  update-rate-bounded, and liveness joins only skinny (id, seq) frames;
* on a compacted churn-free index the probed slice IS live and unique
  (same theorem as ``bm25_topk_from_index``'s fast path: the gate is
  tail/tombstone absence, safe because ``ids`` is appended BEFORE
  ``cells`` — the doclen-before-postings write-order invariant), so the
  replay dedup and liveness join are skipped outright;
* compaction is a full live-only rewrite of the cells (v1 — honest for
  an embedding-sized store; the churn-proportional affected-cell fold
  is the same upgrade path the search index walked in r09/r10, with
  ``compact_ivf_index``'s affected-cell discovery as the template).

Reference parity note: the reference (couch-to-postgres, lib/index.js)
has no vector search; this is extension-stratum capability for the
LLM-training-data pipeline (ANN retrieval over a LIVE corpus mirror),
built from the public IVF design (Jégou et al., PAMI 2011) on the
repo's own LSM machinery.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from couch_to_postgres_spark.extensions.ann import (
    _score_probed,
    assign_cells,
    assign_cells_hof,
    train_centroids,
)
from couch_to_postgres_spark.streaming.meta_io import (
    read_meta_rows,
    write_meta_rows,
)
from couch_to_postgres_spark.streaming.search_stream import (
    _open_partition_dirs,
    _read_components,
    _read_or_empty,
)

_ASSIGNERS = {"vectorized": assign_cells, "hof": assign_cells_hof}


@dataclass
class VectorIndexBatchStats:
    arrived: int
    upserts: int
    deletes: int


def _paths(index_path: str) -> tuple[str, str, str]:
    return (
        os.path.join(index_path, "ids"),
        os.path.join(index_path, "cells"),
        os.path.join(index_path, "tombstones"),
    )


def _base_paths(index_path: str) -> tuple[str, str, str]:
    base = os.path.join(index_path, "base")
    return (
        os.path.join(base, "ids"),
        os.path.join(base, "cells"),
        os.path.join(base, "meta"),
    )


def _centroids_path(index_path: str) -> str:
    return os.path.join(index_path, "centroids")


def _quantizer_path(index_path: str) -> str:
    return os.path.join(index_path, "quantizer")


def init_vector_index(
    spark: SparkSession,
    index_path: str,
    sample: DataFrame | None = None,
    n_cells: int = 16,
    centroids: list[list[float]] | None = None,
    vec_col: str = "embedding",
    assigner: str = "vectorized",
    seed: int = 13,
) -> list[list[float]]:
    """Train (or accept) the coarse quantizer and record it. Idempotent:
    re-initialising with the SAME (assigner, n_cells) returns the
    existing centroids untouched (the quantizer is frozen by contract);
    a different configuration raises instead of silently mixing two
    incompatible cell layouts in one index."""
    if assigner not in _ASSIGNERS:
        raise ValueError(f"unknown assigner {assigner!r}")
    existing = read_meta_rows(spark, _quantizer_path(index_path))
    if existing:
        got_a = existing[0]["assigner"]
        got_n = int(existing[0]["n_cells"])
        want_n = len(centroids) if centroids is not None else n_cells
        if got_a != assigner or got_n != want_n:
            raise ValueError(
                f"vector index at {index_path} was built with "
                f"(assigner={got_a}, n_cells={got_n}); refusing "
                f"(assigner={assigner}, n_cells={want_n})"
            )
        return [
            list(r["centroid"])
            for r in sorted(
                read_meta_rows(spark, _centroids_path(index_path)),
                key=lambda r: r["cell"],
            )
        ]
    if centroids is None:
        if sample is None:
            raise ValueError(
                "init_vector_index needs either explicit centroids or a "
                "sample frame to train them on"
            )
        centroids = train_centroids(sample, n_cells, vec_col, seed)
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(_centroids_path(index_path))
    write_meta_rows(
        spark,
        _quantizer_path(index_path),
        [(assigner, len(centroids))],
        "assigner string, n_cells int",
    )
    return centroids


def _quantizer(
    spark: SparkSession, index_path: str
) -> tuple[str, list[list[float]], int]:
    q = read_meta_rows(spark, _quantizer_path(index_path))
    if not q:
        raise ValueError(
            f"vector index at {index_path} has no quantizer — call "
            f"init_vector_index first"
        )
    cents = [
        list(r["centroid"])
        for r in sorted(
            read_meta_rows(spark, _centroids_path(index_path)),
            key=lambda r: r["cell"],
        )
    ]
    return q[0]["assigner"], cents, int(q[0]["n_cells"])


def vector_index_batch(
    spark: SparkSession,
    index_path: str,
    changes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seq_col: str = "seq",
    deleted_col: str = "deleted",
) -> VectorIndexBatchStats:
    """Apply one micro-batch of changes. ``changes`` rows are
    (seq, id, deleted, embedding) — upserts carry the new vector,
    deletes carry ``deleted=true`` (vector ignored). Multiple changes
    to one doc in a batch collapse to the max-seq one. Cost is
    O(changed docs): one Arrow cell-assignment pass over the batch and
    three skinny appends.

    Write-order INVARIANT (load-bearing, the doclen-before-postings
    argument): ``ids`` is appended BEFORE ``cells``, so
    :func:`vector_topk_live`'s read-mostly gate — which decides "no
    tail" from ids/tombstone absence — can never miss tail cell rows; a
    crash between the appends leaves ids without cells, which only
    disables the fast path (the exact merge sees at-least-once state
    the replay overwrites)."""
    from couch_to_postgres_spark.streaming.partitioned import _path_lock

    assigner, cents, _ = _quantizer(spark, index_path)
    ids_path, cells_path, tomb_path = _paths(index_path)
    with _path_lock(index_path):
        latest = (
            changes.groupBy(id_col)
            .agg(
                F.max_by(
                    F.struct(
                        F.col(seq_col).cast("long").alias("seq"),
                        F.col(deleted_col).cast("boolean").alias("deleted"),
                        F.col(vec_col).alias("vec"),
                    ),
                    F.col(seq_col),
                ).alias("c"),
                F.count(F.lit(1)).alias("_n_changes"),
            )
            .select(id_col, "c.seq", "c.deleted", "c.vec", "_n_changes")
            .persist()
        )
        counts = latest.agg(
            F.coalesce(F.sum("_n_changes"), F.lit(0)).alias("arrived"),
            F.coalesce(
                F.sum(F.when(~F.col("deleted"), 1).otherwise(0)), F.lit(0)
            ).alias("n_up"),
            F.coalesce(
                F.sum(F.when(F.col("deleted"), 1).otherwise(0)), F.lit(0)
            ).alias("n_del"),
        ).collect()[0]
        arrived, n_up, n_del = (
            int(counts["arrived"]), int(counts["n_up"]), int(counts["n_del"])
        )
        if n_up:
            upserts = latest.filter(~F.col("deleted")).select(
                id_col, "seq", F.col("vec").alias(vec_col)
            )
            # ids FIRST — the fast-path gate's safety depends on this
            # order (see the docstring's write-order invariant)
            upserts.select(id_col, "seq").write.mode("append").parquet(
                ids_path
            )
            assigned = _ASSIGNERS[assigner](
                upserts, cents, id_col, vec_col, nprobe=1
            )
            # assign_cells projects (id, vec, cell) — rejoin the batch
            # for seq (batch-sized broadcast join, never corpus-sized)
            (
                assigned.join(upserts.select(id_col, "seq"), id_col)
                .select(id_col, "seq", vec_col, "cell")
                .write.mode("append")
                .partitionBy("cell")
                .parquet(cells_path)
            )
        if n_del:
            latest.filter(F.col("deleted")).select(
                id_col, "seq"
            ).write.mode("append").parquet(tomb_path)
        latest.unpersist()
        return VectorIndexBatchStats(
            arrived=arrived, upserts=n_up, deletes=n_del
        )


def live_vector_ids(
    spark: SparkSession, index_path: str, id_col: str = "vec_id"
) -> DataFrame:
    """(id, seq) of every LIVE vector: max-seq version per doc over
    (base ∪ tail) minus higher-seq tombstones. All three inputs are
    SKINNY (id, seq) frames — the embedding column is never read."""
    ids_path, _, tomb_path = _paths(index_path)
    base_ids_path, _, _ = _base_paths(index_path)
    schema = f"{id_col} long, seq long"
    tail, base, tomb = _read_components(
        spark,
        [(ids_path, schema), (base_ids_path, schema), (tomb_path, schema)],
        id_col,
    )
    latest = (
        tail.unionByName(base)
        .groupBy(id_col)
        .agg(F.max("seq").alias("seq"))
    )
    tmax = tomb.groupBy(id_col).agg(F.max("seq").alias("_t"))
    return (
        latest.join(tmax, id_col, "left")
        .filter(F.col("_t").isNull() | (F.col("_t") < F.col("seq")))
        .select(id_col, "seq")
    )


def _try(spark: SparkSession, path: str) -> DataFrame | None:
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return None


def vector_topk_live(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k over the LIVE corpus, answered from the maintained
    index: (query_id, neighbor_id, rank), ranked on rounded cosine with
    deterministic ties (shared :func:`ann._score_probed` stage — the
    batch IVF path and this one cannot drift numerically).

    The probed slice is O(nprobe/n_cells) of the index: base cell dirs
    are opened by name, the tail is filtered to the probed cells
    (update-rate-sized since the last compaction). On a compacted
    churn-free index (stats-bearing meta, no tail ids, no tombstones)
    the slice is live and unique by the compaction invariant — no
    dedup, no liveness join."""
    assigner, cents, _ = _quantizer(spark, index_path)
    ids_path, cells_path, tomb_path = _paths(index_path)
    _, base_cells_path, meta_path = _base_paths(index_path)

    q_cells = _ASSIGNERS[assigner](
        queries, cents, id_col, vec_col, nprobe=nprobe
    ).persist()
    probed = sorted(
        r["cell"] for r in q_cells.select("cell").distinct().collect()
    )
    base_probed = _open_partition_dirs(
        spark, base_cells_path, [f"cell={c}" for c in probed]
    )
    tail_all = _try(spark, cells_path)
    tail_probed = (
        tail_all.filter(F.col("cell").isin(probed))
        if tail_all is not None
        else None
    )
    frames = [
        f.select(id_col, "seq", vec_col, "cell")
        for f in (base_probed, tail_probed)
        if f is not None
    ]
    if not frames:
        # carry the QUERY side's id dtype (string couch ids vs long
        # vec_ids — the never-cast-ids rule)
        id_t = dict(queries.dtypes)[id_col]
        return spark.createDataFrame(
            [], f"query_id {id_t}, neighbor_id {id_t}, rank long"
        )
    slice_df = frames[0]
    for f in frames[1:]:
        slice_df = slice_df.unionByName(f)

    meta_rows = read_meta_rows(spark, meta_path)
    fast = (
        bool(meta_rows)
        and "n_live" in meta_rows[0]
        and _try(spark, ids_path) is None
        and _try(spark, tomb_path) is None
    )
    if not fast:
        # replay dedup on the probed slice (a version lands in exactly
        # one cell, so (id, seq) identifies it), then the seq-wins
        # liveness semi-join against the skinny global live set
        slice_df = slice_df.dropDuplicates([id_col, "seq"]).join(
            live_vector_ids(spark, index_path, id_col),
            on=[id_col, "seq"],
            how="left_semi",
        )
    return _score_probed(q_cells, slice_df, k, id_col, vec_col)


def compact_vector_index(
    spark: SparkSession,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Fold base ∪ tail into a live-only base and clear tail +
    tombstones — the maintenance step that restores the read-mostly
    fast path (and bounds deleted-data retention). Runs under the
    per-path lock; components swap via ``_retire`` (grace-window trash,
    never instant delete), so unlocked readers racing the swap degrade
    to the documented recovery window, exactly as
    ``compact_index_inplace`` describes. v1 rewrites every live cell
    row (embedding-sized, one pass); the churn-proportional
    affected-cell fold is the search index's documented upgrade path."""
    import shutil

    from couch_to_postgres_spark.streaming.partitioned import (
        _path_lock,
        _retire,
    )

    _, _, n_cells = _quantizer(spark, index_path)
    ids_path, cells_path, tomb_path = _paths(index_path)
    base_ids_path, base_cells_path, meta_path = _base_paths(index_path)
    with _path_lock(index_path):
        live = live_vector_ids(spark, index_path, id_col).persist()
        frames = [
            f
            for f in (_try(spark, base_cells_path), _try(spark, cells_path))
            if f is not None
        ]
        if not frames:
            live.unpersist()
            return {"mode": "noop", "n_live": 0}
        allc = frames[0].select(id_col, "seq", vec_col, "cell")
        for f in frames[1:]:
            allc = allc.unionByName(f.select(id_col, "seq", vec_col, "cell"))
        live_rows = (
            allc.dropDuplicates([id_col, "seq"])
            .join(live, on=[id_col, "seq"], how="left_semi")
            .persist()
        )
        staging = index_path.rstrip("/") + ".compacting-vec"
        shutil.rmtree(staging, ignore_errors=True)
        staged_cells = os.path.join(staging, "cells")
        live_rows.repartition(F.col("cell")).write.mode(
            "overwrite"
        ).partitionBy("cell").parquet(staged_cells)
        staged_ids = os.path.join(staging, "ids")
        live_rows.select(id_col, "seq").write.mode("overwrite").parquet(
            staged_ids
        )
        n_live = int(
            live_rows.agg(F.count(F.lit(1)).alias("n")).collect()[0]["n"]
        )
        live_rows.unpersist()
        staged_meta = os.path.join(staging, "meta")
        write_meta_rows(
            spark,
            staged_meta,
            [(int(n_cells), n_live)],
            "n_cells int, n_live long",
        )
        live.unpersist()
        for old, new in (
            (base_cells_path, staged_cells),
            (base_ids_path, staged_ids),
            (meta_path, staged_meta),
        ):
            _retire(old, index_path)
            os.makedirs(os.path.dirname(old), exist_ok=True)
            if os.path.exists(new):
                os.rename(new, old)
        for tail_dir in (ids_path, cells_path, tomb_path):
            _retire(tail_dir, index_path)
        shutil.rmtree(staging, ignore_errors=True)
        return {"mode": "full", "n_live": n_live}


def vector_index_status(
    spark: SparkSession, index_path: str, id_col: str = "vec_id"
) -> dict:
    """Operator health for one vector index — the `/_status` payload:
    live count, post-compaction churn (tail versions + tombstones =
    the compaction-debt signal), quantizer shape. The live count is
    meta-exact on a churn-free compacted base; with churn it is one
    aggregate over the SKINNY (id, seq) components — never the
    embeddings."""
    ids_path, _, tomb_path = _paths(index_path)
    _, _, meta_path = _base_paths(index_path)
    schema = f"{id_col} long, seq long"
    tail_rows = _read_or_empty(spark, ids_path, schema).count()
    n_tomb = _read_or_empty(spark, tomb_path, schema).count()
    meta_rows = read_meta_rows(spark, meta_path)
    q = read_meta_rows(spark, _quantizer_path(index_path))
    if meta_rows and "n_live" in meta_rows[0] and not tail_rows and not n_tomb:
        n_live = int(meta_rows[0]["n_live"])
    else:
        n_live = live_vector_ids(spark, index_path, id_col).count()
    churn = tail_rows + n_tomb
    return {
        "live_vectors": n_live,
        "tail_rows": tail_rows,
        "tombstones": n_tomb,
        "base_present": bool(meta_rows),
        "n_cells": int(q[0]["n_cells"]) if q else None,
        "assigner": q[0]["assigner"] if q else None,
        "compaction_debt": round(churn / n_live, 4) if n_live else None,
    }
