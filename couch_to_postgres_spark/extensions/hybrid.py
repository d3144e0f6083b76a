"""Hybrid retrieval: fuse lexical (BM25) and semantic (ANN) rankings
over the daemon's LIVE index twins with Reciprocal Rank Fusion.

A feed flagged ``search_index=True, vector_index=True`` maintains both
a BM25 LSM index and a seq-wins IVF vector index from the same
micro-batches (:mod:`streaming.search_stream`,
:mod:`streaming.vector_stream`). Retrieval quality work — eval-set
curation, hard-negative mining, targeted decontamination — routinely
needs BOTH signals: lexical matching catches exact terminology the
embedding blurs, embeddings catch paraphrase the terms miss. RRF
(Cormack, Clarke & Buettcher, SIGIR 2009) is the standard
training-free fusion: score(d) = Σ_source 1/(k_rrf + rank_source(d)).
It uses only RANKS, so the incomparable score scales of BM25 and
cosine never need calibration.

Plan shape at 100 TB: each source list is top-``depth`` per query —
query-sized, never corpus-sized — produced by the index readers'
pruned probes (token-bucket postings reads; nprobe cell dirs opened by
name). The fusion itself joins two query×depth frames: broadcast-sized
regardless of corpus. Contributions sum as exact DECIMALs in a fixed
rounding (the search module's summation-order discipline), so fused
scores are engine- and partitioning-stable — which is what lets
x_hybrid_live carry a full DuckDB value oracle.

Reference parity note: the reference (couch-to-postgres) has no ranked
retrieval at all; this is extension-stratum capability composing the
two r10/r11 live indexes.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    k_rrf: int = 60,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    weights: list[float] | None = None,
) -> DataFrame:
    """Reciprocal Rank Fusion over any number of per-query rankings.

    Each input frame holds (query_id, id, rank) rows — ranks 1-based
    within a query, one row per (query, doc) per source. A doc absent
    from a source simply contributes nothing for it (the standard RRF
    convention). Emits (query_id, id, rrf_score, rank) with
    ``rrf_score = round(Σ round(w_i/(k_rrf+rank), 9), 6)`` — the inner
    round makes every contribution an exact DECIMAL(18,9) so the sum is
    independent of addition order (IEEE double summation is not
    associative; three-plus sources would otherwise be
    partitioning-dependent), the outer round is the stable sort key.
    Ties break by id ascending. ``weights`` (default all-1.0, one per
    ranking) is the standard weighted-RRF tuning knob — e.g. 2:1
    lexical:semantic for terminology-heavy corpora."""
    if not rankings:
        raise ValueError("rrf_fuse: at least one ranking required")
    if weights is None:
        weights = [1.0] * len(rankings)
    if len(weights) != len(rankings):
        raise ValueError(
            f"rrf_fuse: {len(weights)} weights for {len(rankings)} rankings"
        )
    contribs = [
        r.select(
            F.col(query_id_col),
            F.col(id_col),
            F.round(
                F.lit(float(w)) / (F.lit(k_rrf) + F.col(rank_col)), 9
            ).cast("decimal(18,9)").alias("_c"),
        )
        for r, w in zip(rankings, weights)
    ]
    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.unionByName(c)
    scored = allc.groupBy(query_id_col, id_col).agg(
        F.round(F.sum("_c"), 6).cast("double").alias("rrf_score")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col, id_col, "rrf_score",
            F.col("rank").cast("long").alias("rank"),
        )
    )


_NINE = Decimal("1e-9")
_SIX = Decimal("1e-6")

#: plan-capture hook (r14, VERDICT r13 #7): the fused read materializes
#: each leg to the driver, so an explain() of the RESULT is a
#: `Scan ExistingRDD` stub. Evidence tooling (tools/dump_plans.py) sets
#: this to a dict before invoking the operator and receives each leg's
#: formatted PRE-COLLECT plan keyed by leg name. None (the default)
#: costs one falsy check per leg — no production effect.
_PLAN_CAPTURE: dict | None = None


def _capture_plan(name: str, df: DataFrame) -> None:
    if _PLAN_CAPTURE is None:
        return
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    _PLAN_CAPTURE[name] = qe.explainString(mode.fromString("formatted"))


def _rrf_fuse_local(
    rankings: list[list],
    k: int,
    k_rrf: int,
    weights: list[float],
) -> list[tuple]:
    """Driver-side RRF over ALREADY-COLLECTED (query_id, id, rank)
    rows — the fusion :func:`hybrid_topk_live` runs once its two legs
    are materialized. Sound at any corpus size because each leg is
    top-``depth`` per query (≤ queries×depth rows by construction);
    running the 3-job Spark fusion over two ~hundred-row local
    relations costs ~0.9 s of pure job-launch latency for arithmetic
    the driver does in microseconds (measured r12).

    BIT-EXACT parity with :func:`rrf_fuse` (pinned by test): Spark's
    ``round(double, 9)`` is ``BigDecimal.valueOf(x).setScale(9,
    HALF_UP)`` where ``valueOf`` goes through ``Double.toString``'s
    shortest round-trip representation — Python's ``repr(float)``
    produces the same unique shortest form, so
    ``Decimal(repr(x)).quantize(1e-9, HALF_UP)`` yields the identical
    DECIMAL(18,9) contribution; the sum is exact in both engines and
    the final ``round(·, 6) → double`` maps the same way. Tie-break is
    id ascending — for string ids Python's codepoint order matches
    Spark's UTF8 binary order on the ASCII ids couch uses."""
    acc: dict[tuple, Decimal] = {}
    for rows, w in zip(rankings, weights):
        for query_id, doc_id, rank in rows:
            x = float(w) / (k_rrf + rank)  # IEEE double, same as JVM
            c = Decimal(repr(x)).quantize(_NINE, ROUND_HALF_UP)
            key = (query_id, doc_id)
            acc[key] = acc.get(key, Decimal(0)) + c
    by_query: dict = {}
    for (query_id, doc_id), s in acc.items():
        score = float(s.quantize(_SIX, ROUND_HALF_UP))
        by_query.setdefault(query_id, []).append((doc_id, score))
    out = []
    for query_id, docs in by_query.items():
        docs.sort(key=lambda t: (-t[1], t[0]))
        out.extend(
            (query_id, doc_id, score, r)
            for r, (doc_id, score) in enumerate(docs[:k], start=1)
        )
    return out


def hybrid_topk_live(
    spark: SparkSession,
    search_index_path: str,
    vector_index_path: str,
    term_queries: DataFrame,
    vector_queries: DataFrame,
    k: int = 10,
    depth: int = 50,
    k_rrf: int = 60,
    nprobe: int = 4,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    weights: list[float] | None = None,
    candidates: DataFrame | None = None,
    diag: dict | None = None,
    auto_escalate: bool = False,
    escalate_factor: int = 4,
) -> DataFrame:
    """Fused top-k over the LIVE corpus: BM25 from the maintained LSM
    index + ANN from the maintained vector index, RRF-combined.

    ``candidates`` (optional, a one-column ``<id_col>`` frame in the
    twins' shared id space) restricts BOTH legs to the given doc set —
    metadata-filtered hybrid retrieval ("fused top-k among docs with
    lang=en"): the lexical leg semi-joins its query-hit slice, the
    vector leg its probed slice, so the filter pays slice cost on each
    side and never corpus cost. Scoring stats stay corpus-global on
    the lexical side and the vector side keeps post-filter IVF
    semantics (raise ``nprobe``/``depth`` for selective filters — a
    filter that empties a leg's top-``depth`` simply contributes
    nothing for those queries, the standard RRF absence rule).

    ``term_queries`` holds (query_id, term) rows; ``vector_queries``
    holds (<vec_id_col>, embedding) rows whose ids ARE the query ids
    (the two tables share a query-id space — ask both modalities the
    same questions). Each side retrieves its top-``depth`` per query
    from its own pruned index read; docs carried by only one modality
    contribute only that source's reciprocal rank. Emits
    (query_id, <id_col>, rrf_score, rank).

    **Underfill observability** (r13, VERDICT r12 #4): a selective
    ``candidates`` set can leave a leg's top-``depth`` with fewer than
    ``k`` in-set docs, silently degrading the fusion (the doc pool that
    source can vote on is thinner than the contract assumes). The
    failure mode is now OBSERVABLE: pass ``diag`` (a dict) to receive
    per-query ``lex_in_set_depth`` / ``sem_in_set_depth`` (rows each
    leg actually returned) and ``underfilled`` (query ids where a leg
    returned < k rows while a candidate filter was active — "< k rows"
    can also mean the filter genuinely matches fewer docs, which is
    why this is a signal, not an error). With ``auto_escalate=True``
    an underfilled leg is deterministically re-probed ONCE at
    ``depth×escalate_factor`` (the vector leg also at
    ``nprobe×escalate_factor``) and the deeper list replaces it —
    a pure function of the inputs, so value oracles stay replayable;
    escalation is opt-in because a deeper list adds contributions for
    docs the other leg ranked, changing fused scores by design.
    ``diag['escalated']`` records which legs re-probed.

    Query ids must be type-compatible with the corpus ids AND disjoint
    from them: the vector reader's self-exclusion filter
    (``query_id != neighbor_id``, inherited from the batch IVF's
    corpus-member-query contract) would silently drop a corpus doc
    whose id collides with a query id.

    The two probes are independent until the fuse, so each runs to
    completion on its own driver thread and the fused read costs
    ≈ max(leg) + fuse instead of sum-of-legs (VERDICT r11 #1 — the
    fold's staged-write overlap discipline applied to the read path;
    Spark's scheduler interleaves the two threads' jobs across the
    executor pool). Each leg MATERIALIZES to the driver — sound
    because a leg is top-``depth`` per query, i.e. ≤ queries×depth
    rows by construction, never corpus-sized — and the RRF itself then
    runs driver-side (:func:`_rrf_fuse_local`, bit-exact with
    :func:`rrf_fuse` by test): probe reads are job-LATENCY-bound at
    this shape, and three more Spark jobs over two hundred-row local
    relations were ~20%% of the whole fused read (measured r12)."""
    from concurrent.futures import ThreadPoolExecutor

    from couch_to_postgres_spark.streaming.search_stream import (
        bm25_topk_from_index,
    )
    from couch_to_postgres_spark.streaming.vector_stream import (
        vector_topk_live,
    )

    def _lex(leg_depth: int) -> tuple:
        df = bm25_topk_from_index(
            spark, search_index_path, term_queries, k=leg_depth,
            id_col=id_col, candidates=candidates,
        ).select("query_id", id_col, "rank")
        _capture_plan(f"lexical_depth{leg_depth}", df)
        return df.schema, df.collect()

    def _sem(leg_depth: int, leg_nprobe: int) -> tuple:
        df = vector_topk_live(
            spark, vector_index_path, vector_queries, k=leg_depth,
            nprobe=leg_nprobe, id_col=vec_id_col,
            candidates=(
                candidates.select(F.col(id_col).alias(vec_id_col))
                if candidates is not None
                else None
            ),
        ).select(
            F.col("query_id"),
            F.col("neighbor_id").alias(id_col),
            F.col("rank"),
        )
        _capture_plan(f"semantic_depth{leg_depth}", df)
        return df.schema, df.collect()

    with ThreadPoolExecutor(max_workers=2) as pool:
        lex_f = pool.submit(_lex, depth)
        sem_schema, sem_rows = _sem(depth, nprobe)
        lex_schema, lex_rows = lex_f.result()
    # per-query in-set depth: how many rows each leg ACTUALLY returned —
    # the underfill signal for filtered retrieval. Computed only when
    # observability or escalation asked for it: the two query-table
    # collects are tiny but they are JOBS, and the fused read is
    # job-latency-bound by design (the r12 ≈max(leg) work).
    under_lex: list = []
    under_sem: list = []
    escalated: list = []
    if diag is not None or (auto_escalate and candidates is not None):
        qids = {
            r[0]
            for r in term_queries.select("query_id").distinct().collect()
        } | {
            r[0]
            for r in vector_queries.select(vec_id_col).distinct().collect()
        }
        lex_n = {q: 0 for q in qids}
        sem_n = {q: 0 for q in qids}
        for r in lex_rows:
            lex_n[r[0]] = lex_n.get(r[0], 0) + 1
        for r in sem_rows:
            sem_n[r[0]] = sem_n.get(r[0], 0) + 1
        if candidates is not None:
            under_lex = sorted((q for q, n in lex_n.items() if n < k), key=str)
            under_sem = sorted((q for q, n in sem_n.items() if n < k), key=str)
    if auto_escalate and (under_lex or under_sem):
        # one deterministic re-probe of the underfilled leg(s) at
        # escalated depth/nprobe; the deeper list REPLACES the leg (a
        # pure function of the inputs — value oracles stay replayable)
        with ThreadPoolExecutor(max_workers=2) as pool:
            lex_f = (
                pool.submit(_lex, depth * escalate_factor)
                if under_lex
                else None
            )
            if under_sem:
                sem_schema, sem_rows = _sem(
                    depth * escalate_factor, nprobe * escalate_factor
                )
                escalated.append("semantic")
            if lex_f is not None:
                lex_schema, lex_rows = lex_f.result()
                escalated.append("lexical")
    if diag is not None:
        diag.update(
            lex_in_set_depth=dict(lex_n),
            sem_in_set_depth=dict(sem_n),
            underfilled={"lexical": under_lex, "semantic": under_sem},
            escalated=sorted(escalated),
        )
    if weights is None:
        weights = [1.0, 1.0]
    if len(weights) != 2:
        raise ValueError(f"hybrid_topk_live: 2 weights, got {len(weights)}")
    fused = _rrf_fuse_local(
        [
            [(r[0], r[1], r[2]) for r in lex_rows],
            [(r[0], r[1], r[2]) for r in sem_rows],
        ],
        k=k, k_rrf=k_rrf,
        weights=weights,  # [w_lexical, w_semantic]
    )
    # result id dtypes follow the lexical leg's schema (both legs share
    # the id space by contract; never-cast-ids)
    types = {f.name: f.dataType.simpleString() for f in lex_schema.fields}
    return spark.createDataFrame(
        fused,
        f"query_id {types['query_id']}, {id_col} {types[id_col]}, "
        f"rrf_score double, rank long",
    )
