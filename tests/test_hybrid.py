"""Hybrid retrieval: RRF fusion must be exact rank arithmetic (decimal
contributions, engine-stable rounding), respect per-source absence, and
— composed over the two LIVE index twins — honor seq-wins liveness on
both sides."""

import pytest
from pyspark.sql import functions as F

from couch_to_postgres_spark.extensions.hybrid import (
    hybrid_topk_live,
    rrf_fuse,
)
from couch_to_postgres_spark.streaming.search_stream import (
    search_index_batch,
)
from couch_to_postgres_spark.streaming.vector_stream import (
    init_vector_index,
    vector_index_batch,
)

ANCHORS = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]]

# doc -> (text, embedding): doc 1 is the lexical hit for "spark window";
# doc 2 is its semantic near-neighbor but shares no term; doc 3 is both
DOCS = {
    1: ("spark window merge", [0.9, 0.1]),
    2: ("totally unrelated words", [0.95, 0.05]),
    3: ("spark rows", [0.8, 0.2]),
    4: ("merge rows stream", [-0.7, 0.2]),
    5: ("filler text here", [0.1, -0.9]),
}


def _ranking(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, rank long"
    )


def _contrib(rank, k_rrf=60):
    return round(1.0 / (k_rrf + rank), 9)


def test_rrf_fuse_arithmetic(spark):
    lex = _ranking(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3)])
    sem = _ranking(spark, [(1, 11, 1), (1, 13, 2)])
    out = {
        r["doc_id"]: (r["rrf_score"], r["rank"])
        for r in rrf_fuse([lex, sem], k=10).collect()
    }
    # doc 11: both sources; 10/12 lexical-only; 13 semantic-only
    assert out[11][0] == round(_contrib(2) + _contrib(1), 6)
    assert out[10][0] == round(_contrib(1), 6)
    assert out[13][0] == round(_contrib(2), 6)
    assert out[12][0] == round(_contrib(3), 6)
    # fused order: 11 (two contributions) first, then 10, 13, 12
    assert [d for d, (_, rk) in sorted(out.items(), key=lambda kv: kv[1][1])] \
        == [11, 10, 13, 12]


def test_rrf_fuse_three_sources_and_ties(spark):
    a = _ranking(spark, [(1, 10, 1), (1, 11, 2)])
    b = _ranking(spark, [(1, 11, 1), (1, 10, 2)])
    c = _ranking(spark, [(1, 10, 1), (1, 11, 1)])  # tie rank from source c
    out = {
        r["doc_id"]: (r["rrf_score"], r["rank"])
        for r in rrf_fuse([a, b, c], k=10).collect()
    }
    # 10: r1+r2+r1, 11: r2+r1+r1 — identical sums => tie => id asc
    assert out[10][0] == out[11][0]
    assert out[10][1] == 1 and out[11][1] == 2


def test_rrf_fuse_k_cut_and_empty(spark):
    lex = _ranking(spark, [(1, d, d) for d in range(1, 8)])
    assert rrf_fuse([lex], k=3).count() == 3
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])


@pytest.fixture()
def twin_indexes(spark, tmp_path):
    sidx = str(tmp_path / "sidx")
    vidx = str(tmp_path / "vidx")
    init_vector_index(spark, vidx, centroids=ANCHORS, assigner="hof")
    search_index_batch(spark, sidx, spark.createDataFrame(
        [(i, i, False, t) for i, (t, _) in DOCS.items()],
        "seq long, doc_id long, deleted boolean, text string",
    ))
    vector_index_batch(spark, vidx, spark.createDataFrame(
        [(i, i, False, v) for i, (_, v) in DOCS.items()],
        "seq long, vec_id long, deleted boolean, embedding array<double>",
    ))
    return sidx, vidx


def _queries(spark):
    terms = spark.createDataFrame(
        [(1001, "spark"), (1001, "window")], "query_id long, term string"
    )
    vecs = spark.createDataFrame(
        [(1001, [1.0, 0.05])], "vec_id long, embedding array<double>"
    )
    return terms, vecs


def test_hybrid_composes_both_live_indexes(spark, twin_indexes):
    sidx, vidx = twin_indexes
    terms, vecs = _queries(spark)
    # nprobe=2 probes the +x/+y cells only: semantic candidates are
    # docs 1/2/3; the -x/-y docs (4, 5) are pruned AND term-less, so
    # the fusion must not carry them
    out = hybrid_topk_live(
        spark, sidx, vidx, terms, vecs, k=5, depth=5, nprobe=2,
    )
    rows = {r["doc_id"]: r["rank"] for r in out.collect()}
    # doc 1 carries both terms AND is a semantic hit -> fused #1; doc 2
    # rides semantics alone (no term), doc 3 rides both weakly
    assert set(rows) == {1, 2, 3}
    assert rows[1] == 1
    cols = out.columns
    assert cols == ["query_id", "doc_id", "rrf_score", "rank"]


def test_hybrid_respects_liveness_on_both_sides(spark, twin_indexes):
    sidx, vidx = twin_indexes
    terms, vecs = _queries(spark)
    before = {r["doc_id"] for r in hybrid_topk_live(
        spark, sidx, vidx, terms, vecs, k=5, depth=5,
        nprobe=len(ANCHORS),
    ).collect()}
    assert 1 in before
    # doc 1 deleted from the FEED -> both twins tombstone it
    search_index_batch(spark, sidx, spark.createDataFrame(
        [(10, 1, True, None)],
        "seq long, doc_id long, deleted boolean, text string",
    ))
    vector_index_batch(spark, vidx, spark.createDataFrame(
        [(10, 1, True, None)],
        "seq long, vec_id long, deleted boolean, embedding array<double>",
    ))
    after = {r["doc_id"] for r in hybrid_topk_live(
        spark, sidx, vidx, terms, vecs, k=5, depth=5,
        nprobe=len(ANCHORS),
    ).collect()}
    assert 1 not in after
    assert after and after <= before - {1} | after


def test_weighted_rrf(spark):
    """Weighted RRF: weights scale each source's reciprocal-rank
    contribution exactly (decimal arithmetic), and a 2:1 lexical bias
    flips an otherwise semantic-won fusion."""
    lex = _ranking(spark, [(1, 10, 1), (1, 11, 2)])
    sem = _ranking(spark, [(1, 11, 1), (1, 10, 3)])
    # unweighted: 11 wins (r2+r1 > r1+r3)
    flat = {r["doc_id"]: r["rank"] for r in rrf_fuse([lex, sem]).collect()}
    assert flat[11] == 1
    # 2:1 lexical: 10 wins (2*r1 + r3 > 2*r2 + r1)
    out = {
        r["doc_id"]: (r["rrf_score"], r["rank"])
        for r in rrf_fuse([lex, sem], weights=[2.0, 1.0]).collect()
    }
    assert out[10][1] == 1
    assert out[10][0] == round(
        round(2.0 / 61, 9) + round(1.0 / 63, 9), 6
    )
    assert out[11][0] == round(
        round(2.0 / 62, 9) + round(1.0 / 61, 9), 6
    )
    with pytest.raises(ValueError, match="weights"):
        rrf_fuse([lex, sem], weights=[1.0])


def test_hybrid_on_couch_style_string_ids(spark, tmp_path):
    """Couch `_id`s ARE strings (reference data model): both twins and
    the fusion must run on string doc ids end-to-end, with query ids
    as synthetic non-colliding strings (the docstring contract: shared
    query-id space, disjoint from corpus ids — the vector reader's
    self-exclusion would silently drop a colliding corpus doc).
    VERDICT r11 #6."""
    sidx = str(tmp_path / "s_sidx")
    vidx = str(tmp_path / "s_vidx")
    init_vector_index(spark, vidx, centroids=ANCHORS, assigner="hof")
    search_index_batch(spark, sidx, spark.createDataFrame(
        [(i, f"100009-{i}", False, t) for i, (t, _) in DOCS.items()],
        "seq long, doc_id string, deleted boolean, text string",
    ))
    vector_index_batch(spark, vidx, spark.createDataFrame(
        [(i, f"100009-{i}", False, v) for i, (_, v) in DOCS.items()],
        "seq long, vec_id string, deleted boolean, embedding array<double>",
    ))
    terms = spark.createDataFrame(
        [("q-1001", "spark"), ("q-1001", "window")],
        "query_id string, term string",
    )
    vecs = spark.createDataFrame(
        [("q-1001", [1.0, 0.05])], "vec_id string, embedding array<double>"
    )
    out = hybrid_topk_live(
        spark, sidx, vidx, terms, vecs, k=5, depth=5, nprobe=2,
    )
    rows = {r["doc_id"]: r["rank"] for r in out.collect()}
    assert set(rows) == {"100009-1", "100009-2", "100009-3"}
    assert rows["100009-1"] == 1
    assert dict(out.dtypes)["doc_id"] == "string"
    assert dict(out.dtypes)["query_id"] == "string"


def test_local_fusion_bit_exact_with_spark_rrf(spark):
    """hybrid_topk_live's driver-side fusion must produce EXACTLY what
    the distributed rrf_fuse produces — same decimal contributions,
    same rounding, same tie-break — on an adversarial panel: many
    sources, weights, rank collisions, docs present in one/some/all
    sources, and near-tie sums."""
    import random

    from couch_to_postgres_spark.extensions.hybrid import _rrf_fuse_local

    rng = random.Random(13)
    n_sources, n_queries, depth = 4, 7, 25
    weights = [1.0, 2.0, 0.5, 1.25]
    rankings = []
    for _ in range(n_sources):
        rows = []
        for q in range(n_queries):
            docs = rng.sample(range(1000, 1080), depth)
            rows.extend((q, d, r) for r, d in enumerate(docs, start=1))
        rankings.append(rows)
    dfs = [
        spark.createDataFrame(rows, "query_id long, doc_id long, rank long")
        for rows in rankings
    ]
    want = sorted(
        tuple(r)
        for r in rrf_fuse(dfs, k=10, weights=weights).collect()
    )
    got = sorted(
        _rrf_fuse_local(rankings, k=10, k_rrf=60, weights=weights)
    )
    assert got == want


def test_filtered_hybrid_restricts_both_legs(spark, twin_indexes):
    """candidates= restricts BOTH legs: the fused result is a subset of
    the candidate set, the top doc outside it disappears even though it
    wins both modalities unfiltered, and scores for surviving docs are
    UNCHANGED (corpus-global lexical stats; the RRF re-ranks within the
    filtered lists)."""
    sidx, vidx = twin_indexes
    terms, vecs = _queries(spark)
    unfiltered = {
        r["doc_id"] for r in hybrid_topk_live(
            spark, sidx, vidx, terms, vecs, k=5, depth=5,
            nprobe=len(ANCHORS),
        ).collect()
    }
    assert 1 in unfiltered
    cands = spark.createDataFrame([(2,), (3,), (4,)], "doc_id long")
    got = hybrid_topk_live(
        spark, sidx, vidx, terms, vecs, k=5, depth=5,
        nprobe=len(ANCHORS), candidates=cands,
    ).collect()
    ids = {r["doc_id"] for r in got}
    assert ids and ids <= {2, 3, 4}
    assert 1 not in ids
    # rank 1 within the filtered set is doc 3 (the only candidate with
    # a query term AND a semantic hit)
    by_rank = {r["rank"]: r["doc_id"] for r in got}
    assert by_rank[1] == 3


def test_underfill_signal_and_deterministic_escalation(spark, twin_indexes):
    """r13 (VERDICT r12 #4): a selective candidates= set that empties a
    leg's top-depth must be OBSERVABLE (per-query in-set depth +
    underfilled query ids in diag), and auto_escalate=True must
    deterministically re-probe the underfilled leg once at escalated
    nprobe/depth — here the semantic leg, whose nprobe=1 probe misses
    both candidates' cells until the escalation widens it."""
    sidx, vidx = twin_indexes
    terms, vecs = _queries(spark)
    # candidates live in the -x / -y cells; nprobe=1 probes only +x
    cands = spark.createDataFrame([(4,), (5,)], "doc_id long")
    diag = {}
    got = hybrid_topk_live(
        spark, sidx, vidx, terms, vecs, k=2, depth=3, nprobe=1,
        candidates=cands, diag=diag,
    )
    rows = {r["doc_id"] for r in got.collect()}
    # unescalated: the semantic leg returned nothing in-set; the
    # lexical leg is ALSO underfilled (neither candidate carries a
    # query term) — both signals surface
    assert diag["sem_in_set_depth"][1001] == 0
    assert diag["underfilled"]["semantic"] == [1001]
    assert diag["underfilled"]["lexical"] == [1001]
    assert diag["escalated"] == []
    assert 5 not in rows  # doc 5 is term-less AND semantically unprobed
    # escalation: nprobe 1 -> 4 reaches the candidates' cells; the
    # result is a pure function of the inputs (re-run -> identical)
    runs = []
    for _ in range(2):
        d2 = {}
        out = hybrid_topk_live(
            spark, sidx, vidx, terms, vecs, k=2, depth=3, nprobe=1,
            candidates=cands, diag=d2, auto_escalate=True,
        )
        runs.append(sorted(tuple(r) for r in out.collect()))
        # both legs underfilled -> both re-probe; only the semantic one
        # can actually fill (the candidates are term-less)
        assert d2["escalated"] == ["lexical", "semantic"]
        assert d2["underfilled"]["semantic"] == [1001]
    assert runs[0] == runs[1]
    ids = {t[1] for t in runs[0]}
    assert 5 in ids  # the escalated probe found the -y candidate
    # no-filter calls keep the old contract: no underfill bookkeeping
    d3 = {}
    hybrid_topk_live(
        spark, sidx, vidx, terms, vecs, k=2, depth=3, nprobe=1, diag=d3
    ).collect()
    assert d3["underfilled"] == {"lexical": [], "semantic": []}
    assert d3["escalated"] == []
