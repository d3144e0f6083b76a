"""CDC-maintained vector index: live top-k must EQUAL the brute-force
cosine ranking over the model's live corpus — across inserts, updates
(vectors MOVING cells), deletes, replays, and compaction. nprobe =
n_cells in the equivalence tests so IVF probing is exhaustive and the
check is exact; cell pruning is pinned separately."""

import os

import pytest
from pyspark.sql import functions as F

from couch_to_postgres_spark.streaming.vector_stream import (
    compact_vector_index,
    init_vector_index,
    live_vector_ids,
    vector_index_batch,
    vector_index_status,
    vector_topk_live,
)

# fixed 2-d anchors: cells = quadrant-ish directions (deterministic)
ANCHORS = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]]

# (id, vector) model corpus; ids chosen so updates move cells
V0 = {
    1: [0.9, 0.1], 2: [0.8, 0.3], 3: [0.1, 0.9],
    4: [-0.7, 0.2], 5: [0.2, -0.8], 6: [0.6, 0.6],
}


def _changes(spark, rows):
    # (seq, vec_id, deleted, embedding)
    return spark.createDataFrame(
        rows, "seq long, vec_id long, deleted boolean, embedding array<double>"
    )


def _queries(spark, model):
    return spark.createDataFrame(
        [(100 + i, v) for i, v in enumerate(
            [[1.0, 0.05], [0.05, 1.0], [-0.5, 0.5]]
        )],
        "vec_id long, embedding array<double>",
    )


def _brute(spark, model, queries, k):
    """Exact ranking with _score_probed's own rounding/tie rules: every
    (query, live doc) pair scored — the all-cells 'index'."""
    from couch_to_postgres_spark.extensions.ann import _score_probed

    corpus = spark.createDataFrame(
        [(i, v, 0) for i, v in model.items()],
        "vec_id long, embedding array<double>, cell int",
    )
    q = queries.select("vec_id", "embedding", F.lit(0).alias("cell"))
    return _score_probed(q, corpus, k, "vec_id", "embedding")


def _rows(df):
    return sorted(
        (r["query_id"], r["neighbor_id"], r["rank"]) for r in df.collect()
    )


@pytest.fixture()
def index(spark, tmp_path):
    p = str(tmp_path / "vec_index")
    init_vector_index(spark, p, centroids=ANCHORS, assigner="hof")
    return p


def _check(spark, index, model, k=4):
    got = _rows(vector_topk_live(
        spark, index, _queries(spark, model), k=k, nprobe=len(ANCHORS)
    ))
    want = _rows(_brute(spark, model, _queries(spark, model), k=k))
    assert got == want


def test_inserts_equal_brute_force(spark, index):
    vector_index_batch(
        spark, index,
        _changes(spark, [(i, i, False, v) for i, v in V0.items()]),
    )
    _check(spark, index, V0)
    assert vector_index_status(spark, index)["live_vectors"] == len(V0)


def test_update_moves_cells_and_supersedes(spark, index):
    vector_index_batch(
        spark, index,
        _changes(spark, [(i, i, False, v) for i, v in V0.items()]),
    )
    # doc 1 flips from the +x cell to the +y cell: the OLD version lives
    # in a cell the new one does not — id-only tombstones could never
    # express this; seq-wins liveness must
    model = {**V0, 1: [0.05, 0.95]}
    st = vector_index_batch(
        spark, index, _changes(spark, [(10, 1, False, model[1])])
    )
    assert (st.arrived, st.upserts, st.deletes) == (1, 1, 0)
    _check(spark, index, model)
    assert vector_index_status(spark, index)["live_vectors"] == len(model)


def test_delete_and_reinsert(spark, index):
    vector_index_batch(
        spark, index,
        _changes(spark, [(i, i, False, v) for i, v in V0.items()]),
    )
    model = dict(V0)
    model.pop(3)
    vector_index_batch(spark, index, _changes(spark, [(10, 3, True, None)]))
    _check(spark, index, model)
    model[3] = [0.3, 0.7]
    vector_index_batch(
        spark, index, _changes(spark, [(11, 3, False, model[3])])
    )
    _check(spark, index, model)


def test_replay_is_idempotent(spark, index):
    batch = [(i, i, False, v) for i, v in V0.items()]
    vector_index_batch(spark, index, _changes(spark, batch))
    before = _rows(vector_topk_live(
        spark, index, _queries(spark, V0), k=4, nprobe=len(ANCHORS)
    ))
    st = vector_index_batch(spark, index, _changes(spark, batch))
    assert st.arrived == len(V0)  # redelivered, absorbed
    after = _rows(vector_topk_live(
        spark, index, _queries(spark, V0), k=4, nprobe=len(ANCHORS)
    ))
    assert before == after
    assert vector_index_status(spark, index)["live_vectors"] == len(V0)


def test_compaction_preserves_results_and_restores_fast_path(
    spark, index
):
    vector_index_batch(
        spark, index,
        _changes(spark, [(i, i, False, v) for i, v in V0.items()]),
    )
    model = {**V0, 1: [0.05, 0.95]}
    vector_index_batch(spark, index, _changes(spark, [(10, 1, False, model[1])]))
    model.pop(5)
    vector_index_batch(spark, index, _changes(spark, [(11, 5, True, None)]))
    before = _rows(vector_topk_live(
        spark, index, _queries(spark, model), k=4, nprobe=len(ANCHORS)
    ))
    st = compact_vector_index(spark, index)
    assert st["mode"] == "full" and st["n_live"] == len(model)
    after = _rows(vector_topk_live(
        spark, index, _queries(spark, model), k=4, nprobe=len(ANCHORS)
    ))
    assert before == after
    _check(spark, index, model)
    status = vector_index_status(spark, index)
    assert status["tail_rows"] == 0 and status["tombstones"] == 0
    assert status["live_vectors"] == len(model)
    assert status["compaction_debt"] == 0.0
    # post-compaction churn works on top of the base
    model[7] = [0.7, -0.6]
    vector_index_batch(spark, index, _changes(spark, [(12, 7, False, model[7])]))
    _check(spark, index, model)


def test_cell_pruning_opens_only_probed_dirs(spark, index, tmp_path):
    """After compaction a 1-probe query must not OPEN unprobed cell
    dirs: corrupting an unprobed dir changes nothing, corrupting the
    probed one fails. (Open-by-name pruning, VERDICT r09 #6.)"""
    vector_index_batch(
        spark, index,
        _changes(spark, [(i, i, False, v) for i, v in V0.items()]),
    )
    compact_vector_index(spark, index)
    q = spark.createDataFrame(
        [(100, [1.0, 0.05])], "vec_id long, embedding array<double>"
    )
    want = _rows(vector_topk_live(spark, index, q, k=2, nprobe=1))
    assert want  # the +x cell holds docs 1, 2, 6
    # cell 2 (-x direction) is never probed by this query — corrupt it
    bad = os.path.join(index, "base", "cells", "cell=2")
    assert os.path.isdir(bad)
    for f in os.listdir(bad):
        if f.endswith(".parquet"):
            with open(os.path.join(bad, f), "wb") as fh:
                fh.write(b"not parquet")
    assert _rows(vector_topk_live(spark, index, q, k=2, nprobe=1)) == want


def test_quantizer_mismatch_fails_loudly(spark, index):
    with pytest.raises(ValueError, match="refusing"):
        init_vector_index(
            spark, index, centroids=ANCHORS[:2], assigner="hof"
        )
    with pytest.raises(ValueError, match="refusing"):
        init_vector_index(
            spark, index, centroids=ANCHORS, assigner="vectorized"
        )
    # same config is idempotent and returns the stored centroids
    assert init_vector_index(
        spark, index, centroids=ANCHORS, assigner="hof"
    ) == ANCHORS


def test_uninitialized_index_fails_loudly(spark, tmp_path):
    with pytest.raises(ValueError, match="quantizer"):
        vector_index_batch(
            spark, str(tmp_path / "nope"), _changes(spark, [])
        )


def test_live_vector_ids_model(spark, index):
    vector_index_batch(
        spark, index,
        _changes(spark, [(i, i, False, v) for i, v in V0.items()]),
    )
    vector_index_batch(spark, index, _changes(spark, [
        (10, 1, False, [0.0, 1.0]),   # update
        (11, 2, True, None),          # delete
    ]))
    live = {
        (r["vec_id"], r["seq"])
        for r in live_vector_ids(spark, index).collect()
    }
    assert live == {(1, 10), (3, 3), (4, 4), (5, 5), (6, 6)}
