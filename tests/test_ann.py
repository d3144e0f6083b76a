"""IVF ANN: recall vs brute force, cell-assignment sanity, simhash64
properties."""

import pytest
from pyspark.sql import functions as F

from couch_to_postgres_spark.extensions.ann import assign_cells, ivf_topk, train_centroids
from couch_to_postgres_spark.extensions.dedup import hamming64, simhash64
from couch_to_postgres_spark.extensions.similarity import cosine_topk
from couch_to_postgres_spark.session import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def centroids(emb):
    return train_centroids(emb, n_cells=8)


def test_centroid_shape(centroids, emb):
    dim = len(emb.head()["embedding"])
    assert len(centroids) == 8 and all(len(c) == dim for c in centroids)


def test_assign_cells_covers_corpus(emb, centroids):
    assigned = assign_cells(emb, centroids)
    assert assigned.count() == emb.count()  # nprobe=1 → one cell each
    cells = {r["cell"] for r in assigned.select("cell").distinct().collect()}
    assert cells.issubset(set(range(8)))


def test_ivf_recall_vs_bruteforce(spark, emb, centroids):
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(queries, emb, k=5).collect()
    }
    # full probing (nprobe = n_cells) must reproduce brute force exactly
    full = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(queries, emb, centroids, k=5, nprobe=8).collect()
    }
    assert full == exact
    # partial probing trades recall for work; random gaussian-ish data is
    # the worst case for IVF, so the bar is modest
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(queries, emb, centroids, k=5, nprobe=4).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.5, recall


def test_simhash64_properties(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    d0 = docs.first()
    near_words = d0["text"].split(" ")
    near_words[len(near_words) // 2] = "XXREPLACEDXX"
    extra = spark.createDataFrame(
        [
            (900000, d0["text"], d0["lang"], d0["source"], d0["n_chars"]),
            (900001, " ".join(near_words), d0["lang"], d0["source"], d0["n_chars"]),
        ],
        schema=docs.schema,
    )
    fp = {
        r["doc_id"]: r["simhash64"]
        for r in simhash64(docs.unionByName(extra)).collect()
    }
    assert fp[d0["doc_id"]] == fp[900000]  # identical text
    near_dist = bin((fp[d0["doc_id"]] ^ fp[900001]) & (2**64 - 1)).count("1")
    assert near_dist <= 12  # near-identical → hamming-close
    other = [i for i in fp if i not in (d0["doc_id"], 900000, 900001)][0]
    far_dist = bin((fp[d0["doc_id"]] ^ fp[other]) & (2**64 - 1)).count("1")
    assert far_dist > near_dist  # unrelated docs are farther


def test_hamming64_column(spark):
    df = spark.createDataFrame([(0b1011, 0b0011)], "a long, b long")
    assert df.select(hamming64(F.col("a"), F.col("b")).alias("h")).head()["h"] == 1


def test_persisted_index_matches_inmemory_and_prunes(spark, emb, centroids, tmp_path):
    from couch_to_postgres_spark.extensions.ann import build_ivf_index, ivf_topk_indexed
    from couch_to_postgres_spark.plans.inspect import formatted_plan

    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, centroids=centroids)
    queries = emb.filter(F.col("vec_id") < 10)
    direct = sorted(
        map(tuple, ivf_topk(queries, emb, centroids, k=5, nprobe=3).collect())
    )
    indexed_df = ivf_topk_indexed(queries, spark, path, k=5, nprobe=3)
    assert sorted(map(tuple, indexed_df.collect())) == direct
    # the probed-cell filter must reach the scan as a PARTITION filter:
    # only the probed cells' directories are read, whatever the corpus size
    plan = formatted_plan(indexed_df)
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:200], plan


def test_quantize_reconstruction_error_bounded(spark, emb):
    """int8 quantization contract: reconstruction error per component is
    ≤ scale/2 (+float eps); qvec values fit int8; dequantize round-trips
    cosine within 2% on real vectors."""
    from couch_to_postgres_spark.extensions.ann import (
        dequantize,
        quantize_embeddings,
    )

    q = quantize_embeddings(emb)
    joined = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).join(q, "vec_id")
    # per-component |x - q*scale| <= scale/2 (+eps) and |q| <= 127
    bad = joined.select(
        F.exists(
            F.zip_with(
                "v",
                dequantize(F.col("qvec"), F.col("scale")),
                lambda x, d: F.abs(x - d) > F.col("scale") / 2 + F.lit(1e-9),
            ),
            lambda b: b,
        ).alias("err_over"),
        F.exists("qvec", lambda x: F.abs(x) > 127).alias("overflow"),
    )
    assert bad.filter(F.col("err_over") | F.col("overflow")).count() == 0
    # cosine(v, dequant(v)) ≈ 1 — the ANN-relevant property
    dq = dequantize(F.col("qvec"), F.col("scale"))
    dot = F.aggregate(
        F.zip_with("v", dq, lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    n1 = F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x))
    n2 = F.sqrt(F.aggregate(dq, F.lit(0.0), lambda a, x: a + x * x))
    cos = joined.select((dot / (n1 * n2)).alias("c"))
    assert cos.filter(F.col("c") < 0.98).count() == 0


def test_ivf_incremental_append_and_stats(spark, emb, centroids, tmp_path):
    """Index maintenance: appended vectors are queryable with the same
    directory pruning, existing cell files are untouched (O(batch)), and
    the stats monitor reflects the growth."""
    import os

    from couch_to_postgres_spark.extensions.ann import (
        append_to_ivf_index,
        build_ivf_index,
        ivf_index_stats,
        ivf_topk_indexed,
    )

    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, centroids=centroids)

    def inventory():
        out = {}
        for root, _d, files in os.walk(os.path.join(path, "cells")):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = os.stat(p).st_mtime_ns
        return out

    before = inventory()
    n_before = spark.read.parquet(os.path.join(path, "cells")).count()

    # clones of an existing vector => land in its cell, become its NN
    src = emb.filter(F.col("vec_id") == 7)
    clones = src.select(
        (F.col("vec_id") + 500000).alias("vec_id"), "embedding", "label"
    )
    assert append_to_ivf_index(spark, path, clones) == 1
    # O(batch): every pre-existing file bit-identical (append-only)
    after = inventory()
    assert all(after[p] == t for p, t in before.items())
    assert len(after) > len(before)
    assert spark.read.parquet(os.path.join(path, "cells")).count() == n_before + 1

    # the appended vector is found as the top neighbor of its source
    res = ivf_topk_indexed(src, spark, path, k=3, nprobe=2).collect()
    assert res and res[0]["neighbor_id"] == 500007 and res[0]["rank"] == 1

    stats = ivf_index_stats(spark, path)
    rows = {r["cell"]: r for r in stats.collect()}
    assert sum(r["n_vecs"] for r in rows.values()) == n_before + 1
    assert all(r["balance_ratio"] >= 1.0 for r in rows.values())


def test_ivf_tombstone_delete_and_compact(spark, emb, centroids, tmp_path):
    """Delete lifecycle: tombstoned vectors vanish from search results
    immediately (O(batch) logical delete); compaction rewrites ONLY the
    affected cells, clears the log, and search results are unchanged."""
    import os

    from couch_to_postgres_spark.extensions.ann import (
        build_ivf_index,
        compact_ivf_index,
        ivf_index_stats,
        ivf_topk_indexed,
        remove_from_ivf_index,
    )

    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, centroids=centroids)
    queries = emb.filter(F.col("vec_id") < 5)
    before = ivf_topk_indexed(queries, spark, path, k=3, nprobe=3).collect()
    victim = before[0]["neighbor_id"]

    assert (
        remove_from_ivf_index(
            spark, path, spark.createDataFrame([(victim,)], "vec_id long")
        )
        == 1
    )
    after = ivf_topk_indexed(queries, spark, path, k=3, nprobe=3).collect()
    assert all(r["neighbor_id"] != victim for r in after)
    assert ivf_index_stats(spark, path).head()["n_tombstones"] == 1

    # compact: only the victim's cell rewritten; results identical after
    def inventory():
        out = {}
        for root, _d, files in os.walk(os.path.join(path, "cells")):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = os.stat(p).st_mtime_ns
        return out

    pre = inventory()
    affected = compact_ivf_index(spark, path)
    assert len(affected) >= 1
    post = inventory()
    untouched = {
        p: t for p, t in pre.items()
        if not any(f"cell={c}/" in p or p.endswith(f"cell={c}") for c in affected)
    }
    assert all(post[p] == t for p, t in untouched.items())
    assert ivf_index_stats(spark, path).head()["n_tombstones"] == 0
    assert not os.path.isdir(os.path.join(path, "tombstones"))
    final = ivf_topk_indexed(queries, spark, path, k=3, nprobe=3).collect()
    assert sorted(map(tuple, final)) == sorted(map(tuple, after))
    # the victim is physically gone
    assert (
        spark.read.parquet(os.path.join(path, "cells"))
        .filter(F.col("vec_id") == victim)
        .count()
        == 0
    )


def test_jl_projection_preserves_distances_on_average(spark, emb):
    # JL sign projection: expected squared pairwise distance is preserved;
    # with out_dim=16 the per-pair distortion concentrates, so the MEAN
    # ratio over many pairs must sit near 1 (the lemma's guarantee is on
    # expectation/concentration, not per-pair exactness)
    import math
    import random

    from couch_to_postgres_spark.extensions.ann import random_projection

    sub = emb.filter(F.col("vec_id") < 60)
    orig = {
        r["vec_id"]: r["v"]
        for r in sub.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ).collect()
    }
    proj = {
        r["vec_id"]: r["proj"]
        for r in random_projection(sub, in_dim=64, out_dim=16).collect()
    }
    assert all(len(p) == 16 for p in proj.values())
    rng = random.Random(3)
    ids = sorted(orig)
    ratios = []
    for _ in range(120):
        a, b = rng.sample(ids, 2)
        d2o = sum((x - y) ** 2 for x, y in zip(orig[a], orig[b]))
        d2p = sum((x - y) ** 2 for x, y in zip(proj[a], proj[b]))
        if d2o > 0:
            ratios.append(d2p / d2o)
    mean = sum(ratios) / len(ratios)
    assert 0.8 < mean < 1.2, mean
    # determinism: same seed -> identical matrix, different seed -> different
    from couch_to_postgres_spark.extensions.ann import jl_projection_matrix

    assert jl_projection_matrix(8, 2, seed=7) == jl_projection_matrix(8, 2, seed=7)
    assert jl_projection_matrix(8, 2, seed=7) != jl_projection_matrix(8, 2, seed=8)


def test_assign_cells_hof_matches_vectorized(spark):
    # clear-margin synthetic: HOF (rounded, tie-broken) and numpy
    # assignments agree whenever the best/second margin exceeds rounding
    import math

    from couch_to_postgres_spark.extensions.ann import (
        assign_cells,
        assign_cells_hof,
    )

    cents = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
    ]
    rows = []
    for i in range(30):
        a = 0.3 + 0.02 * i
        rows.append((i, [math.cos(a), math.sin(a), 0.05 * (i % 3), 0.01]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for nprobe in (1, 2):
        got_h = {
            (r["vec_id"], r["cell"])
            for r in assign_cells_hof(df, cents, nprobe=nprobe).collect()
        }
        got_v = {
            (r["vec_id"], r["cell"])
            for r in assign_cells(df, cents, nprobe=nprobe).collect()
        }
        assert got_h == got_v

    # exact rounded tie resolves to the LOWER centroid index (the
    # cross-engine-deterministic rule the oracle relies on)
    tie = spark.createDataFrame(
        [(0, [1.0, 1.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    got = assign_cells_hof(tie, cents, nprobe=1).collect()[0]
    assert got["cell"] == 0


def test_hard_negatives_excludes_same_label_and_ranks_by_cosine(spark):
    from couch_to_postgres_spark.extensions.similarity import hard_negatives

    # query q (label 0); same-label near-twin MUST be excluded; the
    # different-label vectors rank by cosine
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),        # query
        (1, [0.99, 0.1, 0.0, 0.0], 0),       # same label, most similar -> excluded
        (2, [0.9, 0.2, 0.0, 0.0], 1),        # hard negative (closest other-label)
        (3, [0.0, 1.0, 0.0, 0.0], 1),        # easy negative
        (4, [0.5, 0.5, 0.0, 0.0], 2),        # middling negative
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = [
        (r["neighbor_id"], r["rank"])
        for r in hard_negatives(
            emb, k=3, queries=emb.filter(F.col("vec_id") == 0)
        ).orderBy("rank").collect()
    ]
    assert [n for n, _ in out] == [2, 4, 3]  # by similarity, no same-label
    assert 1 not in {n for n, _ in out}


def test_topk_recall_overlap_arithmetic(spark):
    from couch_to_postgres_spark.extensions.similarity import topk_recall

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21), (3, 30), (3, 31)],
        "query_id long, neighbor_id long",
    )
    # q1: full overlap; q2: half; q3: absent from the approx result
    approx = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 99)],
        "query_id long, neighbor_id long",
    )
    got = {
        r["query_id"]: (r["n_hit"], r["recall"])
        for r in topk_recall(approx, exact, k=2).collect()
    }
    assert got == {1: (2, 1.0), 2: (1, 0.5), 3: (0, 0.0)}


def test_topk_recall_ivf_vs_exact_real_vectors(spark, emb):
    from couch_to_postgres_spark.extensions.ann import ivf_topk, train_centroids
    from couch_to_postgres_spark.extensions.similarity import (
        cosine_topk,
        topk_recall,
    )

    q = emb.filter(F.col("vec_id") < 8)
    cents = train_centroids(emb, n_cells=8)
    exact = cosine_topk(q, emb, k=5)
    approx = ivf_topk(q, emb, cents, k=5, nprobe=4)
    rec = topk_recall(approx, exact, k=5)
    rows = rec.collect()
    assert len(rows) == 8
    assert all(0.0 <= r["recall"] <= 1.0 for r in rows)
    # nprobe=4 of 8 trained cells must beat chance decisively
    mean = sum(r["recall"] for r in rows) / len(rows)
    assert mean >= 0.5, f"IVF recall collapsed: {mean}"
