"""Streaming-incremental corpus-QA stats: reports answered from the
maintained index must EQUAL the fresh-tokenize batch functions over the
equivalent live corpus snapshot — across inserts, updates, deletes,
replays, and compaction."""

import pytest
from pyspark.sql import functions as F

from couch_to_postgres_spark.extensions.text import (
    hapax_rate_by_source,
    kl_by_source,
)
from couch_to_postgres_spark.streaming.search_stream import compact_index
from couch_to_postgres_spark.streaming.stats_stream import (
    hapax_rate_from_index,
    kl_by_source_from_index,
    live_attrs,
    stats_index_batch,
)

# (doc_id, source, text) — two sources with overlapping vocabulary and
# real hapaxes so both reports have structure
DOCS = [
    (1, "web", "spark merges the window rows before the shuffle"),
    (2, "web", "window functions rank rows inside a spark partition"),
    (3, "web", "the merge statement upserts changed rows"),
    (4, "books", "couch documents replicate through the changes feed"),
    (5, "books", "spark spark spark tuning guide for the shuffle"),
    (6, "books", "feed the window with late arriving rows"),
]


def _changes(spark, rows):
    # (seq, doc_id, deleted, source, text)
    return spark.createDataFrame(
        rows,
        "seq long, doc_id long, deleted boolean, source string, text string",
    )


def _corpus(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, source string, text string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def index(tmp_path):
    return str(tmp_path / "stats_index")


def _ingest(spark, index, rows):
    return stats_index_batch(spark, index, _changes(spark, rows))


def test_reports_equal_fresh_build(spark, index):
    _ingest(spark, index,
            [(s, d, False, src, t) for s, (d, src, t) in
             enumerate(DOCS, start=1)])
    corpus = _corpus(spark, DOCS)
    assert _rows(kl_by_source_from_index(spark, index)) == _rows(
        kl_by_source(corpus)
    )
    assert _rows(hapax_rate_from_index(spark, index)) == _rows(
        hapax_rate_by_source(corpus)
    )


def test_update_delete_and_source_move(spark, index):
    _ingest(spark, index,
            [(s, d, False, src, t) for s, (d, src, t) in
             enumerate(DOCS, start=1)])
    # update doc 2 (new text AND a source move web→books), delete doc 5
    new2 = "merge conflicts resolved by the latest revision"
    _ingest(spark, index,
            [(10, 2, False, "books", new2), (11, 5, True, None, None)])
    final = [
        (d, "books" if d == 2 else src, new2 if d == 2 else t)
        for d, src, t in DOCS if d != 5
    ]
    corpus = _corpus(spark, final)
    assert _rows(kl_by_source_from_index(spark, index)) == _rows(
        kl_by_source(corpus)
    )
    assert _rows(hapax_rate_from_index(spark, index)) == _rows(
        hapax_rate_by_source(corpus)
    )
    got = {
        (r["doc_id"], r["source"]) for r in live_attrs(spark, index).collect()
    }
    assert got == {(1, "web"), (2, "books"), (3, "web"), (4, "books"),
                   (6, "books")}


def test_replay_is_idempotent(spark, index):
    rows = [(s, d, False, src, t) for s, (d, src, t) in enumerate(DOCS, start=1)]
    _ingest(spark, index, rows)
    before = _rows(kl_by_source_from_index(spark, index))
    _ingest(spark, index, rows)  # at-least-once transport replays
    assert _rows(kl_by_source_from_index(spark, index)) == before


def test_reports_survive_compaction(spark, index, tmp_path):
    _ingest(spark, index,
            [(s, d, False, src, t) for s, (d, src, t) in
             enumerate(DOCS, start=1)])
    _ingest(spark, index, [(10, 4, True, None, None)])
    want_kl = _rows(kl_by_source_from_index(spark, index))
    compacted = str(tmp_path / "compacted")
    # compaction carries the attrs state (live max-seq rows) itself
    compact_index(spark, index, compacted, token_buckets=4)
    assert _rows(kl_by_source_from_index(spark, compacted)) == want_kl
    # and tail ingest after compaction folds into the same report
    _ingest(spark, compacted, [(20, 7, False, "web",
                                "spark window merge rows all at once")])
    final = [(d, s, t) for d, s, t in DOCS if d != 4]
    final.append((7, "web", "spark window merge rows all at once"))
    assert _rows(kl_by_source_from_index(spark, compacted)) == _rows(
        kl_by_source(_corpus(spark, final))
    )


def test_vocab_growth_hand_computed(spark, index):
    """Arrival-order Heaps curve from the postings log, hand-checked:
    doc 1 introduces 3 types, doc 2 adds 2 new, doc 3 adds none, doc 12
    (second batch) adds 1 — and a DELETE does not erase a type's first
    arrival."""
    from couch_to_postgres_spark.streaming.search_stream import (
        search_index_batch,
    )
    from couch_to_postgres_spark.streaming.stats_stream import (
        vocab_growth_from_index,
    )

    def ch(rows):
        return spark.createDataFrame(
            rows, "seq long, doc_id long, deleted boolean, text string"
        )

    search_index_batch(
        spark, index,
        ch([
            (1, 1, False, "alpha beta gamma"),
            (2, 2, False, "alpha delta epsilon"),
            (3, 3, False, "beta gamma delta"),
        ]),
    )
    search_index_batch(
        spark, index,
        ch([(12, 12, False, "epsilon zeta"), (13, 1, True, None)]),
    )
    got = [
        (r["bucket"], r["new_types"], r["cum_types"])
        for r in vocab_growth_from_index(spark, index, bucket_width=1)
        .orderBy("bucket").collect()
    ]
    assert got == [(1, 3, 3), (2, 2, 5), (12, 1, 6)]
    # width 10: first batch collapses to bucket 0, second to bucket 1
    got10 = [
        (r["bucket"], r["new_types"], r["cum_types"])
        for r in vocab_growth_from_index(spark, index, bucket_width=10)
        .orderBy("bucket").collect()
    ]
    assert got10 == [(0, 5, 5), (1, 1, 6)]


def test_vocab_growth_by_group_matches_python_reference(spark, index):
    from couch_to_postgres_spark.streaming.stats_stream import (
        vocab_growth_by_group_from_index,
    )

    _ingest(spark, index,
            [(d, d, False, src, t) for d, src, t in DOCS])  # seq = doc_id
    got = _rows(vocab_growth_by_group_from_index(spark, index,
                                                 bucket_width=2))

    # driver-side reference: per-source first-arrival seq per token
    first: dict[tuple[str, str], int] = {}
    for d, src, t in DOCS:
        for w in t.split(" "):
            if w:
                k = (src, w)
                first[k] = min(first.get(k, d), d)
    buckets: dict[tuple[str, int], int] = {}
    for (src, _w), seq in first.items():
        b = (seq - seq % 2) // 2
        buckets[(src, b)] = buckets.get((src, b), 0) + 1
    want = []
    cums: dict[str, int] = {}
    for (src, b) in sorted(buckets):
        cums[src] = cums.get(src, 0) + buckets[(src, b)]
        want.append((src, b, buckets[(src, b)], cums[src]))
    assert got == sorted(want)


def test_vocab_growth_by_group_attributes_updates_to_new_source(spark, index):
    from couch_to_postgres_spark.streaming.stats_stream import (
        vocab_growth_by_group_from_index,
    )

    _ingest(spark, index, [(1, 1, False, "web", "alpha beta")])
    # the update moves doc 1 to books and mints a token new to BOTH
    _ingest(spark, index, [(10, 1, False, "books", "alpha gamma")])
    got = _rows(vocab_growth_by_group_from_index(spark, index,
                                                 bucket_width=100))
    # web keeps its arrival history (alpha, beta @ seq 1); the updated
    # version's tokens (alpha, gamma @ seq 10) count for books
    assert got == [("books", 0, 2, 2), ("web", 0, 2, 2)]


def test_trending_terms_planted_spike(spark, index):
    from couch_to_postgres_spark.streaming.stats_stream import (
        trending_terms_from_index,
    )

    # base window (seq <= 100): steady vocabulary
    _ingest(spark, index, [
        (1, 1, False, "web", "alpha beta gamma delta"),
        (2, 2, False, "web", "alpha beta gamma delta"),
    ])
    # tail window: 'viral' floods in, everything else holds rate
    _ingest(spark, index, [
        (101, 3, False, "web", "alpha beta viral viral viral"),
        (102, 4, False, "web", "viral viral viral gamma delta"),
    ])
    top = trending_terms_from_index(
        spark, index, split_seq=100, k=3, min_count=1
    ).collect()
    assert top[0]["token"] == "viral"
    assert top[0]["c_base"] == 0 and top[0]["c_tail"] == 6
    # every returned lift is sorted descending, cut is deterministic
    lifts = [r["lift"] for r in top]
    assert lifts == sorted(lifts, reverse=True)


def test_trending_updated_doc_counts_wholly_in_tail(spark, index):
    from couch_to_postgres_spark.streaming.stats_stream import (
        trending_terms_from_index,
    )

    _ingest(spark, index, [(1, 1, False, "web", "alpha beta")])
    # the SAME doc updated after the split: its live version is tail,
    # so 'alpha beta' contribute nothing to the base window anymore
    _ingest(spark, index, [(200, 1, False, "web", "alpha rocket")])
    out = {
        r["token"]: r
        for r in trending_terms_from_index(
            spark, index, split_seq=100, k=10, min_count=1
        ).collect()
    }
    assert out["alpha"]["c_base"] == 0 and out["alpha"]["c_tail"] == 1
    assert "beta" not in out  # superseded version's tokens are gone
    # min_count prunes the tail-rare tokens
    pruned = trending_terms_from_index(
        spark, index, split_seq=100, k=10, min_count=2
    ).count()
    assert pruned == 0


def test_contamination_from_shingle_index_equals_batch(spark, tmp_path):
    """Decontamination from a maintained shingle index: the same
    (id, n_shingles, n_overlap, overlap_frac) values as the batch
    operator over the LIVE train corpus — across inserts, an update
    that REMOVES a contaminating shingle, a delete, and a replay."""
    from couch_to_postgres_spark.extensions.text import contamination
    from couch_to_postgres_spark.streaming.search_stream import (
        compact_index,
        search_index_batch,
    )
    from couch_to_postgres_spark.streaming.stats_stream import (
        contamination_from_index,
        shingle_changes,
    )

    train_v1 = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "benchmark answer alpha beta gamma delta"),
        (3, "totally unrelated text about spark shuffles"),
    ]
    eval_rows = [
        (100, "quick brown fox jumps again"),        # overlaps doc 1
        (101, "answer alpha beta gamma in the eval"),  # overlaps doc 2 v1
        (102, "nothing shared here at all friends"),
        (103, "xy"),  # shorter than a shingle: zero-shingle guard
    ]
    eval_df = spark.createDataFrame(eval_rows, "doc_id long, text string")
    index = str(tmp_path / "shingle_idx")

    def ingest(rows, start_seq):
        ch = spark.createDataFrame(
            [(start_seq + i, d, deleted, t) for i, (d, deleted, t) in enumerate(rows)],
            "seq long, doc_id long, deleted boolean, text string",
        )
        search_index_batch(
            spark, index, shingle_changes(ch), id_col="doc_id"
        )

    ingest([(d, False, t) for d, t in train_v1], 1)
    # update doc 2 so the 'answer alpha beta' overlap DISAPPEARS from
    # the live corpus; delete doc 3; replay doc 1's original row
    ingest([(2, False, "rewritten clean content entirely new words"),
            (3, True, None)], 10)
    ingest([(1, False, train_v1[0][1])], 1)  # replay (same seq)

    live_train = spark.createDataFrame(
        [(1, train_v1[0][1]), (2, "rewritten clean content entirely new words")],
        "doc_id long, text string",
    )
    want = sorted(
        tuple(r) for r in contamination(live_train, eval_df).collect()
    )
    got = sorted(
        tuple(r)
        for r in contamination_from_index(spark, index, eval_df).collect()
    )
    assert got == want
    # the eval doc overlapping only the SUPERSEDED version reads clean
    by_id = {r[0]: r for r in got}
    assert by_id[101][2] == 0  # n_overlap gone with the update
    assert by_id[100][2] > 0
    assert by_id[103][1] == 0  # zero shingles, no crash, frac 0
    # compaction changes nothing (fast path takes over)
    compacted = str(tmp_path / "shingle_idx_base")
    compact_index(spark, index, compacted, token_buckets=8)
    got2 = sorted(
        tuple(r)
        for r in contamination_from_index(
            spark, compacted, eval_df
        ).collect()
    )
    assert got2 == want


def test_shingle_n_recorded_and_mismatch_fails_loudly(spark, tmp_path):
    """ADVICE r09: md5 fingerprints of different n-grams NEVER match, so
    a reader probing a shingle index with the wrong ``shingle_n`` would
    silently report zero contamination — the worst failure mode for a
    decontamination gate. The width is recorded at ingest
    (``record_shingle_n``) and both ingest and readers reject a
    mismatching width instead of returning empty results."""
    import pytest

    from couch_to_postgres_spark.streaming.search_stream import (
        search_index_batch,
    )
    from couch_to_postgres_spark.streaming.stats_stream import (
        contamination_from_index,
        decontaminate_from_index,
        record_shingle_n,
        shingle_changes,
    )

    index = str(tmp_path / "marked_idx")
    train = spark.createDataFrame(
        [(1, 1, False, "the quick brown fox jumps over the lazy dog")],
        "seq long, doc_id long, deleted boolean, text string",
    )
    train_df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    record_shingle_n(spark, index, 4)
    search_index_batch(spark, index, shingle_changes(train, shingle_n=4))
    eval_df = spark.createDataFrame(
        [(100, "quick brown fox jumps high")], "doc_id long, text string"
    )
    # matching width: reads work, overlap found
    got = contamination_from_index(
        spark, index, eval_df, shingle_n=4
    ).collect()
    assert got[0]["n_overlap"] > 0
    # re-asserting the same width is idempotent
    record_shingle_n(spark, index, 4)
    # a different width is rejected at ingest AND on every reader
    with pytest.raises(ValueError, match="shingle_n"):
        record_shingle_n(spark, index, 3)
    with pytest.raises(ValueError, match="shingle_n"):
        contamination_from_index(spark, index, eval_df, shingle_n=3)
    with pytest.raises(ValueError, match="shingle_n"):
        decontaminate_from_index(
            spark, index, train_df, eval_df, shingle_n=5
        )
    # an UNMARKED (hand-built) index keeps working: caller asserts width
    bare = str(tmp_path / "bare_idx")
    search_index_batch(spark, bare, shingle_changes(train, shingle_n=3))
    assert (
        contamination_from_index(spark, bare, eval_df, shingle_n=3)
        .collect()[0]["n_overlap"]
        > 0
    )


def test_daemon_shingle_feed_records_width(spark, tmp_path):
    """The daemon-maintained shingle index carries its width: a
    FeedConfig(shingle_index=True, shingle_n=4) feed writes the marker,
    and a default-width (n=3) reader fails loudly instead of silently
    matching nothing (the exact trap ADVICE r09 names)."""
    import pytest

    from couch_to_postgres_spark.streaming.daemon import (
        Daemon,
        FeedConfig,
        save_registry,
    )
    from couch_to_postgres_spark.streaming.stats_stream import (
        contamination_from_index,
    )

    from couch_to_postgres_spark.sources.changes import write_change_log

    logdir = str(tmp_path / "log")
    doc = (
        '{"_id": "d1", "_rev": "1-a", '
        '"text": "the quick brown fox jumps over the dog"}'
    )
    write_change_log(
        spark.createDataFrame(
            [(1, "d1", False, doc)],
            "seq long, id string, deleted boolean, doc string",
        ),
        logdir,
    )
    reg = str(tmp_path / "registry.json")
    save_registry(
        reg,
        [FeedConfig(name="wide-feed", changes_path=logdir,
                    shingle_index=True, shingle_n=4)],
    )
    d = Daemon(spark, reg, str(tmp_path / "data"))
    d.find_feeds()
    d.await_all()
    shidx = str(tmp_path / "data" / "shingles" / "wide_feed")
    eval_df = spark.createDataFrame(
        [(1, "quick brown fox jumps")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="shingle_n"):
        contamination_from_index(spark, shidx, eval_df)  # default n=3
    got = contamination_from_index(
        spark, shidx, eval_df, shingle_n=4
    ).collect()
    assert got[0]["n_shingles"] > 0
    d.stop_all()


def test_decontaminate_from_index_equals_batch(spark, tmp_path):
    """Drop-side decontamination from the shingle index: the surviving
    train set equals text.decontaminate over the live corpus, including
    the threshold rule (count comparison, not rounded fracs) and docs
    the eval set doesn't touch."""
    from couch_to_postgres_spark.extensions.text import decontaminate
    from couch_to_postgres_spark.streaming.search_stream import (
        search_index_batch,
    )
    from couch_to_postgres_spark.streaming.stats_stream import (
        decontaminate_from_index,
        shingle_changes,
    )

    train_rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "benchmark answer alpha beta gamma delta epsilon zeta"),
        (3, "totally unrelated text about spark shuffles and rows"),
        (4, "xy"),  # zero shingles: must always survive
    ]
    eval_rows = [
        (100, "benchmark answer alpha beta gamma overlap heavy"),
        (101, "quick brown fox appears briefly"),
    ]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    eval_df = spark.createDataFrame(eval_rows, "doc_id long, text string")
    index = str(tmp_path / "decon_idx")
    search_index_batch(
        spark,
        index,
        shingle_changes(
            train.select(
                F.col("doc_id").alias("seq"),
                "doc_id",
                F.lit(False).alias("deleted"),
                "text",
            )
        ),
        id_col="doc_id",
    )
    for frac in (0.0, 0.1, 0.5):
        want = sorted(
            r["doc_id"]
            for r in decontaminate(
                train, eval_df, max_overlap_frac=frac
            ).collect()
        )
        got = sorted(
            r["doc_id"]
            for r in decontaminate_from_index(
                spark, index, train, eval_df, max_overlap_frac=frac
            ).collect()
        )
        assert got == want, frac
    assert 4 in got  # the zero-shingle doc survived every threshold


def test_novelty_from_index_equals_batch(spark, tmp_path):
    """Novelty answered from the shingle index: same rows as
    text.novelty_curve over the live corpus — across an update that
    changes first-carriership, a delete, a replay, and compaction."""
    from couch_to_postgres_spark.extensions.text import novelty_curve
    from couch_to_postgres_spark.streaming.search_stream import (
        compact_index,
        search_index_batch,
    )
    from couch_to_postgres_spark.streaming.stats_stream import (
        novelty_from_index,
        shingle_changes,
    )

    v1 = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma totally new ending"),  # shares 1's prefix
        (3, "completely fresh words appear here"),
        (4, "xy"),  # zero shingles: absent from both outputs
    ]
    index = str(tmp_path / "novelty_idx")

    def ingest(rows, start_seq):
        ch = spark.createDataFrame(
            [(start_seq + i, d, deleted, t)
             for i, (d, deleted, t) in enumerate(rows)],
            "seq long, doc_id long, deleted boolean, text string",
        )
        search_index_batch(spark, index, shingle_changes(ch), id_col="doc_id")

    ingest([(d, False, t) for d, t in v1], 1)
    # update doc 1 away from the shared prefix (doc 2 becomes the first
    # carrier of 'alpha beta gamma'), delete doc 3, replay doc 2's row
    ingest([(1, False, "moved on to entirely different content"),
            (3, True, None)], 10)
    ingest([(2, False, v1[1][1])], 2)  # replay (same seq)

    live = spark.createDataFrame(
        [(1, "moved on to entirely different content"), (2, v1[1][1]),
         (4, "xy")],
        "doc_id long, text string",
    )
    want = sorted(tuple(r) for r in novelty_curve(live).collect())
    got = sorted(
        tuple(r) for r in novelty_from_index(spark, index).collect()
    )
    assert got == want and len(got) == 2  # doc 4 absent (zero shingles)
    compacted = str(tmp_path / "novelty_base")
    compact_index(spark, index, compacted, token_buckets=8)
    got2 = sorted(
        tuple(r) for r in novelty_from_index(spark, compacted).collect()
    )
    assert got2 == want


def test_source_overlap_from_index_equals_batch(spark, tmp_path):
    """Pairwise source Jaccard from the shingle index (attrs carried by
    shingle_changes keep_cols): same rows as dedup.source_overlap over
    the live corpus, including after an update flips a doc's source."""
    from couch_to_postgres_spark.extensions.dedup import source_overlap
    from couch_to_postgres_spark.streaming.stats_stream import (
        shingle_changes,
        source_overlap_from_index,
        stats_index_batch,
    )

    v1 = [
        (1, "a", "the quick brown fox jumps high"),
        (2, "a", "pack my box with five dozen jugs"),
        (3, "b", "the quick brown fox naps instead"),   # overlaps src a
        (4, "c", "entirely disjoint vocabulary lives here"),
    ]
    index = str(tmp_path / "overlap_idx")

    def ingest(rows, start_seq):
        ch = spark.createDataFrame(
            [(start_seq + i, d, deleted, s, t)
             for i, (d, deleted, s, t) in enumerate(rows)],
            "seq long, doc_id long, deleted boolean, source string, text string",
        )
        stats_index_batch(
            spark, index,
            shingle_changes(ch, keep_cols=["source"]),
            id_col="doc_id",
        )

    ingest([(d, False, s, t) for d, s, t in v1], 1)
    # doc 3 moves to source c (its overlap moves with it)
    ingest([(3, False, "c", "the quick brown fox naps instead")], 10)

    live = spark.createDataFrame(
        [(1, "a", v1[0][2]), (2, "a", v1[1][2]),
         (3, "c", v1[2][2]), (4, "c", v1[3][2])],
        "doc_id long, source string, text string",
    )
    want = sorted(
        tuple(r) for r in source_overlap(live).collect()
    )
    got = sorted(
        tuple(r)
        for r in source_overlap_from_index(spark, index).collect()
    )
    assert got == want
    # source b vanished with the move; a–c share the fox shingles
    assert all(r[0] != "b" and r[1] != "b" for r in got)
    assert any(r[2] > 0 for r in got)


def test_decontaminate_from_index_replay_safe(spark, tmp_path):
    """VERDICT r08 #1: a REPLAYED micro-batch must not double-count a
    doc's postings rows — before the shared live_postings() helper,
    _ov counted raw (id, token, seq) rows, so a replayed doc's true
    overlap looked 2x and a doc below threshold was spuriously dropped
    at frac > 0. Ingest, replay one batch, then pin
    decontaminate_from_index ≡ text.decontaminate across frac sweeps —
    on the uncompacted index (the buggy path) AND after compaction."""
    from couch_to_postgres_spark.extensions.text import decontaminate
    from couch_to_postgres_spark.streaming.search_stream import (
        compact_index,
        search_index_batch,
    )
    from couch_to_postgres_spark.streaming.stats_stream import (
        decontaminate_from_index,
        shingle_changes,
    )

    # doc 2's overlap is deliberately NEAR the 0.5 threshold: distinct
    # shingles = 6 ("benchmark answer alpha beta gamma delta epsilon
    # zeta" -> 6 3-grams), eval covers 3 of them -> frac 0.5, which the
    # rule (_ov > dl * frac) keeps; a double-counted _ov = 6 > 3 drops it
    train_rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "benchmark answer alpha beta gamma delta epsilon zeta"),
        (3, "totally unrelated text about spark shuffles and rows"),
    ]
    eval_rows = [
        (100, "benchmark answer alpha beta gamma prompt"),
        (101, "quick brown fox appears briefly"),
    ]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    eval_df = spark.createDataFrame(eval_rows, "doc_id long, text string")
    index = str(tmp_path / "decon_replay_idx")
    batch = shingle_changes(
        train.select(
            F.col("doc_id").alias("seq"),
            "doc_id",
            F.lit(False).alias("deleted"),
            "text",
        )
    )
    search_index_batch(spark, index, batch, id_col="doc_id")
    # at-least-once replay: the SAME batch lands again, byte-identical
    search_index_batch(spark, index, batch, id_col="doc_id")

    def survivors(idx):
        return {
            frac: sorted(
                r["doc_id"]
                for r in decontaminate_from_index(
                    spark, idx, train, eval_df, max_overlap_frac=frac
                ).collect()
            )
            for frac in (0.0, 0.1, 0.5)
        }

    want = {
        frac: sorted(
            r["doc_id"]
            for r in decontaminate(
                train, eval_df, max_overlap_frac=frac
            ).collect()
        )
        for frac in (0.0, 0.1, 0.5)
    }
    assert survivors(index) == want
    # the near-threshold doc is the regression witness: it must survive
    # at frac 0.5 (overlap == 3 of 6 distinct shingles, not >)
    assert 2 in survivors(index)[0.5]
    # compaction dedupes physically; values unchanged
    compacted = str(tmp_path / "decon_replay_base")
    compact_index(spark, index, compacted, token_buckets=8)
    assert survivors(compacted) == want
