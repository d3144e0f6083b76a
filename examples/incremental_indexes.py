"""Worked example: the LIVE-INDEX family — maintain search, corpus-QA
and ANN state incrementally under CDC, and answer questions FROM the
index without ever rescanning the corpus.

1. bootstrap a BM25+attrs index from the initial corpus state,
2. apply a CDC micro-batch (update + delete + insert) at O(changed docs),
3. BM25 top-k answered from the index — the corpus text is never re-read,
4. corpus-QA from the same state: per-source KL drift + hapax rate,
5. compact to an LSM base (token-bucket layout, dead rows dropped), keep
   ingesting into the tail, query base+tail together, compact again,
6. semantic admission control: a persisted IVF index accepts only
   embedding-batch vectors that are not semantic near-dups of the live
   set; replaying the batch admits nothing (at-least-once safe),
7. rebalance the accepted corpus to a target domain mix.

Run: python examples/incremental_indexes.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from couch_to_postgres_spark.extensions.ann import (  # noqa: E402
    build_ivf_index,
    ivf_topk_indexed,
)
from couch_to_postgres_spark.extensions.dedup import (  # noqa: E402
    semantic_dedup_ingest,
)
from couch_to_postgres_spark.extensions.sampling import (  # noqa: E402
    resample_to_mix,
)
from couch_to_postgres_spark.session import get_spark, load_table  # noqa: E402
from couch_to_postgres_spark.streaming.search_stream import (  # noqa: E402
    bm25_topk_from_index,
    compact_index,
)
from couch_to_postgres_spark.streaming.stats_stream import (  # noqa: E402
    hapax_rate_from_index,
    kl_by_source_from_index,
    stats_index_batch,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(app_name="incremental-indexes")
    docs = load_table(spark, SF_DIR, "documents")
    work = tempfile.mkdtemp(prefix="live_index_")
    idx = os.path.join(work, "idx")

    # 1 — bootstrap: every doc arrives as an insert (seq = doc_id here;
    # any monotone change sequence works — couch `seq` in production)
    boot = docs.select(
        F.col("doc_id").alias("seq"), "doc_id",
        F.lit(False).alias("deleted"), "text", "source",
    )
    st = stats_index_batch(spark, idx, boot)
    print(f"bootstrap: {st.upserts} docs indexed")

    # 2 — one CDC micro-batch: update doc 0, delete doc 1, insert a doc.
    # Cost is O(changed docs): tokenize 3 rows, append 3 skinny files.
    d0 = docs.filter(F.col("doc_id") == 0).first()
    batch = spark.createDataFrame(
        [
            (1_000_001, 0, False, d0["text"] + " merge merge merge", "src0"),
            (1_000_002, 1, True, None, None),
            (1_000_003, 900_000, False, "spark merge window scan join", "src1"),
        ],
        "seq long, doc_id long, deleted boolean, text string, source string",
    )
    st = stats_index_batch(spark, idx, batch)
    print(f"cdc batch: {st.upserts} upserts, {st.deletes} deletes")

    # 3 — ranked retrieval FROM the index: last-write-wins liveness is
    # resolved by max-seq; the deleted doc can no longer match
    qtab = spark.createDataFrame(
        [("q0", "merge"), ("q0", "window"), ("q1", "scan")],
        "query_id string, term string",
    )
    hits = bm25_topk_from_index(spark, idx, qtab, k=3)
    for r in hits.orderBy("query_id", "rank").collect():
        print(f"  {r['query_id']} #{r['rank']}: doc {r['doc_id']} @ {r['score']}")

    # 4 — corpus QA answered from the SAME maintained state, O(index)
    kl = kl_by_source_from_index(spark, idx)
    worst = kl.orderBy(F.col("kl_div").desc()).first()
    print(f"most-drifted source: {worst['source']} KL {worst['kl_div']}")
    hap = hapax_rate_from_index(spark, idx).orderBy("source").first()
    print(f"hapax rate ({hap['source']}): {hap['hapax_rate']}")

    # 4b — vocabulary growth over ingest order (Heaps curve) from the
    # same postings log: run BEFORE compaction (the append log is the
    # arrival history)
    from couch_to_postgres_spark.streaming.stats_stream import (
        vocab_growth_from_index,
    )

    growth = vocab_growth_from_index(spark, idx, bucket_width=100)
    last = growth.orderBy(F.col("bucket").desc()).first()
    print(f"vocabulary: {last['cum_types']} types after bucket {last['bucket']}")

    # 5 — LSM maintenance: compact (token-bucket base, dead rows gone),
    # keep ingesting into the tail, query base+tail together
    compacted = os.path.join(work, "compacted")
    compact_index(spark, idx, compacted, token_buckets=16)
    stats_index_batch(
        spark, compacted,
        spark.createDataFrame(
            [(2_000_001, 900_001, False, "window join merge stream", "src2")],
            "seq long, doc_id long, deleted boolean, text string, source string",
        ),
    )
    hits2 = bm25_topk_from_index(spark, compacted, qtab, k=3)
    print(f"base+tail query: {hits2.count()} hits (bucket-pruned base scan)")

    # 6 — semantic admission control on the embedding side: build the
    # IVF index once, then each arriving batch is classified against the
    # LIVE set (touched-cells-only scan) and only non-dups append
    emb = load_table(spark, SF_DIR, "embeddings")
    ivf = os.path.join(work, "ivf")
    build_ivf_index(emb.filter(F.col("vec_id") < 300), ivf, n_cells=8)
    arriving = emb.filter(F.col("vec_id") >= 300)
    stats = semantic_dedup_ingest(spark, ivf, arriving, threshold=0.35)
    print(f"admission: {stats}")
    # at-least-once replay: every previously-ACCEPTED vector re-classifies
    # dup_of_corpus (cosine 1.0 to its live self) — never double-admitted.
    # Chain-covered within-batch rejects may legitimately enter now (they
    # are not within threshold of any LIVE vector); see the docstring.
    replay = semantic_dedup_ingest(spark, ivf, arriving, threshold=0.35)
    assert replay["dup_of_corpus"] >= stats["accepted"], "double-admission!"
    assert replay["accepted"] <= stats["dup_within_batch"]
    print(f"replay: {replay} (no double-admission)")
    probe = ivf_topk_indexed(
        emb.filter(F.col("vec_id") < 3), spark, ivf, k=3, nprobe=2
    )
    print(f"ANN from the maintained index: {probe.count()} result rows")

    # 7 — rebalance what the corpus NOW is to a target domain mix
    mix = resample_to_mix(
        docs, {"src0": 0.5, "src1": 0.25, "src2": 0.125, "src3": 0.125}
    )
    comp = {
        r["source"]: r["n"]
        for r in mix.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    print(f"rebalanced epoch composition: {comp}")

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    print("OK")


if __name__ == "__main__":
    main()
