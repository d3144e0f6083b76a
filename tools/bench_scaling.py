"""Scaling evidence: the headline queries at sf0.1 AND a synthesized 10x
corpus (~sf1: 6M lineitem docs, 50k documents, 10x events/embeddings).

No sf1 parquet ships with the test data, so this tool builds one in /tmp
from sf0.1, designed so each query's WORK scales 10x without changing its
semantics density:

* lineitem/orders-derived docs: 10 replicas with a replica-prefixed id
  (row content identical -- GROUP BY / key-expansion / CDC shapes don't
  key on the id);
* documents: 10 replicas with every WORD prefixed by a replica tag
  (``r3w...``), giving each replica a disjoint shingle space -- the
  near-dup structure within a replica is preserved exactly, and no
  cross-replica dups are fabricated, so dedup at 10x does 10x real work
  instead of drowning in artificial exact dups;
* events: 10 replicas with offset user_ids (10x users, same per-user
  session shape);
* embeddings: 10 replicas with offset vec_ids.

Each query is timed at both scales in ONE warm process; the RATIO is the
deliverable -- a query whose ratio tracks the data ratio (~10x) scales
linearly and survives the 100x extrapolation; anything super-linear is a
scale bug. Emits one JSON line; tools/../SCALING.md records the run.

Run:  python tools/bench_scaling.py   (~5-10 min, writes ~2 GB to /tmp)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import lineitem_mirror  # noqa: E402
from couch_to_postgres_spark.extensions import dedup as X_dedup  # noqa: E402
from couch_to_postgres_spark.extensions import similarity as X_sim  # noqa: E402
from couch_to_postgres_spark.extensions import text as X_text  # noqa: E402
from couch_to_postgres_spark.extensions import lines as X_lines  # noqa: E402
from couch_to_postgres_spark.extensions import sketch as X_sketch  # noqa: E402
from couch_to_postgres_spark.extensions.search import bm25_topk  # noqa: E402
from couch_to_postgres_spark.operators.mirror import content_diff  # noqa: E402
from couch_to_postgres_spark.operators import query as Q  # noqa: E402
from couch_to_postgres_spark.operators.cdc import apply_changes  # noqa: E402
from couch_to_postgres_spark.session import get_spark, load_table  # noqa: E402
from couch_to_postgres_spark.extensions.sampling import (  # noqa: E402
    select_topk_by_key,
)
from couch_to_postgres_spark.streaming.stats_stream import (  # noqa: E402
    kl_by_source_from_index,
    trending_terms_from_index,
    vocab_growth_by_group_from_index,
    vocab_growth_from_index,
)
from couch_to_postgres_spark.streaming.windows import (  # noqa: E402
    sessionize_batch,
)

REPLICAS = 10


def _bm25_from_idx(spark, idx, pruned):
    """The r13 MaxScore A/B leg body: a 20-query batch over the bench's
    real vocabulary (returnflag/status letters at ~33-50% df, discount/
    tax values at ~9-22%, quantity values at ~2%), answered from the
    compacted index. A single query at these corpus sizes is
    job-latency-bound on this box (both paths ≈3 s, ratio ≈1.4 at 10×)
    and cannot separate the cost shapes; a batch makes the unpruned
    path's (query, doc) pair space df-proportional — the regime the
    pruned path exists for. The pruned leg runs the r13 PER-QUERY cost
    gate: rare/skewed-term queries engage MaxScore, all-common queries
    ride the full path (a first ungated cut measured the all-engaged
    plan LOSING 18.3 vs 12.3 s at 6M docs — global min-merged cuts
    zeroed by the common queries made phase B a full scan; the gate +
    per-engaged-query cut merging is the fix)."""
    from couch_to_postgres_spark.streaming.search_stream import (
        bm25_topk_from_index,
    )

    vocab = [
        "F", "O", "N", "R", "A", "0.01", "0.03", "0.05", "0.07", "0.09",
        "42.0", "22.0", "9.0", "45.0", "12.0",
    ]
    qtab = spark.createDataFrame(
        [
            (qid, vocab[(qid + j) % len(vocab)])
            for qid in range(20)
            for j in range(3)
        ],
        "query_id int, term string",
    )
    rows = bm25_topk_from_index(spark, idx, qtab, k=20, pruned=pruned).collect()
    assert rows, "bm25 scaling leg matched nothing — vocabulary drifted?"
    return len(rows)


def _bm25_sel_batch(spark, idx, pruned):
    """The ENGAGEMENT-regime A/B leg (r13): 20 queries of (two common
    terms + one DISTINCT ABSOLUTELY-rare integer term each, df ≈ 650
    at sf0.1 / 6.5k at 10×) — every query carries a high-idf seed
    whose θ prices F/O out of phase B, the candidate union stays far
    inside the gate's broadcast-regime cap at BOTH scales, and the
    whole batch clears every gate level. This is the regime MaxScore
    exists for: the unpruned path's ranked-pair space multiplies the
    shared common terms across all 20 queries, the pruned path ranks
    each query's own bounded candidate set. A first cut seeded with
    ~2%-df quantity terms measured the boundary the cap now encodes:
    2× WIN at 600k docs (240k candidates) but a LOSS at 6M (2.4M
    candidates — the plan's own shuffles outgrew the pair savings);
    fractional selectivity is not selectivity. The rotating-vocab leg
    above stays as the NO-REGRESSION control (its mostly-common batch
    is gate-refused; pruned ≈ unpruned)."""
    from couch_to_postgres_spark.streaming.search_stream import (
        bm25_topk_from_index,
    )

    qtab = spark.createDataFrame(
        [
            (qid, t)
            for qid in range(20)
            for t in ("F", "O", str(101 + qid))
        ],
        "query_id int, term string",
    )
    diag = {}
    rows = bm25_topk_from_index(
        spark, idx, qtab, k=20, pruned=pruned, diag=diag
    ).collect()
    assert rows, "bm25 sel-batch leg matched nothing — vocabulary drifted?"
    if pruned:
        assert diag.get("pruned") is True, diag.get("gate")
    return len(rows)


def replicate(df, tag_fn):
    out = None
    for i in range(REPLICAS):
        rep = tag_fn(df, i)
        out = rep if out is None else out.unionByName(rep)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="bench_scaling",
        extra_conf={"spark.sql.files.maxPartitionBytes": str(16 << 20)},
    )
    tmp = tempfile.mkdtemp(prefix="bench_scaling_")
    extras: dict = {}  # non-timing evidence riding the output JSON

    def _du_bytes(path: str) -> int:
        total = 0
        for dp, _dns, fns in os.walk(path):
            total += sum(
                os.path.getsize(os.path.join(dp, f))
                for f in fns
                if not f.startswith((".", "_"))
            )
        return total

    # ---- materialize both scales once (mirrors are stored state) ----
    m1_path = os.path.join(tmp, "mirror_sf01.parquet")
    lineitem_mirror(spark, sf_dir).write.mode("overwrite").parquet(m1_path)
    m10_path = os.path.join(tmp, "mirror_sf1.parquet")
    replicate(
        lineitem_mirror(spark, sf_dir),
        lambda df, i: df.select(
            F.concat_ws("#", F.lit(str(i)), "id").alias("id"), "doc"
        ),
    ).write.mode("overwrite").parquet(m10_path)

    docs1 = load_table(spark, sf_dir, "documents")
    d10_path = os.path.join(tmp, "docs_sf1.parquet")
    replicate(
        docs1,
        lambda df, i: df.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            # per-replica word tag => disjoint shingle space per replica:
            # within-replica dup structure preserved, no fabricated
            # cross-replica dups
            F.regexp_replace("text", r"(\S+)", f"r{i}$1").alias("text"),
            "lang", "source", "n_chars",
        ),
    ).write.mode("overwrite").parquet(d10_path)

    ev1 = load_table(spark, sf_dir, "events")
    ev10_path = os.path.join(tmp, "events_sf1.parquet")
    replicate(
        ev1,
        lambda df, i: df.withColumn(
            "user_id", F.col("user_id") + F.lit(i * 10_000_000)
        ),
    ).write.mode("overwrite").parquet(ev10_path)

    emb1 = load_table(spark, sf_dir, "embeddings")
    emb10_path = os.path.join(tmp, "emb_sf1.parquet")
    replicate(
        emb1,
        lambda df, i: df.withColumn(
            "vec_id", F.col("vec_id") + F.lit(i * 1_000_000)
        ),
    ).write.mode("overwrite").parquet(emb10_path)

    # persisted IVF indexes for the incremental-SemDeDup entry (setup,
    # not timed — index build amortizes across every future batch).
    # n_cells follows the √N discipline (16 at 2k vecs, 50 at 20k) so the
    # measurement reflects the documented maintenance contract: the timed
    # query admits the SAME 20-vector batch against both live corpora —
    # the claim under test is O(batch · cell), never O(corpus)
    from couch_to_postgres_spark.extensions.ann import build_ivf_index

    emb10 = spark.read.parquet(emb10_path)
    idx1_path = os.path.join(tmp, "ivf_sf01")
    build_ivf_index(emb1.filter(F.col("vec_id") >= 20), idx1_path, n_cells=16)
    idx10_path = os.path.join(tmp, "ivf_sf1")
    build_ivf_index(
        emb10.filter(F.col("vec_id") >= 20), idx10_path, n_cells=50
    )

    # stats indexes (postings + attrs) for the index-answered corpus-QA
    # readers (setup, not timed — ingest amortizes across every report).
    # The timed claim is O(index): report cost tracks live postings and
    # attrs state, never corpus TEXT re-tokenization
    from couch_to_postgres_spark.streaming.stats_stream import (
        stats_index_batch,
    )

    def build_stats_idx(docs_df, path):
        stats_index_batch(
            spark,
            path,
            docs_df.select(
                F.col("doc_id").cast("long").alias("seq"),
                "doc_id",
                F.lit(False).alias("deleted"),
                "source",
                "text",
            ),
        )

    sidx1_path = os.path.join(tmp, "stats_sf01")
    build_stats_idx(docs1, sidx1_path)
    sidx10_path = os.path.join(tmp, "stats_sf1")
    build_stats_idx(spark.read.parquet(d10_path), sidx10_path)

    scales = {
        "sf0.1": {
            "mirror": spark.read.parquet(m1_path),
            "docs": docs1,
            "events": ev1,
            "emb": emb1,
            "semdedup_idx": idx1_path,
            "stats_idx": sidx1_path,
            # seq splitting the live corpus in half (stats seq = doc_id;
            # replicas at 10x are offset by i*1e6, so half the replicas
            # are "recent" there) — the trending reader's window
            "trend_split": 2_500,
        },
        "sf1(synth)": {
            "mirror": spark.read.parquet(m10_path),
            "docs": spark.read.parquet(d10_path),
            "events": spark.read.parquet(ev10_path),
            "emb": emb10,
            "semdedup_idx": idx10_path,
            "stats_idx": sidx10_path,
            "trend_split": 5_000_000,
        },
    }
    # touch so timings measure queries, not cold page cache
    for t in scales.values():
        for df in t.values():
            if not isinstance(df, (str, int)):  # paths/params warm by use
                df.count()
        t["mirror_rows"] = t["mirror"].count()

    # r08 phrase-search setup (gated: the deduped corpus + compacted
    # index per scale cost minutes at 6M docs — built only when the
    # phrase legs are requested or the full run executes)
    only_early = set(sys.argv[1:])
    if not only_early or only_early & {
        "q_phrase_scan", "q_phrase_indexed",
        # the r09 crossover + compaction legs reuse the deduped phrase
        # corpus / its raw index; the r10 long-doc legs build on the
        # same corpus
        "q_contam_mirror_scan", "q_contam_mirror_indexed",
        "q_contam_long_scan", "q_contam_long_indexed",
        "q_phrase_long_scan", "q_phrase_long_indexed",
        "q_compact_full_512", "q_compact_incr_batch",
        # r13: the MaxScore A/B reads the same compacted phrase_idx
        "q_bm25_read_unpruned", "q_bm25_read_pruned",
        "q_bm25_sel_batch_unpruned", "q_bm25_sel_batch_pruned",
    }:
        from couch_to_postgres_spark.streaming.search_stream import (
            compact_index,
            search_index_batch,
        )

        rare_price = (
            spark.read.parquet(m1_path)
            .select(
                F.get_json_object("doc", "$.l_extendedprice").alias("p")
            )
            .first()["p"]
        )
        for scale_name, mpath in (
            ("sf0.1", m1_path),
            ("sf1(synth)", m10_path),
        ):
            t = scales[scale_name]
            cpath = os.path.join(tmp, f"phrase_corpus_{scale_name}")
            (
                spark.read.parquet(mpath)
                .select(
                    "id",
                    F.regexp_replace(
                        F.col("doc"), '[,:"{}]', " "
                    ).alias("text"),
                )
                .dropDuplicates(["id"])
                .write.mode("overwrite")
                .parquet(cpath)
            )
            raw = os.path.join(tmp, f"phrase_raw_{scale_name}")
            idx = os.path.join(tmp, f"phrase_idx_{scale_name}")
            pc = spark.read.parquet(cpath)
            search_index_batch(
                spark,
                raw,
                pc.select(
                    F.monotonically_increasing_id().alias("seq"),
                    F.col("id").alias("doc_id"),
                    F.lit(False).alias("deleted"),
                    "text",
                ),
                id_col="doc_id",
            )
            compact_index(spark, raw, idx, token_buckets=64)
            t["phrase_corpus"] = cpath
            t["phrase_idx"] = idx
            t["phrase_raw"] = raw
            t["rare_phrase"] = f"l_extendedprice {rare_price}"

    # r08 decontamination setup (gated like the phrase legs): a shingle
    # index per scale over the documents train split — the batch scan
    # re-shingles that split per run, the indexed probe reads live
    # postings tokens instead
    if not only_early or only_early & {
        "q_contamination_scan", "q_contamination_indexed",
    }:
        from couch_to_postgres_spark.extensions.text import hash_split
        from couch_to_postgres_spark.streaming.search_stream import (
            search_index_batch as _sib,
        )
        from couch_to_postgres_spark.streaming.stats_stream import (
            shingle_changes,
        )

        for scale_name in ("sf0.1", "sf1(synth)"):
            t = scales[scale_name]
            split = hash_split(t["docs"])
            sidx = os.path.join(tmp, f"decon_idx_{scale_name}")
            _sib(
                spark,
                sidx,
                shingle_changes(
                    split.filter(F.col("split") == "train").select(
                        F.col("doc_id").cast("long").alias("seq"),
                        "doc_id",
                        F.lit(False).alias("deleted"),
                        "text",
                    )
                ),
                id_col="doc_id",
            )
            t["decon_idx"] = sidx

    # r09 (VERDICT r08 #5): the decontamination CROSSOVER demonstrated at
    # the 600k/6M-doc mirror corpus, not extrapolated — SCALING.md r08
    # honestly reported the indexed path flat but losing in absolute
    # seconds at 5k-50k docs (fixed costs). Setup (untimed): a shingle
    # index per scale over the deduped phrase corpus; the EVAL set is
    # fixed (~500 docs of 1x corpus text) while train grows 10x — the
    # real benchmark-decontamination shape. The batch leg re-shingles
    # the train corpus per run (cost tracks corpus); the indexed leg
    # reads live postings tokens (cost tracks the index).
    if scales["sf0.1"].get("phrase_corpus") and (
        not only_early
        or only_early
        & {
            "q_contam_mirror_scan",
            "q_contam_mirror_indexed",
            "q_contam_mirror_dfs",
        }
    ):
        from couch_to_postgres_spark.streaming.search_stream import (
            compact_index_inplace as _cii_m,
        )
        from couch_to_postgres_spark.streaming.search_stream import (
            search_index_batch as _sib_m,
        )
        from couch_to_postgres_spark.streaming.stats_stream import (
            shingle_changes as _shch_m,
        )

        ev_path = os.path.join(tmp, "mirror_eval.parquet")
        (
            spark.read.parquet(scales["sf0.1"]["phrase_corpus"])
            .filter(F.abs(F.hash("id")) % 1200 == 3)
            .select(
                F.abs(F.hash("id")).cast("long").alias("doc_id"), "text"
            )
            .write.mode("overwrite")
            .parquet(ev_path)
        )
        for scale_name in ("sf0.1", "sf1(synth)"):
            t = scales[scale_name]
            midx = os.path.join(tmp, f"decon_mirror_idx_{scale_name}")
            _sib_m(
                spark,
                midx,
                _shch_m(
                    spark.read.parquet(t["phrase_corpus"]).select(
                        F.monotonically_increasing_id().alias("seq"),
                        F.col("id").alias("doc_id"),
                        F.lit(False).alias("deleted"),
                        "text",
                    )
                ),
                id_col="doc_id",
            )
            t["decon_mirror_idx"] = midx
            t["mirror_eval"] = ev_path
            # r10: a COMPACTED twin of the same index — base_is_live, so
            # contamination_from_index takes the vocab-sized dfs fast
            # path. The short-doc regime's r09 negative (postings ≈ text
            # bytes) is exactly what the dfs read sidesteps whenever the
            # corpus carries cross-doc shingle repetition.
            midx_c = os.path.join(tmp, f"decon_mirror_idx_c_{scale_name}")
            _sib_m(
                spark,
                midx_c,
                _shch_m(
                    spark.read.parquet(t["phrase_corpus"]).select(
                        F.monotonically_increasing_id().alias("seq"),
                        F.col("id").alias("doc_id"),
                        F.lit(False).alias("deleted"),
                        "text",
                    )
                ),
                id_col="doc_id",
            )
            _cii_m(
                spark, midx_c,
                token_buckets=64 if scale_name == "sf0.1" else 512,
            )
            t["decon_mirror_idx_c"] = midx_c
            extras.setdefault("contam_mirror_bytes", {})[scale_name] = {
                "text_parquet": _du_bytes(t["phrase_corpus"]),
                "base_postings": _du_bytes(
                    os.path.join(midx_c, "base", "postings")
                ),
                "base_dfs": _du_bytes(os.path.join(midx_c, "base", "dfs")),
            }

    # r10 (VERDICT r09 #3): the LONG-DOC decontamination regime. r09's
    # honest negative was measured on ~30-word docs, where the shingle
    # postings outweigh the corpus text (one fat row per (doc, shingle))
    # and both paths are train-scan-bound. The claim under test here is
    # the DECOMPOSITION, not a constant: the batch leg's cost tracks
    # corpus TEXT bytes; the indexed leg — via contamination_from_index's
    # r10 read-mostly fast path — tracks the compacted base's DFS table,
    # i.e. the distinct shingle VOCABULARY. Long docs with cross-doc
    # repetition (boilerplate/templates — here ~600-word docs built by
    # concatenating 20 mirror docs, whose small-domain fields repeat
    # shingles heavily, and whose 10x replicas repeat text verbatim) are
    # exactly the regime where vocab bytes fall below text bytes.
    # Synthetic caveat recorded with the results: the 10x corpus's vocab
    # is ~1x by construction (replicas repeat text), so the indexed
    # leg's flatness is the vocab-tracking claim at its extreme; real
    # web vocab grows ~Heaps-law sub-linearly, landing in between. Byte
    # accounting (text vs postings vs dfs parquet bytes, in extras)
    # keeps the story honest.
    if scales["sf0.1"].get("phrase_corpus") and (
        not only_early
        or only_early & {
            "q_contam_long_scan", "q_contam_long_indexed",
            "q_phrase_long_scan", "q_phrase_long_indexed",
        }
    ):
        from couch_to_postgres_spark.streaming.search_stream import (
            compact_index_inplace as _cii_l,
        )
        from couch_to_postgres_spark.streaming.search_stream import (
            search_index_batch as _sib_l,
        )
        from couch_to_postgres_spark.streaming.stats_stream import (
            shingle_changes as _shch_l,
        )

        GROUP_L = 20  # ~20 mirror docs -> one ~600-word training doc
        long_eval_path = os.path.join(tmp, "long_eval.parquet")
        for scale_name, n_b in (("sf0.1", 64), ("sf1(synth)", 512)):
            t = scales[scale_name]
            pc_l = spark.read.parquet(t["phrase_corpus"])
            k_groups = max(1, pc_l.count() // GROUP_L)
            lpath = os.path.join(tmp, f"longdocs_{scale_name}.parquet")
            (
                pc_l.groupBy(
                    F.pmod(F.abs(F.hash("id")), F.lit(k_groups))
                    .cast("long")
                    .alias("doc_id")
                )
                .agg(F.concat_ws(" ", F.collect_list("text")).alias("text"))
                # AQE coalesces the small agg output to ONE file, which
                # would serialize the scan leg's shingle explosion into
                # a single task at the small scale (measured 31 s for a
                # 10 MB corpus) — spread the stored corpus like any real
                # mirror is spread
                .repartition(64)
                .write.mode("overwrite")
                .parquet(lpath)
            )
            if scale_name == "sf0.1":
                # FIXED eval set (the benchmark-decontamination shape):
                # ~200 long docs of 1x corpus text, shared by both scales
                (
                    spark.read.parquet(lpath)
                    .filter(F.col("doc_id") % 150 == 3)
                    .write.mode("overwrite")
                    .parquet(long_eval_path)
                )
            lidx = os.path.join(tmp, f"long_shingle_idx_{scale_name}")
            _sib_l(
                spark,
                lidx,
                _shch_l(
                    spark.read.parquet(lpath).select(
                        F.col("doc_id").alias("seq"),
                        "doc_id",
                        F.lit(False).alias("deleted"),
                        "text",
                    )
                ),
                id_col="doc_id",
            )
            # compacted + tail-free => base_is_live => the indexed leg
            # reads the vocab-sized dfs, the exact r10 fast path
            _cii_l(spark, lidx, token_buckets=n_b)
            t["long_corpus"] = lpath
            t["long_idx"] = lidx
            t["long_eval"] = long_eval_path
            # r11 (VERDICT r10 #5): a WORD search index over the SAME
            # long corpus, for the phrase-probe economics in the
            # large-postings-per-doc regime (the shingle index above
            # serves contamination; phrase probes read word postings)
            lwidx = os.path.join(tmp, f"long_word_idx_{scale_name}")
            _sib_l(
                spark,
                lwidx,
                spark.read.parquet(lpath).select(
                    F.col("doc_id").alias("seq"),
                    "doc_id",
                    F.lit(False).alias("deleted"),
                    "text",
                ),
                id_col="doc_id",
            )
            _cii_l(spark, lwidx, token_buckets=n_b)
            t["long_word_idx"] = lwidx

        extras["contam_long_bytes"] = {
            sn: {
                "text_parquet": _du_bytes(scales[sn]["long_corpus"]),
                "base_postings": _du_bytes(
                    os.path.join(scales[sn]["long_idx"], "base", "postings")
                ),
                "base_dfs": _du_bytes(
                    os.path.join(scales[sn]["long_idx"], "base", "dfs")
                ),
            }
            for sn in ("sf0.1", "sf1(synth)")
        }

    # r09 (VERDICT r08 #2 at scale): full-rewrite compaction is corpus-
    # proportional (expect ratio ~ data ratio); bucket-scoped incremental
    # compaction folds one micro-batch into only its affected buckets.
    # BUCKET COUNT MUST SCALE WITH THE CORPUS (512 at 600k docs, 5120 at
    # 6M — the bounded-bucket-size discipline, same as IVF's √N cells):
    # with a FIXED count each bucket is corpus-proportional and
    # "affected buckets only" still grows with the corpus (first measure
    # of this leg at fixed 512: incr ratio 3.5 — the pruning was real
    # but the units it pruned to had grown 10x). With scaled counts a
    # 3-doc churn rewrites ~40-80 bounded buckets at EITHER scale, so
    # the incremental ratio isolates the skinny corpus-proportional
    # residue (doclen/dfs/meta + the column-pruned id scan).
    if scales["sf0.1"].get("phrase_raw") and (
        not only_early
        or only_early & {"q_compact_full_512", "q_compact_incr_batch"}
    ):
        from couch_to_postgres_spark.streaming.search_stream import (
            compact_index as _ci512,
        )

        # with the (token_bucket × id_sub=16) two-level layout the unit
        # count is the PRODUCT — 64×16=1024 units at 600k docs,
        # 512×16=8192 at 6M — so unit size stays bounded as the corpus
        # grows without exploding directory counts
        for scale_name, n_b in (("sf0.1", 64), ("sf1(synth)", 512)):
            t = scales[scale_name]
            idx512 = os.path.join(tmp, f"compact512_{scale_name}")
            _ci512(spark, t["phrase_raw"], idx512, token_buckets=n_b)
            t["idx512"] = idx512
            t["idx512_buckets"] = n_b
            t["churn_seq"] = [10**15]  # mutable per-call seq high-water

    # r11 (VERDICT r10 #1 at scale): the VECTOR index's compaction pair.
    # Corpus = the embeddings table replicated x300 (600k vs 6M 64-dim
    # vectors), fixed-anchor quantizer with the cell count scaling like
    # IVF's sqrt-N discipline (64 at 600k, 256 at 6M) so cell size stays
    # bounded. The full leg rewrites every live embedding (expect ratio ~
    # data ratio); the incremental leg ingests a 5-vector churn batch and
    # folds only its affected cell dirs + churned id buckets (expect
    # ~flat — the search index's r09/r10 shape, now on embedding-sized
    # state where the full rewrite hurts the most).
    if not only_early or only_early & {
        "q_vector_compact_full", "q_vector_compact_incr",
        "q_vector_query", "q_vector_query_churn", "q_hybrid_fused",
    }:
        from couch_to_postgres_spark.streaming.vector_stream import (
            compact_vector_index as _cvf,
        )
        from couch_to_postgres_spark.streaming.vector_stream import (
            init_vector_index as _ivi,
        )
        from couch_to_postgres_spark.streaming.vector_stream import (
            vector_index_batch as _vib,
        )

        VEC_MULT = 300
        for scale_name, v_cells in (("sf0.1", 64), ("sf1(synth)", 256)):
            t = scales[scale_name]
            vpath = os.path.join(tmp, f"vec_idx_{scale_name}")
            vecs = (
                t["emb"]
                .crossJoin(
                    spark.range(VEC_MULT).select(F.col("id").alias("rep"))
                )
                .select(
                    (
                        F.col("vec_id") + F.col("rep") * F.lit(100_000_000)
                    ).alias("vec_id"),
                    F.col("embedding").cast("array<double>").alias(
                        "embedding"
                    ),
                )
            )
            anchors = [
                [float(x) for x in r["embedding"]]
                for r in t["emb"]
                .filter(F.col("vec_id") % 97 < v_cells)  # spread anchors
                .orderBy("vec_id")
                .limit(v_cells)
                .collect()
            ]
            _ivi(spark, vpath, centroids=anchors)
            _vib(
                spark,
                vpath,
                vecs.select(
                    F.col("vec_id").alias("seq"),
                    "vec_id",
                    F.lit(False).alias("deleted"),
                    "embedding",
                ),
            )
            _cvf(spark, vpath)  # setup: lay the live-only v2 base
            t["vec_idx"] = vpath
            t["vec_seq"] = [10**15]
            t["vec_churn"] = vecs.limit(5).localCheckpoint(eager=True)
            # r12 (VERDICT r11 #1): the HYBRID fused read needs a
            # lexical twin over the SAME long-id corpus as the vector
            # index (the contract: one shared id space), so each vec
            # doc gets deterministic synthetic tokens — 3 "tokN"
            # vocabulary words (N = vec_id·{1,7,13} mod 1000, so a
            # term's postings slice is ~corpus/1000 docs) plus filler.
            # Built + compacted in setup (the standard amortization);
            # the timed leg is the fused read: two pruned index probes
            # overlapped on two driver threads + the driver-side RRF.
            from couch_to_postgres_spark.streaming.search_stream import (
                compact_index as _hci,
            )
            from couch_to_postgres_spark.streaming.search_stream import (
                search_index_batch as _hsib,
            )

            hyb_raw = os.path.join(tmp, f"hyb_sidx_raw_{scale_name}")
            hyb_sidx = os.path.join(tmp, f"hyb_sidx_{scale_name}")
            _hsib(
                spark,
                hyb_raw,
                vecs.select(
                    F.col("vec_id").alias("seq"),
                    F.col("vec_id").alias("doc_id"),
                    F.lit(False).alias("deleted"),
                    F.concat_ws(
                        " ",
                        F.concat(
                            F.lit("tok"),
                            F.pmod(F.col("vec_id"), F.lit(1000)),
                        ),
                        F.concat(
                            F.lit("tok"),
                            F.pmod(F.col("vec_id") * 7, F.lit(1000)),
                        ),
                        F.concat(
                            F.lit("tok"),
                            F.pmod(F.col("vec_id") * 13, F.lit(1000)),
                        ),
                        F.lit("common filler corpus words"),
                    ).alias("text"),
                ),
                id_col="doc_id",
            )
            _hci(spark, hyb_raw, hyb_sidx, token_buckets=64)
            t["hyb_sidx"] = hyb_sidx
        extras["vector_index_bytes"] = {
            sn: _du_bytes(
                os.path.join(scales[sn]["vec_idx"], "base", "cells")
            )
            for sn in ("sf0.1", "sf1(synth)")
        }

    def queries(t):
        mirror, docs, ev, emb = t["mirror"], t["docs"], t["events"], t["emb"]

        def cdc_apply():
            changes = mirror.select(
                F.monotonically_increasing_id().alias("seq"),
                "id", F.lit(False).alias("deleted"), "doc",
            )
            apply_changes(mirror.limit(0), changes, broadcast_changes=False).count()

        id_parts = F.split(F.col("id"), "-")
        q = {
            "q_group_count": lambda: Q.group_count(mirror, "l_returnflag").collect(),
            "q_key_expansion": lambda: Q.key_expansion(mirror, "l_returnflag").collect(),
            "q_cdc_apply": cdc_apply,
            "q_dedup_minhash": lambda: X_dedup.minhash_candidate_pairs(
                docs, num_bands=4
            ).count(),
            "q_near_dedup_e2e": lambda: X_dedup.near_dedup(
                docs, num_bands=8, rows_per_band=2, hash_family="km"
            ).count(),
            "q_pack": lambda: X_text.pack_documents(
                mirror.select(
                    # numeric doc id (pack range-buckets on it): 60-bit
                    # md5 prefix of the string id
                    F.conv(F.substring(F.md5("id"), 1, 15), 16, 10)
                    .cast("long")
                    .alias("doc_id"),
                    F.col("doc").alias("text"),
                ),
                budget=512,
            ).count(),
            "q_text_features": lambda: X_text.text_features(docs).count(),
            "q_sessionize": lambda: sessionize_batch(ev, 60).count(),
            "q_ann_topk": lambda: X_sim.cosine_topk(
                emb.filter(F.col("vec_id") < 5), emb, k=5
            ).collect(),
            "q_bm25": lambda: bm25_topk(
                mirror.select(
                    "id",
                    F.regexp_replace(F.col("doc"), '[,:"{}]', " ").alias(
                        "text"
                    ),
                ),
                # r12 fidelity fix: real doc-token vocabulary (the
                # synthetic lineitem has no l_shipmode, so the old
                # RAIL/TRUCK/AIR terms matched nothing)
                ["R", "42.0", "0.05"],
                k=20,
                id_col="id",
            ).count(),
            # r13 (VERDICT r12 #1): the from-index read's
            # df-proportionality, measured head-to-head at 1x/10x over
            # the compacted phrase_idx (same corpus, mixed-df batch).
            # The UNPRUNED full path ranks every (query, posting) pair
            # — its work tracks Σ_q Σ_t df. The PRUNED leg runs the
            # per-query cost gate: queries with a provably skippable
            # cohort engage MaxScore (phase B reads ~candidates,
            # rescore ranks ~candidates), the rest ride the full path
            # — the claim is pruned ≤ unpruned everywhere and
            # materially below on the engaged share. Results are
            # bit-identical by construction (exactness pinned in
            # test_search_stream's maxscore suite).
            "q_bm25_read_unpruned": lambda: _bm25_from_idx(
                spark, t["phrase_idx"], pruned=False
            ),
            "q_bm25_read_pruned": lambda: _bm25_from_idx(
                spark, t["phrase_idx"], pruned=True
            ),
            "q_bm25_sel_batch_unpruned": lambda: _bm25_sel_batch(
                spark, t["phrase_idx"], pruned=False
            ),
            "q_bm25_sel_batch_pruned": lambda: _bm25_sel_batch(
                spark, t["phrase_idx"], pruned=True
            ),
            "q_cdc_chunks": lambda: X_text.cdc_chunk_documents(docs).count(),
            "q_entropy": lambda: X_text.unigram_entropy(docs).count(),
            # r04: QA-suite heavy hitters (VERDICT #5) — each shuffles a
            # corpus-shingle-proportional set; ratios must stay ~linear
            "q_novelty": lambda: X_text.novelty_curve(docs).count(),
            "q_containment": lambda: X_dedup.ngram_containment(
                docs,
                X_dedup.minhash_candidate_pairs(docs, num_bands=4),
            ).count(),
            "q_boilerplate": lambda: X_dedup.boilerplate_score(docs).count(),
            # r05: incremental SemDeDup — the SAME 20-vector batch admitted
            # against the 1x vs 10x live index (touched-cells-only scan);
            # a corpus-proportional ratio here would falsify the
            # O(batch · cell) admission-cost claim
            "q_semdedup_incr": lambda: X_dedup.semantic_dedup_incremental(
                spark,
                t["semdedup_idx"],
                emb.filter(F.col("vec_id") < 20),
                threshold=0.35,
            ).count(),
            # r06: index-answered corpus-QA readers (VERDICT r05 #4) —
            # the O(index) report claim, measured: cost must track the
            # postings/attrs state (10x here, since the replica word
            # tags disjoint the vocab), never corpus-text re-tokenize
            "q_kl_from_index": lambda: kl_by_source_from_index(
                spark, t["stats_idx"]
            ).count(),
            "q_vocab_growth_from_index": lambda: vocab_growth_from_index(
                spark, t["stats_idx"], bucket_width=100
            ).count(),
            "q_vocab_growth_by_source": lambda:
            vocab_growth_by_group_from_index(
                spark, t["stats_idx"], bucket_width=100
            ).count(),
            # r06 session-2 families: line hygiene is a pure map + one
            # skew-free doc-key aggregate (expect ~linear); the KMV
            # sketch shuffles only k-length arrays (expect strongly
            # sub-linear); content_diff shuffles (id, fp) pairs only
            # (expect ~linear in id count, independent of doc width)
            "q_gopher_rules": lambda: X_lines.gopher_rules(docs).count(),
            "q_bottomk_sketch": lambda: X_sketch.bottomk_sketch(
                docs.select(
                    "source",
                    F.explode(
                        X_dedup.word_shingles("text", 3)
                    ).alias("shingle"),
                ),
                "source",
                F.col("shingle"),
                k=64,
            ).count(),
            "q_content_diff": lambda: content_diff(
                mirror,
                mirror.filter(
                    F.substring(F.md5("id"), 1, 1) != F.lit("0")
                ).withColumn(
                    "doc",
                    F.when(
                        F.substring(F.md5("id"), 2, 1) == F.lit("0"),
                        F.concat(F.col("doc"), F.lit("x")),
                    ).otherwise(F.col("doc")),
                ),
            ).count(),
            # r07: line-hygiene family's first scale rows (VERDICT r06
            # #2). C4 is a pure codegen map; the line-LM's count tables
            # are vocab-bounded (replica word tags disjoint the vocab, so
            # the tables grow 10x too — worst case) and its occurrence-
            # stream joins ride AQE: broadcast when small, skew-split on
            # the Zipf keys when not
            "q_c4_clean": lambda: X_lines.c4_line_clean(
                docs.select(
                    "doc_id", X_lines.as_lines("text").alias("text")
                )
            ).count(),
            "q_line_lm_clean": lambda: X_lines.line_lm_clean(
                docs.select(
                    "doc_id", X_lines.as_lines("text").alias("text")
                )
            ).count(),
            # r08: the join-bytes lever (VERDICT r07 #6) — same query,
            # occurrence-stream join keyed on xxhash64(bg) with the
            # string dropped before the shuffle. If the 10x ratio does
            # not move vs q_line_lm_clean, the family's floor is the
            # bigram count aggregation (vocab-sized partials via
            # map-side combine), not join bytes
            "q_line_lm_hashed": lambda: X_lines.line_lm_clean(
                docs.select(
                    "doc_id", X_lines.as_lines("text").alias("text")
                ),
                hashed_keys=True,
            ).count(),
            # r07: trending reader (VERDICT r06 #6) — O(index) claim,
            # grouped on the live postings split recent-vs-before
            "q_trending": lambda: trending_terms_from_index(
                spark, t["stats_idx"], split_seq=t["trend_split"], k=25
            ).count(),
            # r07: the DSIR-selection fix at volume (VERDICT r06 #1) —
            # the threshold-refinement cut on a 600k/6M-row scored
            # table at k = 10% of rows (10x data -> 10x k). TakeOrdered
            # here would heap-merge partitions x k rows on the driver;
            # the cut's driver state is a quantile sketch + 2 scalars
            # at either scale
            "q_topk_cut_bigk": lambda: select_topk_by_key(
                mirror.select(
                    "id",
                    (
                        F.conv(F.substring(F.md5("id"), 1, 15), 16, 10)
                        .cast("double")
                        / F.lit(1e18)
                    ).alias("score"),
                ),
                "score",
                k=t["mirror_rows"] // 10,
                id_col="id",
            ).count(),
        }
        # r08: index-assisted phrase search at volume (only when the
        # phrase setup ran — see the `want` gate). The scan's cost is
        # corpus-proportional (position-verify HOF on every doc); the
        # indexed probe reads the rare term's postings bucket + the
        # skinny doclen, so its 10x ratio should sit far below the
        # scan's
        if t.get("phrase_idx"):
            from couch_to_postgres_spark.extensions.phrase import (
                phrase_hits,
                phrase_hits_indexed,
            )

            pc = spark.read.parquet(t["phrase_corpus"])
            q["q_phrase_scan"] = lambda: phrase_hits(
                pc, t["rare_phrase"], id_col="id"
            ).count()
            q["q_phrase_indexed"] = lambda: phrase_hits_indexed(
                spark, t["phrase_idx"], pc, t["rare_phrase"],
                id_col="id", index_id_col="doc_id",
            ).count()
        # r09: compaction at scale. The full leg rewrites the whole base
        # into a fresh sibling (corpus-proportional, ratio ~ 10); the
        # incremental leg is self-contained — ingest ONE 3-doc churn
        # micro-batch (new seqs per call) and fold it into only its
        # affected buckets (ratio should sit far below the full leg's;
        # the O(batch) ingest inside the leg is identical at both
        # scales, so it cancels in the comparison)
        if t.get("idx512"):
            from couch_to_postgres_spark.streaming.search_stream import (
                compact_index as _ci,
                compact_index_incremental as _cii,
                search_index_batch as _sib_c,
            )

            pc512 = spark.read.parquet(t["phrase_corpus"])
            churn_docs = pc512.select("id", "text").limit(3).localCheckpoint(
                eager=True
            )

            def _compact_full():
                _ci(
                    spark, t["idx512"],
                    os.path.join(tmp, "compact512_out"),
                    token_buckets=t["idx512_buckets"],
                )

            def _compact_incr_batch():
                t["churn_seq"][0] += 1_000_000
                seq0 = t["churn_seq"][0]
                _sib_c(
                    spark, t["idx512"],
                    churn_docs.select(
                        (F.lit(seq0) + F.abs(F.hash("id"))
                         % 1_000_000).alias("seq"),
                        F.col("id").alias("doc_id"),
                        F.lit(False).alias("deleted"),
                        F.concat("text", F.lit(" churnscale rail")).alias(
                            "text"
                        ),
                    ),
                    id_col="doc_id",
                )
                out = _cii(spark, t["idx512"])
                assert out["mode"] == "incremental", out

            q["q_compact_full_512"] = _compact_full
            q["q_compact_incr_batch"] = _compact_incr_batch
        # r11: the VECTOR twin's compaction pair — full live rewrite
        # (corpus-proportional, embedding-sized) vs the affected-cell
        # fold over a 5-vector churn (churn-proportional; the assert
        # pins that the leg really measured the incremental path)
        if t.get("vec_idx"):
            from couch_to_postgres_spark.streaming.vector_stream import (
                compact_vector_index as _cvf_q,
            )
            from couch_to_postgres_spark.streaming.vector_stream import (
                compact_vector_index_incremental as _cvi_q,
            )
            from couch_to_postgres_spark.streaming.vector_stream import (
                vector_index_batch as _vib_q,
            )

            def _vector_full():
                _cvf_q(spark, t["vec_idx"])

            def _vector_incr():
                t["vec_seq"][0] += 1_000_000
                vseq0 = t["vec_seq"][0]
                _vib_q(
                    spark,
                    t["vec_idx"],
                    t["vec_churn"].select(
                        (
                            F.lit(vseq0)
                            + F.pmod(F.col("vec_id"), F.lit(1_000_000))
                        ).alias("seq"),
                        "vec_id",
                        F.lit(False).alias("deleted"),
                        "embedding",
                    ),
                )
                vout = _cvi_q(spark, t["vec_idx"])
                assert vout["mode"] == "incremental", vout

            q["q_vector_compact_full"] = _vector_full
            q["q_vector_compact_incr"] = _vector_incr

            # the QUERY path at scale: nprobe=4 cells opened by name.
            # Cell counts grow sqrt-N-style with the corpus (64 -> 256),
            # so the probed slice grows ~sqrt(data) (600k/64*4=37.5k
            # rows vs 6M/256*4=93.7k — ~2.5x at 10x data), and the
            # plan never lists or scans unprobed dirs — expect a ratio
            # well under the data ratio
            from couch_to_postgres_spark.streaming.vector_stream import (
                vector_topk_live as _vtl_q,
            )

            vq = t["emb"].filter(F.col("vec_id") < 3).select(
                (F.col("vec_id") + F.lit(10**12)).alias("vec_id"),
                F.col("embedding").cast("array<double>").alias(
                    "embedding"
                ),
            ).localCheckpoint(eager=True)

            def _vector_query():
                _vtl_q(
                    spark, t["vec_idx"], vq, k=10, nprobe=4
                ).collect()

            q["q_vector_query"] = _vector_query

            # r12: the BETWEEN-FOLDS read shape — a churn batch lands
            # (tail + non-fast path) and the query pays replay dedup +
            # the seq-wins liveness join against the GLOBAL skinny
            # sidecar merge (one partial-aggregated columnar pass). A
            # slice-scoped per-query liveness read (base placements
            # opened by id_bucket dir name for just the probed slice)
            # was built and A/B'd at 600k AND 6M rows in r12 and LOST
            # every cell — hashed ids defeat bucket-level pruning past
            # ~the bucket count, and the scoped path added 4-6 driver
            # actions per query; it was reverted with the evidence in
            # SCALING.md r12 ("scoped-read negative").
            def _vector_query_churn():
                t["vec_seq"][0] += 1_000_000
                vseq0 = t["vec_seq"][0]
                _vib_q(
                    spark,
                    t["vec_idx"],
                    t["vec_churn"].select(
                        (
                            F.lit(vseq0)
                            + F.pmod(F.col("vec_id"), F.lit(1_000_000))
                        ).alias("seq"),
                        "vec_id",
                        F.lit(False).alias("deleted"),
                        "embedding",
                    ),
                )
                _vtl_q(
                    spark, t["vec_idx"], vq, k=10, nprobe=4
                ).collect()

            q["q_vector_query_churn"] = _vector_query_churn

        # r12 (VERDICT r11 #1): the fused hybrid read at scale — the
        # BM25 probe (token buckets by name, fast path) and the ANN
        # probe (nprobe cell dirs by name) run on two driver threads,
        # RRF fuses driver-side over two query×depth leg results.
        # Expect ~flat: both legs' read slices are query-proportional
        # (postings ~corpus/1000 per term; probed cells sqrt-N-bounded)
        # and the fuse is corpus-independent by construction.
        if t.get("hyb_sidx"):
            from couch_to_postgres_spark.extensions.hybrid import (
                hybrid_topk_live as _htl,
            )

            h_terms = spark.createDataFrame(
                [
                    (10**12 + 1, "tok17"),
                    (10**12 + 1, "tok401"),
                    (10**12 + 1, "tok733"),
                    (10**12 + 2, "tok88"),
                    (10**12 + 2, "tok256"),
                    (10**12 + 2, "tok911"),
                ],
                "query_id long, term string",
            )
            h_vq = t["emb"].filter(F.col("vec_id") < 2).select(
                (F.col("vec_id") + F.lit(10**12 + 1)).alias("vec_id"),
                F.col("embedding").cast("array<double>").alias(
                    "embedding"
                ),
            ).localCheckpoint(eager=True)

            def _hybrid_fused():
                got = _htl(
                    spark, t["hyb_sidx"], t["vec_idx"], h_terms, h_vq,
                    k=10, depth=50, nprobe=4,
                ).collect()
                assert got, "hybrid fused read returned nothing"

            q["q_hybrid_fused"] = _hybrid_fused
        # r09 crossover: same pair over the 600k/6M MIRROR corpus with a
        # FIXED eval set — the batch leg re-shingles the growing train
        # corpus per run, the indexed leg reads live postings tokens
        if t.get("decon_mirror_idx"):
            from couch_to_postgres_spark.extensions.text import (
                contamination as _contam_m,
            )
            from couch_to_postgres_spark.streaming.stats_stream import (
                contamination_from_index as _cfi_m,
            )

            pc_m = spark.read.parquet(t["phrase_corpus"]).select(
                F.col("id").alias("doc_id"), "text"
            )
            ev_m = spark.read.parquet(t["mirror_eval"])
            # .count() would let Catalyst ELIMINATE the train-side join
            # entirely (left join with a unique right key whose columns
            # feed only the agg values, and count() prunes the values) —
            # measured: 0.4 s "re-shingling" 6M docs. Summing n_overlap
            # forces the train side to actually compute.
            q["q_contam_mirror_scan"] = lambda: _contam_m(
                pc_m, ev_m
            ).agg(F.sum("n_overlap")).collect()
            q["q_contam_mirror_indexed"] = lambda: _cfi_m(
                spark, t["decon_mirror_idx"], ev_m
            ).agg(F.sum("n_overlap")).collect()
            if t.get("decon_mirror_idx_c"):
                # same values off the COMPACTED twin: base_is_live, so
                # the train side reads the vocab-sized dfs (r10)
                q["q_contam_mirror_dfs"] = lambda: _cfi_m(
                    spark, t["decon_mirror_idx_c"], ev_m
                ).agg(F.sum("n_overlap")).collect()
        # r10 long-doc regime: batch cost tracks corpus TEXT, indexed
        # cost tracks the compacted dfs VOCAB (read-mostly fast path) —
        # .agg(sum) forces the train join (the r09 count() trap)
        if t.get("long_corpus"):
            from couch_to_postgres_spark.extensions.text import (
                contamination as _contam_l,
            )
            from couch_to_postgres_spark.streaming.stats_stream import (
                contamination_from_index as _cfi_l,
            )

            ld_corp = spark.read.parquet(t["long_corpus"])
            ld_eval = spark.read.parquet(t["long_eval"]).select(
                (F.col("doc_id") + 10**9).alias("doc_id"), "text"
            )
            q["q_contam_long_scan"] = lambda: _contam_l(
                ld_corp, ld_eval, id_col="doc_id"
            ).agg(F.sum("n_overlap")).collect()
            q["q_contam_long_indexed"] = lambda: _cfi_l(
                spark, t["long_idx"], ld_eval
            ).agg(F.sum("n_overlap")).collect()
        # r11: the phrase-probe economics in the LONG-DOC regime
        # (~600 words/doc — per-doc postings are large, candidate
        # verification re-reads long texts). The scan position-verifies
        # every doc; the probe reads the rarest word's postings bucket
        # and verifies only candidates
        if t.get("long_word_idx"):
            from couch_to_postgres_spark.extensions.phrase import (
                phrase_hits as _ph_l,
            )
            from couch_to_postgres_spark.extensions.phrase import (
                phrase_hits_indexed as _phi_l,
            )

            ld_pc = spark.read.parquet(t["long_corpus"])
            q["q_phrase_long_scan"] = lambda: _ph_l(
                ld_pc, t["rare_phrase"], id_col="doc_id"
            ).count()
            q["q_phrase_long_indexed"] = lambda: _phi_l(
                spark, t["long_word_idx"], ld_pc, t["rare_phrase"],
                id_col="doc_id", index_id_col="doc_id",
            ).count()
        # r08: decontamination — batch re-shingles the train split per
        # run; the indexed probe reads live postings tokens (O(index))
        if t.get("decon_idx"):
            from couch_to_postgres_spark.extensions.text import (
                contamination,
                hash_split,
            )
            from couch_to_postgres_spark.streaming.stats_stream import (
                contamination_from_index,
            )

            # NB: must NOT rebind `ev` — the q_sessionize lambda above
            # closed over `ev` as t["events"]; a rebind here would make
            # it sessionize the docs split (no user_id/ts —
            # AnalysisException at warm time on the canonical full run)
            split = hash_split(docs)
            tr = split.filter(F.col("split") == "train")
            ev_docs = split.filter(F.col("split") == "eval")
            # sum(n_overlap), not count(): see the mirror pair's comment
            # (count() lets Catalyst eliminate the train-side join)
            q["q_contamination_scan"] = lambda: contamination(
                tr, ev_docs
            ).agg(F.sum("n_overlap")).collect()
            q["q_contamination_indexed"] = lambda: contamination_from_index(
                spark, t["decon_idx"], ev_docs
            ).agg(F.sum("n_overlap")).collect()
        return q

    # optional subset: `python tools/bench_scaling.py q_a q_b` times only
    # the named legs (focused re-measures; the canonical run is all legs)
    only = set(sys.argv[1:])

    def selected(t):
        qs = queries(t)
        return {n: f for n, f in qs.items() if not only or n in only}

    # warm each query's pipeline once at the SMALL scale (JIT/codegen),
    # then time small and large in the same process
    for fn in selected(scales["sf0.1"]).values():
        fn()

    results: dict[str, dict] = {}
    for scale, t in scales.items():
        for name, fn in selected(t).items():
            os.sync()
            t0 = time.time()
            fn()
            results.setdefault(name, {})[scale] = round(time.time() - t0, 2)

    for name, r in results.items():
        r["ratio"] = round(r["sf1(synth)"] / max(r["sf0.1"], 1e-9), 1)

    out = {
        "metric": "scaling_sf01_to_sf1",
        "data_ratio": REPLICAS,
        "queries": results,
        "rows": {
            "lineitem_docs": [600_000 * 1, 600_000 * REPLICAS],
            "documents": [docs1.count(), docs1.count() * REPLICAS],
        },
        "note": "ratio ~= data_ratio (10) = linear scaling; sub-linear is "
        "fixed-overhead amortization, super-linear is a scale bug",
    }
    if extras:
        out["extras"] = extras
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
