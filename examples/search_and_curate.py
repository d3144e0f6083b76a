"""Worked example: the round-3 curation toolkit end to end over the
`documents` corpus.

1. corpus health: Zipf slope + per-doc entropy + per-source language/
   contamination diagnostics (should this corpus component ship at all?),
2. overlap map: which sources duplicate each other (pick cross-dedup
   targets from evidence, not guesswork),
3. dedup with QUALITY keep: near-dup clusters keep their longest member,
4. PII triage: detection counts before the redaction pass,
5. exact stratified eval split (lang × length), then a weighted sample
   of the training side proportional to length,
6. BM25 retrieval over the curated corpus — single query and a query
   table in one plan.

Run: python examples/search_and_curate.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from couch_to_postgres_spark.extensions import dedup as D  # noqa: E402
from couch_to_postgres_spark.extensions import text as T  # noqa: E402
from couch_to_postgres_spark.extensions.sampling import (  # noqa: E402
    stratified_split,
    weighted_sample_topn,
)
from couch_to_postgres_spark.extensions.search import (  # noqa: E402
    bm25_topk,
    bm25_topk_batch,
)
from couch_to_postgres_spark.session import get_spark, load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark(app_name="search-and-curate")
    docs = load_table(spark, SF_DIR, "documents")

    # 1 — corpus health
    z = T.zipf_slope(docs).collect()[0]
    print(f"zipf slope {z['slope']} (natural text ~ -1) over {z['n_types']} types")
    ent = T.unigram_entropy(docs)
    low = ent.filter(F.col("entropy") < 2.0).count()
    print(f"{low} low-entropy (degenerate) docs")
    split = T.hash_split(docs)
    leak = T.contamination_by_group(
        split.filter(F.col("split") == "train"),
        split.filter(F.col("split") == "eval"),
        "source",
    )
    worst = leak.orderBy(F.col("overlap_frac").desc()).first()
    print(f"most-contaminated source: {worst['source']} @ {worst['overlap_frac']}")

    # 1b — deeper diagnostics: boilerplate burden, composition balance,
    # drift between the split halves
    bp = D.boilerplate_score(docs)
    heavy = bp.filter(F.col("boilerplate_frac") > 0.5).count()
    print(f"{heavy} docs are >50% shared boilerplate")
    gini = T.gini_concentration(docs).collect()[0]
    print(f"source concentration gini {gini['gini']} over {gini['n_groups']} sources")
    drift = T.ks_drift(
        split.filter(F.col("split") == "train"),
        split.filter(F.col("split") == "eval"),
    ).collect()[0]
    print(f"train/eval length-distribution KS {drift['ks']}")

    # 2 — which sources overlap enough to cross-dedup
    overlap = D.source_overlap(docs)
    top = overlap.orderBy(F.col("jaccard").desc()).limit(3).collect()
    for r in top:
        print(f"overlap {r['group_a']}~{r['group_b']}: jaccard {r['jaccard']}")

    # 3 — near-dedup keeping the LONGEST member of each cluster
    curated = D.near_dedup(
        docs, jaccard_threshold=0.6, num_bands=4, keep_score_col="n_chars"
    )
    print(f"dedup: {docs.count()} -> {curated.count()} docs (quality-keep)")

    # 4 — PII triage before the redaction pass
    pii = T.pii_scan(curated)
    flagged = pii.filter(F.col("n_pii_total") > 0).count()
    print(f"{flagged} docs carry PII-shaped matches")

    # 5 — exact stratified split, then weighted-sample the training side
    strata = curated.withColumn("len_bucket", F.expr("n_chars div 500"))
    parts = stratified_split(strata, ["lang", "len_bucket"], eval_per_10=1)
    train_ids = parts.filter(F.col("split") == "train").select("doc_id")
    train = curated.join(train_ids, "doc_id", "left_semi")
    epoch = weighted_sample_topn(train, "n_chars", n=100)
    print(f"epoch sample: {epoch.count()} docs, weighted by length")

    # 6 — BM25 retrieval over the curated corpus
    hits = bm25_topk(curated, ["spark", "merge", "window"], k=5).collect()
    print("top docs for [spark merge window]:",
          [(r["doc_id"], r["score"]) for r in hits])
    qtab = spark.createDataFrame(
        [(1, "spark"), (1, "merge"), (2, "customer"), (2, "vector")],
        "query_id int, term string",
    )
    batch = bm25_topk_batch(curated, qtab, k=3)
    for r in batch.collect():
        print(f"q{r['query_id']} #{r['rank']}: doc {r['doc_id']} @ {r['score']}")

    spark.stop()


if __name__ == "__main__":
    main()
