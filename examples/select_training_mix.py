"""Worked example: building a TRAINING MIXTURE from a raw corpus — the
target-aware selection + mixture-planning workflow a pretraining data
team runs before every training launch.

1. score every raw document against a small trusted target corpus with
   DSIR-style importance weights (hashed n-gram LMs; Xie et al. 2023),
2. keep the top-k most target-like documents,
3. plan a domain mixture over the kept set (`mix_report`: what the
   corpus HAS vs what the target composition can USE, binding group
   flagged),
4. materialize the largest feasible epoch at that mixture
   (`resample_to_mix` — exact quotas, deterministic md5 order, and at
   scale the threshold-refinement plan: no group ever funnels through
   one task),
5. carve an exact stratified eval split from the epoch
   (`stratified_split`) and prove the proportions.

Run: python examples/select_training_mix.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from couch_to_postgres_spark.extensions.sampling import (  # noqa: E402
    mix_report,
    resample_to_mix,
    stratified_split,
)
from couch_to_postgres_spark.extensions.selection import (  # noqa: E402
    dsir_importance,
    dsir_select,
)
from couch_to_postgres_spark.session import get_spark, load_table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark(app_name="select_training_mix")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "text"
    )

    # 1. score: the src0 slice plays the trusted target corpus
    target = docs.filter(F.col("source") == "src0")
    scored = dsir_importance(docs, target)
    print("== DSIR importance (top 5 / bottom 3) ==")
    for r in scored.orderBy(F.col("log_ratio").desc()).limit(5).collect():
        print(f"  doc {r['doc_id']}: log_ratio={r['log_ratio']:+.4f} "
              f"({r['n_grams']} n-grams)")
    for r in scored.orderBy("log_ratio").limit(3).collect():
        print(f"  doc {r['doc_id']}: log_ratio={r['log_ratio']:+.4f}")

    # 2. select the most target-like half of the corpus
    k = docs.count() // 2
    kept = dsir_select(docs, target, k=k).persist()
    comp = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    print(f"\n== kept top-{k}: composition shift toward the target ==")
    print(f"  src0 share: {comp.get('src0', 0)}/{k} "
          f"(corpus-wide it is 1/{docs.select('source').distinct().count()})")

    # 3. plan the mixture BEFORE committing to it
    weights = {"src0": 0.5, "src1": 0.25, "src2": 0.25}
    print("\n== mix_report: has vs usable at 0.5/0.25/0.25 ==")
    for r in mix_report(kept, weights).collect():
        tag = "  <-- binding (grow THIS source to grow the epoch)" \
            if r["binding"] else ""
        print(f"  {r['source']}: n={r['n_rows']} quota={r['quota']} "
              f"surplus={r['surplus']}{tag}")

    # 4. materialize the largest feasible epoch at that mixture
    epoch = resample_to_mix(kept, weights).persist()
    got = {
        r["source"]: r["n"]
        for r in epoch.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    print(f"\n== epoch composition (exact quotas): {got} ==")

    # 5. exact stratified eval split over (source, lang)
    split = stratified_split(epoch, ["source", "lang"], eval_per_10=2)
    print("\n== stratified 20% eval split (exact per stratum) ==")
    for r in (
        split.groupBy("source", "split")
        .agg(F.count("*").alias("n"))
        .orderBy("source", "split")
        .collect()
    ):
        print(f"  {r['source']}/{r['split']}: {r['n']}")

    kept.unpersist()
    epoch.unpersist()
    spark.stop()
    print("\nselect_training_mix: done")


if __name__ == "__main__":
    main()
