"""End-to-end training-corpus preparation: the composition a data pipeline
actually ships — dedup → quality gate → deterministic split → sequence
packing — as one declarative plan.

Every stage is an already-oracled operator (`x_dedup_exact`,
`x_quality_filter`, `x_hash_split`, `x_pack`); this module chains them so
the full pipeline itself stays one Catalyst plan (stages fuse: the quality
gate's features never materialize, the split filter is map-side) and is
verified end-to-end against a single composed DuckDB oracle
(`x_train_pipeline`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from couch_to_postgres_spark.extensions.dedup import (
    dedup_clusters,
    exact_dedup,
    minhash_candidate_pairs,
    ngram_jaccard,
)
from couch_to_postgres_spark.extensions.text import (
    hash_split,
    pack_documents,
    quality_filter,
)


def prepare_training_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 256,
    train_frac: float = 0.8,
    salt: str = "split1",
    min_words: int = 5,
    max_punct_ratio: float = 0.3,
    num_buckets: int = 32,
) -> DataFrame:
    """Exact-dedup the corpus, keep documents passing the quality gates,
    take the deterministic train split, and lay it out as packed sequences
    (global token offsets at ``budget`` tokens per pack).

    Returns the pack layout frame: ``(id, n_tokens, tok_start, pack_id,
    pack_offset, n_packs)`` for every kept training document."""
    deduped = exact_dedup(df, text_col, id_col)
    kept_ids = quality_filter(
        deduped, text_col, id_col, min_words, max_punct_ratio
    ).select(id_col)
    kept = deduped.join(kept_ids, on=id_col, how="left_semi")
    train = hash_split(kept, id_col, train_frac, salt).filter(
        F.col("split") == "train"
    )
    return pack_documents(train, text_col, id_col, budget, num_buckets)


def leakage_safe_split(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_frac: float = 0.8,
    salt: str = "split1",
    jaccard_threshold: float = 0.8,
    num_bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Train/eval split in which near-duplicate documents can NEVER
    straddle the boundary — the leakage `hash_split` alone cannot prevent
    (a near-copy of a training document landing in eval inflates every
    metric it touches).

    The split key is the document's near-dup CLUSTER representative (min
    id of its verified-duplicate component; itself for singletons), so an
    entire duplicate cluster moves as one unit. Emits
    ``(id, cluster_id, split)``.

    Plan shape: clustering work is pair-set-proportional (LSH cut first);
    the corpus itself sees one left join against the (small) cluster map
    plus the map-side md5 threshold."""
    candidates = minhash_candidate_pairs(
        df, text_col, id_col, num_bands, shingle_n
    )
    verified = ngram_jaccard(df, candidates, text_col, id_col, shingle_n).filter(
        F.col("jaccard") >= jaccard_threshold
    )
    clusters = dedup_clusters(verified, id_col)
    # same stats blindness as near_dedup's drop set: the cluster map exits
    # localCheckpoint without size stats — broadcast it explicitly so the
    # corpus side never shuffles
    withc = df.join(F.broadcast(clusters), on=id_col, how="left").withColumn(
        "cluster_id", F.coalesce(F.col("cluster"), F.col(id_col))
    )
    key = F.md5(F.concat_ws(":", F.lit(salt), F.col("cluster_id").cast("string")))
    thr = format(int(train_frac * 65536), "04x")
    return withc.select(
        F.col(id_col),
        "cluster_id",
        F.when(F.substring(key, 1, 4) < F.lit(thr), F.lit("train"))
        .otherwise(F.lit("eval"))
        .alias("split"),
    )
