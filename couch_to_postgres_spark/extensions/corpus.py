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


def assign_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    num_shards: int = 8,
    salt: str = "shard1",
) -> DataFrame:
    """Deterministic pseudo-random shard assignment:
    ``shard = int(md5(salt:id)[:8], 16) % num_shards``, plus the full md5
    as ``shard_key`` (the in-shard training order). Same contract as the
    other sampling/split primitives — a pure map of (id, salt), identical
    on any cluster size, partitioning, or engine, re-dealt by changing
    ``salt``."""
    key = F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    return df.withColumn(
        "shard", F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % num_shards
    ).withColumn("shard_key", key)


def shard_manifest(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_shards: int = 8,
    salt: str = "shard1",
) -> DataFrame:
    """Per-shard manifest of the export layout (without writing anything):
    ``(shard, n_docs, n_tokens, min_id, max_id)``. One scan, one shuffle on
    the tiny shard key; this is also the post-export audit query — compare
    it against the same rollup over the written files."""
    return _manifest_rollup(
        assign_shards(df, id_col, num_shards, salt), text_col, id_col
    )


def export_shards(
    df: DataFrame,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_shards: int = 8,
    salt: str = "shard1",
    max_rows_per_file: int | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Write the corpus as ``num_shards`` deterministic pseudo-random
    shards (``shard=K/`` directories), each internally ordered by
    ``shard_key`` — the layout a training loader consumes (shards map to
    loader workers; the in-shard order is the reproducible training order).
    ``fmt`` is ``parquet`` or ``json`` (JSONL, the common text-corpus
    interchange format).

    Plan shape at scale: ONE hash repartition on the shard id (the only
    shuffle), then ``sortWithinPartitions`` — a per-shard sort, never a
    global one. ``maxRecordsPerFile`` bounds individual files so a 100 TB
    export yields loader-friendly file sizes regardless of executor
    count. Returns the manifest of what was written."""
    if fmt not in ("parquet", "json"):
        raise ValueError(f"fmt must be 'parquet' or 'json', got {fmt!r}")
    assigned = assign_shards(df, id_col, num_shards, salt)
    writer = (
        assigned.repartition(num_shards, F.col("shard"))
        .sortWithinPartitions("shard", "shard_key")
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if max_rows_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_rows_per_file)
    getattr(writer, fmt)(out_dir)
    spark = df.sparkSession
    return _manifest_rollup(getattr(spark.read, fmt)(out_dir), text_col, id_col)


def _manifest_rollup(assigned: DataFrame, text_col: str, id_col: str) -> DataFrame:
    from couch_to_postgres_spark.extensions.text import token_count

    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(text_col)).alias("n_tokens"),
        F.min(id_col).alias("min_id"),
        F.max(id_col).alias("max_id"),
    )


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
