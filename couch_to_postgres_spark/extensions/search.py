"""Full-text relevance search over the document corpus (BM25).

The reference's query surface stops at filters/aggregates over jsonb
(README.md:102-240); a training-data engine also needs RANKED retrieval
— "find the documents most relevant to these terms" — for eval-set
curation, targeted decontamination, and corpus inspection. Okapi BM25 is
the standard lexical scorer; this is the distributed, oracle-checkable
form.

Plan shape at 100 TB (the reason this looks the way it does):

* tokens are filtered to the QUERY TERMS **before** any shuffle — the
  corpus-wide token explosion reduces map-side to only matching rows, so
  the (doc, token) aggregation shuffles query-hit rows, not the corpus;
* document lengths and corpus stats (N, avgdl, per-term df) are tiny
  aggregates broadcast back into the scoring join;
* ranking sorts on the ROUNDED score (4 dp, doc-id tie-break) so results
  are reproducible across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from couch_to_postgres_spark.extensions.text import _words


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents by Okapi BM25 for a bag of query terms.

    score(D) = Σ_t idf(t) · tf(t,D)·(k1+1) / (tf(t,D) + k1·(1−b+b·|D|/avgdl)),
    idf(t) = ln((N − df(t) + 0.5)/(df(t) + 0.5) + 1)   (the +1 form, so
    idf stays positive even for terms in more than half the corpus).

    Returns (id, score, rank) — ties broken by id ascending on the
    rounded score. Documents matching no term are absent (score 0).
    """
    if not query_terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    terms = [t for t in query_terms]
    words = _words(text_col)
    # per-doc length (ALL words, not just matches — BM25's length norm).
    # Persisted: it feeds both the avgdl aggregate and the scoring join,
    # and without the cache each branch re-tokenizes the corpus (plan
    # audit: 4 parquet scans -> 2). Skinny rows (id, double); released
    # below once the top-k materializes.
    doclen = df.select(
        F.col(id_col), F.size(words).cast("double").alias("dl")
    ).persist()
    # corpus stats: one skinny agg, broadcast into the scoring join
    stats = doclen.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
    )
    # token stream pruned to query terms BEFORE the shuffle
    tok = df.select(
        F.col(id_col),
        F.explode(F.filter(words, lambda w: w.isin(terms))).alias("token"),
    )
    # query-hit-proportional (tiny); feeds both df(t) and the scoring join
    tf = tok.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    ).persist()
    dft = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("double").alias("dft")
    )
    idf = F.log(
        (F.col("n") - F.col("dft") + F.lit(0.5))
        / (F.col("dft") + F.lit(0.5))
        + F.lit(1.0)
    )
    contrib = idf * (
        F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    # Per-term contributions are rounded to 6 dp and summed as DECIMAL:
    # decimal addition is exact and order-independent, so the per-doc
    # score does not depend on which order the aggregate consumes the
    # term rows (double summation is non-associative — a cross-engine /
    # cross-partitioning hazard at the final round boundary).
    contrib_dec = F.round(contrib, 6).cast("decimal(18,6)")
    scored = (
        tf.join(F.broadcast(dft), "token")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.round(F.sum(contrib_dec), 4).cast("double").alias("score")
        )
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "score", F.col("rank").cast("long").alias("rank"))
    )
    # the result is k rows: materialize it eagerly (localCheckpoint) so
    # the caches above can release NOW instead of leaking across calls —
    # the same lifecycle discipline as near_dedup/dedup_clusters
    out = out.localCheckpoint(eager=True)
    doclen.unpersist()
    tf.unpersist()
    return out


def bm25_topk_batch(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    term_col: str = "term",
) -> DataFrame:
    """:func:`bm25_topk` for a whole QUERY TABLE at once — the eval-set
    retrieval shape (thousands of benchmark questions against a 100 TB
    corpus in one plan) instead of one driver round-trip per query.

    ``queries`` holds (query_id, term) rows; it is small by construction
    and broadcasts twice: once as the distinct-term prune on the corpus
    token stream (only tokens ANY query mentions survive the map side),
    once to fan tf rows out to the queries that want them. Scoring stats
    (N, avgdl, df(t)) are corpus-global, identical to the single-query
    form; per-(query, doc) scores decimal-sum as there. Emits
    ``(query_id, id, score, rank)``."""
    words = _words(text_col)
    doclen = df.select(
        F.col(id_col), F.size(words).cast("double").alias("dl")
    ).persist()
    stats = doclen.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
    )
    terms = queries.select(F.col(term_col).alias("token")).distinct()
    tok = df.select(
        F.col(id_col), F.explode(words).alias("token")
    ).join(F.broadcast(terms), "token")
    tf = tok.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    ).persist()
    dft = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("double").alias("dft")
    )
    idf = F.log(
        (F.col("n") - F.col("dft") + F.lit(0.5))
        / (F.col("dft") + F.lit(0.5))
        + F.lit(1.0)
    )
    contrib = idf * (
        F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    contrib_dec = F.round(contrib, 6).cast("decimal(18,6)")
    q = queries.select(
        F.col(query_id_col), F.col(term_col).alias("token")
    ).distinct()
    scored = (
        tf.join(F.broadcast(dft), "token")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(q), "token")
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum(contrib_dec), 4).cast("double").alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col, id_col, "score",
            F.col("rank").cast("long").alias("rank"),
        )
        .localCheckpoint(eager=True)
    )
    doclen.unpersist()
    tf.unpersist()
    return out
