"""Text analysis operators over the ``documents`` table: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

Everything is built-in string/regex/higher-order functions — JVM-side,
embarrassingly parallel, no shuffle — which is exactly the shape a 100 TB
corpus pass needs (pure map over partitions, pushdown-friendly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TOKEN_RE = "[A-Za-z0-9]+"
#: tiny function-word list for the language-ID heuristic (en-weighted).
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]


def _words(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, " "), lambda w: w != F.lit(""))


def token_count(text: Column | str) -> Column:
    """Regex token count (BPE-ish word/number tokens)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_RE), F.lit(0))).cast("long")


def text_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document feature row: char/word/token counts, mean word length,
    punctuation ratio, stopword ratio — the standard quality-filter inputs."""
    words = _words(text_col)
    n_words = F.size(words)
    n_chars = F.length(F.col(text_col))
    punct = F.length(F.regexp_replace(F.col(text_col), "[A-Za-z0-9 ]", ""))
    stop_hits = F.size(F.filter(words, lambda w: F.lower(w).isin(STOPWORDS)))
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        token_count(text_col).alias("n_tokens"),
        F.round((n_chars.cast("double") / F.greatest(n_words, F.lit(1))), 4).alias(
            "chars_per_word"
        ),
        F.round(punct.cast("double") / F.greatest(n_chars, F.lit(1)), 4).alias("punct_ratio"),
        F.round(stop_hits.cast("double") / F.greatest(n_words, F.lit(1)), 4).alias(
            "stopword_ratio"
        ),
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    max_punct_ratio: float = 0.3,
) -> DataFrame:
    """Keep documents passing the basic quality gates (Gopher-style length
    and symbol-ratio rules, reduced to the portable feature set)."""
    feats = text_features(df, text_col, id_col)
    return feats.filter(
        (F.col("n_words") >= min_words) & (F.col("punct_ratio") <= max_punct_ratio)
    ).select(id_col, "n_words", "punct_ratio")


def language_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language-ID signal: function-word hit ratio (an n-gram/
    wordlist language detector reduced to its portable core). Emits the
    ratio and a binary english-like flag; a real deployment swaps in a
    per-language wordlist table joined by broadcast."""
    words = _words(text_col)
    stop_hits = F.size(F.filter(words, lambda w: F.lower(w).isin(STOPWORDS)))
    ratio = F.round(
        stop_hits.cast("double") / F.greatest(F.size(words), F.lit(1)), 4
    )
    return df.select(
        F.col(id_col),
        ratio.alias("stopword_ratio"),
        (ratio >= 0.05).alias("english_like"),
    )


#: default function-word lists for :func:`language_id` — tiny
#: demonstration lists; a deployment passes its own (lang, word) table.
DEFAULT_WORDLISTS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit", "zu", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pas", "avec", "dans"],
}


def language_id(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    wordlists: dict[str, list[str]] | None = None,
    min_ratio: float = 0.02,
) -> DataFrame:
    """Multi-language ID: per-language function-word hit ratio via a
    broadcast (lang, word) table, winner = arg-max ratio (ties broken by
    language code; below ``min_ratio`` → 'und' undetermined) — the
    upgrade of :func:`language_score`'s binary english-like flag to a
    real classification.

    Plan shape: words explode row-local, the wordlist join is a
    broadcast hash join (the table is a few hundred rows for dozens of
    languages), per-(doc, lang) hits partial-aggregate map-side, and the
    winner is one grouped max_by — no shuffle carries anything bigger
    than (doc × matched-language) rows. Emits
    ``(id, lang_pred, lang_ratio)``."""
    wl = wordlists or DEFAULT_WORDLISTS
    sess = df.sparkSession
    rows = [(lang, w) for lang, words in wl.items() for w in words]
    wltab = sess.createDataFrame(rows, "wl_lang string, wl_word string")
    words = df.select(
        F.col(id_col),
        F.size(_words(text_col)).alias("n_words"),
        F.explode_outer(_words(text_col)).alias("w"),
    ).withColumn("w", F.lower(F.col("w")))
    hits = (
        words.join(F.broadcast(wltab), words.w == wltab.wl_word, "left")
        .groupBy(id_col, "n_words", "wl_lang")
        .agg(F.count(F.col("wl_word")).alias("hits"))
    )
    ratio = F.round(
        F.col("hits") / F.greatest(F.col("n_words"), F.lit(1)), 4
    )
    scored = hits.filter(F.col("wl_lang").isNotNull()).select(
        F.col(id_col), F.col("wl_lang"), ratio.alias("ratio")
    )
    # winner by (ratio, lang) composite — ties break to the HIGHEST
    # language code, a total deterministic order on both engines
    best = scored.groupBy(id_col).agg(
        F.expr("max_by(wl_lang, struct(ratio, wl_lang))").alias("_lang"),
        F.max("ratio").alias("lang_ratio"),
    )
    out = df.select(F.col(id_col)).join(best, on=id_col, how="left")
    return out.select(
        F.col(id_col),
        F.when(
            F.col("lang_ratio").isNull() | (F.col("lang_ratio") < min_ratio),
            F.lit("und"),
        )
        .otherwise(F.col("_lang"))
        .alias("lang_pred"),
        F.coalesce(F.col("lang_ratio"), F.lit(0.0)).alias("lang_ratio"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprint: md5 over case/whitespace-normalized text, plus
    a coarse 8-hex-char prefix bucket (the rolling-hash analog used for
    shard-local near-dup prefiltering)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " ")
    h = F.md5(norm)
    return df.select(
        F.col(id_col),
        h.alias("fp_md5"),
        F.substring(h, 1, 8).alias("fp_bucket"),
    )

def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_frac: float = 0.8,
    salt: str = "split1",
) -> DataFrame:
    """Deterministic, reproducible train/eval split by md5 bucket.

    The split key is ``md5(salt || ':' || id)``; a row is *train* iff its
    first 4 hex chars fall below ``floor(train_frac * 16^4)``. Unlike
    ``df.sample``/``randomSplit`` this is stable across runs, partitionings
    and engines (same rows land in the same split on any cluster size —
    and in the DuckDB oracle), and changing ``salt`` re-rolls the split.
    Pure map, no shuffle."""
    key = F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    thr = format(int(train_frac * 65536), "04x")
    return df.withColumn(
        "split",
        F.when(F.substring(key, 1, 4) < F.lit(thr), F.lit("train")).otherwise(
            F.lit("eval")
        ),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 32,
    stride: int = 16,
) -> DataFrame:
    """Overlapping token-window chunking (the RAG/embedding preprocessing
    layout): chunk ``i`` covers word-tokens ``[i*stride, i*stride+window)``
    until the document is exhausted. Emits
    ``(id, chunk_id, n_chunk_tokens, chunk_md5)`` — the md5 stands in for
    the chunk text so downstream comparisons stay fixed-width.

    Row-local explode, no shuffle: each document expands to
    ``ceil(n_tokens/stride)`` chunk rows on its own partition. Zero-token
    documents emit no chunks."""
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    words = _words(text_col)
    n = F.size(words)
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    w = df.select(
        F.col(id_col), words.alias("_w"), F.explode(starts).alias("_start")
    )
    chunk = F.slice(F.col("_w"), F.col("_start") + 1, window)
    return w.select(
        F.col(id_col),
        F.expr(f"_start div {stride}").alias("chunk_id"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


def corpus_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Per-source corpus report card: document/token volume, mean length,
    exact-duplicate count — the first pass of any ingestion audit. One
    scan, one shuffle on the (low-cardinality) source key; the tokenizer
    runs once per row via the pre-aggregation projection."""
    t = df.select(
        F.col(group_col),
        token_count(text_col).alias("nt"),
        F.md5(F.col(text_col)).alias("h"),
    )
    return t.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").alias("total_tokens"),
        F.round(F.avg("nt"), 4).alias("mean_tokens"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("h"))).alias("n_exact_dups"),
    )


def tfidf_top_terms(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """Per-document top-``k`` TF-IDF terms (tf × ln(N/df), plain variant).

    Plan shape at scale: one shuffle keyed (doc, token) for tf, one keyed
    token for document frequency (two-phase distinct — partial per-partition
    dedup before the shuffle), corpus size N broadcast as a 1-row frame so
    the whole computation stays one declarative plan (no driver-side
    ``count()`` round-trip), then a per-doc window for top-k.

    Ranking sorts on the ROUNDED score (4 dp, ties → token asc) so the
    order is reproducible across engines and partitionings — raw
    floating-point ranking would let ±1 ulp differences reorder ties."""
    tok = df.select(F.col(id_col), F.explode(_words(text_col)).alias("token"))
    tf = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dft = tok.groupBy("token").agg(F.count_distinct(id_col).alias("dft"))
    n = df.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dft, "token")
        .crossJoin(F.broadcast(n))
        .select(
            F.col(id_col),
            "token",
            F.round(
                F.col("tf") * F.log(F.col("n").cast("double") / F.col("dft")), 4
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "token", "tfidf", "rank")
    )


def pack_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 256,
    num_buckets: int = 32,
) -> DataFrame:
    """Sequence packing: lay the corpus tokens end-to-end in ``id_col``
    order and cut packs of ``budget`` tokens (the concat-and-chunk layout a
    training loader consumes). Emits per document::

        (id, n_tokens, tok_start, pack_id, pack_offset, n_packs)

    where ``tok_start`` is the document's global token offset, ``pack_id``
    the pack its first token lands in, ``pack_offset`` the position inside
    that pack, and ``n_packs`` how many packs the document spans.

    The global running sum is a **distributed prefix scan**, not a global
    sort: ids bucket into ``num_buckets`` uniform ranges (deterministic —
    no sampled boundaries), each bucket computes its local running sum in
    parallel, and the tiny per-bucket totals (``num_buckets`` rows) come to
    the driver to form bucket offsets that broadcast back. A naive
    ``Window.orderBy(id)`` would funnel 100 TB through ONE task; this plan
    keeps every stage ``num_buckets``-wide. Zero-token documents still
    occupy one logical slot for ``n_packs`` so the value stays positive
    (and floor-div vs truncating-div never disagree: all operands ≥ 0).
    """
    # Materialize (id, n_tokens) once: the regex tokenizer is the dominant
    # expression (5.3 s of the ~9 s sf0.1 run; regexp_count A/B'd equal to
    # size(regexp_extract_all) — the regex engine, not array allocation,
    # is the cost), and without materialization both the bucket-totals job
    # and the final layout job re-scan the corpus to recompute it. The
    # materialized frame is ~16 bytes/doc at any corpus size; wall time at
    # sf0.1 is a wash, but at 100 TB one corpus scan versus two is the
    # difference that matters. On a real cluster swap localCheckpoint for
    # persist(DISK) or a temp table to survive executor loss.
    toks = df.select(
        F.col(id_col), token_count(text_col).alias("n_tokens")
    ).localCheckpoint(eager=True)
    spark = df.sparkSession
    out_schema = (
        f"{id_col} long, n_tokens long, tok_start long, "
        "pack_id long, pack_offset long, n_packs long"
    )
    bounds = toks.agg(
        F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
    ).first()
    if bounds["lo"] is None:
        return spark.createDataFrame([], out_schema)
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    span = max(1, -(-(hi - lo + 1) // num_buckets))  # ceil div
    bucketed = toks.withColumn(
        "bucket", F.expr(f"({id_col} - {lo}) div {span}")
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn(
        "local_start", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    totals = sorted(
        bucketed.groupBy("bucket").agg(F.sum("n_tokens").alias("tot")).collect(),
        key=lambda r: r["bucket"],
    )
    offsets, run = [], 0
    for r in totals:
        offsets.append((int(r["bucket"]), run))
        run += int(r["tot"])
    off = spark.createDataFrame(offsets, "bucket long, bucket_start long")
    start = F.col("local_start") + F.col("bucket_start")
    return (
        local.join(F.broadcast(off), "bucket")
        .select(F.col(id_col), "n_tokens", start.alias("tok_start"))
        .withColumn("pack_id", F.expr(f"tok_start div {budget}"))
        .withColumn("pack_offset", F.col("tok_start") % budget)
        .withColumn(
            "n_packs",
            F.expr(f"(tok_start + greatest(n_tokens, 1) - 1) div {budget}")
            - F.col("pack_id")
            + F.lit(1),
        )
    )


def contamination(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Benchmark-decontamination check: for each eval document, what
    fraction of its word ``shingle_n``-grams also appears anywhere in the
    training corpus. Emits ``(id, n_shingles, n_overlap, overlap_frac)``.

    Plan shape at scale — the asymmetry is the design: eval benchmarks
    are tiny while train is the 100 TB side, so the train side is NEVER
    shuffled. Its exploded shingles semi-join the BROADCAST eval
    vocabulary map-side first (a shingle outside the eval set can never
    produce a hit — values unchanged), and only the surviving hit set
    (eval-scale) pays the distinct shuffle. The former plan distincted
    the train vocabulary first, which on short-doc corpora is
    corpus-scale (measured 7.5× growth at 10× data); the eval-side
    rollup reuses the eval partitioning either way."""
    from couch_to_postgres_spark.extensions.dedup import word_shingles

    eval_sh = eval_df.select(
        F.col(id_col), F.explode_outer(word_shingles(text_col, shingle_n)).alias("shingle")
    ).distinct()
    eval_vocab = (
        eval_sh.filter(F.col("shingle").isNotNull())
        .select("shingle")
        .distinct()
    )
    train_sh = (
        train.select(F.explode(word_shingles(text_col, shingle_n)).alias("shingle"))
        .join(F.broadcast(eval_vocab), "shingle", "left_semi")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    joined = eval_sh.join(train_sh, "shingle", "left")
    return joined.groupBy(id_col).agg(
        F.sum(F.when(F.col("shingle").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_shingles"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_overlap"),
        F.round(
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            / F.greatest(
                F.sum(F.when(F.col("shingle").isNotNull(), 1).otherwise(0)), F.lit(1)
            ),
            4,
        ).alias("overlap_frac"),
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    max_overlap_frac: float = 0.0,
) -> DataFrame:
    """Drop-side benchmark decontamination: remove from ``train`` every
    document whose DISTINCT word-shingle overlap with the eval corpus
    exceeds ``max_overlap_frac`` (default 0.0 = any shared shingle
    contaminates). Distinct-shingle ratios match :func:`contamination`'s
    metric exactly, so one threshold means the same thing on both the
    measuring and the dropping side (occurrence-weighted ratios would
    let a document that repeats one leaked 3-gram many times read as
    60% contaminated while its distinct overlap is 2%).

    The complement of :func:`contamination` (which *measures* eval-side
    overlap): this one cleans the training side, which is what a corpus
    build actually ships.

    Plan shape at 100 TB — the asymmetry is the whole design: eval
    benchmarks are tiny (thousands of docs) while train is the 100 TB
    side, so the eval DISTINCT-shingle vocabulary is broadcast and the
    train side is never shuffled. Detection is a map-side broadcast
    left-join over train's exploded shingles rolled up by doc id
    (partial aggregation keeps the exchange to one skinny row per doc),
    and the final drop is a broadcast anti-join of the (small)
    contaminated-id set against train. Corpus shuffles: zero.
    """
    from couch_to_postgres_spark.extensions.dedup import word_shingles

    eval_sh = (
        eval_df.select(
            F.explode(word_shingles(text_col, shingle_n)).alias("shingle")
        )
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train_sh = train.select(
        F.col(id_col),
        F.explode_outer(
            F.array_distinct(word_shingles(text_col, shingle_n))
        ).alias("shingle"),
    )
    overlap = (
        train_sh.join(F.broadcast(eval_sh), "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.col("shingle")).alias("n_shingles"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_overlap"),
        )
        .filter(
            F.col("n_overlap")
            > F.col("n_shingles") * F.lit(max_overlap_frac)
        )
        .select(id_col)
    )
    return train.join(F.broadcast(overlap), on=id_col, how="left_anti")


def compression_ratio(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """zlib compression ratio per document (compressed bytes / raw bytes) —
    the classic cheap quality signal: boilerplate and degenerate repetition
    compress far below natural text, near-random noise compresses above it.

    This is the repo's canonical *vectorized Python* path: no built-in
    expression can run zlib, so an Arrow-batched ``pandas_udf`` does —
    one Python call per ~10k-row batch, never per row. (Built-in wrap
    style, not the type-hint style: hints break under
    ``from __future__ import annotations``.) NOT SQL-oracle-able (DuckDB
    has no zlib scalar); pinned by property tests instead."""
    import zlib

    from pyspark.sql.types import DoubleType

    def _ratio(s):
        return s.map(
            lambda t: None
            if t is None
            else round(
                len(zlib.compress(t.encode("utf-8"), 6))
                / max(len(t.encode("utf-8")), 1),
                4,
            )
        )

    ratio_udf = F.pandas_udf(_ratio, DoubleType())
    return df.select(
        F.col(id_col), ratio_udf(F.col(text_col)).alias("compression_ratio")
    )


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Intra-document repetition signals (the Gopher-style "rep" filters
    that catch boilerplate and degenerate generations): duplicate-word
    fraction, single-most-frequent-token share, and duplicate-shingle
    fraction. ``dup_shingle_frac`` is NULL for documents too short to have
    a shingle.

    Plan shape: explode → two-level groupBy keyed by (doc, token) then doc
    — codegen'd hash aggregation with map-side partials (measured 4× over
    the shuffle-free higher-order-function form, which Spark interprets
    per-row); doc keys are uniform so both shuffles are skew-free."""
    from couch_to_postgres_spark.extensions.dedup import word_shingles

    tok = df.select(F.col(id_col), F.explode(_words(text_col)).alias("token"))
    tc = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("c"))
    word_stats = tc.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("max_c"),
    )
    sh = df.select(
        F.col(id_col), F.explode(word_shingles(text_col, shingle_n)).alias("sh")
    )
    sh_stats = sh.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_sh"),
        F.count_distinct("sh").alias("n_dsh"),
    )
    n = F.col("n_tokens").cast("double")
    return word_stats.join(sh_stats, id_col, "left").select(
        F.col(id_col),
        "n_tokens",
        F.round(F.lit(1) - F.col("n_distinct") / n, 4).alias("dup_word_frac"),
        F.round(F.col("max_c") / n, 4).alias("top_token_share"),
        F.round(
            F.lit(1) - F.col("n_dsh") / F.col("n_sh").cast("double"), 4
        ).alias("dup_shingle_frac"),
    )


def bigram_logprob_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Bigram language-model scoring (the step up from unigram
    log-frequency as a perplexity proxy): per document, the mean
    ``ln P(w2 | w1)`` over its word bigrams, with MLE conditionals from the
    corpus itself (``C(w1 w2) / C(w1·)``). Fluent text scores near 0;
    shuffled or degenerate text scores far negative. Documents with no
    bigram are omitted.

    Plan shape at scale: one explode → bigram-keyed shuffle for the counts
    (uniform string keys), context counts derived FROM the bigram table
    (vocabulary-sized, not corpus-sized), then two joins that both carry
    vocabulary-sized sides. No driver round-trips."""
    from couch_to_postgres_spark.extensions.dedup import word_shingles

    bg = df.select(
        F.col(id_col), F.explode(word_shingles(text_col, 2)).alias("bg")
    )
    c_bg = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))
    c_w1 = (
        bg.select(F.split(F.col("bg"), " ")[0].alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c_w1"))
    )
    return (
        bg.join(c_bg, "bg")
        .withColumn("w1", F.split(F.col("bg"), " ")[0])
        .join(c_w1, "w1")
        .groupBy(id_col)
        .agg(
            F.round(F.avg(F.log(F.col("c_bg") / F.col("c_w1"))), 4).alias(
                "mean_bigram_logprob"
            ),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )


def interpolated_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.7,
) -> DataFrame:
    """Jelinek-Mercer interpolated LM scoring: per document the mean
    ``ln( λ·P(w2|w1) + (1-λ)·P(w2) )`` over its word bigrams — the
    smoothing step up from raw-MLE :func:`bigram_logprob_score`, whose
    score collapses for any bigram unseen elsewhere in the corpus
    (P=corpus-MLE is 1/C(w1) at best, and brittle); interpolation backs
    off to the unigram so rare continuations are penalized smoothly, the
    standard n-gram quality-filter formulation.

    Same plan skeleton as the bigram scorer: bigram- and unigram-keyed
    aggregations are vocabulary-sized; the corpus total is a one-row
    broadcast; no driver round-trips. Documents with no bigram are
    omitted."""
    from couch_to_postgres_spark.extensions.dedup import word_shingles

    # the occurrence stream is the ONLY corpus-sized frame: it carries
    # exactly (id, bg) — the w1/w2 splits live on the vocab-sized count
    # table below, never here (two redundant string columns on the big
    # side of the one join would be pure shuffle bytes)
    bg = df.select(
        F.col(id_col), F.explode(word_shingles(text_col, 2)).alias("bg")
    )
    # ONE corpus-wide aggregation builds the bigram table; the w1/w2
    # marginals and the corpus total all derive from it (vocabulary-sized
    # inputs) — naively grouping `bg` four times would re-run the
    # corpus-wide shingle explode per aggregate
    c_bg = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))
    c_bg_split = c_bg.withColumn("w1", F.split(F.col("bg"), " ")[0]).withColumn(
        "w2", F.split(F.col("bg"), " ")[1]
    )
    c_w1 = c_bg_split.groupBy("w1").agg(F.sum("c_bg").alias("c_w1"))
    c_w2 = c_bg_split.groupBy("w2").agg(F.sum("c_bg").alias("c_w2"))
    n_tot = c_bg.agg(F.sum("c_bg").alias("n_tot"))
    p_bg = F.col("c_bg") / F.col("c_w1")
    p_uni = F.col("c_w2") / F.col("n_tot")
    # marginals fold INTO the bigram table (vocab-sized joins) so the
    # corpus-sized occurrence stream pays exactly ONE join, on bg —
    # same shape as lines.line_lm_scores, where the former three
    # occurrence-wide joins measured 3.6x at 10x data
    bg_table = (
        c_bg_split.join(c_w1, "w1")
        .join(c_w2, "w2")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "bg",
            F.log(F.lit(lam) * p_bg + F.lit(1.0 - lam) * p_uni).alias(
                "_logp"
            ),
        )
    )
    return (
        bg.join(bg_table, "bg")
        .groupBy(id_col)
        .agg(
            F.round(F.avg("_logp"), 4).alias("mean_interp_logprob"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
    max_size: int | None = None,
) -> DataFrame:
    """Vocabulary builder (tokenizer-training / coverage-analysis
    primitive): corpus token histogram pruned to ``min_count``, ranked
    (count desc, token asc), with each entry's cumulative share of ALL
    corpus token mass — so ``cum_share`` at rank *r* answers "what corpus
    coverage does a size-*r* vocab buy", with pruned-tail tokens still in
    the denominator.

    Plan shape at scale: explode → partial map-side count → one shuffle on
    token. The ranking/cumulative window orders globally, which is a
    single-partition funnel — but it runs over the VOCABULARY (≪ corpus;
    ~1M rows for web-scale text), never the corpus, and the total token
    mass rides along as a broadcast 1-row frame instead of a driver
    round-trip."""
    words = _words(text_col)
    hist = (
        df.select(F.explode(words).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = hist.agg(F.sum("cnt").alias("_total"))
    order = [F.col("cnt").desc(), F.col("token")]
    cum = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    out = (
        hist.filter(F.col("cnt") >= min_count)
        .crossJoin(F.broadcast(total))
        .select(
            "token",
            "cnt",
            F.row_number().over(Window.orderBy(*order)).cast("long").alias("rank"),
            F.round(
                F.sum("cnt").over(cum) / F.col("_total").cast("double"), 4
            ).alias("cum_share"),
        )
    )
    if max_size is not None:
        out = out.filter(F.col("rank") <= max_size)
    return out


def encode_documents(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    unk_id: int = 0,
) -> DataFrame:
    """Apply a built vocabulary (:func:`build_vocab` output) to encode each
    document as its token-id sequence — the text→ids step a training
    loader consumes. Token id = vocab ``rank`` (1-based); out-of-vocab
    tokens become ``unk_id`` (0 by default, disjoint from ranks). Emits
    ``(id, token_ids array<long>, n_unk)``; documents with zero tokens
    produce no row.

    Plan shape at scale: posexplode → broadcast join against the vocab
    (vocab ≪ corpus — it always fits) → one shuffle back onto the doc id.
    Order is restored engine-side by sorting (pos, id) structs, never by
    assuming collect_list order.

    ``unk_id`` must lie OUTSIDE the vocab's live rank range: ``n_unk``
    counts tokens whose id equals ``unk_id``, so an unk_id that collides
    with a real rank would silently conflate that token with OOV in both
    ``token_ids`` and ``n_unk``. Ranks are 1-based, so the default
    ``unk_id=0`` can never collide and skips the check (keeps the common
    path lazy); a positive unk_id is validated eagerly (vocab is small)."""
    if unk_id >= 1:
        max_rank_row = vocab.agg(F.max("rank")).first()
        max_rank = (
            max_rank_row[0] if max_rank_row and max_rank_row[0] is not None else 0
        )
        if unk_id <= max_rank:
            raise ValueError(
                f"unk_id={unk_id} collides with live vocab rank range "
                f"[1, {max_rank}]; pick an id outside it (e.g. 0 or "
                f"{max_rank + 1}) so n_unk counts only OOV tokens"
            )
    toks = df.select(
        F.col(id_col),
        F.posexplode(_words(text_col)).alias("pos", "token"),
    )
    enc = toks.join(
        F.broadcast(vocab.select("token", F.col("rank").alias("_tid"))),
        "token",
        "left",
    ).withColumn("_tid", F.coalesce("_tid", F.lit(unk_id)))
    return enc.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "_tid"))),
            lambda s: s["_tid"],
        ).alias("token_ids"),
        F.sum(
            F.when(F.col("_tid") == unk_id, 1).otherwise(0)
        ).alias("n_unk"),
    )


def top_tokens(df: DataFrame, text_col: str = "text", k: int = 20) -> DataFrame:
    """Corpus-level token frequency top-k with a total deterministic order
    (count desc, token asc).

    Plan shape at scale: explode → partial map-side count → one shuffle of
    (token, partial-count) → TakeOrderedAndProject (per-partition top-k
    merged on the driver) — the full sorted histogram is never
    materialized or globally sorted."""
    words = _words(text_col)
    return (
        df.select(F.explode(words).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(k)
    )


def approx_top_tokens(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
    capacity: int = 200,
) -> DataFrame:
    """Scalable top-k token frequencies via per-partition Misra-Gries
    candidate generation + exact recount of the candidate set.

    Why not :func:`top_tokens` at 100 TB: its single count-by-token
    shuffle carries the FULL vocabulary (billions of long-tail keys).
    Here phase 1 runs a Misra-Gries summary of ``capacity`` counters
    inside each partition (mapInPandas, one pass, constant memory) —
    pigeonhole guarantees any token with global frequency above
    ``N/(capacity+1)`` survives in at least one partition's summary — and
    phase 2 recounts ONLY the candidate union (≤ capacity × partitions
    keys, broadcast) exactly. The result is EXACTLY the top-k whenever
    the k-th frequency clears that threshold (the regime top-k queries
    live in; pinned against :func:`top_tokens` in tests), with the
    vocabulary-sized shuffle engineered out.
    """
    import pandas as pd

    words = _words(text_col)
    toks = df.select(F.explode(words).alias("token"))

    def mg_partition(batches):
        counters: dict = {}
        for pdf in batches:
            for tok in pdf["token"]:
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < capacity:
                    counters[tok] = 1
                else:
                    # decrement-all step, dropping zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"token": list(counters.keys())})

    candidates = (
        toks.mapInPandas(mg_partition, schema="token string")
        .distinct()
    )
    return (
        toks.join(F.broadcast(candidates), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(k)
    )


def pmi_bigrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-``k`` word bigrams by pointwise mutual information —
    collocation mining over the corpus (the classic phrase-discovery /
    tokenizer-merge-candidate signal for training-data pipelines).

    pmi(w1,w2) = ln( p(w1,w2) / (p(w1)·p(w2)) ) with MLE probabilities
    from bigram/unigram counts; ``min_count`` suppresses the noise tail
    (rare pairs score spuriously high under MLE).

    Plan shape: one bigram-keyed count shuffle (uniform string keys), a
    unigram count derived from the corpus token stream, two
    vocabulary-sized joins, then a global top-k on the ROUNDED score
    (ties → bigram asc) — reproducible across engines. Counts are
    integers, so the score expression is one deterministic FP evaluation
    per row (no order-dependent summation anywhere)."""
    from couch_to_postgres_spark.extensions.dedup import word_shingles

    bg = df.select(F.explode(word_shingles(text_col, 2)).alias("bg"))
    # persisted: the count tables feed both the totals and the scoring
    # join — without the cache each branch re-explodes the corpus (the
    # same single-pass discipline as bm25_topk/source_overlap; totals
    # derive FROM the counts, so the corpus is exploded exactly once per
    # gram width). Released below once the top-k materializes.
    c_bg = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg")).persist()
    uni = df.select(F.explode(_words(text_col)).alias("w"))
    c_w = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c_w")).persist()
    totals = c_bg.agg(F.sum("c_bg").alias("n_bg")).crossJoin(
        c_w.agg(F.sum("c_w").alias("n_w"))
    )
    parts = F.split(F.col("bg"), " ")
    scored = (
        c_bg.filter(F.col("c_bg") >= min_count)
        .withColumn("w1", parts[0])
        .withColumn("w2", parts[1])
        .join(c_w.select(F.col("w").alias("w1"), F.col("c_w").alias("c1")), "w1")
        .join(c_w.select(F.col("w").alias("w2"), F.col("c_w").alias("c2")), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "bg",
            F.col("c_bg").alias("pair_count"),
            F.round(
                F.log(
                    (F.col("c_bg").cast("double") / F.col("n_bg"))
                    / (
                        (F.col("c1").cast("double") / F.col("n_w"))
                        * (F.col("c2").cast("double") / F.col("n_w"))
                    )
                ),
                4,
            ).alias("pmi"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("pmi").desc(), F.col("bg"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("bg", "pair_count", "pmi", F.col("rank").cast("long").alias("rank"))
        .localCheckpoint(eager=True)  # k rows; lets the caches go now
    )
    c_bg.unpersist()
    c_w.unpersist()
    return out


#: deliberately simple, cross-engine-portable patterns (character classes
#: and bounded repetition only — no lookaround, no shorthand that differs
#: between Java regex and RE2-style engines)
PII_PATTERNS = {
    "emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "urls": r"https?://[^ ]+",
    "phones": r"\+?[0-9][0-9()\- ]{7,}[0-9]",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def pii_scan(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII-shaped match counts (emails, urls, phone-number
    runs, IPv4 literals) — the triage report a corpus release gate needs
    before the redaction pass (:`x_redact`'s numeric scrub is the
    remediation; this is the detection side). One map pass, no shuffle;
    patterns are engine-portable by construction (see PII_PATTERNS)."""
    cols = [
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
        ).cast("long").alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]
    out = df.select(F.col(id_col), *cols)
    total = None
    for name in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_pii_total", total.cast("long"))


def iqr_outlier_trim(
    df: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "lang",
) -> DataFrame:
    """Tukey-fence outlier trimming per group: keep rows whose value lies
    within [q1 − 1.5·IQR, q3 + 1.5·IQR] of their group — the standard
    length-distribution cleanup before corpus statistics (a handful of
    pathological megadocs otherwise dominate every mean).

    Plan shape: exact per-group quartiles are one agg over the groups
    (group count is small — languages, sources); the fences broadcast
    back and the filter is a map. The corpus never shuffles."""
    q = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.25)").alias("_q1"),
        F.expr(f"percentile({value_col}, 0.75)").alias("_q3"),
    )
    fenced = q.select(
        group_col,
        (F.col("_q1") - 1.5 * (F.col("_q3") - F.col("_q1"))).alias("_lo"),
        (F.col("_q3") + 1.5 * (F.col("_q3") - F.col("_q1"))).alias("_hi"),
    )
    return (
        df.join(F.broadcast(fenced), group_col)
        .filter(
            (F.col(value_col) >= F.col("_lo"))
            & (F.col(value_col) <= F.col("_hi"))
        )
        .drop("_lo", "_hi")
    )


def cdc_chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    avg_words: int = 16,
    ngram: int = 3,
) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS boundary trick at word
    granularity): a chunk boundary falls AFTER word position p whenever
    the hash of the ``ngram`` words ending at p is ≡ 0 mod ``avg_words``
    — so boundaries are determined by local CONTENT, not by position,
    and an insertion near the start of a document shifts only the chunks
    it touches (fixed-stride chunking re-frames everything downstream,
    destroying cross-doc chunk identity). Expected chunk length is
    ``avg_words`` with a geometric tail.

    Emits ``(id, chunk_id, n_chunk_words, chunk_md5)``; equal chunk_md5
    across documents = shared content segment robust to edits — feed to
    :func:`shared_cdc_chunks` for the cross-doc report. Plan: one
    posexplode and one doc-keyed window pass (running sum of boundary
    flags); hashing is md5 on the joined n-gram, engine-portable."""
    from pyspark.sql import Window

    words = _words(text_col)
    pos = df.select(
        F.col(id_col),
        F.posexplode(words).alias("pos", "w"),
    )
    w_ord = Window.partitionBy(id_col).orderBy("pos")
    # n-gram ending at pos: this word + the ngram-1 before it (shorter at
    # the document head — still deterministic content)
    grams = [F.lag("w", i).over(w_ord) for i in range(ngram - 1, 0, -1)]
    gram = F.concat_ws(" ", *grams, F.col("w"))
    hx = F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
    flagged = pos.withColumn(
        "boundary", (hx % F.lit(avg_words) == 0).cast("int")
    )
    # chunk id = boundaries BEFORE this word (boundary cuts AFTER its
    # word, so the flag shifts into the next row's running sum)
    chunk = F.coalesce(
        F.sum("boundary").over(
            w_ord.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    chunked = flagged.withColumn("chunk_id", chunk.cast("long"))
    return (
        chunked.groupBy(id_col, "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunk_words"),
            F.md5(
                F.concat_ws(" ", F.array_sort(F.collect_list(F.struct("pos", "w"))).getField("w"))
            ).alias("chunk_md5"),
        )
    )


def shared_cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    avg_words: int = 16,
    ngram: int = 3,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document shared content at CDC-chunk granularity: chunks
    (by content hash) appearing in ≥ ``min_docs`` documents, with the
    carrier count — the insertion-robust complement to
    :func:`couch_to_postgres_spark.extensions.dedup.shared_span_buckets`
    (winnowing samples positions; CDC chunking partitions the text, so
    every shared segment longer than a couple of chunks is surfaced in
    full). The aggregation shuffles one skinny row per (doc, chunk)."""
    chunks = cdc_chunk_documents(df, text_col, id_col, avg_words, ngram)
    # n_docs must be DISTINCT carriers: a chunk repeated twice inside one
    # document yields two (doc, chunk_id) rows with the same chunk_md5 and
    # would otherwise satisfy min_docs=2 without being cross-document
    # (same distinct-before-count discipline as boilerplate_score).
    return (
        chunks.groupBy("chunk_md5")
        .agg(
            F.count_distinct(F.col(id_col)).alias("n_docs"),
            F.min("n_chunk_words").alias("n_chunk_words"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def unigram_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document unigram (word-type) Shannon entropy in nats —
    the gibberish/degeneracy axis the repetition signals approach from
    the other side: near-zero entropy = one token repeated, log(n_types)
    = perfectly uniform usage. Emits ``(id, n_types, entropy)``.

    Per-type terms (c/n)·ln(n/c) are rounded to 6 dp and summed as
    DECIMAL so the per-doc entropy is independent of aggregation order
    (double summation is non-associative — same discipline as BM25's
    score sum). Plan: one (doc, word) count shuffle, a doc-keyed total,
    one aggregation."""
    tok = df.select(F.col(id_col), F.explode(_words(text_col)).alias("w"))
    tc = tok.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("c"))
    tot = tc.groupBy(id_col).agg(F.sum("c").alias("n"))
    term = F.round(
        (F.col("c") / F.col("n"))
        * F.log(F.col("n").cast("double") / F.col("c")),
        6,
    ).cast("decimal(18,6)")
    return (
        tc.join(tot, id_col)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.round(F.sum(term), 4).cast("double").alias("entropy"),
        )
    )


def zipf_slope(
    df: DataFrame, text_col: str = "text", top_n: int = 1000
) -> DataFrame:
    """Corpus-health check: the OLS slope of ln(frequency) vs ln(rank)
    over the ``top_n`` most frequent word types. Natural-language corpora
    sit near −1 (Zipf's law); a slope collapsing toward 0 means the
    frequency mass is flat (template/spam floods), a much steeper slope
    means a few tokens dominate (degenerate generation). One skinny row
    out: ``(n_types, slope, intercept)``.

    The regression sums (Σx, Σy, Σxy, Σx²) run as rounded DECIMALs so
    the result is engine- and order-independent; the final slope formula
    is one deterministic double expression over those exact sums."""
    counts = (
        df.select(F.explode(_words(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql import Window

    # top-n FIRST via orderBy+limit (TakeOrderedAndProject — distributed
    # per-partition heads, no stage sees more than partitions×n rows);
    # the ranking window then runs over ≤ top_n survivors. A global
    # row_number window over the raw vocabulary would funnel hundreds of
    # millions of types through one task.
    top = counts.orderBy(F.col("cnt").desc(), F.col("w")).limit(top_n)
    win = Window.orderBy(F.col("cnt").desc(), F.col("w"))
    ranked = (
        top.withColumn("rank", F.row_number().over(win))
        .select(
            F.log(F.col("rank").cast("double")).alias("x"),
            F.log(F.col("cnt").cast("double")).alias("y"),
        )
    )
    dec = lambda c: F.round(c, 6).cast("decimal(28,6)")
    sums = ranked.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x") * F.col("y"))).alias("sxy"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
    )
    n = F.col("n_types").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    denom = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / denom
    # degenerate inputs (empty corpus, a single type — zero x-variance)
    # have no regression line: emit NULLs, not a NaN/era-of-the-engine
    # division artifact
    ok = (F.col("n_types") >= 2) & (denom != 0)
    return sums.select(
        "n_types",
        F.when(ok, F.round(slope, 4)).alias("slope"),
        F.when(ok, F.round((sy - slope * sx) / n, 4)).alias("intercept"),
    )


def contamination_by_group(
    train: DataFrame,
    eval_df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """:func:`contamination` rolled up per eval-side GROUP (source,
    benchmark, shard): which corpus components leak training text. The
    rate is micro-averaged from integer shingle counts
    (Σoverlap / Σshingles — no floating-point accumulation at all until
    the final division), so it is engine- and order-exact. Emits
    ``(group, n_docs, n_shingles, n_overlap, overlap_frac)``."""
    per_doc = contamination(train, eval_df, text_col, id_col, shingle_n)
    groups = eval_df.select(F.col(id_col), F.col(group_col))
    return (
        per_doc.join(groups, id_col)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_shingles").alias("n_shingles"),
            F.sum("n_overlap").alias("n_overlap"),
            F.round(
                F.sum("n_overlap")
                / F.greatest(F.sum("n_shingles"), F.lit(1)),
                4,
            ).alias("overlap_frac"),
        )
    )


def ks_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str = "n_chars",
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the distributions
    of ``value_col`` in two corpus snapshots — the drift gate a
    continuously-ingesting pipeline runs before mixing a new batch into
    an established corpus (a KS jump on length/quality distributions
    means the new crawl slice is a different animal; investigate before
    training on it). Emits one row: ``(ks, n_a, n_b)``.

    Plan shape: each side collapses to per-VALUE counts (corpus →
    distinct-value-sized), the union groups once more, and the two ECDFs
    are cumulative sums over one window ordered by value — the window's
    input is the distinct-value table, never the corpus. The ECDF
    difference is exact-integer counts over exact-integer totals, so the
    statistic is engine-exact before its final rounding."""
    a = df_a.select(F.col(value_col).alias("v")).groupBy("v").agg(
        F.count(F.lit(1)).alias("ca")
    )
    b = df_b.select(F.col(value_col).alias("v")).groupBy("v").agg(
        F.count(F.lit(1)).alias("cb")
    )
    merged = (
        a.join(b, "v", "full_outer")
        .select(
            "v",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    # persist: the cumulative branch and the totals branch both consume
    # `merged`, and without the cache each re-runs both sides' corpus
    # count aggregations; the frame is distinct-value-sized. Released
    # after the (1-row) result materializes.
    merged = merged.persist()
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = merged.select(
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    totals = merged.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    out = (
        cum.crossJoin(F.broadcast(totals))
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("cum_a") / F.col("n_a")
                        - F.col("cum_b") / F.col("n_b")
                    )
                ),
                4,
            ).alias("ks"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
    ).localCheckpoint(eager=True)
    merged.unpersist()
    return out


def robust_zscore(
    df: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group ROBUST standardization: z = (v − median) / (1.4826·MAD),
    the outlier-resistant alternative to mean/stddev scaling (e21) —
    one pathological megadoc shifts a mean and explodes a stddev, but
    leaves median and MAD untouched, so the scores of NORMAL rows stay
    meaningful in dirty data. Groups with MAD = 0 (constant values)
    emit NULL scores. Emits ``(id, group, value, robust_z)``.

    Plan shape: two small per-group aggs (median, then median absolute
    deviation — group-count-sized each), broadcast back; the corpus
    sees two map-side joins, no corpus-keyed shuffle anywhere."""
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("_med")
    )
    with_med = df.join(F.broadcast(med), group_col)
    mad = with_med.groupBy(group_col).agg(
        F.expr(f"percentile(abs({value_col} - _med), 0.5)").alias("_mad")
    )
    scale = F.col("_mad") * F.lit(1.4826)
    return (
        with_med.join(F.broadcast(mad), group_col)
        .select(
            F.col(id_col),
            F.col(group_col),
            F.col(value_col),
            F.when(
                F.col("_mad") > 0,
                F.round((F.col(value_col) - F.col("_med")) / scale, 4)
                + F.lit(0.0),
            ).alias("robust_z"),
        )
    )


def chi2_independence(
    df: DataFrame,
    col_a: str = "source",
    col_b: str = "lang",
) -> DataFrame:
    """Pearson chi-square statistic for independence of two categorical
    corpus columns — "is language mix independent of source?" is the
    canonical composition-QA question (a crawl slice whose language
    distribution deviates hard from the corpus-wide mix shows up as a
    large statistic). Emits one row: ``(chi2, dof, n)``.

    Plan shape: one contingency aggregation (cells = |A|×|B|, tiny),
    marginals derived from the cells, expected counts exact-integer
    ratios; per-cell terms round to 6 dp and sum as DECIMAL so the
    statistic is engine- and order-exact."""
    cells = df.groupBy(col_a, col_b).agg(F.count(F.lit(1)).alias("o"))
    ra = cells.groupBy(col_a).agg(F.sum("o").alias("ra"))
    rb = cells.groupBy(col_b).agg(F.sum("o").alias("rb"))
    n = cells.agg(F.sum("o").alias("n"))
    # all-double BEFORE the multiply: ra*rb in LONG wraps past ~3e9 rows
    e = (
        F.col("ra").cast("double")
        * F.col("rb").cast("double")
        / F.col("n").cast("double")
    )
    term = F.round((F.col("o") - e) * (F.col("o") - e) / e, 6).cast(
        "decimal(28,6)"
    )
    joined = (
        cells.join(F.broadcast(ra), col_a)
        .join(F.broadcast(rb), col_b)
        .crossJoin(F.broadcast(n))
    )
    return joined.agg(
        F.round(F.sum(term), 4).cast("double").alias("chi2"),
        (
            (F.count_distinct(F.col(col_a)) - 1)
            * (F.count_distinct(F.col(col_b)) - 1)
        ).alias("dof"),
        F.first("n").alias("n"),
    )


def gini_concentration(
    df: DataFrame,
    group_col: str = "source",
) -> DataFrame:
    """Gini coefficient of row counts across groups — one number for
    "how concentrated is the corpus in a few sources" (0 = perfectly
    even mix, →1 = one source dominates). The portfolio-balance check a
    mixture build reports next to its per-source caps. Emits
    ``(gini, n_groups, n_rows)``.

    G = (2·Σᵢ i·xᵢ) / (n·Σx) − (n+1)/n over counts xᵢ sorted ascending
    (i = 1..n). Counts and index products are exact integers; the
    statistic is one deterministic double expression at the end. The
    rank window runs over the GROUP table (tens of rows), never the
    corpus."""
    from pyspark.sql import Window

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("x"))
    w = Window.orderBy(F.col("x"), F.col(group_col))
    ranked = counts.withColumn("i", F.row_number().over(w))
    return ranked.agg(
        F.round(
            (F.lit(2.0) * F.sum(F.col("i") * F.col("x")))
            / (F.count(F.lit(1)) * F.sum("x"))
            - (F.count(F.lit(1)) + F.lit(1.0)) / F.count(F.lit(1)),
            4,
        ).alias("gini"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("x").alias("n_rows"),
    )


def novelty_curve(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document novelty: the fraction of a doc's distinct shingles
    whose FIRST carrier (min id) is the doc itself — how much genuinely
    new content each doc contributes in corpus order (boilerplate-heavy
    tails show up as a novelty collapse). Emits
    ``(id, n_shingles, n_novel, novelty_frac)``; docs shorter than one
    shingle are absent (no shingles to be novel about).

    Shuffle shape, sized for 100 TB: the distinct (doc, shingle) pair set
    is corpus-token proportional and is shuffled exactly TWICE (the
    distinct, then the per-shingle min/count aggregate — both
    partial-aggregated map-side). The first-carrier map is then reduced
    to per-doc counts BEFORE any join: the only join in the plan is
    doc-count proportional (two skinny per-doc frames), never a join of
    the full pair set against the shingle map — at 10× data the pair-set
    volume grows 10×, the joined frames 10×-of-doc-count, nothing
    quadratic (ratio measured in SCALING.md)."""
    from couch_to_postgres_spark.extensions.dedup import word_shingles

    pairs = df.select(
        F.col(id_col), F.explode(word_shingles(text_col, shingle_n)).alias("sh")
    ).distinct()
    # Two branches over the pair set, NOT persisted: Catalyst removes the
    # redundant distinct under the per-shingle min (duplicates can't change
    # a min), so the novel branch shuffles map-side-partial (sh, min) rows
    # straight off the scan, and the per-doc branch shuffles the distinct
    # pair set once. The corpus is scanned/tokenized twice — deliberately:
    # a second columnar scan is cheap at any scale, while caching a
    # corpus-token-proportional pair set is exactly the thing that spills
    # at 100 TB (executed plan verified: both branches partial-aggregate
    # before their exchanges).
    per_doc = pairs.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    novel_per_doc = (
        pairs.groupBy("sh")
        .agg(F.min(id_col).alias("first_doc"))
        .groupBy("first_doc")
        .agg(F.count(F.lit(1)).alias("n_novel"))
        .withColumnRenamed("first_doc", id_col)
    )
    return (
        per_doc.join(novel_per_doc, id_col, "left")
        .select(
            id_col,
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.coalesce(F.col("n_novel"), F.lit(0)).cast("long").alias("n_novel"),
            F.round(
                F.coalesce(F.col("n_novel"), F.lit(0)) / F.col("n_shingles"), 4
            ).alias("novelty_frac"),
        )
    )


def kl_by_source(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group unigram KL divergence D(p_group ‖ p_corpus) — the
    distribution-level drift detector that complements the per-feature
    KS test (``ks_drift``): how far each source's word usage sits from
    the corpus mixture, in nats. A spiking source (template flood, new
    crawl seed, encoding bug) moves before any single feature does.

    No smoothing is needed: every group word is by construction in the
    corpus (the corpus counts are DERIVED from the per-group counts, one
    aggregation tree, no second corpus pass), so p_corpus(w) > 0 wherever
    p_group(w) > 0. Per-word terms are rounded to 6 dp and summed as
    DECIMAL (order-independent — the BM25/entropy discipline). Plan: one
    (group, word) count shuffle, a word-keyed corpus rollup of THAT
    aggregate, one word join (both sides partial-aggregated), one final
    per-group sum. Emits ``(group, n_tokens, kl_div)``."""
    tok = df.select(
        F.col(group_col).alias("grp"), F.explode(_words(text_col)).alias("w")
    )
    gw = tok.groupBy("grp", "w").agg(F.count(F.lit(1)).alias("c_gw"))
    return kl_from_group_counts(gw, group_col=group_col)


def kl_from_group_counts(gw: DataFrame, group_col: str = "source") -> DataFrame:
    """The KL scoring stage over pre-computed (grp, w, c_gw) counts —
    shared by the fresh-tokenize path (:func:`kl_by_source`) and the
    incrementally-maintained index path
    (:mod:`couch_to_postgres_spark.streaming.stats_stream`), so the two
    cannot drift numerically (the ``bm25_rank_components`` discipline)."""
    gtot = gw.groupBy("grp").agg(F.sum("c_gw").alias("n_g"))
    cw = gw.groupBy("w").agg(F.sum("c_gw").alias("c_w"))
    ctot = gw.agg(F.sum("c_gw").alias("n_c"))
    term = F.round(
        (F.col("c_gw") / F.col("n_g"))
        * F.log(
            (F.col("c_gw") / F.col("n_g"))
            / (F.col("c_w") / F.col("n_c"))
        ),
        6,
    ).cast("decimal(18,6)")
    return (
        gw.join(cw, "w")
        .join(gtot, "grp")
        .crossJoin(F.broadcast(ctot))
        .groupBy("grp")
        .agg(
            F.sum("c_gw").cast("long").alias("n_tokens"),
            F.round(F.sum(term), 4).cast("double").alias("kl_div"),
        )
        .select(F.col("grp").alias(group_col), "n_tokens", "kl_div")
    )


def hapax_rate_by_source(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-group hapax legomena rate: the fraction of the group's
    vocabulary occurring exactly once in it — the vocabulary-health axis
    between entropy (usage balance) and Zipf slope (frequency decay).
    Natural text sits near 0.4–0.6; template floods crush it, random
    noise pushes it toward 1. One (group, word) count shuffle + one
    per-group rollup, both partial-aggregated. Emits
    ``(group, n_types, n_hapax, hapax_rate)``."""
    tok = df.select(
        F.col(group_col).alias("grp"), F.explode(_words(text_col)).alias("w")
    )
    gw = tok.groupBy("grp", "w").agg(F.count(F.lit(1)).alias("c"))
    return hapax_from_group_counts(gw, group_col=group_col)


def hapax_from_group_counts(
    gw: DataFrame, group_col: str = "source"
) -> DataFrame:
    """The hapax-rate rollup over pre-computed (grp, w, c) counts —
    shared by :func:`hapax_rate_by_source` and the maintained-index path
    (:mod:`couch_to_postgres_spark.streaming.stats_stream`)."""
    return (
        gw.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_hapax"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_types",
            "n_hapax",
            F.round(F.col("n_hapax") / F.col("n_types"), 4).alias("hapax_rate"),
        )
    )


def compression_band_select(
    df: DataFrame,
    ratios: DataFrame,
    lo: float = 0.25,
    hi: float = 0.95,
    id_col: str = "doc_id",
    ratio_col: str = "compression_ratio",
) -> DataFrame:
    """Quality SELECTION over precomputed per-doc compression ratios:
    keep docs whose ratio lies inside ``[lo, hi]`` — below it is
    degenerate repetition/boilerplate, above it near-random noise (the
    classic band rule downstream of :func:`compression_ratio`). Split
    out from the codec so the DECISION leg is value-oracle-able
    (VERDICT r12 #5): any ratio column replays in SQL; only zlib itself
    cannot. Emits the FULL decision table ``(id, ratio, kept)`` — both
    sides of the band, not just survivors — so an oracle checks the
    boundary behavior, and a missing ratio row (never scored) is
    ``kept = false``, the conservative default for selection."""
    r = ratios.select(F.col(id_col), F.col(ratio_col))
    return df.select(F.col(id_col)).join(r, on=id_col, how="left").select(
        F.col(id_col),
        F.col(ratio_col),
        (
            F.col(ratio_col).isNotNull()
            & (F.col(ratio_col) >= F.lit(float(lo)))
            & (F.col(ratio_col) <= F.lit(float(hi)))
        ).alias("kept"),
    )
