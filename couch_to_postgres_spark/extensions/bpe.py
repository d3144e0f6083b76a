"""Distributed BPE (byte-pair encoding) tokenizer training.

The prompt-level story: a training-data engine should be able to LEARN
its subword vocabulary from the corpus it curates, not just count
whitespace tokens. Classic BPE (Sennrich et al., 2016) iteratively
merges the most frequent adjacent symbol pair; the textbook
implementation walks the corpus per merge — unusable at 100 TB.

The scale trick here is the standard one: the corpus is touched ONCE to
build the word-frequency table (vocabulary-sized — millions of rows,
not trillions), and every merge iteration runs over THAT table:

* pair counting = explode adjacent symbol pairs weighted by word count
  (a vocabulary-sized shuffle on uniform pair keys);
* the arg-max pair comes to the driver as ONE row per iteration;
* the merge rewrite is a row-local higher-order fold over each word's
  symbol array (greedy left-to-right, non-overlapping — the BPE rule);
* ``localCheckpoint`` per iteration truncates the growing lineage (the
  standard Spark iterative-algorithm idiom).

Tie-breaking is total and deterministic (count DESC, pair lexicographic
ASC), so the learned merge list is reproducible on any partitioning.
Iterative arg-max has no SQL form — this module is pytest-pinned, not
oracle-checked (same category as the LBFGS quality classifier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word marker (kept out of the corpus alphabet by construction)
EOW = "▁"


def _merge_pair_expr(symbols, a: str, b: str):
    """Greedy left-to-right non-overlapping merge of adjacent (a, b) into
    ``a+b`` as a pure JVM fold: append each symbol unless the previous
    output symbol is exactly ``a`` and the current one is ``b``, in which
    case the pair collapses. A just-merged token can't re-merge (its text
    is ``a+b``, not ``a``), which IS the non-overlap rule."""
    ab = a + b
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda out, cur: F.when(
            (F.size(out) > 0)
            & (F.element_at(out, -1) == F.lit(a))
            & (cur == F.lit(b)),
            F.concat(
                F.slice(out, 1, F.size(out) - 1), F.array(F.lit(ab))
            ),
        ).otherwise(F.concat(out, F.array(cur))),
    )


def word_frequency_table(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The single corpus pass: distinct words with counts, each word as
    its initial symbol array (characters + end-of-word marker)."""
    from couch_to_postgres_spark.extensions.text import _words

    wf = (
        df.select(F.explode(_words(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    syms = F.concat(
        F.split(F.col("word"), ""), F.array(F.lit(EOW))
    )
    return wf.select("word", "cnt", syms.alias("symbols"))


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 50,
    min_pair_count: int = 2,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns
    ``(merges, vocab)`` where ``merges`` is the ordered merge list and
    ``vocab`` the final (word, cnt, symbols) table — the encoding
    artifact (:func:`encode_bpe` joins against it, so encoding is one
    broadcast/hash join, not a re-derivation).

    Stops early when the best remaining pair falls under
    ``min_pair_count`` (merging hapax noise learns nothing)."""
    vocab = word_frequency_table(df, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        # filter BEFORE the pair explode: a fully-merged word has one
        # symbol, and sequence(0, -1) counts DOWN to [0, -1] — index -1
        # would then crash element_at. (Catalyst happens to push a
        # post-select filter below the Generate, but correctness must
        # not depend on an optimizer rule.)
        pairs = vocab.filter(F.size("symbols") >= 2).select(
            "cnt",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("symbols") - 2),
                    lambda i: F.struct(
                        F.element_at(F.col("symbols"), i + 1).alias("a"),
                        F.element_at(F.col("symbols"), i + 2).alias("b"),
                    ),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p")
            .agg(F.sum("cnt").alias("total"))
            .orderBy(F.col("total").desc(), F.col("p.a"), F.col("p.b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["total"] < min_pair_count:
            break
        a, b = best[0]["p"]["a"], best[0]["p"]["b"]
        merges.append((a, b))
        vocab = vocab.select(
            "word",
            "cnt",
            _merge_pair_expr(F.col("symbols"), a, b).alias("symbols"),
        ).localCheckpoint(eager=True)
    return merges, vocab


def encode_bpe(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode documents with a trained vocabulary: explode words with
    positions, join the (word → symbols) table, flatten back per doc in
    word order. Out-of-vocabulary words fall back to characters + EOW
    (their merge path was never learned). Emits ``(id, tokens, n_tokens)``.

    Plan: the vocab join is a hash join on uniform word keys (broadcast
    when the vocab is small); re-assembly is one doc-keyed aggregation —
    no per-merge passes at encode time at all, which is the payoff of
    returning the vocabulary from training."""
    from couch_to_postgres_spark.extensions.text import _words

    words = df.select(
        F.col(id_col),
        F.posexplode(_words(text_col)).alias("pos", "word"),
    )
    fallback = F.concat(F.split(F.col("word"), ""), F.array(F.lit(EOW)))
    joined = words.join(
        vocab.select("word", "symbols"), "word", "left"
    ).select(
        id_col,
        "pos",
        F.coalesce(F.col("symbols"), fallback).alias("symbols"),
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "symbols"))
                    ),
                    lambda s: s["symbols"],
                )
            ).alias("tokens")
        )
        .select(
            id_col, "tokens", F.size("tokens").cast("long").alias("n_tokens")
        )
    )
