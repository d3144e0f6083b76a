"""Distributed BPE training/encoding: deterministic merges from the
word-frequency table, greedy non-overlapping merge rule, vocab-join
encoding with OOV fallback."""

from pyspark.sql import functions as F

from couch_to_postgres_spark.extensions.bpe import (
    EOW,
    encode_bpe,
    train_bpe,
    word_frequency_table,
)


def _corpus(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_first_merge_is_most_frequent_pair(spark):
    # "ab" appears inside every 'abc' (5x) and 'abd' (4x): (a,b) must be
    # the first learned merge; ties would break lexicographically
    df = _corpus(spark, ["abc abc abc abc abc", "abd abd abd abd"])
    merges, vocab = train_bpe(df, num_merges=1)
    assert merges == [("a", "b")]
    syms = {r["word"]: r["symbols"] for r in vocab.collect()}
    assert syms["abc"] == ["ab", "c", EOW]
    assert syms["abd"] == ["ab", "d", EOW]


def test_merges_chain_into_longer_units(spark):
    # a word dominating the corpus gets fully merged symbol by symbol
    df = _corpus(spark, ["low low low low low low", "west west"])
    merges, vocab = train_bpe(df, num_merges=10, min_pair_count=2)
    syms = {r["word"]: r["symbols"] for r in vocab.collect()}
    assert syms["low"] == ["low" + EOW]  # fully merged, EOW absorbed
    assert ("l", "o") in merges or ("o", "w") in merges


def test_merge_rule_is_greedy_non_overlapping(spark):
    # 'aaaa' under merge (a,a): left-to-right gives [aa, aa], never
    # overlapping [a,aa,a]-style splits
    df = _corpus(spark, ["aaaa aaaa aaaa"])
    merges, vocab = train_bpe(df, num_merges=1)
    assert merges == [("a", "a")]
    syms = vocab.collect()[0]["symbols"]
    assert syms == ["aa", "aa", EOW]


def test_training_is_deterministic(spark):
    df = _corpus(spark, ["the cat sat on the mat", "the bat and the rat"])
    m1, _ = train_bpe(df, num_merges=8)
    m2, _ = train_bpe(df, num_merges=8)
    assert m1 == m2


def test_encode_joins_vocab_and_handles_oov(spark):
    train = _corpus(spark, ["hello hello hello world world"])
    merges, vocab = train_bpe(train, num_merges=6)
    test_df = _corpus(spark, ["hello unseen"])
    out = {r["doc_id"]: r for r in encode_bpe(test_df, vocab).collect()}
    toks = out[0]["tokens"]
    # OOV word falls back to characters + EOW (the tail of the stream)
    assert toks[-7:] == list("unseen") + [EOW]
    # seen word uses its merged symbols: everything before the OOV tail,
    # strictly fewer units than its raw character+EOW form
    hello_part = toks[:-7]
    assert 1 <= len(hello_part) < len("hello") + 1
    assert "".join(hello_part) == "hello" + EOW  # lossless segmentation
    assert out[0]["n_tokens"] == len(toks)


def test_min_pair_count_stops_early(spark):
    df = _corpus(spark, ["x y z"])  # all pairs are hapax
    merges, _ = train_bpe(df, num_merges=5, min_pair_count=2)
    assert merges == []


def test_word_frequency_table_is_vocab_sized(spark):
    df = _corpus(spark, ["a b a b a", "b a b"])
    wf = word_frequency_table(df)
    got = {r["word"]: r["cnt"] for r in wf.collect()}
    assert got == {"a": 4, "b": 4}
