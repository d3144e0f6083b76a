"""Line/paragraph-level hygiene: C4 line cleaning, Gopher repetition
signals, and the full Gopher rule table (`extensions/lines.py`).

Reference scope note: couch-to-postgres (lib/index.js) only mirrors docs;
line-level hygiene is part of this repo's training-data stratum, modeled
on the published C4 (Raffel et al. 2020 §2.2) and Gopher (Rae et al.
2021 A1.1) rules.
"""

import pytest
from pyspark.sql import functions as F

from couch_to_postgres_spark.extensions import lines as L


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # doc 1: mixed-quality lines, one exact dup pair
        (
            1,
            "This is a good first sentence.\n"
            "short\n"
            "Enable javascript to continue browsing.\n"
            "The quick brown fox jumps over the dog.\n"
            "The quick brown fox jumps over the dog.",
        ),
        # doc 2: single line, no terminal punctuation
        (2, "no terminal punctuation on this line"),
        # doc 3: bullets + ellipsis
        (
            3,
            "- first bullet item here.\n"
            "- second bullet item here.\n"
            "Trailing thought goes on and on...",
        ),
        # doc 4: paragraphs (blank-line separated), one dup paragraph
        (
            4,
            "Para one is fine and long enough.\n\n"
            "Para two repeats soon after this.\n\n"
            "Para two repeats soon after this.",
        ),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_as_lines_deterministic_relining(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, ""), (3, "x y")],
        "doc_id long, text string",
    )
    out = dict(
        df.select("doc_id", L.as_lines("text", 3).alias("t")).collect()
    )
    assert out[1] == "a b c\nd e f\ng h"  # remainder keeps last short line
    assert out[2] == ""
    assert out[3] == "x y"


def test_c4_line_clean_rules(docs):
    out = {
        r["doc_id"]: r
        for r in L.c4_line_clean(docs, min_words=3).collect()
    }
    # doc 1: keeps the two good sentences + the dup (blacklist kills the
    # javascript line, min_words kills "short")
    assert out[1]["n_lines"] == 5 and out[1]["n_lines_kept"] == 3
    assert "javascript" not in out[1]["clean_text"]
    assert "short" not in out[1]["clean_text"].split("\n")
    # doc 2: no terminal punctuation -> every line dropped -> doc dropped
    assert 2 not in out
    # doc 3: all three lines end with . or ... (ellipsis ends in '.')
    assert out[3]["n_lines_kept"] == 3


def test_c4_line_clean_optional_punct_and_empty_doc_retention(docs):
    out = {
        r["doc_id"]: r
        for r in L.c4_line_clean(
            docs, min_words=3, require_terminal_punct=False,
            drop_empty_docs=False,
        ).collect()
    }
    assert out[2]["n_lines_kept"] == 1  # survives without the punct rule
    # blacklist is still applied
    assert "javascript" not in out[1]["clean_text"]


def test_line_repetition_counts_all_duplicate_occurrences(docs):
    rep = {r["doc_id"]: r for r in L.line_repetition(docs).collect()}
    # doc 1: 5 lines, 4 distinct -> dup_line_frac = 1/5
    assert rep[1]["n_lines"] == 5
    assert rep[1]["dup_line_frac"] == pytest.approx(0.2)
    # char frac counts BOTH occurrences of the duplicated line
    dup_chars = 2 * len("The quick brown fox jumps over the dog.")
    total = (
        len("This is a good first sentence.")
        + len("short")
        + len("Enable javascript to continue browsing.")
        + dup_chars
    )
    assert rep[1]["dup_line_char_frac"] == pytest.approx(
        round(dup_chars / total, 4)
    )
    assert rep[2]["dup_line_frac"] == 0.0


def test_paragraph_variant_via_sep(docs):
    rep = {
        r["doc_id"]: r
        for r in L.line_repetition(docs, sep="\n\n").collect()
    }
    # doc 4: 3 paragraphs, one duplicated -> 1/3 occurrences beyond first
    assert rep[4]["n_lines"] == 3
    assert rep[4]["dup_line_frac"] == pytest.approx(0.3333)
    # doc 1 has no blank lines: a single "paragraph", no dups
    assert rep[1]["n_lines"] == 1


def test_gopher_rules_table(docs):
    out = {
        r["doc_id"]: r
        for r in L.gopher_rules(
            docs, min_words=5, min_stopword_hits=1, max_dup_line_frac=0.1
        ).collect()
    }
    r1 = out[1]
    assert r1["n_words"] == 28  # 6 + 1 + 5 + 8 + 8 across the 5 lines
    assert not r1["r_dup_lines"]  # 0.2 > 0.1
    assert not r1["gopher_pass"]
    r3 = out[3]
    assert r3["bullet_line_frac"] == pytest.approx(0.6667)
    assert r3["ellipsis_line_frac"] == pytest.approx(0.3333)
    # every rule column is boolean and present
    bools = [c for c in out[1].asDict() if c.startswith("r_")]
    assert len(bools) == 9


def test_gopher_rules_shuffle_free_base(spark, docs):
    # the doc-local signals must not shuffle: only line_repetition's
    # two aggregations (and its join) may appear in the plan
    plan = L.gopher_rules(docs)._jdf.queryExecution().executedPlan().toString()
    # one join (base x rep); no window, no sort-based funnel
    assert "Window" not in plan
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") <= 1


def test_on_relined_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    relined = docs.select(
        "doc_id", L.as_lines("text", 7).alias("text")
    )
    out = L.c4_line_clean(
        relined, min_words=7, require_terminal_punct=False, blacklist=["slow"]
    )
    n_docs = docs.count()
    kept = out.count()
    assert 0 < kept <= n_docs
    # every kept line really has >= 7 words and no 'slow'
    bad = out.filter(
        F.exists(
            F.split("clean_text", "\n"),
            lambda l: (F.size(F.split(l, " ")) < 7)
            | F.contains(F.lower(l), F.lit("slow")),
        )
    ).count()
    assert bad == 0


def test_line_lm_scores_penalize_atypical_order(spark):
    fluent = "alpha beta gamma delta"
    rows = [(i, fluent + "\n" + fluent) for i in range(1, 9)]
    rows.append((9, fluent + "\ndelta alpha gamma beta"))  # shuffled words
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sc = {
        (r["doc_id"], r["line_no"]): r["line_score"]
        for r in L.line_lm_scores(df).collect()
    }
    # same unigrams, never-seen-together bigrams -> lower score
    assert sc[(9, 1)] < sc[(9, 0)]
    thr = (sc[(9, 1)] + sc[(9, 0)]) / 2
    out = {
        r["doc_id"]: r for r in L.line_lm_clean(df, threshold=thr).collect()
    }
    assert out[9]["n_lines_kept"] == 1 and out[9]["clean_text"] == fluent
    # fluent docs keep both lines, rebuilt in original order
    assert out[1]["n_lines_kept"] == 2
    assert out[1]["clean_text"] == fluent + "\n" + fluent


def test_line_lm_unscorable_lines_survive_any_threshold(spark):
    df = spark.createDataFrame(
        [(1, "solo\nalpha beta gamma\nalpha beta gamma")],
        "doc_id long, text string",
    )
    # +100 threshold kills every SCORED line; the bigram-less line stays
    out = L.line_lm_clean(df, threshold=100.0).collect()[0]
    assert out["n_lines_kept"] == 1 and out["clean_text"] == "solo"
    # and an impossible-to-fail threshold keeps everything
    keep_all = L.line_lm_clean(df, threshold=-100.0).collect()[0]
    assert keep_all["n_lines_kept"] == 3


def test_gopher_rules_degenerate_docs_fail_every_rule(spark):
    # zero-word / zero-line docs have no denominators: signals are NULL
    # but every rule — and gopher_pass — must be FALSE (not NULL), so a
    # downstream WHERE <rule> excludes them with the failure recorded
    df = spark.createDataFrame(
        [(1, ""), (2, "   \n  \n "), (3, "A real sentence with words.")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in L.gopher_rules(df, min_words=1).collect()}
    rule_cols = [c for c in out[1].asDict() if c.startswith("r_")]
    for d in (1, 2):
        assert out[d]["mean_word_len"] is None
        assert out[d]["bullet_line_frac"] is None
        for c in rule_cols:
            assert out[d][c] is False, (d, c)
        assert out[d]["gopher_pass"] is False
    # the real doc keeps real booleans
    assert out[3]["gopher_pass"] in (True, False)
    assert all(out[3][c] is not None for c in rule_cols)


def test_line_lm_hashed_keys_equal_string_keys(spark):
    """hashed_keys=True joins the occurrence stream on xxhash64(bg)
    (8-byte keys, string dropped before the shuffle) and must produce
    identical scores at any collision-free scale."""
    from couch_to_postgres_spark.extensions.lines import (
        line_lm_clean,
        line_lm_scores,
    )

    rows = [
        (i, "the quick brown fox\njumps over the dog\nzxq qxz zxq")
        for i in range(40)
    ] + [(100 + i, "spark shuffles the rows\nspark sorts the rows") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = sorted(
        (r["doc_id"], r["line_no"], r["line_score"])
        for r in line_lm_scores(df).collect()
    )
    got = sorted(
        (r["doc_id"], r["line_no"], r["line_score"])
        for r in line_lm_scores(df, hashed_keys=True).collect()
    )
    assert got == want
    a = sorted(
        tuple(r) for r in line_lm_clean(df, threshold=-3.0).collect()
    )
    b = sorted(
        tuple(r)
        for r in line_lm_clean(df, threshold=-3.0, hashed_keys=True).collect()
    )
    assert a == b
