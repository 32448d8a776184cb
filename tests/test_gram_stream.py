"""Parity pin for the Arrow gram stream (r13 optimization): the
Python pass in ``text.gram_stream`` must emit BIT-IDENTICAL rows to
the JVM higher-order-function form it replaced —
``explode(word_ngrams(word_tokens(text), n))`` (and the
``posexplode`` + 1 contract for positions). The HOF form stays in the
codebase as the executable spec; every span/contamination operator
now rides the Python pass (guide §4.2: interpreted HOF lambdas were
~5x slower), so this pin is what keeps the two tokenizations from
drifting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, None),
    (3, ""),
    (4, "...!!!   ???"),
    (5, "one two three"),  # shorter than n for n>3
    (6, "A B C D E F G H"),  # case folding
    (7, "x1 y2   z3\t\nw4 v5 u6 t7 s8"),  # mixed whitespace runs
    (8, "a-b c_d e.f g,h i;j k:l m?n o!p"),  # punctuation separators
    (9, "aa aa aa aa aa aa"),  # repeated token (duplicate grams)
    (10, "word " * 40),  # long repetitive doc
]


def _hof_form(docs, n, with_pos):
    from aggregator_spark.operators.text import word_ngrams, word_tokens

    toks = docs.select(
        "doc_id", word_tokens(F.col("text")).alias("ts")
    ).filter(F.size("ts") >= n)
    if with_pos:
        return toks.select(
            "doc_id",
            F.posexplode(word_ngrams(F.col("ts"), n)).alias("p0", "gram"),
        ).select(
            "doc_id", (F.col("p0") + 1).cast("long").alias("pos"), "gram"
        )
    return toks.select(
        "doc_id", F.explode(word_ngrams(F.col("ts"), n)).alias("gram")
    )


@pytest.mark.parametrize("n", [2, 3, 8, 16])
@pytest.mark.parametrize("with_pos", [False, True])
def test_gram_stream_matches_hof_form(spark, n, with_pos):
    from aggregator_spark.operators.text import gram_stream

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = sorted(
        map(tuple, gram_stream(docs, n, with_pos=with_pos).collect())
    )
    want = sorted(map(tuple, _hof_form(docs, n, with_pos).collect()))
    assert got == want
    # non-trivial coverage: some doc must emit grams at every tested n
    assert got, f"fixture emitted no {n}-grams"


def test_gram_stream_custom_columns(spark):
    from aggregator_spark.operators.text import gram_stream

    docs = spark.createDataFrame(
        [(7, "alpha beta gamma delta")], "k long, body string"
    )
    rows = gram_stream(
        docs, 2, id_col="k", text_col="body"
    ).collect()
    assert {(r.doc_id, r.gram) for r in rows} == {
        (7, "alpha beta"),
        (7, "beta gamma"),
        (7, "gamma delta"),
    }
