"""Span-decode goldens ported from the reference test suite
(tests/model/metrics/test_entity_level_precision.py:32-66) plus
differential testing of the Spark window implementation against the
pure-Python port of the reference state machine."""

from __future__ import annotations

import random

import pandas as pd

from bioner_spark.spans import decode_spans, decode_spans_reference


def _spark_decode(spark, sentences: list[list[str]]):
    rows = [
        ("d", sid, tid, f"w{tid}", tag)
        for sid, tags in enumerate(sentences)
        for tid, tag in enumerate(tags)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "sentence_id", "token_id", "text", "tag"])
    )
    out = decode_spans(df).collect()
    return sorted((r.sentence_id, r.start_tok, r.end_tok) for r in out)


def test_simple_bio_spans(spark):
    assert _spark_decode(spark, [["B", "I", "O", "B"]]) == [(0, 0, 1), (0, 3, 3)]


def test_i_after_o_opens_span(spark):
    # reference entity_level_precision_recall.py:142-143
    assert _spark_decode(spark, [["O", "I", "I", "O"]]) == [(0, 1, 2)]


def test_i_at_sentence_start_opens_span(spark):
    assert _spark_decode(spark, [["I", "I", "O"]]) == [(0, 0, 1)]


def test_b_closes_open_span(spark):
    assert _spark_decode(spark, [["B", "B", "I"]]) == [(0, 0, 0), (0, 1, 2)]


def test_span_flushed_at_sentence_end(spark):
    assert _spark_decode(spark, [["O", "O", "B", "I"]]) == [(0, 2, 3)]


def test_all_o_yields_nothing(spark):
    assert _spark_decode(spark, [["O", "O", "O"]]) == []


def test_multiple_sentences(spark):
    assert _spark_decode(spark, [["B", "O"], ["O", "B", "I"]]) == [(0, 0, 0), (1, 1, 2)]


def test_differential_vs_reference_state_machine(spark):
    rng = random.Random(1234)  # reference test seed
    sentences = [
        [rng.choice(["B", "I", "O"]) for _ in range(rng.randint(1, 12))]
        for _ in range(60)
    ]
    expected = sorted(decode_spans_reference(sentences))
    assert _spark_decode(spark, sentences) == expected


def test_mention_text_ordering(spark):
    df_rows = [("d", 0, 0, "acetylsalicylic", "B"), ("d", 0, 1, "acid", "I")]
    import pandas as pd

    df = decode_spans(
        # build via spark
        __import__("pyspark").sql.SparkSession.getActiveSession().createDataFrame(
            pd.DataFrame(df_rows, columns=["doc_id", "sentence_id", "token_id", "text", "tag"])
        )
    ).collect()
    assert df[0].mention_text == "acetylsalicylic acid"
