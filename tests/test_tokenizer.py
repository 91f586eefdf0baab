from __future__ import annotations

import pandas as pd

from bioner_spark import corpus as corpus_mod
from bioner_spark.schemas import PAGES_SCHEMA
from bioner_spark.tokenizer import tokenize


def test_tokenize_offsets(spark):
    pages = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u1"],
                "warc_ts": [pd.Timestamp("2024-01-01")],
                "html": [b""],
                "text": ["aspirin treats headache .\nsecond line here ."],
                "lang": ["en"],
            }
        ),
        schema=PAGES_SCHEMA,
    )
    toks = tokenize(pages).orderBy("sentence_id", "token_id").collect()
    s0 = [(t.token_id, t.text, t.start, t.end) for t in toks if t.sentence_id == 0]
    assert s0 == [
        (0, "aspirin", 0, 7),
        (1, "treats", 8, 14),
        (2, "headache", 15, 23),
        (3, ".", 24, 25),
    ]
    s1 = [(t.token_id, t.text, t.start, t.end) for t in toks if t.sentence_id == 1]
    assert s1 == [(0, "second", 0, 6), (1, "line", 7, 11), (2, "here", 12, 16), (3, ".", 17, 18)]


def test_tokenize_matches_gold_corpus(spark, corpus):
    """Spark tokenization == the generator's gold token table (text/offsets)."""
    pages = corpus_mod.pages_spark_df(spark, corpus)
    got = (
        tokenize(pages)
        .orderBy("doc_id", "sentence_id", "token_id")
        .toPandas()
    )
    gold = (
        corpus.tokens[["doc_id", "sentence_id", "token_id", "text", "start", "end"]]
        .sort_values(["doc_id", "sentence_id", "token_id"])
        .reset_index(drop=True)
    )
    got = got.astype({"sentence_id": "int64", "token_id": "int64", "start": "int64", "end": "int64"})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), gold.reset_index(drop=True))


def test_tokenize_plan_has_no_shuffle(spark, corpus):
    pages = corpus_mod.pages_spark_df(spark, corpus)
    plan = tokenize(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
