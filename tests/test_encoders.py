"""Encoder goldens ported from reference tests/model/test_n_gram_encoder.py
plus surface/position feature checks against the reference predicates."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from bioner_spark.functions.ngrams import (
    build_vocabulary,
    char_ngrams,
    encode_multihot_indices,
    is_unknown,
    keep_only_printable_chars,
)
from bioner_spark.functions.position import with_position_features
from bioner_spark.functions.surface import FEATURE_NAMES, with_surface_features


def _scalar(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


# ---- keep_only_printable_chars: all 17 reference cases (:5-56) -------------
def test_keep_only_printable_chars(spark):
    cases = {
        "Test": "test",
        "(ASA)": "(asa)",
        "Reye's": "reye's",
        "acetaminophen/aspirin/pro-caffeine": "acetaminophen/aspirin/pro-caffeine",
        "11.8%": "11.8%",
        "1,667": "1,667",
        "a b": "ab",
        "25 °C (77 °F)": "25c(77f)",
        '"<cite>"': '""',  # '<' '>' are Sm: kept? see below
        "§63": "§63",
        "Maßähnliche": "maßähnliche",
        "né": "né",
        "français": "français",
        "l'amuïssement": "l'amuïssement",
        "conquête": "conquête",
        "?": "?",
    }
    # NOTE on '"<cite>"': < and > are Unicode Sm, so the reference KEEPS them
    # ('"<cite>"'), see test_alphabet :31-32.
    cases['"<cite>"'] = '"<cite>"'
    df = spark.createDataFrame(pd.DataFrame({"t": list(cases)}))
    got = {
        r["t"]: r["c"]
        for r in df.select("t", keep_only_printable_chars(F.col("t")).alias("c")).collect()
    }
    assert got == cases


def test_ngram_generation(spark):
    # reference :58-72
    got = _scalar(spark, char_ngrams(F.lit("Aspirin"), 3))
    assert got == ["#as", "asp", "spi", "pir", "iri", "rin", "in#"]
    assert _scalar(spark, char_ngrams(F.lit("cat"), 5)) == ["#cat#"]
    assert _scalar(spark, char_ngrams(F.lit("cat"), 6)) == []
    assert _scalar(spark, char_ngrams(F.lit(""), 3)) == []


def _texoo_tokens(spark):
    rows = [
        ("d0", 0, 0, "Zaimean"),
        ("d0", 0, 1, "Prime"),
        ("d0", 0, 2, "Minister"),
        ("d0", 1, 0, "Kisto"),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "sentence_id", "token_id", "text"])
    )


def test_vocab_build_and_multihot(spark):
    # reference :75-97 (TeXoo fixture): vocab size 23; Minister→8, Mistister→5
    toks = _texoo_tokens(spark)
    vocab = build_vocabulary(toks, min_word_frequency=1)
    assert vocab.count() == 23

    probe = spark.createDataFrame(
        pd.DataFrame(
            [("p", 0, 0, "Minister"), ("p", 0, 1, "Mistister"), ("p", 0, 2, "Kengo")],
            columns=["doc_id", "sentence_id", "token_id", "text"],
        )
    )
    enc = encode_multihot_indices(probe, vocab).orderBy("token_id").collect()
    assert len(enc[0]["ngram_indices"]) == 8
    assert len(enc[1]["ngram_indices"]) == 5
    unk = {
        r["text"]: r["is_unknown"]
        for r in is_unknown(probe, vocab).collect()
    }
    assert unk == {"Minister": False, "Mistister": True, "Kengo": True}


def test_vocab_index_order(spark):
    # reference :116-132: count desc; engine tiebreak = ngram asc (documented)
    rows = [("d", 0, i, w) for i, w in enumerate(["test", "tests", "testz", "tests", "tests", "testz"])]
    # use whole words as "ngrams" via a 1-token vocab over full-token grams:
    # instead test the ordering rule directly on counts
    toks = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "sentence_id", "token_id", "text"])
    )
    vocab = build_vocabulary(toks, min_word_frequency=1).orderBy("index").collect()
    counts = [(r["ngram"], r["count"], r["index"]) for r in vocab]
    # counts strictly descending, ties broken by ngram asc, dense 0-based
    assert [r[2] for r in counts] == list(range(len(counts)))
    for a, b in zip(counts, counts[1:]):
        assert (a[1], b[0]) > (b[1], a[0]) or (a[1] > b[1]) or (a[1] == b[1] and a[0] < b[0])


def test_surface_features(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            [
                ("d", 0, 0, "Aspirin"),
                ("d", 0, 1, "ASA"),
                ("d", 0, 2, "mg"),
                ("d", 0, 3, "11.8%"),
                ("d", 0, 4, "(aspirin)"),
                ("d", 0, 5, "mmHg"),
            ],
            columns=["doc_id", "sentence_id", "token_id", "text"],
        )
    )
    rows = {r["text"]: r for r in with_surface_features(df).collect()}
    a = rows["Aspirin"]
    assert a["starts_with_uppercase"] and not a["starts_with_lowercase"]
    assert not a["is_all_uppercase"] and not a["is_all_lowercase"] and not a["is_mixed_case"]
    assert rows["ASA"]["is_all_uppercase"]
    assert rows["mg"]["is_all_lowercase"]
    n = rows["11.8%"]
    # '%' is punctuation? No: % is Po → yes \p{P}. '.'/digits are N/P.
    assert n["is_all_numeric"] and n["includes_numeric"]
    assert n["starts_with_numeric"] and n["ends_with_numeric"]
    p = rows["(aspirin)"]
    assert p["starts_with_punctuation"] and p["ends_with_punctuation"]
    assert p["starts_with_lowercase"]  # letters-only view starts with 'a'
    m = rows["mmHg"]
    assert m["is_mixed_case"]  # not starts-upper, not all-upper, not all-lower


def test_position_features(spark):
    rows = [
        ("d", 0, 0), ("d", 0, 1), ("d", 1, 0), ("d", 1, 1), ("d", 1, 2),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "sentence_id", "token_id"])
    ).withColumn("text", F.lit("w"))
    got = {
        (r["sentence_id"], r["token_id"]): (
            r["begin_doc"], r["begin_sentence"], r["end_sentence"], r["end_document"]
        )
        for r in with_position_features(df).collect()
    }
    assert got[(0, 0)] == (True, True, False, False)
    assert got[(0, 1)] == (False, False, True, False)
    assert got[(1, 0)] == (False, True, False, False)
    assert got[(1, 1)] == (False, False, False, False)
    assert got[(1, 2)] == (False, False, True, True)


def test_surface_strip_matches_python_strip_semantics(spark):
    """The reference strips tokens with Python .strip() — NBSP/tab padding
    must strip like the reference, not like ASCII-space-only F.trim."""
    import duckdb

    from bioner_spark.functions.surface import with_surface_features

    probes = ["5 ", "\tABC\t", " x ", "5 "]
    df = spark.createDataFrame([(p,) for p in probes], "text string")
    rows = {r.text: r for r in with_surface_features(df).collect()}
    assert rows["5 "].is_all_numeric and rows["5 "].ends_with_numeric
    assert rows["5 "].is_all_numeric == rows["5 "].is_all_numeric
    assert rows["\tABC\t"].is_all_uppercase
    assert rows[" x "].is_all_lowercase

    # the oracle's trim(token, PY_STRIP_WHITESPACE) strips the same set
    from bioner_spark.functions.surface import PY_STRIP_WHITESPACE

    con = duckdb.connect()
    for p in probes:
        got = con.execute(
            "SELECT trim(?, ?)", [p, PY_STRIP_WHITESPACE]
        ).fetchone()[0]
        assert got == p.strip(), (p, got)
