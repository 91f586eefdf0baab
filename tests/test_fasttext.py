"""fastText subword inference (P5): hash/subword golden cases, integer-path
exactness, float-path properties, and Spark-vs-single-node parity.

Reference semantics under test: get_word_vector = mean of hashed char-ngram
rows (bioner/model/encoder/fasttext_encoder.py:26-28; config
fasttext_runner.py:13-28, minn/maxn 3-4)."""

from __future__ import annotations

import numpy as np
import pytest

from bioner_spark.ner.fasttext import (
    FastTextModel,
    fixture_matrix_int,
    fnv1a,
    subwords,
)


def test_fnv1a_known_values():
    # FNV-1a 32-bit test vectors (public: Fowler/Noll/Vo reference values)
    assert fnv1a("") == 2166136261
    assert fnv1a("a") == 0xE40C292C
    assert fnv1a("foobar") == 0xBF9CF968


def test_fnv1a_signed_char_cast():
    """fastText's Dictionary::hash XORs int8_t (sign-extended) bytes —
    non-ASCII UTF-8 bytes must go through the signed cast."""
    # 'é' = 0xC3 0xA9; both bytes >= 0x80 → sign-extended
    h = 2166136261
    for b in (0xC3 - 256, 0xA9 - 256):
        h = ((h ^ (b & 0xFFFFFFFF)) * 16777619) & 0xFFFFFFFF
    assert fnv1a("é") == h
    # and differs from the unsigned-byte fold
    hu = 2166136261
    for b in (0xC3, 0xA9):
        hu = ((hu ^ b) * 16777619) & 0xFFFFFFFF
    assert fnv1a("é") != hu


def test_subwords_golden():
    # '<as>' has 3-grams {<as, as>} and 4-gram {<as>}
    assert subwords("as", 3, 4) == ["<as", "as>", "<as>"]
    # codepoint-wise (like fastText computeSubwords): 'é' is ONE char
    assert subwords("é", 3, 4) == ["<é>"]
    got = set(subwords("aspirin", 3, 4))
    assert "<as" in got and "rin" in got and "in>" in got and "spir" in got
    # n-gram counts: (L-2) 3-grams + (L-3) 4-grams for L = len('<w>')
    L = len("<aspirin>")
    assert len(subwords("aspirin", 3, 4)) == (L - 2) + (L - 3)
    # too short for any subword → empty
    assert subwords("", 3, 4) == []


def test_fixture_matrix_lattice():
    m = fixture_matrix_int(bucket=50, dim=8)
    assert m.shape == (50, 8)
    assert m.min() >= -1000 and m.max() <= 1000
    # spot-check the closed form the DuckDB oracle uses
    r, k = 37, 5
    assert m[r, k] == ((r * 2654435761 + k * 40503 + 17) % 2001) - 1000


def test_word_vector_is_mean_of_subword_rows():
    ft = FastTextModel.fixture(bucket=200, dim=8)
    w = "aspirin"
    rows = ft.subword_rows(w)
    expected = ft.matrix[rows].sum(axis=0, dtype=np.float64) / len(rows)
    np.testing.assert_allclose(ft.word_vector(w), expected, rtol=1e-6)
    # no subwords → zero vector
    np.testing.assert_array_equal(ft.word_vector(""), np.zeros(8, dtype=np.float32))


def test_save_load_roundtrip(tmp_path):
    ft = FastTextModel.fixture(bucket=100, dim=4)
    p = str(tmp_path / "ft.npz")
    ft.save(p)
    ft2 = FastTextModel.load(p)
    assert ft2.minn == 3 and ft2.maxn == 4
    np.testing.assert_array_equal(ft.matrix, ft2.matrix)
    np.testing.assert_array_equal(ft.word_vector("hello"), ft2.word_vector("hello"))


def test_spark_vectors_match_single_node(spark):
    """fasttext_token_vectors (mapInPandas, cached) == word_vector per token,
    including repeated and non-ASCII tokens."""
    from bioner_spark.ner.fasttext import fasttext_token_vectors

    ft = FastTextModel.fixture(bucket=500, dim=8)
    words = ["alpha", "beta", "alpha", "généralité", "x", "", "beta-blocker"]
    rows = [(str(i), 0, i, w) for i, w in enumerate(words)]
    tokens = spark.createDataFrame(
        rows, "doc_id string, sentence_id int, token_id int, text string"
    )
    got = {
        r["token_id"]: np.array(r["embedding"], dtype=np.float32)
        for r in fasttext_token_vectors(tokens, ft).collect()
    }
    for i, w in enumerate(words):
        np.testing.assert_allclose(got[i], ft.word_vector(w), rtol=1e-6, atol=1e-7)


def test_int_subword_check_matches_duckdb(spark):
    """The integer verification projection agrees with an independent DuckDB
    implementation of subwords→FNV-1a→bucket→lattice-sum (the same SQL the
    driver oracle uses) — exact int64 equality, no float tolerance."""
    import duckdb

    from bioner_spark.ner.fasttext import int_subword_check

    words = ["aspirin", "the", "microbiome", "acid", "x1", "beta-blocker"]
    tokens = spark.createDataFrame([(w,) for w in words], "text string")
    got = {
        r["token"]: (r["n_subwords"], r["s0"], r["s1"], r["s2"])
        for r in int_subword_check(tokens, bucket=2000, dim=16).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE words(token VARCHAR)")
    con.executemany("INSERT INTO words VALUES (?)", [(w,) for w in words])
    sql = """
WITH sub AS (
  SELECT token, '<' || token || '>' AS w FROM words
),
grams AS (
  SELECT token, substring(w, i, n) AS sw
  FROM sub, (SELECT unnest(generate_series(3, 4)) AS n) ns,
       (SELECT unnest(generate_series(1, 200)) AS i) pos
  WHERE i <= length(w) - n + 1
),
hashed AS (
  SELECT token,
    list_reduce(
      list_prepend(2166136261::BIGINT,
        list_transform(generate_series(1, length(sw)), j -> ascii(substring(sw, j, 1)))),
      (h, b) -> (xor(h, b) * 16777619) % 4294967296
    ) % 2000 AS r
  FROM grams
)
SELECT token, COUNT(*)::INT AS n_subwords,
  SUM(((r * 2654435761 + 0 * 40503 + 17) % 2001) - 1000)::BIGINT AS s0,
  SUM(((r * 2654435761 + 1 * 40503 + 17) % 2001) - 1000)::BIGINT AS s1,
  SUM(((r * 2654435761 + 2 * 40503 + 17) % 2001) - 1000)::BIGINT AS s2
FROM hashed GROUP BY token
"""
    for token, n, s0, s1, s2 in con.execute(sql).fetchall():
        assert got[token] == (n, s0, s1, s2), token


def test_fasttext_ner_path_spark_matches_single_node(spark):
    """BioNER-shape path: fastText embeddings → sequence model, Spark
    distributed vs single-node numpy — identical tags."""
    from bioner_spark.ner.infer import annotate_tokens_fasttext
    from bioner_spark.ner.kernel import init_model

    ft = FastTextModel.fixture(bucket=500, dim=8)
    model = init_model(input_dim=8, feedforward_size=16, lstm_size=8, seed=77)
    sentences = [
        "aspirin inhibits cyclooxygenase",
        "the patient received beta-blocker therapy",
        "microbiome diversity declined",
    ]
    rows = []
    for si, s in enumerate(sentences):
        for ti, w in enumerate(s.split(" ")):
            rows.append(("d0", si, ti, w))
    tokens = spark.createDataFrame(
        rows, "doc_id string, sentence_id int, token_id int, text string"
    )
    got = {
        (r["sentence_id"], r["token_id"]): r["tag"]
        for r in annotate_tokens_fasttext(tokens, ft, model)
        .select("sentence_id", "token_id", "tag")
        .collect()
    }
    for si, s in enumerate(sentences):
        ws = s.split(" ")
        x = np.stack([ft.word_vector(w) for w in ws])[None, :, :]
        tags = model.predict_tags(x, np.array([len(ws)]))[0]
        for ti, tag in enumerate(tags):
            assert got[(si, ti)] == tag, (si, ti)


def test_ship_fasttext_sparkfiles_path(spark):
    """ship_fasttext name → fasttext_token_vectors resolves the model from
    the executor-local SparkFiles copy; vectors identical to the
    closure-shipped model (the scale path for multi-GB real .bin models)."""
    from bioner_spark.ner.fasttext import fasttext_token_vectors, ship_fasttext

    ft = FastTextModel.fixture(bucket=500, dim=8)
    name = ship_fasttext(spark, ft, name="test_ship_ft")
    tokens = spark.createDataFrame(
        [("d0", 0, i, w) for i, w in enumerate(["aspirin", "therapy", "xx"])],
        "doc_id string, sentence_id int, token_id int, text string",
    )
    via_file = {
        r["token_id"]: r["embedding"]
        for r in fasttext_token_vectors(tokens, name).collect()
    }
    via_closure = {
        r["token_id"]: r["embedding"]
        for r in fasttext_token_vectors(tokens, ft).collect()
    }
    assert via_file == via_closure
    assert len(via_file) == 3 and len(via_file[0]) == 8


def test_vector_cache_eviction_keeps_current_batch_hits():
    """Epoch eviction clears words that are HITS in the current batch; the
    final lookup must not KeyError on them (previously task-killing in the
    >max_size distinct-words regime the bound exists for)."""
    import pandas as pd

    from bioner_spark.ner.fasttext import FastTextModel, _VectorCache

    cache = _VectorCache(FastTextModel.fixture(), max_size=3)
    cache.get_many(pd.Series(["a", "b", "c"]))  # fill to the bound
    out = cache.get_many(pd.Series(["a", "d"]))  # hit + miss -> eviction
    assert len(out) == 2
    import numpy as np

    np.testing.assert_array_equal(out[0], cache.model.word_vector("a"))


def test_int_subword_check_eos_matches_production(spark):
    """The verification projection must mirror subword_rows' EOS rule (no
    n-grams for '</s>') — otherwise the oracle validates semantics the
    inference path never executes."""
    from bioner_spark.ner.fasttext import int_subword_check

    df = spark.createDataFrame([("</s>",), ("cell",)], "text string")
    rows = {r.token: r for r in int_subword_check(df).collect()}
    assert rows["</s>"].n_subwords == 0
    assert (rows["</s>"].s0, rows["</s>"].s1, rows["</s>"].s2) == (0, 0, 0)
    assert rows["cell"].n_subwords > 0


def test_save_load_symmetric_without_npz_extension(tmp_path):
    """Same rule as SequenceModel.save: save(path) writes EXACTLY path —
    np.savez_compressed(str) appends .npz to extension-less paths, so
    save('/m/ft_cache') + load('/m/ft_cache') used to FileNotFoundError."""
    import os

    ft = FastTextModel.fixture(bucket=50, dim=4)
    p = str(tmp_path / "ft_cache")  # no extension, like a configured knob
    ft.save(p)
    assert os.path.isfile(p)
    ft2 = FastTextModel.load(p)
    np.testing.assert_array_equal(ft.word_vector("graph"), ft2.word_vector("graph"))
