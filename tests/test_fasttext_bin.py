"""fastText ``.bin`` reader: format parsing + getWordVector dictionary
semantics, pinned against the committed fixture and independent recomputes.

The reference loads trained ``.bin`` embeddings with fasttext.load_model
(bioner/model/encoder/fasttext_encoder.py:14-15); these tests prove the
pure-numpy reader yields the same inference-side state for a format-true
file: header fields decoded at spec offsets by hand (independent of the
module's own constants), the input matrix byte-exact, and word vectors
matching a from-scratch recompute of Dictionary::getSubwords +
FastText::getWordVector.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from bioner_spark.ner.fasttext import (
    EOS,
    LATTICE_SCALE,
    FastTextModel,
    fixture_matrix_int,
    fnv1a,
    subwords,
)
from bioner_spark.ner.fasttext_bin import FastTextBinError, load_bin, write_bin

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "fasttext_tiny.bin")
WORDS = ["</s>", "the", "cancer", "gene", "protein", "cell", "naïve", "α-synuclein"]
NWORDS, BUCKET, DIM, MINN, MAXN = len(WORDS), 64, 8, 3, 4


def expected_matrix() -> np.ndarray:
    return (fixture_matrix_int(NWORDS + BUCKET, DIM) / LATTICE_SCALE).astype(
        "float32"
    )


def reference_vector(word: str) -> np.ndarray:
    """From-scratch getWordVector: dictionary row (if in vocab) + n-gram
    rows at nwords + fnv1a % bucket, averaged — written against the spec,
    not via FastTextModel."""
    mat = expected_matrix()
    rows = []
    if word in WORDS:
        rows.append(WORDS.index(word))
    if word != EOS:
        rows += [NWORDS + fnv1a(sw) % BUCKET for sw in subwords(word, MINN, MAXN)]
    if not rows:
        return np.zeros(DIM, dtype=np.float32)
    return (
        mat[np.array(rows)].sum(axis=0, dtype=np.float64).astype(np.float32)
        / np.float32(len(rows))
    )


def test_fixture_header_bytes_match_spec():
    """Hand-decode the committed fixture's header at spec offsets."""
    raw = open(FIXTURE, "rb").read()
    magic, version = struct.unpack_from("<ii", raw, 0)
    assert magic == 793712314
    assert version == 12
    # args: 12 int32 from offset 8; dim first, bucket 9th, minn/maxn 10/11th
    args = struct.unpack_from("<12i", raw, 8)
    assert args[0] == DIM
    assert args[8] == BUCKET
    assert (args[9], args[10]) == (MINN, MAXN)
    (t,) = struct.unpack_from("<d", raw, 56)
    assert t == pytest.approx(1e-5)
    size, nwords, nlabels = struct.unpack_from("<3i", raw, 64)
    assert (size, nwords, nlabels) == (NWORDS, NWORDS, 0)
    # first vocab entry begins right after ntokens/pruneidx (16 bytes)
    first = raw[92 : 92 + 5]
    assert first == b"</s>\x00"


def test_load_fixture_matrix_and_vocab():
    model, meta = load_bin(FIXTURE)
    assert meta["dim"] == DIM and meta["bucket"] == BUCKET
    assert meta["nwords"] == NWORDS
    assert (model.minn, model.maxn) == (MINN, MAXN)
    assert model.nwords == NWORDS and model.bucket == BUCKET
    assert model.vocab == {w: i for i, w in enumerate(WORDS)}
    np.testing.assert_array_equal(model.matrix, expected_matrix())


@pytest.mark.parametrize(
    "word",
    [
        "cancer",        # in vocab: own row + ngrams
        "the",           # short in-vocab: '<the>' has 3- and 4-grams
        "naïve",         # in vocab, non-ASCII (signed-char FNV path)
        "α-synuclein",   # in vocab, multi-byte leading codepoint
        "carcinoma",     # OOV: ngram rows only
        "à",             # OOV non-ASCII, '<à>' = single 3-gram
        EOS,             # in vocab, no ngrams: exactly its own row
    ],
)
def test_word_vectors_match_spec_recompute(word):
    model, _ = load_bin(FIXTURE)
    np.testing.assert_array_equal(model.word_vector(word), reference_vector(word))


def test_eos_is_pure_dictionary_row():
    model, _ = load_bin(FIXTURE)
    np.testing.assert_array_equal(
        model.word_vector(EOS), expected_matrix()[WORDS.index(EOS)]
    )


def test_oov_word_shorter_than_minn_is_zero():
    model, _ = load_bin(FIXTURE)
    # '<z>' has 3 chars -> one 3-gram, so use the truly empty case: minn=5
    m5 = FastTextModel(
        matrix=model.matrix, minn=5, maxn=6, vocab=model.vocab, nwords=model.nwords
    )
    assert not m5.word_vector("ab").any()


def test_roundtrip_write_read(tmp_path):
    rng = np.random.default_rng(7)
    words = ["</s>", "alpha", "beta"]
    mat = rng.normal(size=(len(words) + 16, 4)).astype("float32")
    p = str(tmp_path / "rt.bin")
    write_bin(p, mat, words, minn=2, maxn=5, ws=7, epoch=3, min_count=2, neg=9)
    model, meta = load_bin(p)
    np.testing.assert_array_equal(model.matrix, mat)
    assert model.vocab == {"</s>": 0, "alpha": 1, "beta": 2}
    assert (meta["minn"], meta["maxn"]) == (2, 5)
    assert (meta["ws"], meta["epoch"], meta["min_count"], meta["neg"]) == (7, 3, 2, 9)


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "bad.bin"
    p.write_bytes(struct.pack("<ii", 123, 12) + b"\x00" * 64)
    with pytest.raises(FastTextBinError, match="magic"):
        load_bin(str(p))


def test_quantized_rejected(tmp_path):
    # take the fixture and flip its quant flag byte
    raw = bytearray(open(FIXTURE, "rb").read())
    # quant flag offset: 92 (dict header end) + per-word entries
    off = 92
    for w in WORDS:
        off += len(w.encode("utf-8")) + 1 + 9
    assert raw[off] == 0
    raw[off] = 1
    p = tmp_path / "quant.bin"
    p.write_bytes(bytes(raw))
    with pytest.raises(FastTextBinError, match="quantized"):
        load_bin(str(p))


def test_truncated_rejected(tmp_path):
    raw = open(FIXTURE, "rb").read()
    p = tmp_path / "trunc.bin"
    p.write_bytes(raw[: len(raw) // 2])
    with pytest.raises(FastTextBinError, match="truncated|rows"):
        load_bin(str(p))


def test_npz_roundtrip_preserves_vocab(tmp_path):
    model, _ = load_bin(FIXTURE)
    p = str(tmp_path / "m.npz")
    model.save(p)
    back = FastTextModel.load(p)
    assert back.vocab == model.vocab and back.nwords == model.nwords
    np.testing.assert_array_equal(
        back.word_vector("cancer"), model.word_vector("cancer")
    )


def test_spark_token_vectors_with_bin_model(spark):
    from bioner_spark.ner.fasttext import fasttext_token_vectors

    model, _ = load_bin(FIXTURE)
    toks = spark.createDataFrame(
        [(1, 0, 0, "cancer"), (1, 0, 1, "carcinoma"), (1, 0, 2, EOS)],
        "doc_id long, sentence_id int, token_id int, text string",
    )
    out = {
        r["text"]: np.array(r["embedding"], dtype=np.float32)
        for r in fasttext_token_vectors(toks, model).collect()
    }
    for w in ("cancer", "carcinoma", EOS):
        np.testing.assert_array_equal(out[w], reference_vector(w))


def test_dim_mismatch_rejected(tmp_path):
    """A .bin whose DenseMatrix column count disagrees with the header dim
    must fail at load, not later as an opaque shape mismatch."""
    rng = np.random.default_rng(3)
    words = ["</s>", "x"]
    mat = rng.normal(size=(len(words) + 4, 4)).astype("float32")
    p = str(tmp_path / "dm.bin")
    write_bin(p, mat, words, minn=2, maxn=3)
    raw = bytearray(open(p, "rb").read())
    # header dim is the FIRST int32 of the args block (after magic+version)
    import struct as _s

    (dim,) = _s.unpack_from("<i", raw, 8)
    assert dim == 4
    _s.pack_into("<i", raw, 8, 300)
    bad = tmp_path / "dm_bad.bin"
    bad.write_bytes(bytes(raw))
    with pytest.raises(FastTextBinError, match="dim"):
        load_bin(str(bad))
