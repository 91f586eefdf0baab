"""Property-based tests (hypothesis) over the engine's pure-Python
authorities and the Spark operators they differentially gate.

Randomized counterpart of the golden/differential suites (SURVEY.md §5):
rather than fixed fixtures, hypothesis searches the input space for
law violations and shrinks failures to minimal counterexamples.

Laws covered:
  * Huffman codes (functions/huffman.py — V4): prefix-freeness, exact
    Kraft equality, frequency-monotone code lengths, cost-optimality vs
    an independent heapq Huffman, and the word2vec `point` contract.
  * Span decode: the declarative cumsum formulation used by the Spark
    window plan (spans.py:10-14) against the ported reference state
    machine `decode_spans_reference` — the exact equivalence the
    docstring claims, checked on arbitrary tag strings, plus the real
    `decode_spans` DataFrame on random batches.
  * WAV-PCM / netpbm codecs (ops/multimodal.py): encode→decode identity
    and a decoder fuzz law (arbitrary bytes either decode or raise
    MediaDecodeError/NotImplementedError — never an uncontrolled error).
  * Tokenizer offsets (tokenizer.py): `sentence[start:end] == text` for
    every emitted token on arbitrary Unicode corpora — the char-offset
    law the CoNLL round trip relies on.
"""

from __future__ import annotations

import heapq
from fractions import Fraction

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bioner_spark.functions.huffman import build_codes
from bioner_spark.ops.multimodal import (
    MediaDecodeError,
    decode_netpbm,
    decode_wav,
    encode_ppm,
    encode_wav_pcm16,
)
from bioner_spark.spans import decode_spans, decode_spans_reference

# ---------------------------------------------------------------------------
# Huffman (pure numpy — fast, wide example budget)
# ---------------------------------------------------------------------------

counts_desc = st.lists(
    st.integers(min_value=1, max_value=10**9), min_size=2, max_size=150
).map(lambda xs: sorted(xs, reverse=True))


def _heapq_optimal_cost(counts: list[int]) -> int:
    """Independent textbook Huffman: total weighted path length is the sum
    of every merged internal-node weight."""
    heap = list(counts)
    heapq.heapify(heap)
    cost = 0
    while len(heap) > 1:
        a, b = heapq.heappop(heap), heapq.heappop(heap)
        cost += a + b
        heapq.heappush(heap, a + b)
    return cost


@given(counts_desc)
def test_huffman_prefix_free_kraft_monotone_optimal(counts):
    v = len(counts)
    codes, code_lens, points = build_codes(np.asarray(counts, dtype=np.int64))
    assert len(codes) == v and len(points) == v

    # code strings are consistent with the reported lengths and non-empty
    for c, n in zip(codes, code_lens):
        assert len(c) == int(n) > 0 and set(c) <= {"0", "1"}

    # prefix-free: in lexicographic order a prefix would sort immediately
    # before an extension of itself
    s = sorted(codes)
    for a, b in zip(s, s[1:]):
        assert not b.startswith(a), f"{a!r} is a prefix of {b!r}"

    # exact Kraft equality (full binary tree)
    assert sum(Fraction(1, 2 ** len(c)) for c in codes) == 1

    # optimal-code monotonicity: strictly higher count -> code no longer
    lens = np.asarray(code_lens, dtype=np.int64)
    cnts = np.asarray(counts, dtype=np.int64)
    prefix_max = np.maximum.accumulate(lens)
    suffix_min = np.minimum.accumulate(lens[::-1])[::-1]
    for i in range(v - 1):
        if cnts[i] > cnts[i + 1]:
            assert prefix_max[i] <= suffix_min[i + 1]

    # cost-optimality against the independent heapq construction
    assert int(np.dot(cnts, lens)) == _heapq_optimal_cost(counts)

    # word2vec point contract: root first, leaf sentinel (index - V) last,
    # interior entries are inner-node offsets in [0, V-2]
    for i, (pt, n) in enumerate(zip(points, code_lens)):
        assert len(pt) == int(n) + 1
        assert pt[0] == v - 2
        assert pt[-1] == i - v
        assert all(0 <= p <= v - 2 for p in pt[:-1])


# ---------------------------------------------------------------------------
# Span decode: declarative cumsum law == reference state machine
# ---------------------------------------------------------------------------

tag_sentences = st.lists(
    st.lists(st.sampled_from(["B", "I", "O"]), min_size=0, max_size=12),
    min_size=1,
    max_size=8,
)


def _spans_declarative(sentences: list[list[str]]) -> list[tuple[int, int, int]]:
    """The exact formulation the Spark window plan evaluates (spans.py:10-14),
    in pure Python: is_start -> running span_id -> (min, max) over non-O."""
    out: list[tuple[int, int, int]] = []
    for sid, tags in enumerate(sentences):
        span_id = 0
        groups: dict[int, list[int]] = {}
        prev = None
        for i, tag in enumerate(tags):
            is_start = tag != "O" and (prev is None or prev == "O" or tag == "B")
            span_id += int(is_start)
            if tag != "O":
                groups.setdefault(span_id, []).append(i)
            prev = tag
        for _, toks in sorted(groups.items()):
            out.append((sid, min(toks), max(toks)))
    return out


@given(tag_sentences)
def test_span_declarative_law_equals_reference(sentences):
    assert sorted(_spans_declarative(sentences)) == sorted(
        decode_spans_reference(sentences)
    )


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(tag_sentences)
def test_decode_spans_dataframe_matches_reference(spark, sentences):
    rows = [
        ("d0", sid, tid, f"t{sid}_{tid}", tag)
        for sid, tags in enumerate(sentences)
        for tid, tag in enumerate(tags)
    ]
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "doc_id string, sentence_id int, token_id int, text string, tag string"
    )
    got = {
        (r["sentence_id"], r["start_tok"], r["end_tok"], r["mention_text"])
        for r in decode_spans(df).collect()
    }
    want = {
        (sid, a, b, " ".join(f"t{sid}_{t}" for t in range(a, b + 1)))
        for sid, a, b in decode_spans_reference(sentences)
    }
    assert got == want


# ---------------------------------------------------------------------------
# Multimodal codecs: roundtrip identity + decoder fuzz law
# ---------------------------------------------------------------------------


@given(
    st.lists(st.integers(min_value=-(2**15), max_value=2**15 - 1), max_size=400),
    st.integers(min_value=1, max_value=192_000),
)
def test_wav_pcm16_roundtrip(samples, rate):
    arr = np.asarray(samples, dtype=np.int16)
    out = decode_wav(encode_wav_pcm16(arr, sample_rate=rate))
    assert out["sample_rate"] == rate
    assert out["n_channels"] == 1 and out["bits"] == 16
    assert np.array_equal(out["samples"].reshape(-1), arr.astype(np.int32))


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.data(),
)
def test_ppm_roundtrip(h, w, data):
    raw = data.draw(st.binary(min_size=h * w * 3, max_size=h * w * 3))
    px = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    out = decode_netpbm(encode_ppm(px))
    assert out["width"] == w and out["height"] == h
    assert np.array_equal(out["pixels"], px)


@given(st.binary(max_size=256))
def test_wav_decoder_fuzz_is_total(payload):
    # law: arbitrary bytes either decode or raise the module's typed errors
    for buf in (payload, b"RIFF" + payload, b"RIFF" + payload[:4] + b"WAVE" + payload):
        try:
            out = decode_wav(buf)
        except (MediaDecodeError, NotImplementedError):
            continue
        assert out["samples"].ndim == 2  # decoded: shape contract holds


@given(st.binary(max_size=256))
def test_netpbm_decoder_fuzz_is_total(payload):
    for buf in (payload, b"P6" + payload, b"P5\n" + payload):
        try:
            out = decode_netpbm(buf)
        except (MediaDecodeError, NotImplementedError):
            continue
        assert out["pixels"].size == out["width"] * out["height"] * (
            3 if out["pixels"].ndim == 3 else 1
        )


# ---------------------------------------------------------------------------
# Tokenizer char-offset law on arbitrary Unicode corpora
# ---------------------------------------------------------------------------

_token = st.text(
    alphabet=st.characters(blacklist_characters=" \n\r", blacklist_categories=("Cs",)),
    min_size=1,
    max_size=6,
)
# hostile separators: 1-3 spaces between tokens, optional edge spaces —
# offsets must stay exact and token ids dense regardless
_sep = st.integers(min_value=1, max_value=3).map(lambda n: " " * n)


@st.composite
def _sentence(draw):
    toks = draw(st.lists(_token, min_size=1, max_size=8))
    seps = [draw(_sep) for _ in range(len(toks) - 1)]
    body = toks[0] + "".join(s + t for s, t in zip(seps, toks[1:]))
    lead = draw(_sep) if draw(st.booleans()) else ""
    trail = draw(_sep) if draw(st.booleans()) else ""
    return lead + body + trail


_sentence_simple = st.lists(_token, min_size=1, max_size=8).map(" ".join)
_sentence_any = st.one_of(_sentence_simple, _sentence())
_doc = st.lists(_sentence_any, min_size=1, max_size=5).map("\n".join)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_doc, min_size=1, max_size=4))
def test_tokenize_offsets_substring_law(spark, docs):
    from bioner_spark.tokenizer import tokenize

    df = spark.createDataFrame(
        [(f"u{i}", d) for i, d in enumerate(docs)], "url string, text string"
    )
    sent_by_key = {
        (f"u{i}", sid): s
        for i, d in enumerate(docs)
        for sid, s in enumerate(d.split("\n"))
    }
    rows = tokenize(df).collect()
    # every non-empty token of every sentence appears exactly once
    assert len(rows) == sum(
        1 for s in sent_by_key.values() for t in s.split(" ") if t
    )
    for r in rows:
        sent = sent_by_key[(r["doc_id"], r["sentence_id"])]
        assert sent[r["start"] : r["end"]] == r["text"]
        assert r["end"] - r["start"] == len(r["text"])
        # token_id is the DENSE rank among non-empty tokens
        assert [t for t in sent.split(" ") if t][r["token_id"]] == r["text"]
