"""Huffman code assignment over the n-gram vocabulary (SURVEY §2 V4 —
reference ngram_encoder.py:30-101 `update_huffman_codes`).

The reference's version is dead code, twice over: its own docstring says
"Unnecessary to create huffman encoding!", and the body cannot run —
``np.zeros[Vocabulary.MAX_CODE_LENGTH]`` (ngram_encoder.py:78-79) and
``len(vocab_words * 2 - 2)`` (ngram_encoder.py:93) both raise, and it
re-sorts the vocab ASCENDING (ngram_encoder.py:34) while keeping the
descending-order two-pointer initialisation, which would mis-merge even
if it ran. What it clearly *intends* to be is word2vec's
``CreateBinaryTree`` (public word2vec.c, the hierarchical-softmax code
builder) — the engine implements THAT, correctly:

* leaves sorted by (count DESC, ngram ASC) — the vocabulary's existing
  deterministic rank (``build_vocabulary``'s ``index``), replacing
  word2vec's insertion-order tie behavior with a stable total order;
* the O(V) two-pointer merge over the already-sorted counts (no heap);
* per-word binary code (MSB-first string), code length, and the word2vec
  ``point`` path (inner-node indices, ``point[0] = V-2``, leaf sentinel
  ``index - V`` last) for hierarchical-softmax consumers.

Scale split: the corpus-sized work (n-gram counting, min-frequency
truncation, global rank) is the DISTRIBUTED ``build_vocabulary``; this
module's driver step touches only the truncated vocab's count column —
one int64 per vocab entry, ~80 MB even at a 10^7-entry web-corpus
char-n-gram vocab — because Huffman merging is inherently sequential in
the sorted count order (word2vec also builds it single-threaded). The
resulting (index → code) map is re-distributed and joined back on the
rank key, so downstream consumers stay DataFrames.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: reference ngram_encoder.py:15 — word2vec.c's MAX_CODE_LENGTH.
MAX_CODE_LENGTH = 40

_SENTINEL = np.int64(1) << 62


def build_codes(counts: np.ndarray, max_code_length: int = MAX_CODE_LENGTH):
    """word2vec ``CreateBinaryTree`` over counts ALREADY sorted descending.

    Returns (codes: list[str], code_lens: np.ndarray, points: list[list[int]]).
    Pure driver-side numpy; the walk is vectorised level-by-level so the
    cost is O(V × depth) numpy ops, depth capped at ``max_code_length``
    (beyond the cap word2vec itself would overrun its fixed buffers; the
    engine raises instead).
    """
    v = int(len(counts))
    if v == 0:
        return [], np.zeros(0, dtype=np.int64), []
    counts = np.asarray(counts, dtype=np.int64)
    if v > 1 and np.any(counts[:-1] < counts[1:]):
        raise ValueError("build_codes: counts must be sorted descending")

    cnt = np.full(2 * v - 1, _SENTINEL, dtype=np.int64)
    cnt[:v] = counts
    parent = np.zeros(2 * v - 1, dtype=np.int64)
    binary = np.zeros(2 * v - 1, dtype=np.int8)
    pos1, pos2 = v - 1, v
    for a in range(v - 1):
        if pos1 >= 0 and cnt[pos1] < cnt[pos2]:
            min1, pos1 = pos1, pos1 - 1
        else:
            min1, pos2 = pos2, pos2 + 1
        if pos1 >= 0 and cnt[pos1] < cnt[pos2]:
            min2, pos1 = pos1, pos1 - 1
        else:
            min2, pos2 = pos2, pos2 + 1
        cnt[v + a] = cnt[min1] + cnt[min2]
        parent[min1] = v + a
        parent[min2] = v + a
        binary[min2] = 1

    # vectorised root-ward walk (word2vec's per-word do-while, all words at
    # once): record (bit, node) per level until the parent is the root
    root = 2 * v - 2
    cur = np.arange(v, dtype=np.int64)
    alive = np.ones(v, dtype=bool)
    bit_levels: list[np.ndarray] = []
    node_levels: list[np.ndarray] = []
    code_lens = np.zeros(v, dtype=np.int64)
    while alive.any():
        if len(bit_levels) >= max_code_length:
            raise ValueError(
                f"Huffman code length exceeds {max_code_length} "
                f"(reference MAX_CODE_LENGTH, ngram_encoder.py:15); "
                f"vocabulary counts are pathologically skewed"
            )
        bit_levels.append(np.where(alive, binary[cur], -1).astype(np.int8))
        node_levels.append(np.where(alive, cur, -1))
        code_lens[alive] += 1
        nxt = parent[cur]
        alive &= nxt != root
        cur = np.where(alive, nxt, cur)

    bits = np.stack(bit_levels, axis=1) if bit_levels else np.zeros((v, 0))
    nodes = np.stack(node_levels, axis=1) if node_levels else np.zeros((v, 0))
    codes: list[str] = []
    points: list[list[int]] = []
    for w in range(v):
        n = int(code_lens[w])
        walk_bits = bits[w, :n]
        walk_nodes = nodes[w, :n]
        codes.append("".join("1" if b else "0" for b in walk_bits[::-1]))
        # word2vec: point[0] = V-2, then point[n-b] = walk_nodes[b] - V
        points.append([v - 2] + [int(x) - v for x in walk_nodes[::-1]])
    return codes, code_lens, points


def huffman_codes(
    vocab: DataFrame, max_code_length: int = MAX_CODE_LENGTH
) -> DataFrame:
    """Per-vocabulary-word Huffman codes as a DataFrame.

    ``vocab``: output of ``build_vocabulary`` — (ngram, count, index) with
    index the global (count DESC, ngram ASC) rank. Output adds
    (code: string of '0'/'1' MSB-first, code_len: int, points: array<int>).

    Driver collects ONLY the count column in rank order (bounded by the
    vocabulary's min-frequency truncation — see module docstring for the
    scale argument), builds codes, and joins the mapping back on index.
    """
    spark = vocab.sparkSession
    pdf = vocab.select("index", "count").orderBy("index").toPandas()
    if len(pdf) == 0:
        # schema-stable empty result (createDataFrame can't infer a schema
        # from an all-empty object-dtype pandas frame)
        return spark.createDataFrame(
            [],
            "ngram string, count bigint, index bigint, code string, "
            "code_len int, points array<bigint>",
        )
    counts = pdf["count"].to_numpy(dtype=np.int64)
    codes, code_lens, points = build_codes(counts, max_code_length)
    mapping = pd.DataFrame(
        {
            "index": pdf["index"].to_numpy(dtype=np.int64),
            "code": codes,
            "code_len": code_lens.astype(np.int32),
            "points": points,
        }
    )
    mapping_df = spark.createDataFrame(mapping)
    return vocab.join(mapping_df, "index").select(
        "ngram", "count", "index", "code",
        F.col("code_len").cast("int").alias("code_len"), "points",
    )
