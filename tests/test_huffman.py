"""Huffman code assignment (SURVEY §2 V4 — the intended semantics of the
reference's dead `update_huffman_codes`, i.e. word2vec CreateBinaryTree).

Differential authority: an independent heapq-built Huffman tree — optimal
prefix codes are not unique, but the WEIGHTED TOTAL LENGTH of every
optimal code is, so the two constructions must agree on cost exactly.
"""

from __future__ import annotations

import heapq
from fractions import Fraction

import numpy as np
import pytest

from bioner_spark.functions.huffman import (
    MAX_CODE_LENGTH,
    build_codes,
    huffman_codes,
)


def heapq_optimal_cost(counts) -> int:
    """Independent Huffman total cost: sum of all internal-node weights."""
    if len(counts) < 2:
        return 0
    h = list(int(c) for c in counts)
    heapq.heapify(h)
    cost = 0
    while len(h) > 1:
        a, b = heapq.heappop(h), heapq.heappop(h)
        cost += a + b
        heapq.heappush(h, a + b)
    return cost


def desc(counts):
    return np.sort(np.asarray(counts, dtype=np.int64))[::-1]


def test_clrs_example_lengths_and_cost():
    # CLRS fig 16.5: f=45,e=13,c=12,b=16... classic counts 45,13,12,16,9,5
    counts = desc([45, 13, 12, 16, 9, 5])        # -> 45,16,13,12,9,5
    codes, lens, _ = build_codes(counts)
    assert int(np.dot(counts, lens)) == 224 == heapq_optimal_cost(counts)
    assert list(lens) == [1, 3, 3, 3, 4, 4]


@pytest.mark.parametrize("seed,v,hi", [(0, 50, 1000), (1, 200, 17), (2, 7, 3)])
def test_optimality_differential(seed, v, hi):
    rng = np.random.RandomState(seed)
    counts = desc(rng.randint(1, hi, size=v))
    codes, lens, _ = build_codes(counts)
    assert int(np.dot(counts, lens)) == heapq_optimal_cost(counts)


def test_kraft_equality_and_prefix_free():
    rng = np.random.RandomState(3)
    counts = desc(rng.randint(1, 500, size=64))
    codes, lens, _ = build_codes(counts)
    assert sum(Fraction(1, 2 ** int(n)) for n in lens) == 1
    codeset = sorted(codes)
    for a, b in zip(codeset, codeset[1:]):       # sorted => prefixes adjacent
        assert not b.startswith(a)
    assert len(set(codes)) == len(codes)
    # more frequent word never gets a longer code
    assert all(x <= y for x, y in zip(lens, lens[1:]))


def test_points_law():
    counts = desc([45, 13, 12, 16, 9, 5])
    v = len(counts)
    _, lens, points = build_codes(counts)
    for w, (n, pts) in enumerate(zip(lens, points)):
        assert len(pts) == n + 1                  # word2vec: codelen+1 points
        assert pts[0] == v - 2                    # root is node 2V-2 => V-2
        assert pts[-1] == w - v                   # leaf sentinel (negative)
        assert all(p >= 0 for p in pts[:-1])      # interior = inner nodes


def test_singleton_and_empty():
    codes, lens, points = build_codes(np.array([7], dtype=np.int64))
    assert codes == ["0"] and list(lens) == [1]   # word2vec do-while law
    codes, lens, points = build_codes(np.array([], dtype=np.int64))
    assert codes == [] and len(lens) == 0


def test_all_equal_counts_balanced():
    codes, lens, _ = build_codes(np.ones(4, dtype=np.int64))
    assert list(lens) == [2, 2, 2, 2]


def test_unsorted_counts_rejected():
    with pytest.raises(ValueError, match="sorted descending"):
        build_codes(np.array([1, 5], dtype=np.int64))


def test_depth_cap_raises():
    fib = [1, 1]
    for _ in range(50):
        fib.append(fib[-1] + fib[-2])             # fibonacci => depth V-1
    with pytest.raises(ValueError, match=str(MAX_CODE_LENGTH)):
        build_codes(desc(fib))


def test_dataframe_path_joins_every_vocab_row(spark):
    from bioner_spark.functions.ngrams import build_vocabulary

    toks = spark.createDataFrame(
        [("spark",), ("spark",), ("window",), ("hash",), ("hash",),
         ("table",), ("row",), ("merge",), ("spark",)],
        "text string",
    )
    vocab = build_vocabulary(toks, n=3, min_word_frequency=1)
    out = huffman_codes(vocab).collect()
    assert len(out) == vocab.count()
    by_idx = sorted(out, key=lambda r: r["index"])
    counts = np.array([r["count"] for r in by_idx], dtype=np.int64)
    lens = np.array([r.code_len for r in by_idx])
    assert int(np.dot(counts, lens)) == heapq_optimal_cost(counts)
    for r in out:
        assert len(r.code) == r.code_len
        assert set(r.code) <= {"0", "1"}
        assert len(r.points) == r.code_len + 1
    # deterministic: same vocab -> same codes
    again = {r.ngram: r.code for r in huffman_codes(vocab).collect()}
    assert again == {r.ngram: r.code for r in out}


def test_distributed_walk_matches_driver_build_codes(spark):
    """huffman_codes assembles codes executor-side (mapInPandas over the
    broadcast tree); build_codes is the single-process differential
    authority — identical codes, lengths and point paths, row for row."""
    from bioner_spark.functions.ngrams import build_vocabulary

    toks = spark.createDataFrame(
        [(w,) for w in "spark window hash table row merge spark hash spark "
         "join scan sort shuffle broadcast".split()],
        "text string",
    )
    vocab = build_vocabulary(toks, n=3, min_word_frequency=1)
    rows = sorted(huffman_codes(vocab).collect(), key=lambda r: r["index"])
    counts = np.array([r["count"] for r in rows], dtype=np.int64)
    codes, lens, points = build_codes(counts)
    assert [r.code for r in rows] == codes
    assert [r.code_len for r in rows] == [int(n) for n in lens]
    assert [list(r.points) for r in rows] == points


def test_gapped_index_rejected(spark):
    """Executors use raw index values as tree leaf slots, so a filtered
    (gapped) or offset index must fail loudly, not silently mis-map."""
    vocab = spark.createDataFrame(
        [("aaa", 9, 0), ("bbb", 5, 2), ("ccc", 3, 3)],
        "ngram string, count bigint, index bigint",
    )
    with pytest.raises(ValueError, match="dense rank"):
        huffman_codes(vocab)


def test_empty_vocab_returns_schema_stable_empty(spark):
    from bioner_spark.functions.ngrams import build_vocabulary

    toks = spark.createDataFrame([("rare",)], "text string")
    vocab = build_vocabulary(toks, n=3, min_word_frequency=10)  # truncates all
    out = huffman_codes(vocab)
    assert out.count() == 0
    assert "code" in out.columns and "points" in out.columns


def test_checkpointed_vocab_not_repersisted(spark):
    """A (local)checkpointed vocab already scans a materialized RDD; it
    reports storageLevel NONE (checkpoints don't register with the cache
    manager), so a storage-level-only adopt check would store a pointless
    second full copy of a vocab the module sizes at 10^7–10^8 rows."""
    from bioner_spark.functions.huffman import _is_materialized

    df = spark.createDataFrame(
        [("a", 5, 0), ("b", 3, 1)], "ngram string, count long, index long"
    )
    ck = df.localCheckpoint(eager=True)
    assert not (ck.storageLevel.useMemory or ck.storageLevel.useDisk)
    assert _is_materialized(ck)
    assert not _is_materialized(df.select("ngram", "count", "index"))
    p = df.persist()
    try:
        assert _is_materialized(p)
    finally:
        p.unpersist()


def test_uncheckpointed_rdd_frame_is_not_materialized(spark):
    """A LogicalRDD root alone does NOT mean materialized: an
    un-checkpointed RDD-backed frame re-runs its full lineage on every
    scan, and nondeterministic lineage would give the two huffman_codes
    scans different rows — wrong codes with no error. Only a checkpointed
    RDD may skip the defensive persist."""
    from bioner_spark.functions.huffman import _is_materialized

    rdd = spark.sparkContext.parallelize([("a", 5, 0), ("b", 3, 1)])
    df = spark.createDataFrame(rdd, "ngram string, count long, index long")
    root = df._jdf.queryExecution().analyzed().getClass().getSimpleName()
    assert root == "LogicalRDD"  # the shape the old check wrongly adopted
    assert not _is_materialized(df)
    assert _is_materialized(df.localCheckpoint(eager=True))


def test_sql_oracle_matches_numpy_authority():
    """The DuckDB recursive-CTE oracle (contract query huffman_codes) must
    be cell-identical to the numpy authority for every code/point — the
    driver's value-hash compare depends on it. Cases cover the tie-heavy
    regime (strict-< internal-node preference), a 257-word vocab, an
    all-equal-count vocab, and the v=1 degenerate vocab, where word2vec's
    do-while records one calloc'd 0-bit before testing the root — a step
    the SQL walk cannot take (no edges), so the oracle spells it as a CASE
    that this test pins against the engine's behavior."""
    import duckdb

    import __spark_entry__ as entry_mod

    sql = entry_mod.oracle_sql()["huffman_codes"]
    # replay the merge/walk/projection over a literal vocab CTE (cut the
    # corpus-derived vocab CTEs; the machinery under test starts at `lc`)
    tail = sql[sql.index("lc AS (") :]

    def run_case(counts):
        vals = ", ".join(
            f"('w{i:03d}', {c}, {i})" for i, c in enumerate(counts)
        )
        q = (
            "WITH RECURSIVE vocab(ngram, count, index) AS (VALUES "
            + vals + "), " + tail + " ORDER BY index"
        )
        got = duckdb.sql(q).fetchall()
        codes, lens, points = build_codes(np.array(counts, dtype=np.int64))
        assert len(got) == len(counts)
        for r in got:
            i = r[2]
            assert tuple(r) == (
                f"w{i:03d}", counts[i], i, codes[i], int(lens[i]),
                ",".join(str(x) for x in points[i]),
            ), f"counts={counts} idx={i}"

    rng = np.random.default_rng(7)
    for case in (
        [7],                                   # v=1 do-while degenerate
        [5, 5],                                # pure tie
        [9, 5, 5, 5, 1],
        sorted(rng.integers(1, 50, size=257).tolist(), reverse=True),
        [10] * 64,                             # all counts equal
        sorted(rng.integers(1, 5, size=33).tolist(), reverse=True),
    ):
        run_case(case)
