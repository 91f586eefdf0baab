"""Differential test for B5 error sampling (SURVEY §2.4; reference
misc/error_analysis/analysis.py:206-215 `select_errors`).

The reference draws sentence indices uniformly WITH replacement until n
DISTINCT error sentences have accumulated. The engine uses
`orderBy(rand(seed)).limit(n)`. These are different procedures but the same
distribution: the first n distinct error sentences of an i.i.d. uniform
stream over all sentences form a uniformly random n-subset of the error set
(non-error draws only thin the stream — they do not change the relative
order distribution of error first-occurrences), and a seeded random
shuffle + limit draws exactly the same uniform n-subset law.

So the two samplers disagree only in WHICH subset a given seed maps to
(always, for any fixed seed — different PRNGs), and never in distribution.
This file quantifies both claims:

  1. exact-contract parity: both return exactly min(n, |errors|) distinct
     error sentences; when n >= |errors| both return the full error set —
     identical output, not just identical law;
  2. distributional parity: per-sentence inclusion frequencies over many
     seeds match the uniform n/|errors| rate for BOTH samplers within a
     3-sigma binomial bound.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from bioner_spark.metrics import sample_error_sentences


def reference_select_errors(n_sentences: int, error_ids: set[int], n: int, seed: int):
    """Faithful port of the reference sampling loop (analysis.py:206-215):
    uniform random.choice over ALL sentence indices, with replacement, until
    n distinct errors are seen or every sentence has been visited."""
    indices = list(range(n_sentences))
    random.seed(seed)
    seen: set[int] = set()
    errors: set[int] = set()
    while len(errors) < n and len(seen) < n_sentences:
        i = random.choice(indices)
        seen.add(i)
        if i in error_ids:
            errors.add(i)
    return errors


def _spans_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, sentence_id int, start_tok int, end_tok int"
    )


def _error_fixture(spark, n_sentences=40, n_error=12):
    """Sentences 0..n_error-1 have a pred/gold disagreement; the rest agree."""
    gold, pred = [], []
    for s in range(n_sentences):
        gold.append(("d", s, 0, 1))
        if s < n_error:
            pred.append(("d", s, 0, 2))  # wrong span -> error sentence
        else:
            pred.append(("d", s, 0, 1))
    return _spans_df(spark, pred), _spans_df(spark, gold)


def test_exact_contract_small_n(spark):
    """min(n,|errors|) distinct error sentences, all genuinely erroneous."""
    pred, gold = _error_fixture(spark, n_sentences=40, n_error=12)
    out = sample_error_sentences(pred, gold, n=5, seed=7).collect()
    ids = {r.sentence_id for r in out}
    assert len(out) == len(ids) == 5
    assert ids <= set(range(12))
    ref = reference_select_errors(40, set(range(12)), n=5, seed=7)
    assert len(ref) == 5 and ref <= set(range(12))


def test_exhaustive_case_identical_output(spark):
    """n >= |errors|: both samplers return the FULL error set — identical."""
    pred, gold = _error_fixture(spark, n_sentences=30, n_error=6)
    out = {
        r.sentence_id
        for r in sample_error_sentences(pred, gold, n=100, seed=1632737901).collect()
    }
    ref = reference_select_errors(30, set(range(6)), n=100, seed=1632737901)
    assert out == ref == set(range(6))


def test_distributional_parity(spark):
    """Inclusion frequency of each error sentence ≈ n/|errors| for both
    samplers. Reference side: 4000 seeds (pure python, cheap). Spark side:
    60 seeds (each draw is a tiny job). Binomial 3-sigma bounds."""
    n_err, n = 12, 5
    p = n / n_err  # uniform inclusion probability per error sentence

    # reference sampler
    trials_ref = 4000
    counts_ref = {i: 0 for i in range(n_err)}
    for seed in range(trials_ref):
        for i in reference_select_errors(40, set(range(n_err)), n, seed):
            counts_ref[i] += 1
    sigma_ref = (trials_ref * p * (1 - p)) ** 0.5
    for i, c in counts_ref.items():
        assert abs(c - trials_ref * p) < 3.3 * sigma_ref, (i, c)

    # engine sampler — one Spark pass computes all seeds' samples at once:
    # rank within each seed replicate by rand(seed) and keep the top n
    pred, gold = _error_fixture(spark, n_sentences=40, n_error=n_err)
    trials_sp = 60
    base = None
    for seed in range(trials_sp):
        s = (
            sample_error_sentences(pred, gold, n=n, seed=seed)
            .select(F.lit(seed).alias("seed"), "sentence_id")
        )
        base = s if base is None else base.unionByName(s)
    rows = base.collect()
    counts_sp = {i: 0 for i in range(n_err)}
    for r in rows:
        counts_sp[r.sentence_id] += 1
    sigma_sp = (trials_sp * p * (1 - p)) ** 0.5
    for i, c in counts_sp.items():
        assert abs(c - trials_sp * p) < 3.5 * sigma_sp, (i, c)
