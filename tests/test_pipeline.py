"""End-to-end pipeline parity (the P/R ≥ 0.95 triple gate,
BASELINE.json north_rule) + checkpointed-resume behavior."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from bioner_spark import corpus as corpus_mod
from bioner_spark.metrics import entity_level_prf1
from bioner_spark.pipeline import build_triples, run_checkpointed
from bioner_spark.schemas import MENTIONS_SCHEMA
from bioner_spark.triples import triple_prf1


def test_end_to_end_triple_parity(spark, corpus):
    pages = corpus_mod.pages_spark_df(spark, corpus)
    alias = corpus_mod.alias_dict_spark_df(spark, corpus)
    result = build_triples(pages, alias, tagger="dict")
    gold = spark.createDataFrame(corpus.triples)
    row = triple_prf1(result.triples, gold).collect()[0]
    assert row["precision"] >= 0.95, row
    assert row["recall"] >= 0.95, row


def test_end_to_end_mention_parity(spark, corpus):
    pages = corpus_mod.pages_spark_df(spark, corpus)
    alias = corpus_mod.alias_dict_spark_df(spark, corpus)
    result = build_triples(pages, alias, tagger="dict")
    gold = spark.createDataFrame(
        corpus.mentions[["doc_id", "sentence_id", "start_tok", "end_tok"]]
    )
    row = entity_level_prf1(result.mentions, gold).collect()[0]
    assert row["f1"] >= 0.95, row


def test_checkpointed_resume(spark, corpus, tmp_path):
    pages = corpus_mod.pages_spark_df(spark, corpus)
    alias = corpus_mod.alias_dict_spark_df(spark, corpus)
    out = str(tmp_path / "kg")

    r1 = run_checkpointed(spark, pages, alias, out, n_buckets=4)
    assert r1.n_buckets_processed > 0
    t1 = r1.triples.drop("bucket").toPandas().sort_values(["doc_id", "sentence_id", "subj", "pred", "obj"]).reset_index(drop=True)

    # second run: everything already done → all skipped, same output
    r2 = run_checkpointed(spark, pages, alias, out, n_buckets=4)
    assert r2.n_buckets_processed == 0
    assert r2.n_buckets_skipped == r1.n_buckets_processed
    t2 = r2.triples.drop("bucket").toPandas().sort_values(["doc_id", "sentence_id", "subj", "pred", "obj"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(t1, t2)

    # changed input in one bucket → only affected buckets recompute
    pages2 = pages.withColumn(
        "url", F.when(F.col("url").endswith("/doc/0"), F.concat(F.col("url"), F.lit("x"))).otherwise(F.col("url"))
    )
    r3 = run_checkpointed(spark, pages2, alias, out, n_buckets=4)
    assert 0 < r3.n_buckets_processed <= 2


def test_neural_pipeline_runs(spark, corpus):
    """Neural tagger path: structurally sound end-to-end (tag domain, spans
    decodable). Quality is not asserted — weights are a seeded fixture."""
    from bioner_spark.functions.ngrams import build_vocabulary
    from bioner_spark.ner.kernel import init_model
    from bioner_spark.tokenizer import tokenize

    pages = corpus_mod.pages_spark_df(spark, corpus).limit(6)
    alias = corpus_mod.alias_dict_spark_df(spark, corpus)
    toks = tokenize(pages)
    vocab = build_vocabulary(toks, min_word_frequency=1).cache()
    model = init_model(input_dim=15 + vocab.count(), seed=1234)
    result = build_triples(
        pages, alias, tagger="neural", model=model, vocab=vocab, use_extractor=False
    )
    tags = {r.tag for r in result.tokens.select("tag").distinct().collect()}
    assert tags <= {"B", "I", "O"}
    result.triples.count()  # must execute without error


def test_neural_pipeline_real_artifact_formats(spark, corpus, tmp_path):
    """The released-artifact loop, torch/fasttext-free: fastText .bin
    embeddings (committed fixture) + a .pt checkpoint round-tripped through
    the torch-zip writer drive the BioNER-shape pipeline end to end
    (reference: fasttext_encoder.py:14-15 + annotate_dataset.py:17-18)."""
    import os

    from bioner_spark.ner.fasttext_bin import load_bin
    from bioner_spark.ner.kernel import init_model
    from bioner_spark.ner.torch_import import (
        load_sequence_model,
        model_to_state_dict,
        write_state_dict_pt,
    )

    ft_model, meta = load_bin(
        os.path.join(os.path.dirname(__file__), "fixtures", "fasttext_tiny.bin")
    )
    src = init_model(input_dim=meta["dim"], feedforward_size=8, lstm_size=4,
                     n_bilstm_layers=1, seed=99)
    pt = str(tmp_path / "ckpt.pt")
    write_state_dict_pt(pt, model_to_state_dict(src))
    model = load_sequence_model(pt)
    assert model.input_dim == ft_model.dim

    pages = corpus_mod.pages_spark_df(spark, corpus).limit(6)
    alias = corpus_mod.alias_dict_spark_df(spark, corpus)
    result = build_triples(
        pages, alias, tagger="neural", model=model, ft_model=ft_model,
        use_extractor=False,
    )
    closure_triples = sorted(
        tuple(r) for r in result.triples.select("subj", "pred", "obj").collect()
    )

    # same pipeline with BOTH artifacts shipped via SparkFiles (the scale
    # path kg_job uses: multi-GB real models must never ride the closure) —
    # identical triples
    from bioner_spark.ner.fasttext import ship_fasttext
    from bioner_spark.ner.infer import ship_model

    shipped = build_triples(
        pages, alias, tagger="neural",
        model=ship_model(spark, model, name="pt_artifact_test"),
        ft_model=ship_fasttext(spark, ft_model, name="bin_artifact_test"),
        use_extractor=False,
    )
    shipped_triples = sorted(
        tuple(r) for r in shipped.triples.select("subj", "pred", "obj").collect()
    )
    assert shipped_triples == closure_triples


def test_checkpointed_resume_converges_to_current_input(spark, corpus, tmp_path):
    """The resume contract's hard cases: the on-disk table must converge to
    exactly the CURRENT input's triples — documents REMOVED from the input
    (whole buckets emptied or thinned to zero matches) must not leave stale
    partitions behind, and reverting an input must not be skipped against a
    stale manifest row (latest-wins)."""
    pages = corpus_mod.pages_spark_df(spark, corpus)
    alias = corpus_mod.alias_dict_spark_df(spark, corpus)
    out = str(tmp_path / "kg2")

    run_checkpointed(spark, pages, alias, out, n_buckets=4)

    # half the docs disappear: both emptied buckets (orphans) and thinned
    # ones must recompute / be dropped
    half = pages.filter(F.xxhash64("url") % 2 == 0)
    r2 = run_checkpointed(spark, half, alias, out, n_buckets=4)
    expected = sorted(
        map(tuple, build_triples(half, alias).triples
            .select("subj", "pred", "obj", "doc_id").collect())
    )
    got = sorted(
        map(tuple, r2.triples.select("subj", "pred", "obj", "doc_id").collect())
    )
    assert got == expected  # no stale rows from removed docs

    # revert to the full input (same fingerprints as run 1): latest-wins
    # must see the buckets were since overwritten/removed and recompute —
    # never skip against the stale run-1 'done' rows
    r3 = run_checkpointed(spark, pages, alias, out, n_buckets=4)
    expected3 = sorted(
        map(tuple, build_triples(pages, alias).triples
            .select("subj", "pred", "obj", "doc_id").collect())
    )
    got3 = sorted(
        map(tuple, r3.triples.select("subj", "pred", "obj", "doc_id").collect())
    )
    assert got3 == expected3


def test_checkpointed_zero_triples_and_recrawl(spark, corpus, tmp_path):
    """A run that emits NO triples at all must still write a readable empty
    table + manifest (not crash schema inference); a recrawl (same url, new
    warc_ts) must change the fingerprint and recompute the bucket."""
    pages = corpus_mod.pages_spark_df(spark, corpus)
    out = str(tmp_path / "kg3")
    empty_alias = pages.sparkSession.createDataFrame(
        [], "alias string, canonical_id string"
    )
    r1 = run_checkpointed(spark, pages, empty_alias, out, n_buckets=4)
    assert r1.triples.count() == 0
    r2 = run_checkpointed(spark, pages, empty_alias, out, n_buckets=4)
    assert r2.n_buckets_processed == 0  # manifest recorded the empty result

    # recrawl: identical urls, shifted warc_ts → every bucket recomputes
    recrawled = pages.withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 HOUR")
    )
    r3 = run_checkpointed(spark, recrawled, empty_alias, out, n_buckets=4)
    assert r3.n_buckets_processed == 4
