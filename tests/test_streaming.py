"""Structured-Streaming ingestion tests (bioner_spark/streaming/ingest.py).

Covers: incremental file pickup with checkpointed resume (only NEW files are
processed on re-run), batch/streaming parity of the mention path, and
watermarked windowed aggregation emitting closed windows in append mode.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bioner_spark.corpus import alias_dict_spark_df, generate, pages_spark_df
from bioner_spark.streaming.ingest import (
    batch_mentions,
    read_page_stream,
    run_ingest_once,
    streaming_mention_counts,
)


@pytest.fixture(scope="module")
def corpus():
    return generate(n_docs=30, giant_doc_sentences=10)


def _write_pages(spark, corpus, path, lo, hi):
    df = pages_spark_df(spark, corpus).filter(
        F.split(F.col("url"), "/").getItem(4).cast("int").between(lo, hi)
    )
    df.coalesce(1).write.mode("append").parquet(path)
    return df.count()


def test_ingest_resume_processes_only_new_files(spark, corpus, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("stream"))
    in_dir, out_dir, ckpt = f"{base}/in", f"{base}/out", f"{base}/ckpt"
    alias = alias_dict_spark_df(spark, corpus)

    _write_pages(spark, corpus, in_dir, 0, 14)
    run_ingest_once(spark, in_dir, alias, out_dir, ckpt)
    first = spark.read.parquet(out_dir)
    n_first = first.count()
    assert n_first > 0
    docs_first = {r.doc_id for r in first.select("doc_id").distinct().collect()}

    # second batch of files → only they are processed (offsets in checkpoint)
    _write_pages(spark, corpus, in_dir, 15, 29)
    run_ingest_once(spark, in_dir, alias, out_dir, ckpt)
    both = spark.read.parquet(out_dir)
    docs_both = {r.doc_id for r in both.select("doc_id").distinct().collect()}
    assert docs_first < docs_both  # strictly more documents
    # no duplicates: every (doc, sentence, span) appears exactly once
    dupes = (
        both.groupBy("doc_id", "sentence_id", "start_tok", "end_tok")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dupes == 0

    # parity: streaming output == running the batch body over all pages
    expected = batch_mentions(pages_spark_df(spark, corpus), alias)
    key = ["doc_id", "sentence_id", "start_tok", "end_tok"]
    assert both.count() == expected.count()
    assert expected.join(both, key, "left_anti").count() == 0


def test_windowed_counts_batch_boundary_invariance(spark, corpus, tmp_path_factory):
    """The emitted window set is a pure function of the input, not of the
    micro-batch layout (the law the streaming_window_counts contract query
    relies on): a far-future sentinel page advances the final watermark
    past every real window, so the UNION of append-mode emissions is
    identical whether the stream runs file-at-a-time or as one batch."""
    from datetime import datetime

    from bioner_spark.schemas import PAGES_SCHEMA

    alias = alias_dict_spark_df(spark, corpus)
    sentinel = spark.createDataFrame(
        [("sentinel://wm", datetime(2024, 1, 3), b"<p>aspirin</p>", "aspirin", "en")],
        schema=PAGES_SCHEMA,
    )

    def run(max_files):
        base = str(tmp_path_factory.mktemp("wininv"))
        in_dir, out_dir, ckpt = f"{base}/in", f"{base}/out", f"{base}/ckpt"
        _write_pages(spark, corpus, in_dir, 0, 29)
        real = {f for f in os.listdir(in_dir) if not f.startswith(("_", "."))}
        sentinel.coalesce(1).write.mode("append").parquet(in_dir)
        import time as _t

        now = _t.time()
        for f in os.listdir(in_dir):
            if f.startswith(("_", ".")):
                continue
            t = now - 120 if f in real else now + 60
            os.utime(os.path.join(in_dir, f), (t, t))
        pages = read_page_stream(spark, in_dir, max_files_per_trigger=max_files)
        (
            streaming_mention_counts(
                pages, alias, window_duration="10 minutes", watermark="15 minutes"
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        return {
            (r.window_start, r.canonical_id, r.n_mentions)
            for r in spark.read.parquet(out_dir).collect()
        }

    per_file = run(max_files=1)
    one_batch = run(max_files=None)
    assert per_file == one_batch
    assert len(per_file) > 0
    # the sentinel's own window is open at end-of-stream — never emitted
    assert all(ws.year == 2024 and ws.month == 1 and ws.day == 1
               for ws, _, _ in per_file)


def test_streaming_stateful_dedup_across_batches(spark, tmp_path_factory):
    """applyInPandasWithState: the first copy of each fingerprint wins, state
    survives into later micro-batches (and restarts via the checkpoint)."""
    import pandas as pd

    from bioner_spark.streaming.stateful import streaming_dedup

    base = str(tmp_path_factory.mktemp("dedupstate"))
    in_dir, out_dir, ckpt = f"{base}/in", f"{base}/out", f"{base}/ckpt"

    def drain(rows):
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["url", "text"])
        ).coalesce(1).write.mode("append").parquet(in_dir)
        pages = spark.readStream.schema("url string, text string").parquet(in_dir)
        (
            streaming_dedup(pages)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    drain([("u1", "same text"), ("u2", "Same   TEXT"), ("u3", "other text")])
    drain([("u4", "same text"), ("u5", "third text")])  # u4 dups batch-1 state

    got = {
        r.url: (r.is_first, r.n_duplicates_so_far)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert len(got) == 5
    # normalization folds u1/u2/u4 onto one fingerprint; exactly one first
    firsts = {u for u, (f, _) in got.items() if f == 1}
    assert firsts == {"u1", "u3", "u5"} or firsts == {"u2", "u3", "u5"}
    # u4 arrived in batch 2 but still counted as duplicate via carried state
    assert got["u4"][0] == 0 and got["u4"][1] >= 1


def test_streaming_mention_counts_watermarked(spark, corpus, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("streamagg"))
    in_dir, ckpt = f"{base}/in", f"{base}/ckpt"
    alias = alias_dict_spark_df(spark, corpus)
    _write_pages(spark, corpus, in_dir, 0, 29)

    pages = read_page_stream(spark, in_dir)
    counts = streaming_mention_counts(
        pages, alias, window_duration="10 minutes", watermark="10 minutes"
    )
    query = (
        counts.writeStream.format("memory")
        .queryName("mention_counts")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    got = spark.sql("select * from mention_counts")
    # corpus warc_ts spans 30 minutes (1/min) → early windows are closed by
    # the final watermark and must have been emitted
    assert got.count() > 0
    assert got.columns == ["window_start", "canonical_id", "n_mentions"]
    # every emitted canonical_id is a dictionary id
    bad = got.join(
        alias.select(F.col("canonical_id")).distinct(), "canonical_id", "left_anti"
    ).count()
    assert bad == 0
