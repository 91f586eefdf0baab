"""Custom stateful streaming operator: cross-batch exact deduplication.

`applyInPandasWithState` is Spark's escape hatch for stateful logic the
built-in streaming operators can't express (SURVEY.md task mandate). The
operator here is the streaming form of the training-data exact-dedup op
(ops/dedup.py): documents arrive continuously; the FIRST document per
content fingerprint is emitted, later duplicates only bump a per-fingerprint
counter held in state. Unlike `dropDuplicates` on a stream (whose state
grows per KEY SEEN with no value), the state row also carries first-seen
provenance and a duplicate count, i.e. a live dedup ledger.

Scale notes:
  * state is partitioned by fingerprint hash across executors — the same
    hash-partitioning a batch groupBy would use, so state size per executor
    is corpus_distinct/num_executors;
  * each micro-batch touches only the state shards of fingerprints present
    in that batch; checkpointed state survives restarts;
  * processing-time timeout (`ttl_minutes`) bounds state for unbounded
    crawls — an expired fingerprint is simply treated as new again, the
    standard recall/memory trade of streaming dedup.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("fingerprint", StringType()),
        StructField("url", StringType()),
        StructField("is_first", IntegerType()),
        StructField("n_duplicates_so_far", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("first_url", StringType()),
        StructField("n_seen", LongType()),
    ]
)


def _make_dedup_fn(ttl_minutes: int | None):
    def _dedup_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (fingerprint,) = key
        if state.hasTimedOut:
            # unbounded-crawl memory bound: forget the fingerprint; the next
            # occurrence is treated as new (documented recall trade-off)
            state.remove()
            yield pd.DataFrame(
                [], columns=["fingerprint", "url", "is_first", "n_duplicates_so_far"]
            )
            return
        if state.exists:
            first_url, n_seen = state.get
        else:
            first_url, n_seen = None, 0
        # deterministic within-batch order: the pdf chunks arrive in
        # shuffle-fetch order, so iterating them as-is would let a replayed
        # batch crown a DIFFERENT url as first — the batch analog
        # (exact_duplicate_groups) picks min_doc_id deterministically, and
        # cross-path parity checks on the representative expect the same
        # stability here. Sorting the batch's urls per key costs O(dups in
        # batch · log) — tiny, dup groups are small per micro-batch.
        urls = sorted(
            (u for pdf in pdfs for u in pdf["url"]),
            key=lambda u: (u is None, u),
        )
        out = []
        for url in urls:
            # n_seen (not first_url-is-None) decides first-ness: a NULL
            # url must not make the NEXT copy claim is_first again
            is_first = 1 if n_seen == 0 else 0
            if is_first:
                first_url = url
            out.append((fingerprint, url, is_first, n_seen))
            n_seen += 1
        state.update((first_url, n_seen))
        if ttl_minutes:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        yield pd.DataFrame(
            out, columns=["fingerprint", "url", "is_first", "n_duplicates_so_far"]
        )

    return _dedup_fn


def streaming_dedup(pages: DataFrame, ttl_minutes: int | None = None) -> DataFrame:
    """pages stream → per-document dedup verdicts with cross-batch state.

    Output: (fingerprint, url, is_first, n_duplicates_so_far) — one row per
    input document; `is_first=1` marks the copy to keep. Downstream keeps
    `filter(is_first = 1)` for the deduplicated corpus and can aggregate
    the rest for dup-rate monitoring.
    """
    from bioner_spark.ops.dedup import fingerprint_expr

    # THE fingerprint definition shared with batch dedup
    # (ops/dedup.py:fingerprint_expr — normalization + NULL-text per-url
    # sentinel): the cross-path dedup parity the contract queries assert
    # depends on batch and streaming staying bit-identical.
    keyed = pages.select(
        fingerprint_expr(F.col("text"), F.col("url")).alias("fingerprint"),
        "url",
    )
    grouped = keyed.groupBy("fingerprint")
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes
        else GroupStateTimeout.NoTimeout
    )
    return grouped.applyInPandasWithState(
        _make_dedup_fn(ttl_minutes), OUTPUT_SCHEMA, STATE_SCHEMA, "append", timeout
    )
