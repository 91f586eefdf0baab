"""BIO tag sequence → entity spans (mentions), as window functions.

Reproduces the reference state machine `convert_labeled_tokens_to_annotations`
(reference bioner/model/metrics/entity_level_precision_recall.py:134-164)
EXACTLY, including the documented quirk that an `I` following an `O` (or at
sentence start) OPENS a span (reference :142-143), and that a `B` closes any
open span and starts a new one.

Declarative reformulation: within a sentence ordered by token_id,
    is_start = tag != 'O' AND (prev tag is null OR prev = 'O' OR tag = 'B')
    span_id  = running sum of is_start
    span     = (min token_id, max token_id) over tag != 'O' rows of a span_id
This is provably equivalent to the reference loop: a span is a maximal run
of non-O tokens not crossing a B boundary.

Scale note: the window partitions by (doc_id, sentence_id); the follow-up
groupBy keys are a superset of the window partition keys, so Catalyst reuses
the same hash partitioning — ONE shuffle total for decode + aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def decode_spans(tokens: DataFrame, tag_col: str = "tag") -> DataFrame:
    """tokens(doc_id, sentence_id, token_id, text, tag) → mentions
    (doc_id, sentence_id, start_tok, end_tok, mention_text)."""
    w = Window.partitionBy("doc_id", "sentence_id").orderBy("token_id")
    tag = F.col(tag_col)
    prev = F.lag(tag).over(w)
    is_start = (tag != "O") & (prev.isNull() | (prev == "O") | (tag == "B"))
    running = Window.partitionBy("doc_id", "sentence_id").orderBy("token_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    spans = (
        tokens.withColumn("_is_start", is_start.cast("int"))
        .withColumn("_span_id", F.sum("_is_start").over(running))
        .filter(tag != "O")
        .groupBy("doc_id", "sentence_id", "_span_id")
        .agg(
            F.min("token_id").alias("start_tok"),
            F.max("token_id").alias("end_tok"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("token_id", "text"))),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("mention_text"),
        )
        .drop("_span_id")
    )
    return spans


def decode_spans_reference(labeled_tokens: list[list[str]]) -> list[tuple[int, int, int]]:
    """Pure-Python port of the reference state machine — the differential-test
    authority (SURVEY.md §5c). Input: per-sentence tag lists; output:
    (sentence_id, start_token_id, end_token_id) — mirrors reference
    entity_level_precision_recall.py:134-164 line for line in behavior.
    """
    annotations: list[tuple[int, int, int]] = []
    for sentence_index, sentence in enumerate(labeled_tokens):
        open_tokens: list[int] = []
        for token_index, tag in enumerate(sentence):
            if not open_tokens:
                if tag in ("B", "I"):  # I-after-O opens a span (ref :142)
                    open_tokens.append(token_index)
            else:
                if tag == "B":
                    annotations.append((sentence_index, open_tokens[0], open_tokens[-1]))
                    open_tokens = [token_index]
                elif tag == "I":
                    open_tokens.append(token_index)
                else:  # O closes
                    annotations.append((sentence_index, open_tokens[0], open_tokens[-1]))
                    open_tokens = []
        if open_tokens:
            annotations.append((sentence_index, open_tokens[0], open_tokens[-1]))
    return annotations
