"""pages → tokens: sentence split + tokenization with char offsets.

Engine text-layout contract: sentences are '\\n'-separated, tokens are
single-space separated (the extractor emits exactly this). Under that
contract the whole tokenizer is native Spark SQL — split / posexplode /
higher-order `aggregate` for cumulative offsets — with ZERO shuffle: every
step is a narrow per-row transformation, so at 100 TB this stage is pure
map-side throughput.

The output matches the reference's token model (text, start, end) —
reference bioner/model/token.py:6-32 — except start/end are int, not str
(see schemas.py). Offsets are char offsets within the sentence; `start` of
token i = sum(len(tok_j)+1 for j<i), i.e. single-space joining.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_sentences(
    pages: DataFrame,
    doc_col: str = "url",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """→ (doc_id, sentence_id, sentence [, carry_cols]); drops empty
    docs/sentences. `carry_cols` are passed through unchanged (e.g.
    `warc_ts` for streaming event-time) — still a narrow transformation."""
    return (
        pages.select(
            F.col(doc_col).alias("doc_id"),
            *[F.col(c) for c in carry_cols],
            F.posexplode(F.split(F.col(text_col), "\n")).alias("sentence_id", "sentence"),
        )
        .filter(F.length("sentence") > 0)
    )


def tokenize(
    pages: DataFrame,
    doc_col: str = "url",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
    with_offsets: bool = True,
) -> DataFrame:
    """pages → canonical tokens table (TOKENS_SCHEMA minus tag).

    Offsets are computed inside the sentence's token array with a
    higher-order `aggregate` (running sum of len+1), THEN exploded — no
    window function, no shuffle anywhere in this lineage.

    with_offsets=False skips the offset computation entirely (measured ~8×
    the cost of the split itself) and emits start/end as NULL ints — the KG
    pipeline never reads char offsets, only the CoNLL-parity paths do.
    """
    sents = split_sentences(pages, doc_col=doc_col, text_col=text_col, carry_cols=carry_cols)
    if not with_offsets:
        return (
            sents.select(
                "doc_id",
                *[F.col(c) for c in carry_cols],
                F.col("sentence_id").cast("int").alias("sentence_id"),
                F.posexplode(F.split(F.col("sentence"), " ")).alias("token_id", "text"),
            )
            .filter(F.length("text") > 0)
            .select(
                "doc_id",
                *[F.col(c) for c in carry_cols],
                "sentence_id",
                F.col("token_id").cast("int"),
                "text",
                F.lit(None).cast("int").alias("start"),
                F.lit(None).cast("int").alias("end"),
            )
        )
    toks = F.split(F.col("sentence"), " ")
    # offsets[i] = cumulative (length + 1) of tokens before i
    offsets = F.aggregate(
        toks,
        F.struct(
            F.lit(0).alias("off"), F.array().cast("array<int>").alias("acc")
        ),
        lambda acc, x: F.struct(
            (acc["off"] + F.length(x) + F.lit(1)).alias("off"),
            F.concat(acc["acc"], F.array(acc["off"])).alias("acc"),
        ),
        lambda acc: acc["acc"],
    )
    zipped = F.arrays_zip(toks.alias("text"), offsets.alias("start"))
    return (
        sents.select(
            "doc_id",
            *[F.col(c) for c in carry_cols],
            "sentence_id",
            F.posexplode(zipped).alias("token_id", "tok"),
        )
        .select(
            "doc_id",
            *[F.col(c) for c in carry_cols],
            F.col("sentence_id").cast("int"),
            F.col("token_id").cast("int"),
            F.col("tok.text").alias("text"),
            F.col("tok.start").cast("int").alias("start"),
            (F.col("tok.start") + F.length("tok.text")).cast("int").alias("end"),
        )
        .filter(F.length("text") > 0)
    )
