"""External-prediction import + positional alignment (SURVEY §2.1 S12,
§2.5 M8).

The reference reads a 2-column space-separated prediction file (token,
tag — postprocess_predictions.py:9-18) and zips it positionally onto the
dataset, asserting token-text equality at every position
(postprocess_predictions.py:21-38).

Engine version: the prediction file has no (doc, sentence, token) key — its
only key IS the position. Both sides get a global position via
`row_number()` over their natural order, are joined on it, and the token
texts are checked with `raise_error` (the distributed analogue of the
reference's assert — one mismatched row fails the job, not silently
misaligns the corpus).

Scale note: a global row_number is a single-partition sort — fine for the
(small, single-file) prediction imports this models; corpus-scale alignment
keys on (doc_id, sentence_id, token_id) instead and never needs this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_prediction_tsv(spark: SparkSession, path: str) -> DataFrame:
    """2-col space-separated (token, tag) rows; blank lines are dropped
    (sentence separators carry no alignment information — the positional
    zip in the reference skips them the same way)."""
    raw = spark.read.text(path)
    parts = F.split(F.col("value"), " ")
    return (
        raw.filter(F.length(F.trim(F.col("value"))) > 0)
        .select(
            parts.getItem(0).alias("pred_text"),
            parts.getItem(1).alias("pred_tag"),
        )
    )


def with_position(df: DataFrame, order_cols: list[str] | None, out: str) -> DataFrame:
    if order_cols:
        w = Window.orderBy(*order_cols)
    else:
        w = Window.orderBy(F.monotonically_increasing_id())
    return df.withColumn(out, F.row_number().over(w) - 1)


def align_predictions(
    tokens: DataFrame,
    predictions: DataFrame,
    strict: bool = True,
) -> DataFrame:
    """tokens (ordered by doc/sentence/token ids) + positional predictions →
    tokens with `tag` overwritten by the external prediction.

    strict=True reproduces the reference assert: any position where the
    prediction's token text differs from the dataset's raises at execution
    time (postprocess_predictions.py:32-34).
    """
    t = with_position(tokens, ["doc_id", "sentence_id", "token_id"], "_pos")
    p = with_position(predictions, None, "_pos")
    joined = t.join(p, "_pos", "inner")
    if strict:
        check = F.when(
            F.col("text") != F.col("pred_text"),
            F.raise_error(
                F.concat(
                    F.lit("prediction/token text mismatch at position "),
                    F.col("_pos").cast("string"),
                    F.lit(": "),
                    F.col("text"),
                    F.lit(" != "),
                    F.col("pred_text"),
                )
            ),
        ).otherwise(F.col("pred_tag"))
    else:
        check = F.col("pred_tag")
    return joined.withColumn("tag", check).drop("_pos", "pred_text", "pred_tag")
