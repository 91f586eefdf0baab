"""External-prediction import + positional alignment (SURVEY §2.1 S12,
§2.5 M8).

The reference reads a 2-column space-separated prediction file (token,
tag — postprocess_predictions.py:9-18) and zips it positionally onto the
dataset, asserting token-text equality at every position
(postprocess_predictions.py:21-38).

Engine version: the prediction file has no (doc, sentence, token) key — its
only key IS the position. The reader therefore materializes an explicit
(_file, _line) order key: files are read whole (`wholetext`) and split into
lines executor-side, so line order is exact by construction rather than
inferred from scan-partition order (Spark packs file splits into partitions
sorted by SIZE, not by file/offset, so `monotonically_increasing_id()` over
a multi-file or multi-split scan does NOT follow line order). Both sides
get a global position via `row_number()`, are FULL-OUTER joined on it, and
strict mode `raise_error`s on any text mismatch *or length mismatch* — a
shorter/longer prediction file fails the job instead of silently truncating
the corpus (the distributed analogue of the reference's assert).

Scale note: a global row_number is a single-partition sort, and `wholetext`
holds one file per task in memory — both fine for the (small, single-file)
prediction imports this models; corpus-scale alignment keys on
(doc_id, sentence_id, token_id) instead and never needs this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: order-key columns the reader attaches; align_predictions consumes them
ORDER_COLS = ("_file", "_line")


def read_prediction_tsv(spark: SparkSession, path: str) -> DataFrame:
    """2-col space-separated (token, tag) rows with an exact (_file, _line)
    order key; blank lines are dropped (sentence separators carry no
    alignment information — the positional zip in the reference skips them
    the same way). Multi-file globs order deterministically by file path."""
    raw = spark.read.text(path, wholetext=True)
    lines = raw.select(
        F.input_file_name().alias("_file"),
        # mirror Hadoop's LineReader terminators so a CRLF file parses the
        # same as spark.read.text would have parsed it
        F.posexplode(F.split(F.col("value"), r"\r\n|\r|\n")).alias("_line", "value"),
    )
    parts = F.split(F.col("value"), " ")
    return (
        lines.filter(F.length(F.trim(F.col("value"))) > 0)
        .select(
            "_file",
            "_line",
            parts.getItem(0).alias("pred_text"),
            parts.getItem(1).alias("pred_tag"),
        )
    )


def with_position(df: DataFrame, order_cols: list[str] | None, out: str) -> DataFrame:
    """0-based global position by `order_cols`. The no-order-cols fallback
    ranks by `monotonically_increasing_id()` — only safe when the upstream
    is a single in-order partition (NOT a multi-file/multi-split scan);
    `read_prediction_tsv` always provides real order columns instead."""
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
    prediction's token text differs from the dataset's — INCLUDING a
    missing position on either side when the two inputs differ in length —
    raises at execution time (postprocess_predictions.py:32-34). Without
    the length check an inner join would silently drop the tail of the
    longer side and report success on a truncated corpus.
    """
    t = with_position(tokens, ["doc_id", "sentence_id", "token_id"], "_pos")
    missing = [c for c in ORDER_COLS if c not in predictions.columns]
    if missing:
        # LOUD, not the mono-id fallback — and BOTH columns are required:
        # ordering by _file alone leaves within-file ties broken by
        # arbitrary shuffle order, the exact silent-misalignment hazard the
        # with_position docstring warns about
        raise ValueError(
            f"align_predictions: predictions frame lacks order column(s) "
            f"{missing} — read it with read_prediction_tsv, which provides "
            "a deterministic (_file, _line) line order"
        )
    p = with_position(predictions, list(ORDER_COLS), "_pos").drop(*ORDER_COLS)
    if strict:
        # Presence markers, not text nullability: a present row with NULL
        # text (malformed TSV) must read "NULL text", not "<missing>" —
        # "<missing>" points the operator at a length mismatch that isn't
        # there. The lit(1) is NULL exactly when the full outer join found
        # no row on that side.
        t = t.withColumn("_t_row", F.lit(1))
        p = p.withColumn("_p_row", F.lit(1))
        joined = t.join(p, "_pos", "full_outer")
        side = lambda row_marker, col: F.when(
            F.col(row_marker).isNull(), F.lit("<missing — inputs differ in length>")
        ).otherwise(F.coalesce(F.col(col), F.lit("<null text>")))
        bad = (
            F.col("_t_row").isNull()
            | F.col("_p_row").isNull()
            | F.col("text").isNull()
            | F.col("pred_text").isNull()
            # a prediction line with no tag column (truncated export):
            # the reference's line.split(' ')[1] raises IndexError, so
            # strict mode must raise too — not write tag=NULL
            | F.col("pred_tag").isNull()
            | (F.col("text") != F.col("pred_text"))
        )
        check = F.when(
            bad,
            F.raise_error(
                F.concat(
                    F.lit("prediction/token mismatch at position "),
                    F.col("_pos").cast("string"),
                    F.lit(": token="),
                    side("_t_row", "text"),
                    F.lit(" != prediction="),
                    side("_p_row", "pred_text"),
                )
            ),
        ).otherwise(F.col("pred_tag"))
        joined = joined.withColumn("tag", check).drop("_t_row", "_p_row")
    else:
        joined = t.join(p, "_pos", "inner").withColumn("tag", F.col("pred_tag"))
    return joined.drop("_pos", "pred_text", "pred_tag")
