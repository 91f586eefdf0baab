"""Position features as window functions.

Reference PositionEncoder (bioner/model/encoder/position_encoder.py:10-33)
walks the document tree setting 4 booleans per token:
  begin_doc      = first token of first sentence
  begin_sentence = first token of its sentence
  end_sentence   = last token of its sentence
  end_document   = last token of last sentence
The prepend-to-encoding order is [begin_doc, begin_sentence, end_sentence,
end_document] (position_encoder.py:28-33).

Engine version: two max() windows (per sentence, per doc). Both windows
partition by doc_id (the sentence window keys are a superset), so a single
hash-partitioning by doc_id serves the whole stage — one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

POSITION_FEATURE_NAMES = ["begin_doc", "begin_sentence", "end_sentence", "end_document"]


def with_position_features(tokens: DataFrame) -> DataFrame:
    w_sent = Window.partitionBy("doc_id", "sentence_id")
    w_doc = Window.partitionBy("doc_id")
    max_tok_in_sent = F.max("token_id").over(w_sent)
    max_sent_in_doc = F.max("sentence_id").over(w_doc)

    begin_sentence = F.col("token_id") == 0
    end_sentence = F.col("token_id") == max_tok_in_sent
    begin_doc = begin_sentence & (F.col("sentence_id") == 0)
    end_document = end_sentence & (F.col("sentence_id") == max_sent_in_doc)
    return tokens.withColumns(
        {
            "begin_doc": begin_doc,
            "begin_sentence": begin_sentence,
            "end_sentence": end_sentence,
            "end_document": end_document,
        }
    )


def position_vector() -> Column:
    """4-dim 0/1 float array in reference order (position_encoder.py:28-33);
    apply after with_position_features."""
    return F.array(
        *[F.col(n).cast("float") for n in POSITION_FEATURE_NAMES]
    )
