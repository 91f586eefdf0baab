"""Dictionary NER tagging + entity linking (UMLS/MeSH-style alias table).

Two tagger backends share the downstream pipeline:
  * `dict_tag_tokens` — pure native SQL gazetteer tagger (window leads +
    broadcast join); deterministic, the parity-gated default.
  * the neural tagger (bioner_spark.ner.infer) — the reference's
    BiLSTM analogue.

Linking proper (`link_mentions`) is the broadcast hash join the reference
never needed (its "joins" were Python set ops — SURVEY.md §2.7); ambiguous
aliases resolve to the MIN canonical_id (deterministic; canonicalization by
connected components later merges the ambiguous ids anyway).

Overlap resolution rule (documented engine semantic, applied identically in
the single-node oracle): a candidate span is kept iff no other overlapping
candidate in the same sentence is longer, or equal-length with an earlier
start. Non-iterative (one self-join + anti-join) → deterministic and
shuffle-bounded; on template corpora candidates never overlap, the rule
exists for robustness on real text.

Scale: the alias dictionary is small (≤ millions of rows) → broadcast;
token-side work is window leads over (doc, sentence) — the same hash
partitioning the tokenizer's downstream stages already use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _aliases_by_len(alias_dict: DataFrame) -> DataFrame:
    return alias_dict.withColumn("n_words", F.size(F.split(F.col("alias"), " ")))


def candidate_mentions(
    tokens: DataFrame, alias_dict: DataFrame, max_alias_len: int = 3
) -> DataFrame:
    """All dictionary matches: (doc_id, sentence_id, start_tok, end_tok,
    mention_text, canonical_id). Matching is lowercase-exact on the
    single-space token join (the alias table stores lowercase surface forms).
    """
    w = Window.partitionBy("doc_id", "sentence_id").orderBy("token_id")
    aliases = _aliases_by_len(alias_dict)
    parts = []
    base = tokens.select(
        "doc_id", "sentence_id", "token_id", F.lower(F.col("text")).alias("w0")
    )
    for L in range(1, max_alias_len + 1):
        cols = [F.col("w0")] + [F.lead("w0", i).over(w) for i in range(1, L)]
        phrase = F.concat_ws(" ", *cols)
        cand = (
            base.withColumn("phrase", phrase)
            .withColumn("last_w", cols[-1])
            .filter(F.col("last_w").isNotNull())
            .select(
                "doc_id",
                "sentence_id",
                F.col("token_id").alias("start_tok"),
                (F.col("token_id") + F.lit(L - 1)).alias("end_tok"),
                "phrase",
            )
        )
        al = aliases.filter(F.col("n_words") == L).select(
            F.col("alias").alias("phrase"), "canonical_id"
        )
        parts.append(cand.join(F.broadcast(al), "phrase", "inner"))
    cands = parts[0]
    for p in parts[1:]:
        cands = cands.unionByName(p)
    # ambiguous alias → deterministic min canonical_id
    return cands.groupBy("doc_id", "sentence_id", "start_tok", "end_tok").agg(
        F.min("canonical_id").alias("canonical_id"),
        F.first("phrase").alias("mention_text"),
    )


def resolve_overlaps(cands: DataFrame) -> DataFrame:
    """Keep a candidate iff no overlapping candidate dominates it
    (longer, or same length and earlier start)."""
    a = cands.alias("a")
    b = cands.alias("b")
    len_a = F.col("a.end_tok") - F.col("a.start_tok")
    len_b = F.col("b.end_tok") - F.col("b.start_tok")
    overlap = (F.col("a.start_tok") <= F.col("b.end_tok")) & (
        F.col("b.start_tok") <= F.col("a.end_tok")
    )
    dominates = (len_b > len_a) | (
        (len_b == len_a) & (F.col("b.start_tok") < F.col("a.start_tok"))
    )
    dominated = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.sentence_id") == F.col("b.sentence_id"))
            & overlap
            & dominates,
            "inner",
        )
        .select("a.doc_id", "a.sentence_id", "a.start_tok", "a.end_tok")
        .distinct()
    )
    return cands.join(
        dominated, ["doc_id", "sentence_id", "start_tok", "end_tok"], "left_anti"
    )


def dict_tag_tokens(
    tokens: DataFrame, alias_dict: DataFrame, max_alias_len: int = 3
) -> DataFrame:
    """tokens → tokens + BIO `tag` from dictionary matches (B at span start,
    I inside, O elsewhere)."""
    spans = resolve_overlaps(candidate_mentions(tokens, alias_dict, max_alias_len))
    per_token = spans.select(
        "doc_id",
        "sentence_id",
        F.posexplode(
            F.sequence(F.col("start_tok"), F.col("end_tok"))
        ).alias("pos_in_span", "token_id"),
    ).select(
        "doc_id",
        "sentence_id",
        "token_id",
        F.when(F.col("pos_in_span") == 0, F.lit("B")).otherwise(F.lit("I")).alias("_tag"),
    )
    return (
        tokens.drop("tag")
        .join(per_token, ["doc_id", "sentence_id", "token_id"], "left")
        .withColumn("tag", F.coalesce(F.col("_tag"), F.lit("O")))
        .drop("_tag")
    )


def link_mentions(mentions: DataFrame, alias_dict: DataFrame) -> DataFrame:
    """mentions (from span decode) → + canonical_id via broadcast alias join;
    unlinkable mentions keep canonical_id NULL (kept for recall analysis)."""
    al = alias_dict.groupBy("alias").agg(F.min("canonical_id").alias("canonical_id"))
    return mentions.join(
        F.broadcast(al),
        F.lower(F.col("mention_text")) == F.col("alias"),
        "left",
    ).drop("alias")


def alias_edges(alias_dict: DataFrame) -> DataFrame:
    """Canonical-id ↔ canonical-id edges induced by shared aliases — the
    input graph for connected-components canonicalization."""
    a = alias_dict.select("alias", F.col("canonical_id").alias("src"))
    b = alias_dict.select("alias", F.col("canonical_id").alias("dst"))
    return (
        a.join(b, "alias")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
