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

    Single-pass plan: ONE window (all `lead`s share the same WindowExec →
    one sort per (doc, sentence) partition), phrases for every length built
    as an array and exploded, then ONE broadcast join on phrase — the
    matched alias's own word count supplies end_tok. ~3 stages total vs one
    window + join per length; this stage was the pipeline's bottleneck
    before the rewrite.
    """
    w = Window.partitionBy("doc_id", "sentence_id").orderBy("token_id")
    base = tokens.select(
        "doc_id", "sentence_id", "token_id", F.lower(F.col("text")).alias("w0")
    )
    # materialize all leads in one projection (window exprs can't sit inside
    # a Generate); they share one WindowExec → a single sort per partition
    base = base.select(
        "doc_id",
        "sentence_id",
        "token_id",
        "w0",
        *[F.lead("w0", i).over(w).alias(f"w{i}") for i in range(1, max_alias_len)],
    )
    # first-word prefilter (exact): a phrase can only match an alias whose
    # first word equals w0, so rows whose w0 never starts any alias produce
    # no candidates — drop them BEFORE building/exploding phrases. On real
    # text the overwhelming majority of tokens are not alias starts, so this
    # cuts the explode output and broadcast probe traffic by 1-2 orders of
    # magnitude (memory-bandwidth relief measured in BENCH.md). One hash
    # probe of a small first-word set per token replaces 3 phrase probes +
    # 2 concats + 3 generated rows per non-matching token.
    al = (
        _aliases_by_len(alias_dict)
        .filter(F.col("n_words") <= max_alias_len)
        .select(F.col("alias").alias("phrase"), "n_words", "canonical_id")
    )
    # derived from the LENGTH-FILTERED aliases: a token that only starts
    # aliases longer than max_alias_len can never match, so letting it
    # through would build/explode/probe phrases that are guaranteed misses
    first_words = al.select(
        F.element_at(F.split(F.col("phrase"), " "), 1).alias("w0")
    ).distinct()
    base = base.join(F.broadcast(first_words), "w0", "left_semi")
    leads = [F.col(f"w{i}") for i in range(max_alias_len)]
    phrase_cols = [F.col("w0")]
    for L in range(2, max_alias_len + 1):
        # NULL once the sentence runs out (concat_ws would silently skip
        # the NULL and fabricate a shorter phrase — guard with `when`)
        phrase_cols.append(
            F.when(leads[L - 1].isNotNull(), F.concat_ws(" ", *leads[:L]))
        )
    cand = (
        base.select(
            "doc_id",
            "sentence_id",
            F.col("token_id").alias("start_tok"),
            F.explode(F.array(*phrase_cols)).alias("phrase"),
        )
        .filter(F.col("phrase").isNotNull())
    )
    cands = cand.join(F.broadcast(al), "phrase", "inner").select(
        "doc_id",
        "sentence_id",
        "start_tok",
        (F.col("start_tok") + F.col("n_words") - 1).alias("end_tok"),
        "phrase",
        "canonical_id",
    )
    # ambiguous alias → deterministic min canonical_id
    return cands.groupBy("doc_id", "sentence_id", "start_tok", "end_tok").agg(
        F.min("canonical_id").alias("canonical_id"),
        F.first("phrase").alias("mention_text"),
    )


def resolve_overlaps(cands: DataFrame) -> DataFrame:
    """Keep a candidate iff no overlapping candidate dominates it
    (longer, or same length and earlier start).

    DELIBERATE one-shot rule, NOT greedy longest-match: dominance is
    checked against ALL candidates, including ones that are themselves
    dropped. On chained equal-length overlaps — aliases 'a b', 'b c',
    'c d' over tokens `a b c d` → candidates (0,1),(1,2),(2,3) — this
    keeps only (0,1): (2,3) is dominated by the dropped (1,2) and dies
    with it, where greedy would keep (0,1) and (2,3). The trade is a
    single vectorized pass (no iterative re-scan per sentence) for a
    recall tail on pathological alias chains; the DuckDB oracle mirrors
    the same rule, so parity holds by construction.

    Formulation: ONE groupBy per sentence (candidates per sentence are few),
    dominance checked with an in-array `exists` lambda, survivors re-exploded
    with `inline`. An earlier version did a (doc, sentence)-keyed self-join
    + distinct + anti-join — three shuffles of the full candidate table vs
    one here, and the groupBy reuses the partitioning the candidate window
    already established."""
    per_sent = cands.groupBy("doc_id", "sentence_id").agg(
        F.collect_list(
            F.struct("start_tok", "end_tok", "canonical_id", "mention_text")
        ).alias("cs")
    )

    def dominates(b, a):
        len_a = a["end_tok"] - a["start_tok"]
        len_b = b["end_tok"] - b["start_tok"]
        overlap = (a["start_tok"] <= b["end_tok"]) & (b["start_tok"] <= a["end_tok"])
        return overlap & (
            (len_b > len_a) | ((len_b == len_a) & (b["start_tok"] < a["start_tok"]))
        )

    kept = F.filter(
        F.col("cs"), lambda a: ~F.exists(F.col("cs"), lambda b: dominates(b, a))
    )
    return (
        per_sent.select("doc_id", "sentence_id", F.inline(kept))
        .select(
            "doc_id", "sentence_id", "start_tok", "end_tok",
            "canonical_id", "mention_text",
        )
    )


def dict_mentions(
    tokens: DataFrame, alias_dict: DataFrame, max_alias_len: int = 3
) -> DataFrame:
    """tokens → mentions directly (doc_id, sentence_id, start_tok, end_tok,
    canonical_id, mention_text).

    The gazetteer fast path: resolved candidates ARE the mention spans, so
    the BIO round-trip (`dict_tag_tokens` → `decode_spans`) — a 12M×12M
    tag join-back plus a window decode that exactly reconstructs the spans
    it started from — is parity machinery, not computation. The pipeline
    uses this; the BIO path remains for neural tags and for
    reference-semantics tests. mention_text is the matched alias (lowercase
    surface form), which is what linking joins on anyway."""
    return resolve_overlaps(candidate_mentions(tokens, alias_dict, max_alias_len))


def dict_tag_tokens(
    tokens: DataFrame,
    alias_dict: DataFrame,
    max_alias_len: int = 3,
    spans: DataFrame | None = None,
) -> DataFrame:
    """tokens → tokens + BIO `tag` from dictionary matches (B at span start,
    I inside, O elsewhere).

    spans: optional precomputed dict_mentions result. A caller that already
    built mentions (pipeline.build_triples does) passes them here so the
    gazetteer candidate chain — window leads + broadcast alias join +
    overlap resolution over the full token table — is planned once and
    shared, instead of re-derived independently for the tag view."""
    if spans is None:
        spans = dict_mentions(tokens, alias_dict, max_alias_len)
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
