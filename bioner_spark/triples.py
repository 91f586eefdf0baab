"""(subj, pred, obj) triple materialization from linked mentions.

Semantics (the engine's KG rule, mirrored exactly by the single-node oracle
in corpus.py's gold generator):

  * for every ordered pair of linked mentions (m1, m2) in one sentence with
    m1.start_tok < m2.start_tok:
      - pred = the FIRST predicate-lexicon token strictly between m1.end_tok
        and m2.start_tok, else 'co_occurs_with'
      - subj = component(m1.canonical_id), obj = component(m2.canonical_id)
        (component = connected-components canonical form, graph.py)
  * triples are DISTINCT per (subj, pred, obj, doc_id, sentence_id).

Scale notes:
  * the mention×mention self-join is keyed on (doc_id, sentence_id) — both
    sides come out of the span decode already hash-partitioned on those
    keys, so the join reuses the existing exchange;
  * sentence-level mention counts are small (≤ dozens), so the pair blowup
    is bounded per row; crawl hot-host skew is handled upstream by the
    full-url repartition before inference (pipeline.py — deliberately NOT
    a low-cardinality salt key, see the anti-pattern note there);
  * the predicate lookup joins the (tiny) verb lexicon broadcast against
    the tokens-between range via a range condition on token_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bioner_spark.metrics import exact_match_prf1

DEFAULT_PREDICATES = ["treats", "causes", "inhibits", "prevents", "reduces"]
CO_OCCURS = "co_occurs_with"


def mention_pairs(linked_mentions: DataFrame) -> DataFrame:
    """Ordered same-sentence mention pairs with resolved canonical ids."""
    m1 = linked_mentions.alias("m1")
    m2 = linked_mentions.alias("m2")
    return (
        m1.join(
            m2,
            (F.col("m1.doc_id") == F.col("m2.doc_id"))
            & (F.col("m1.sentence_id") == F.col("m2.sentence_id"))
            & (F.col("m1.start_tok") < F.col("m2.start_tok")),
            "inner",
        )
        .select(
            F.col("m1.doc_id").alias("doc_id"),
            F.col("m1.sentence_id").alias("sentence_id"),
            F.col("m1.component").alias("subj"),
            F.col("m2.component").alias("obj"),
            F.col("m1.end_tok").alias("subj_end"),
            F.col("m2.start_tok").alias("obj_start"),
        )
    )


def extract_triples(
    linked_mentions: DataFrame,
    tokens: DataFrame,
    predicates: list[str] | None = None,
) -> DataFrame:
    """linked mentions (with `component`) + tokens → distinct triples."""
    # normalize the lexicon like the token side: the scan lowercases token
    # text before isin(), so a caller-supplied "Treats" would otherwise
    # match nothing and every pair would silently fall through to
    # co_occurs_with
    predicates = [p.lower() for p in (predicates or DEFAULT_PREDICATES)]
    pairs = mention_pairs(linked_mentions)
    verbs = tokens.filter(F.lower(F.col("text")).isin(predicates)).select(
        "doc_id",
        "sentence_id",
        F.col("token_id").alias("verb_tok"),
        F.lower(F.col("text")).alias("verb"),
    )
    # the BETWEEN range is part of the JOIN CONDITION, not a post-join
    # filter: joining on the sentence key alone materializes pairs×verbs
    # rows per sentence before anything prunes them (a giant-doc sentence
    # with 20 mentions and 10 predicate tokens would emit 1,900 rows into
    # the aggregation); in the condition, non-between verbs never leave
    # the join. LEFT join semantics unchanged — a pair with no between-verb
    # survives with NULL verb and falls through to CO_OCCURS.
    with_verb = (
        pairs.alias("p").join(
            verbs.alias("v"),
            (F.col("p.doc_id") == F.col("v.doc_id"))
            & (F.col("p.sentence_id") == F.col("v.sentence_id"))
            & (F.col("v.verb_tok") > F.col("p.subj_end"))
            & (F.col("v.verb_tok") < F.col("p.obj_start")),
            "left",
        )
        .select(
            F.col("p.doc_id").alias("doc_id"),
            F.col("p.sentence_id").alias("sentence_id"),
            "subj", "obj", "subj_end", "obj_start", "verb_tok", "verb",
        )
        .groupBy("doc_id", "sentence_id", "subj", "obj", "subj_end", "obj_start")
        .agg(
            F.min(
                F.when(F.col("verb_tok").isNotNull(), F.struct("verb_tok", "verb"))
            ).alias("first_verb")
        )
        .select(
            F.col("subj"),
            F.coalesce(F.col("first_verb.verb"), F.lit(CO_OCCURS)).alias("pred"),
            F.col("obj"),
            "doc_id",
            F.col("sentence_id").cast("int").alias("sentence_id"),
        )
    )
    return with_verb.distinct()


def triple_prf1(pred_triples: DataFrame, gold_triples: DataFrame) -> DataFrame:
    """Exact-match triple precision/recall/F1 (the P/R ≥ 0.95 gate,
    BASELINE.json north_rule). Join/aggregate core is the shared
    metrics.exact_match_prf1 — ONE action, because pred_triples is the end
    of the whole extract→tag→link→triples DAG."""
    return exact_match_prf1(
        pred_triples, gold_triples, ["subj", "pred", "obj", "doc_id", "sentence_id"]
    )
