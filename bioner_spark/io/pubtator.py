"""PubTator corpus format: render, parse, and char-span → token-IOB projection.

Closes SURVEY §2.1 S10: the reference converts MedMentions from PubTator to
CoNLL through the external `bconv` library (reference
bioner/preprocessing/medmentions_conll_converter.py:27-29 — `bconv.load(fmt=
'pubtator')` then `bconv.dump(fmt='conll', tagset='IOB')`). The format
itself is public and simple (NCBI PubTator export): per document

    <pmid>|t|<title text>
    <pmid>|a|<abstract text>
    <pmid> TAB <start> TAB <end> TAB <mention> TAB <type> TAB <concept_id>
    (blank line between documents)

with annotation offsets into ``title + <1 separator char> + abstract``.

Engine version is Spark-native and line-parallel: every PubTator line is
self-describing (title / abstract / annotation decided by its own shape), so
``spark.read.text`` + regexp parsing needs no document grouping pass — the
scan is narrow until the one doc-keyed join that reassembles title+abstract.
The IOB projection (the piece bconv's conll dump performs) is a doc-keyed
range join: token gets ``B-<type>`` when it contains the annotation's start
char, ``I-<type>`` while it starts inside the span, ``O`` otherwise;
overlapping annotations resolve deterministically to (earliest start,
then longest). At 100 TB: parse is map-side; the projection shuffles tokens
and annotations once each, co-keyed on doc_id (annotations per doc are tiny,
so the join relation is skew-free and AQE-coalescible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# title/abstract lines: anchored on the FIRST '|t|' / '|a|' after a numeric
# id, so body text containing '|' still parses
_TITLE_RE = r"^(\d+)\|t\|(.*)$"
_ABSTRACT_RE = r"^(\d+)\|a\|(.*)$"


def kept_sentence_offsets(pages: DataFrame, doc_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """→ (doc_id, sentence_id, g_off): global char offset of each non-empty
    sentence inside the PubTator rendering of the document (non-empty
    sentences joined by exactly one separator char — '\\n' after the title,
    ' ' inside the abstract; both are 1 char, so offsets are separator-
    agnostic). Empty sentences keep their original sentence_id numbering
    (tokenizer contract) but consume no chars.

    Narrow: the cumulative sum runs inside a higher-order aggregate over the
    per-row sentence array — no window, no shuffle."""
    parts = F.split(F.col(text_col), "\n")
    # running offset advances len+1 per NON-empty part; every part records
    # the offset it would start at
    offs = F.aggregate(
        parts,
        F.struct(F.lit(0).alias("off"), F.array().cast("array<int>").alias("acc")),
        lambda acc, x: F.struct(
            F.when(F.length(x) > 0, acc["off"] + F.length(x) + F.lit(1))
            .otherwise(acc["off"]).alias("off"),
            F.concat(acc["acc"], F.array(acc["off"])).alias("acc"),
        ),
        lambda acc: acc["acc"],
    )
    zipped = F.arrays_zip(parts.alias("sentence"), offs.alias("g_off"))
    return (
        pages.select(F.col(doc_col).alias("doc_id"),
                     F.posexplode(zipped).alias("sentence_id", "z"))
        .filter(F.length("z.sentence") > 0)
        .select(
            "doc_id",
            F.col("sentence_id").cast("int"),
            F.col("z.g_off").cast("int").alias("g_off"),
        )
    )


def render_pubtator(pages: DataFrame, mentions: DataFrame,
                    doc_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """pages × mentions → one PubTator line per row (single 'line' column).

    ``mentions`` carries (doc_id, g_start, g_end, etype, concept_id) with
    GLOBAL char offsets into the rendering; the mention surface is cut from
    the reconstructed text so the emitted line is format-faithful
    (mention column == substring(text, start, end), as NCBI emits it).

    Title = first non-empty sentence; abstract = remaining non-empty
    sentences joined by ' ' (PubTator abstracts are single-line; offsets are
    unchanged because the engine's sentence separator is also 1 char).

    A document with NO non-empty sentence has no title line to render and
    is skipped (without the guard, element_at on the empty sentence array
    aborts the whole export under Spark's default ANSI mode — one
    blank/fetch-failed doc would kill the job)."""
    kept = F.filter(F.split(F.col(text_col), "\n"), lambda x: F.length(x) > 0)
    docs = pages.filter(F.size(kept) > 0).select(
        F.col(doc_col).alias("doc_id"),
        F.element_at(kept, 1).alias("title"),
        F.array_join(F.slice(kept, 2, F.greatest(F.size(kept) - 1, F.lit(0))), " ")
        .alias("abstract"),
        F.array_join(kept, " ").alias("_recon"),
    )
    t_lines = docs.select(
        F.concat(F.col("doc_id").cast("string"), F.lit("|t|"), F.col("title"))
        .alias("line")
    )
    a_lines = docs.select(
        F.concat(F.col("doc_id").cast("string"), F.lit("|a|"), F.col("abstract"))
        .alias("line")
    )
    ann_lines = (
        mentions.join(docs.select("doc_id", "_recon"), "doc_id")
        .select(
            F.concat_ws(
                "\t",
                F.col("doc_id").cast("string"),
                F.col("g_start").cast("string"),
                F.col("g_end").cast("string"),
                F.expr("substring(_recon, g_start + 1, g_end - g_start)"),
                F.col("etype"),
                F.col("concept_id").cast("string"),
            ).alias("line")
        )
    )
    return t_lines.unionByName(a_lines).unionByName(ann_lines)


def read_pubtator(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """PubTator text file(s) → (docs, annotations).

    docs: (doc_id long, title, abstract, text) with
    ``text = title || '\\n' || abstract`` — the 1-char junction keeps
    annotation offsets valid and lets the engine tokenizer see title and
    abstract as two sentences (bconv's section model).

    annotations: (doc_id long, start int, end int, mention, etype,
    concept_id). Blank separator lines and malformed rows are dropped
    (try_cast, never a bare cast: under Spark's default ANSI mode one
    malformed row — or a title/abstract body containing 5+ literal tabs —
    would otherwise abort the whole scan with CAST_INVALID_INPUT).
    Malformed-input resilience beyond that: a document whose title line is
    missing/corrupt still surfaces (title='', full-outer reassembly) so its
    annotations are never silently orphaned, and duplicate title/abstract
    lines for one pmid collapse deterministically to the minimum instead
    of cross-producting through the join.

    Line-parallel: each line classifies itself; the only shuffle is the
    title⋈abstract reassembly join on doc_id (both aggregations and the
    join share the one doc_id exchange)."""
    lines = spark.read.text(path).select(F.col("value").alias("line"))
    titles = (
        lines.filter(F.col("line").rlike(_TITLE_RE))
        .select(
            F.regexp_extract("line", _TITLE_RE, 1).try_cast("long").alias("doc_id"),
            F.regexp_extract("line", _TITLE_RE, 2).alias("title"),
        )
        .filter(F.col("doc_id").isNotNull())  # pmid overflowing int64: malformed
        .groupBy("doc_id")
        .agg(F.min("title").alias("title"))
    )
    abstracts = (
        lines.filter(F.col("line").rlike(_ABSTRACT_RE))
        .select(
            F.regexp_extract("line", _ABSTRACT_RE, 1).try_cast("long").alias("doc_id"),
            F.regexp_extract("line", _ABSTRACT_RE, 2).alias("abstract"),
        )
        .filter(F.col("doc_id").isNotNull())
        .groupBy("doc_id")
        .agg(F.min("abstract").alias("abstract"))
    )
    docs = (
        titles.join(abstracts, "doc_id", "full")
        .select(
            "doc_id",
            F.coalesce("title", F.lit("")).alias("title"),
            F.coalesce("abstract", F.lit("")).alias("abstract"),
            F.concat(
                F.coalesce("title", F.lit("")), F.lit("\n"),
                F.coalesce("abstract", F.lit("")),
            ).alias("text"),
        )
    )
    parts = F.split(F.col("line"), "\t")
    anns = (
        lines.filter(F.size(parts) >= 6)
        .select(
            F.element_at(parts, 1).try_cast("long").alias("doc_id"),
            F.element_at(parts, 2).try_cast("int").alias("start"),
            F.element_at(parts, 3).try_cast("int").alias("end"),
            F.element_at(parts, 4).alias("mention"),
            F.element_at(parts, 5).alias("etype"),
            F.element_at(parts, 6).alias("concept_id"),
        )
        .filter(F.col("doc_id").isNotNull() & F.col("start").isNotNull()
                & F.col("end").isNotNull())
    )
    return docs, anns


def project_iob(tokens: DataFrame, annotations: DataFrame) -> DataFrame:
    """Char-span annotations → token-level IOB tags (bconv conll/IOB dump
    semantics, reference medmentions_conll_converter.py:29).

    ``tokens`` needs (doc_id, g_start, g_end, text) with GLOBAL char
    offsets; ``annotations`` needs (doc_id, start, end, etype).

    Rules: a token belongs to an annotation when their char spans OVERLAP
    (``g_start < end AND g_end > start`` — robust to annotations that begin
    or end mid-token, e.g. a MedMentions span inside a punctuation-glued
    token). When several annotations claim one token, the earliest-start
    then longest one wins (deterministic total order). Per winning
    annotation, its FIRST claimed token is ``B-<etype>`` and the rest are
    ``I-<etype>`` — exact even when the annotation starts between tokens,
    so an orphan ``I-`` without its ``B-`` can never be emitted. Tokens
    outside every span are ``O``.

    Plan: one doc-keyed overlap join; the winner per token is a min(struct)
    aggregation (map-side combinable, no window); the B/I split is a second
    small aggregation over the ANNOTATED tokens only (first g_start per
    winning annotation — at web scale annotated tokens are a few % of all
    tokens) joined back on the winner key."""
    t = tokens.select("doc_id", "g_start", "g_end", F.col("text").alias("token"))
    a = annotations.select(
        "doc_id", F.col("start").alias("a_start"),
        F.col("end").alias("a_end"), "etype",
    ).filter(
        # a zero-width (or inverted) span claims nothing — without this a
        # malformed start==end annotation would satisfy the overlap
        # predicate for its containing token
        F.col("a_start") < F.col("a_end")
    )
    j = t.join(
        a,
        [t.doc_id == a.doc_id, t.g_start < a.a_end, t.g_end > a.a_start],
        "left",
    ).select(
        t.doc_id, "g_start", "g_end", "token",
        F.when(
            a.a_start.isNotNull(),
            F.struct(
                F.col("a_start"), (-F.col("a_end")).alias("neg_end"), F.col("etype")
            ),
        ).alias("cand"),
    )
    won = j.groupBy("doc_id", "g_start", "g_end", "token").agg(
        F.min("cand").alias("w")
    )
    firsts = (
        won.filter(F.col("w").isNotNull())
        .groupBy("doc_id", "w")
        .agg(F.min("g_start").alias("_b_start"))
    )
    return (
        won.join(firsts, ["doc_id", "w"], "left")
        .select(
            "doc_id", "g_start", "g_end", "token",
            F.when(F.col("w").isNull(), F.lit("O"))
            .when(
                F.col("g_start") == F.col("_b_start"),
                F.concat(F.lit("B-"), F.col("w.etype")),
            )
            .otherwise(F.concat(F.lit("I-"), F.col("w.etype")))
            .alias("tag"),
        )
    )
