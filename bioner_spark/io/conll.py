"""CoNLL-2003-style 4-column TSV read/write — parity with the reference
parser/writer (reference bioner/model/conll_dataset.py:31-64, 110-120).

Format:
  * rows: text \\t start \\t end \\t tag
  * `-DOCSTART-` prefix row = document separator (conll_dataset.py:66-73 —
    note: startswith, not equality)
  * blank row = sentence separator; consecutive blanks collapse
    (itertools.groupby semantics, conll_dataset.py:48-54)
  * tag parsed as FIRST CHARACTER of column 4, so `B-T116,T123` → `B`
    (conll_dataset.py:83)
  * quotes are literal (csv quotechar=None, conll_dataset.py:35)

Reader: files are read with wholetext (a CoNLL file's structure is
line-order-dependent; Spark line mode does not guarantee order across
splits), then split/exploded natively with window-function running counters
for doc/sentence ids. One file = one row pre-explode, so parallelism is
per-file — matching the reference's file-at-a-time semantics; large corpora
are many files.

Writer: serializes each document back to the reference's exact byte format
(round-trip tested via full-file string equality, like the reference's
filecmp test, tests/model/test_CoNLLDataset.py:51-60).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DOC_START = "-DOCSTART-"


def read_conll(spark: SparkSession, path: str) -> DataFrame:
    """→ tokens (doc_id, sentence_id, token_id, text, start, end, tag).

    doc_id is `<file>#<n>` (0-based doc ordinal within file) so multi-file
    reads stay collision-free.

    Malformed token rows fail LOUDLY at scan time: a line with fewer than
    4 tab columns (or non-integer offsets) would otherwise flow NULL
    start/end/tag into every downstream stage and surface far from the
    cause (the reference parser IndexErrors on row[3]).

    Documented limit: a document with ZERO token rows (-DOCSTART-
    immediately followed by another separator) contributes no rows — the
    token-table schema has nowhere to carry an empty document, so the
    write path emits no header for it and read→write is byte-identical
    only for docs with ≥1 token. Real CoNLL exports (including every
    reference fixture) never contain empty documents. Symmetrically, token
    rows BEFORE the first -DOCSTART- header are kept as document 0 (never
    dropped), but the write path synthesizes the header they lacked — the
    byte-identical roundtrip holds only for files that open with a header,
    as every real export does.
    """
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), F.col("value")
    )
    lines = raw.select(
        # mirror universal-newline reading (the reference parses in Python
        # text mode): with a bare '\n' split, a CRLF file would leave '\r'
        # on every line — blank separators become 1-char token rows and
        # sentence boundaries silently vanish
        "file",
        F.posexplode(F.split(F.col("value"), r"\r\n|\r|\n")).alias("line_no", "line"),
    )
    w = Window.partitionBy("file").orderBy("line_no")
    is_doc_sep = F.col("line").startswith(DOC_START)
    is_blank = F.length("line") == 0
    lines = lines.withColumn(
        "doc_ord", F.sum(is_doc_sep.cast("int")).over(w) - 1
    ).withColumn("is_blank", is_blank)
    # new sentence when a non-blank token row follows a blank/DOCSTART/None.
    # IMPORTANT: the lag must see ALL rows (incl. blanks), so compute it
    # BEFORE filtering the separator rows out.
    lines = lines.withColumn(
        "new_sent", F.lag(F.col("is_blank") | is_doc_sep, 1, True).over(w).cast("int")
    )
    toks = lines.filter(~is_blank & ~is_doc_sep)
    # token rows BEFORE the first -DOCSTART- header carry doc_ord -1, whose
    # lpad renders the malformed id suffix '0000000-1' (breaking the
    # zero-padded lexicographic-order guarantee). Shift ONLY that case
    # (file minimum ordinal is -1): the headerless prefix becomes doc 0 and
    # headed docs after it move up by one. A blanket min-subtraction would
    # instead renumber a file whose FIRST headed document happens to be
    # token-free (min ordinal 1), diverging from the mid-file empty-doc
    # behavior where the numbering gap is preserved. Same partition key as
    # the running-counter window, so no extra exchange.
    shift = F.when(
        F.min("doc_ord").over(Window.partitionBy("file")) == -1, F.lit(1)
    ).otherwise(F.lit(0))
    toks = toks.withColumn("doc_ord", F.col("doc_ord") + shift)
    w_doc = Window.partitionBy("file", "doc_ord").orderBy("line_no")
    toks = toks.withColumn("sentence_id", (F.sum("new_sent").over(w_doc) - 1).cast("int"))
    w_sent = Window.partitionBy("file", "doc_ord", "sentence_id").orderBy("line_no")
    toks = toks.withColumn("token_id", (F.row_number().over(w_sent) - 1).cast("int"))
    cols = F.split(F.col("line"), "\t")
    return toks.select(
        # doc_ord zero-padded so LEXICOGRAPHIC doc_id order == document
        # order within a file: without it the writers' orderBy("doc_id")
        # emits doc 10 before doc 2 for files with ≥10 documents, breaking
        # the byte-identical roundtrip
        F.concat_ws(
            "#", F.col("file"), F.lpad(F.col("doc_ord").cast("string"), 9, "0")
        ).alias("doc_id"),
        "sentence_id",
        "token_id",
        cols.getItem(0).alias("text"),
        _int_field(cols, 1, "start").alias("start"),
        _int_field(cols, 2, "end").alias("end"),
        _tag_field(cols).alias("tag"),  # first char — conll_dataset.py:83
    )


def _req_field(cols, i: int, name: str):
    """Field i of the tab-split token line, raising on absence — a short
    line must not silently become NULL start/end/tag (non-ANSI mode) or
    die with an opaque INVALID_ARRAY_INDEX pointing at no input (ANSI
    mode). F.get is NULL-tolerant in both modes, so the controlled
    message below always fires."""
    v = F.get(cols, i)
    return F.when(v.isNotNull(), v).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"read_conll: malformed token row (missing {name} "
                      "column): "),
                F.get(cols, 0),
            )
        )
    )


def _int_field(cols, i: int, name: str):
    """Field i as int, raising on a present-but-non-integer value: without
    the guard, cast('int') on 'foo' — or int32 OVERFLOW on '99999999999',
    which passes a digits-only regex — yields a silent NULL offset in
    non-ANSI mode, the exact hazard _req_field closes for short lines.
    Lexical forms match Python's int() (the reference parser,
    conll_dataset.py) for ASCII input: optional surrounding spaces and an
    optional +/- sign are accepted; the digit cap keeps the bigint cast
    itself overflow-free, and the explicit int32 range check turns
    out-of-range offsets into the loud error instead of a NULL."""
    v = F.trim(_req_field(cols, i, name))
    big = F.when(v.rlike(r"^[+-]?\d{1,18}$"), v.cast("bigint"))
    return F.when(
        big.between(-2147483648, 2147483647), big.cast("int")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"read_conll: malformed token row (non-int32 {name} "
                      "column): "),
                F.get(cols, 0),
            )
        ).cast("int")
    )


def _tag_field(cols):
    """Tag field's first char, raising on a present-but-EMPTY tag: the
    reference's `tag[0]` (conll_dataset.py:83) IndexErrors there, so the
    distributed read must not emit a silent '' tag."""
    v = _req_field(cols, 3, "tag")
    return F.when(F.length(v) > 0, F.substring(v, 1, 1)).otherwise(
        F.raise_error(
            F.concat(
                F.lit("read_conll: malformed token row (empty tag column): "),
                F.get(cols, 0),
            )
        )
    )


def conll_document_strings(tokens: DataFrame) -> DataFrame:
    """tokens → one row per document with the exact reference serialization
    (conll_dataset.py:110-120): '-DOCSTART-\\t0\\t0\\tO\\n\\n' then per
    sentence all token rows + blank line."""
    token_line = F.concat_ws(
        "\t",
        F.col("text"),
        F.col("start").cast("string"),
        F.col("end").cast("string"),
        F.col("tag"),
    )
    per_sentence = (
        tokens.withColumn("_line", token_line)
        .groupBy("doc_id", "sentence_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("token_id", "_line"))),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias("sent_block")
        )
    )
    per_doc = per_sentence.groupBy("doc_id").agg(
        F.concat(
            F.lit(f"{DOC_START}\t0\t0\tO\n\n"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sentence_id", "sent_block"))),
                    lambda s: F.concat(s["sent_block"], F.lit("\n\n")),
                ),
                "",
            ),
        ).alias("doc_text")
    )
    return per_doc


DRIVER_WRITE_MAX_DOCS = 100_000


def write_conll(tokens: DataFrame, path: str, max_docs: int = DRIVER_WRITE_MAX_DOCS) -> None:
    """Write the whole corpus as ONE reference-format file.

    DRIVER-SIDE collect — a boundary/parity format, NOT a scale path: the
    whole serialized corpus passes through driver memory. Guarded by
    max_docs (raises instead of OOMing the driver); for real corpora use
    write_conll_distributed, or Parquet (the engine's scale format)."""
    docs = (
        conll_document_strings(tokens).orderBy("doc_id").limit(max_docs + 1).collect()
    )
    if len(docs) > max_docs:
        raise ValueError(
            f"write_conll: corpus exceeds max_docs={max_docs} documents; "
            "this is a driver-side parity writer. Use "
            "write_conll_distributed(tokens, dir) for large corpora, or "
            "raise max_docs explicitly if you accept the driver memory."
        )
    # Reference writes sentence blocks each followed by ONE blank line and
    # each doc separated by its DOCSTART header; concatenation preserves that.
    with open(path, "w", encoding="utf8") as f:
        for row in docs:
            f.write(row["doc_text"])


def write_conll_distributed(
    tokens: DataFrame, dir_path: str, num_files: int = 32
) -> None:
    """Distributed CoNLL export: documents range-partitioned and sorted by
    doc_id, one text row per document. Concatenating the part-* files in
    file-name order reproduces the exact single-file byte format (each row
    already carries its internal newlines; the text writer restores the one
    trailing newline stripped below). Scale path — nothing touches the
    driver."""
    docs = (
        conll_document_strings(tokens)
        .repartitionByRange(num_files, "doc_id")
        .sortWithinPartitions("doc_id")
        # doc_text ends with '\n'; the text datasource appends one '\n' per
        # row, so strip EXACTLY one to keep bytes identical. NOT regexp
        # '\n$': Java's $ also matches before a final line terminator, so
        # it strips BOTH trailing newlines of '...block\n\n' and eats the
        # blank line that terminates the document.
        .select(
            F.expr(
                "substring(doc_text, 1, length(doc_text) - 1)"
            ).alias("value")
        )
    )
    docs.write.mode("overwrite").text(dir_path)


def write_eval_conll(
    tokens_gold: DataFrame,
    tokens_pred: DataFrame,
    path: str,
    max_sentences: int = DRIVER_WRITE_MAX_DOCS,
) -> None:
    """3-column eval export `token gold pred` (space-sep), blank line before
    each sentence (reference dataset_to_conll_file.py:6-16) — the
    conlleval.pl input format.

    DRIVER-SIDE collect (same caveat as write_conll): eval exports are
    held-out test sets by construction, so small — guarded by max_sentences
    to fail loudly instead of OOMing if misused on a full corpus."""
    key = ["doc_id", "sentence_id", "token_id"]
    # FULL OUTER + raise_error: a token present on only one side must fail
    # the export loudly — an inner join would silently write sentences with
    # holes and conlleval.pl would score the truncated sequences
    # Presence markers, NOT tag nullability: a malformed gold file can
    # yield a row that EXISTS with tag=NULL — blaming that on "only one
    # side" would send the operator hunting a nonexistent alignment hole.
    # The lit(1) marker is NULL exactly when the full-outer join found no
    # row on that side, so the two failure modes get distinct messages.
    joined = tokens_gold.select(
        *key, "text", F.col("tag").alias("gold"), F.lit(1).alias("_g_row")
    ).join(
        tokens_pred.select(
            *key, F.col("tag").alias("pred"), F.lit(1).alias("_p_row")
        ),
        key,
        "full_outer",
    )
    at = F.concat_ws(
        ", ",
        F.col("doc_id"),
        F.col("sentence_id").cast("string"),
        F.col("token_id").cast("string"),
    )
    line = F.when(
        F.col("_g_row").isNull() | F.col("_p_row").isNull(),
        F.raise_error(
            F.concat(
                F.lit("write_eval_conll: token present on only one side at ("),
                at,
                F.lit("): gold="),
                F.when(F.col("_g_row").isNull(), F.lit("<missing>")).otherwise(
                    F.coalesce(F.col("gold"), F.lit("<null tag>"))
                ),
                F.lit(" pred="),
                F.when(F.col("_p_row").isNull(), F.lit("<missing>")).otherwise(
                    F.coalesce(F.col("pred"), F.lit("<null tag>"))
                ),
            )
        ),
    ).when(
        # text too: concat_ws SKIPS NULLs, so a NULL-text row would silently
        # emit a 2-column line that conlleval.pl misparses (tag as token)
        F.col("text").isNull() | F.col("gold").isNull() | F.col("pred").isNull(),
        F.raise_error(
            F.concat(
                F.lit("write_eval_conll: NULL field (malformed input) at ("),
                at,
                F.lit("): text="),
                F.coalesce(F.col("text"), F.lit("<null>")),
                F.lit(" gold="),
                F.coalesce(F.col("gold"), F.lit("<null>")),
                F.lit(" pred="),
                F.coalesce(F.col("pred"), F.lit("<null>")),
            )
        ),
    ).otherwise(F.concat_ws(" ", "text", "gold", "pred"))
    joined = joined.withColumn("_line", line)
    per_sentence = (
        joined.groupBy("doc_id", "sentence_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("token_id", "_line"))),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias("block")
        )
        .orderBy("doc_id", "sentence_id")
        .limit(max_sentences + 1)
        .collect()
    )
    if len(per_sentence) > max_sentences:
        raise ValueError(
            f"write_eval_conll: corpus exceeds max_sentences={max_sentences}; "
            "this driver-side writer is for held-out eval sets. Raise "
            "max_sentences explicitly if you accept the driver memory."
        )
    with open(path, "w", encoding="utf8") as f:
        for row in per_sentence:
            f.write("\n" + row["block"] + "\n")
