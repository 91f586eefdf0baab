"""End-to-end KG construction pipeline with checkpointed resume.

    pages → extract_text → tokenize → tag (dict | neural) → span decode
          → link → canonicalize (connected components) → triples
          → partitioned Parquet + per-partition lineage manifest

Resume model (the engine analogue of the reference's best-checkpoint sink,
reference bioner/model/annotator.py:143-150, reinterpreted for a batch job —
SURVEY.md §2.8): the output is partitioned by `bucket =
pmod(xxhash64(doc_id), n_buckets)`. A manifest table records, per completed
bucket, the input fingerprint (xor-ish sum of url hashes), row/doc counts
and completion time. On restart, buckets already in the manifest with a
matching fingerprint are SKIPPED (their partition dirs are left untouched);
everything else is recomputed and idempotently overwritten
(partitionOverwriteMode=dynamic). Kill the job at any point and rerun — the
result converges to the same table.

Skew handling: pages are repartitioned on (bucket, salt) before the
tokenize→tag stages, where salt = pmod(xxhash64(url), salt_factor). A few
hosts owning ~30% of a crawl (corpus.py models this) otherwise pin a handful
of tasks; salting spreads giant hosts across `salt_factor` tasks per bucket.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bioner_spark.extract import with_extracted_text
from bioner_spark.graph import canonical_map
from bioner_spark.linking import dict_tag_tokens, link_mentions
from bioner_spark.spans import decode_spans
from bioner_spark.tokenizer import tokenize
from bioner_spark.triples import extract_triples


@dataclass
class PipelineResult:
    triples: DataFrame
    mentions: DataFrame
    tokens: DataFrame
    n_buckets_processed: int = 0
    n_buckets_skipped: int = 0


def build_triples(
    pages: DataFrame,
    alias_dict: DataFrame,
    tagger: str = "dict",
    model=None,
    vocab=None,
    use_extractor: bool = True,
    salt_factor: int = 8,
) -> PipelineResult:
    """The lazy logical plan for the whole pipeline (no writes)."""
    if use_extractor:
        pages = with_extracted_text(pages.select("url", "html"), "html", "text")
    else:
        pages = pages.select("url", "text")

    # salt spread BEFORE the heavy per-token stages (skewed hosts)
    pages = pages.repartition(
        F.pmod(F.xxhash64("url"), F.lit(salt_factor)).alias("_salt")
    ).drop("_salt")

    tokens = tokenize(pages)

    if tagger == "dict":
        tagged = dict_tag_tokens(tokens, alias_dict)
    elif tagger == "neural":
        from bioner_spark.ner.infer import annotate_tokens

        assert model is not None and vocab is not None
        tagged = annotate_tokens(tokens, vocab, model)
    else:
        raise ValueError(f"unknown tagger: {tagger}")

    mentions = decode_spans(tagged)
    linked = link_mentions(mentions, alias_dict)
    cmap = canonical_map(alias_dict)
    linked = (
        linked.join(F.broadcast(cmap), "canonical_id", "left")
        .filter(F.col("component").isNotNull())
    )
    triples = extract_triples(linked, tagged)
    return PipelineResult(triples=triples, mentions=linked, tokens=tagged)


# --------------------------------------------------------------------------
# Checkpointed, partition-manifest write path
# --------------------------------------------------------------------------

def _bucket_col(n_buckets: int, col: str = "url"):
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def bucket_fingerprints(pages: DataFrame, n_buckets: int) -> DataFrame:
    """Per-bucket input fingerprint: count + sum of url hashes (order-free)."""
    return (
        pages.withColumn("bucket", _bucket_col(n_buckets))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            # xor-fold of url hashes: order-free, overflow-free (ANSI-safe)
            F.expr("bit_xor(xxhash64(url))").alias("hash_sum"),
        )
        .select(
            "bucket",
            F.concat_ws(":", F.col("n_docs"), F.col("hash_sum")).alias("input_fingerprint"),
            "n_docs",
        )
    )


def read_manifest(spark: SparkSession, manifest_path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(manifest_path)
    except Exception:
        return None


def run_checkpointed(
    spark: SparkSession,
    pages: DataFrame,
    alias_dict: DataFrame,
    out_dir: str,
    n_buckets: int = 16,
    tagger: str = "dict",
    model=None,
    vocab=None,
    use_extractor: bool = True,
) -> PipelineResult:
    """Run the pipeline bucket-partitioned with resume.

    out_dir/triples/  — Parquet partitioned by bucket
    out_dir/manifest/ — per-bucket lineage rows (append-only; latest wins)
    """
    triples_path = f"{out_dir}/triples"
    manifest_path = f"{out_dir}/manifest"

    fps = bucket_fingerprints(pages, n_buckets).cache()
    manifest = read_manifest(spark, manifest_path)
    if manifest is not None:
        done = (
            manifest.filter(F.col("status") == "done")
            .select("bucket", F.col("input_fingerprint").alias("done_fp"))
            .distinct()
        )
        todo = fps.join(done, "bucket", "left").filter(
            F.col("done_fp").isNull() | (F.col("done_fp") != F.col("input_fingerprint"))
        )
    else:
        todo = fps
    todo_buckets = [r["bucket"] for r in todo.select("bucket").distinct().collect()]
    n_skipped = fps.count() - len(todo_buckets)

    if todo_buckets:
        pages_todo = pages.withColumn("bucket", _bucket_col(n_buckets)).filter(
            F.col("bucket").isin(todo_buckets)
        )
        result = build_triples(
            pages_todo.drop("bucket"),
            alias_dict,
            tagger=tagger,
            model=model,
            vocab=vocab,
            use_extractor=use_extractor,
        )
        # triples carry the page url as doc_id → same bucketing function
        out = result.triples.withColumn("bucket", _bucket_col(n_buckets, "doc_id"))
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(triples_path)
        )
        # manifest rows AFTER a successful write (crash before this line →
        # bucket is simply recomputed next run; writes are idempotent)
        written = spark.read.parquet(triples_path).filter(
            F.col("bucket").isin(todo_buckets)
        )
        rows = (
            written.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .join(todo.select("bucket", "input_fingerprint", "n_docs"), "bucket", "right")
            .select(
                F.col("bucket"),
                F.col("input_fingerprint"),
                F.coalesce(F.col("n_rows"), F.lit(0)).alias("n_rows"),
                F.col("n_docs"),
                F.current_timestamp().alias("completed_at"),
                F.lit("done").alias("status"),
            )
        )
        rows.write.mode("append").parquet(manifest_path)

    triples = spark.read.parquet(triples_path) if (todo_buckets or manifest is not None) else None
    res = build_triples(pages, alias_dict, tagger=tagger, model=model, vocab=vocab,
                        use_extractor=use_extractor)
    return PipelineResult(
        triples=triples if triples is not None else res.triples,
        mentions=res.mentions,
        tokens=res.tokens,
        n_buckets_processed=len(todo_buckets),
        n_buckets_skipped=int(n_skipped),
    )
