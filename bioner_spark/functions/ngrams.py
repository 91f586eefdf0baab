"""Char n-gram generation, vocabulary build, and multi-hot encoding —
all native Spark SQL (no UDF anywhere).

Reference semantics (bioner/model/encoder/ngram_encoder.py):
  * keep_only_printable_chars: strip chars outside Unicode classes
    L/N/P/Sm/Sc, then lowercase (ngram_encoder.py:10-11).
  * n-grams: '#'+clean(token)+'#' sliding window of n
    (ngram_encoder.py:152-157); e.g. Aspirin →
    ['#as','asp','spi','pir','iri','rin','in#'] (reference
    tests/model/test_n_gram_encoder.py:58-72).
  * vocab: count every n-gram over the corpus (V1, ngram_encoder.py:139-150),
    drop counts < min_word_frequency (V2, :23-28, default 10), index by
    count DESC (V3, :102-121). Tie order in the reference is Python's
    stable insertion order; the engine uses the deterministic tiebreaker
    (count DESC, ngram ASC) — documented intentional divergence
    (SURVEY.md §2.3 V3).
  * encode: multi-hot over vocab indices, unknown n-grams skipped
    (:164-177). The engine keeps a sorted sparse index array rather than a
    dense 20k+-dim vector (dense is hostile at scale); the NER kernel
    scatters it densely per Arrow batch.

Scale notes: the vocab build is explode → partial/final hash agg — the
canonical map-side-combine pattern; the final index assignment uses a
single-partition window over the (tiny, already-aggregated) vocab, then the
vocab is broadcast for the encode join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PRINTABLE_RE = r"[^\p{L}\p{N}\p{P}\p{Sm}\p{Sc}]"


def keep_only_printable_chars(c: Column) -> Column:
    """reference ngram_encoder.py:10-11."""
    return F.lower(F.regexp_replace(c, PRINTABLE_RE, ""))


def char_ngrams(c: Column, n: int = 3) -> Column:
    """'#'+clean+'#' sliding n-grams; empty array when too short
    (reference ngram_encoder.py:152-157)."""
    word = F.concat(F.lit("#"), keep_only_printable_chars(c), F.lit("#"))
    return F.when(
        F.length(word) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(word) - n + 1),
            lambda i: word.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def build_vocabulary(
    tokens: DataFrame,
    token_col: str = "text",
    n: int = 3,
    min_word_frequency: int = 10,
    rank_partitions: int | None = None,
) -> DataFrame:
    """Corpus n-gram vocabulary: (ngram, count, index).

    index = dense position by (count DESC, ngram ASC), 0-based — the
    engine's deterministic version of LookupCache (ngram_encoder.py:110-121).

    The global rank is a DISTRIBUTED two-phase assignment (no
    single-partition window, whatever the vocab size — a 100× web corpus's
    post-HAVING char-n-gram vocab can reach 10^7–10^8 rows):
      1. range-partition the counts by the sort key (partitions are ordered
         ranges of the global order);
      2. per-partition row_number — a PARTITIONED window, runs parallel;
      3. global index = partition offset (driver-side cumulative sum of the
         tiny per-partition size table) + local rank.
    The counts are persisted across phases 2-3, then the result is
    localCheckpointed (vocab-sized) and the counts cache released — the
    corpus agg never recomputes, no cache entry outlives the call, and a
    post-collect re-sample of the range partitioner can never silently
    shift indices (a lost checkpoint block fails loudly instead).
    """
    spark = tokens.sparkSession
    counts = (
        tokens.select(F.explode(char_ngrams(F.col(token_col), n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= min_word_frequency)
    )
    if rank_partitions is None:
        rank_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    sort_key = [F.desc("count"), F.asc("ngram")]
    from pyspark import StorageLevel

    ranged = (
        counts.repartitionByRange(rank_partitions, *sort_key)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sizes = {
        r["_pid"]: r["sz"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("sz")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    offset_expr = F.element_at(
        F.create_map(
            *[F.lit(v) for kv in sorted(offsets.items()) for v in kv]
        ),
        F.col("_pid"),
    ) if offsets else F.lit(0)
    w = Window.partitionBy("_pid").orderBy(*sort_key)
    out = (
        ranged.withColumn("index", F.row_number().over(w) - 1 + offset_expr)
        .drop("_pid")
    )
    # Cut the lineage and release the counts cache NOW (same discipline as
    # train.assign_doc_shuffled_order's identical two-phase rank):
    # otherwise every build_vocabulary call pins a MEMORY_AND_DISK entry for
    # the session lifetime (one leak per grid-search trial), and —
    # localCheckpoint DELIBERATELY, not persist — repartitionByRange picks
    # boundaries by sampling, so a lineage recompute after cache eviction /
    # executor loss could re-sample different _pid assignments while the
    # collected `offsets` map still encodes the old ones: silently wrong
    # vocab indices. A lost checkpoint block fails LOUDLY instead.
    out = out.localCheckpoint(eager=True)
    ranged.unpersist()
    # The two-phase rank already computed the total vocab size on the driver
    # (sum of the per-partition size table). Stash it on the DataFrame so
    # downstream consumers (annotate_tokens' multi-hot scatter width) don't
    # need a hidden vocab.count() job. persist()/cache() return self, so the
    # attribute survives the usual caching chains.
    out._bioner_vocab_size = acc
    return out


def vocab_size(vocab: DataFrame) -> int:
    """Vocabulary row count WITHOUT a job when possible: the size stashed by
    build_vocabulary's two-phase rank (survives persist()/cache(), which
    return self), falling back to count() for an arbitrary external vocab
    DataFrame (select/filter/checkpoint drop the attribute). The single
    place consumers should get the multi-hot scatter width from."""
    n = getattr(vocab, "_bioner_vocab_size", None)
    return n if n is not None else vocab.count()


def encode_multihot_indices(
    tokens: DataFrame,
    vocab: DataFrame,
    token_col: str = "text",
    n: int = 3,
    out_col: str = "ngram_indices",
) -> DataFrame:
    """tokens → tokens + sorted array of vocab indices present in the token
    (sparse multi-hot; reference ngram_encoder.py:164-177 builds the dense
    vector — same information).

    The encoding depends ONLY on the token string, so it is computed once
    per DISTINCT token and joined back on the string key. On web text the
    distinct-surface-form table is 1-2 orders of magnitude smaller than the
    token table, so the explode → broadcast-vocab join → collect_set chain
    (the expensive part: ~5 gram rows per input row plus a per-row
    aggregate) runs on the small side, and the big token table takes one
    string-keyed join that AQE broadcasts whenever the distinct table fits.
    (An earlier version ran the explode/agg over every token OCCURRENCE —
    ~60 M gram rows and a 12 M-group aggregate at 50 k docs, the dominant
    JVM cost of the neural encode path.) Unknown n-grams drop out via the
    inner join; tokens with NO known n-gram get an empty array (dense
    vector of zeros in the reference).
    """
    distinct = tokens.select(F.col(token_col).alias("_enc_tok")).distinct()
    grams = distinct.select(
        # plain explode: a NULL row from an empty gram array would only be
        # dropped by the inner join below anyway — the empty-array encoding
        # comes from the left join + coalesce, not from outer rows
        "_enc_tok", F.explode(char_ngrams(F.col("_enc_tok"), n)).alias("ngram")
    )
    hit = (
        grams.join(F.broadcast(vocab.select("ngram", "index")), "ngram", "inner")
        .groupBy("_enc_tok")
        .agg(F.array_sort(F.collect_set("index")).alias(out_col))
    )
    feats = distinct.join(hit, "_enc_tok", "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.array().cast("array<int>"))
    )
    # eqNullSafe + final coalesce: a NULL token string must still get the
    # empty-array (dense-zeros) encoding, not a NULL feature column that
    # silently nulls every downstream array concat/size.
    return (
        tokens.join(feats, tokens[token_col].eqNullSafe(feats["_enc_tok"]), "left")
        .drop("_enc_tok")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.array().cast("array<int>")))
    )


def is_unknown(tokens: DataFrame, vocab: DataFrame, token_col: str = "text", n: int = 3) -> DataFrame:
    """token has ≥1 n-gram missing from vocab (reference ngram_encoder.py:179-186).

    Computed per DISTINCT token string, then joined back — the flag depends
    only on the string, and the per-OCCURRENCE explode this replaces was
    exactly the shape encode_multihot_indices' distinct-token trick exists
    to avoid (~5 gram rows per token over the full table plus two keyed
    aggregations; Zipf makes distinct tokens orders of magnitude fewer)."""
    distinct = tokens.select(F.col(token_col).alias("_iu_tok")).distinct()
    grams = distinct.select(
        "_iu_tok", F.explode(char_ngrams(F.col("_iu_tok"), n)).alias("ngram")
    )
    known = grams.join(F.broadcast(vocab.select("ngram")), "ngram", "left_semi")
    n_all = grams.groupBy("_iu_tok").agg(F.count(F.lit(1)).alias("n_grams"))
    n_known = known.groupBy("_iu_tok").agg(F.count(F.lit(1)).alias("n_known"))
    flags = (
        n_all.join(n_known, "_iu_tok", "left")
        .select(
            "_iu_tok",
            (
                F.coalesce(F.col("n_known"), F.lit(0))
                < F.coalesce(F.col("n_grams"), F.lit(0))
            ).alias("is_unknown"),
        )
    )
    return (
        tokens.join(
            flags, tokens[token_col].eqNullSafe(flags["_iu_tok"]), "left"
        )
        .drop("_iu_tok")
        .withColumn("is_unknown", F.coalesce(F.col("is_unknown"), F.lit(False)))
    )
