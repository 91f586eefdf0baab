"""Iceberg sink for the triples table.

The target deployment materializes triples "into partitioned Iceberg
tables with per-partition lineage and checkpointed resume". The engine's
portable sink (`pipeline.run_checkpointed`) implements those semantics
over plain Parquet — bucket partitions, an append-only lineage manifest,
fingerprint-keyed resume — because this build environment ships no
Iceberg runtime jar (pyspark's jars/ has none and there is no network to
fetch one). This module is the Iceberg-native counterpart for clusters
that DO have the jar: every statement it builds is public Iceberg-Spark
API (`CREATE TABLE ... USING iceberg`, DataFrameWriterV2
`overwritePartitions`, `snapshot-property.*` write options, the
`<table>.snapshots` metadata table), the builders are deterministic and
unit-tested offline, and the live entry points gate on the runtime class
being loadable and fail with the exact spark-submit flags to fix it.

How the portable sink's concepts map onto Iceberg:

  parquet sink (pipeline.py)             Iceberg sink (this module)
  -------------------------------------  --------------------------------
  triples/ dir partitioned by bucket     table PARTITIONED BY (bucket)
  delete todo partitions + rewrite       one atomic overwritePartitions
                                         snapshot (zero-row todos: a
                                         row-level DELETE commit BEFORE
                                         it; orphans: a DELETE AFTER it —
                                         plan_commit has the ordering law)
  manifest/ append-only lineage rows     snapshot summary properties
    (bucket, fingerprint, n_rows, ts)      (kg.buckets, kg.fingerprints)
    latest-row-wins read                   read back from .snapshots,
                                           latest commit wins
  readers see partial state mid-rewrite  readers pin the previous
    (documented tradeoff)                  snapshot until commit — the
                                           reason Iceberg is the target

Enable on a real cluster with:

  spark-submit \
    --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 \
    --conf spark.sql.catalog.kg=org.apache.iceberg.spark.SparkCatalog \
    --conf spark.sql.catalog.kg.type=hadoop \
    --conf spark.sql.catalog.kg.warehouse=<warehouse-path> ...

Reference scope note: the reference engine (phil1995/BioNER) has no table
sink at all — it writes CoNLL/TSV files (bioner/model/annotator.py) — so
this module is target-deployment surface, not reference parity.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

ICEBERG_CATALOG_CLASS = "org.apache.iceberg.spark.SparkCatalog"

# snapshot summary keys carrying the per-commit lineage (mirrors the
# parquet manifest's columns; values are JSON because summary properties
# are string->string)
PROP_BUCKETS = "kg.buckets"
PROP_FINGERPRINTS = "kg.fingerprints"
PROP_N_DOCS = "kg.n_docs"
# buckets whose rows were deleted in/just before this commit because the
# current input no longer produces them (the parquet manifest's "removed"
# rows) — without this, a bucket that disappears and later REAPPEARS with
# an identical fingerprint would be skipped against stale lineage while
# its rows are gone
PROP_REMOVED = "kg.removed"


class IcebergUnavailable(RuntimeError):
    pass


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is loadable by SPARK's
    classloader. The probe must go through Spark's Utils.classForName
    (context classloader): a bare `java.lang.Class.forName` resolves
    against py4j's system classloader, which cannot see jars added by
    `--packages`/`--jars` — i.e. it would report Iceberg missing on
    exactly the launch config require_iceberg prescribes."""
    jvm = spark._jvm  # type: ignore[union-attr]
    probes = (
        # Spark's own loader-aware probe (what DataSource lookup uses)
        lambda: jvm.org.apache.spark.util.Utils.classForName(
            ICEBERG_CATALOG_CLASS, False, False
        ),
        # thread context classloader (MutableURLClassLoader-backed)
        lambda: jvm.java.lang.Thread.currentThread()
        .getContextClassLoader()
        .loadClass(ICEBERG_CATALOG_CLASS),
        # system classpath (jar baked into the distribution)
        lambda: jvm.java.lang.Class.forName(ICEBERG_CATALOG_CLASS),
    )
    for probe in probes:
        try:
            probe()
            return True
        except Exception:
            continue
    return False


def require_iceberg(spark: SparkSession) -> None:
    if not iceberg_available(spark):
        raise IcebergUnavailable(
            "Iceberg runtime not on the classpath. Launch with "
            "--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 "
            "and a spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog "
            "catalog config, or use the portable Parquet sink "
            "(pipeline.run_checkpointed)."
        )


# ---------------------------------------------------------------- builders
# Pure string/dict builders — deterministic, unit-testable without the jar.


def create_table_ddl(table: str, triples_schema_ddl: str) -> str:
    """DDL for the partitioned triples table.

    `triples_schema_ddl` is the DataFrame schema in DDL form
    (`df.schema.simpleString()` is NOT DDL — pass
    `', '.join(f'{f.name} {f.dataType.simpleString()}' for f in schema)`
    or use `plan_for_dataframe`). The explicit `bucket int` column (not a
    hidden `bucket(N, doc_id)` transform) keeps the partition value
    byte-identical to the portable sink's, so fingerprints and resume
    bookkeeping transfer between the two sinks unchanged.
    """
    return (
        f"CREATE TABLE IF NOT EXISTS {table} ({triples_schema_ddl}) "
        f"USING iceberg PARTITIONED BY (bucket)"
    )


def delete_buckets_sql(table: str, buckets: list[int]) -> str:
    """Row-level DELETE clearing todo buckets whose recompute may emit
    zero rows (`overwritePartitions` only replaces partitions PRESENT in
    the written data — same edge the parquet sink handles by deleting
    partitions up front)."""
    blist = ", ".join(str(int(b)) for b in sorted(buckets))
    return f"DELETE FROM {table} WHERE bucket IN ({blist})"


def snapshot_lineage_options(
    todo: list[tuple[int, str, int]],
    removed: list[int] | tuple = (),
) -> dict[str, str]:
    """DataFrameWriterV2 options attaching per-partition lineage to the
    commit's snapshot summary: [(bucket, input_fingerprint, n_docs)] →
    {'snapshot-property.kg.buckets': '[..]', ...}. `removed` lists orphan
    buckets deleted alongside this commit (their lineage entries must be
    voided). Read back via
    `SELECT summary FROM <table>.snapshots ORDER BY committed_at`."""
    todo = sorted(todo)
    opts = {
        f"snapshot-property.{PROP_BUCKETS}": json.dumps([int(b) for b, _, _ in todo]),
        f"snapshot-property.{PROP_FINGERPRINTS}": json.dumps([fp for _, fp, _ in todo]),
        f"snapshot-property.{PROP_N_DOCS}": json.dumps([int(n) for _, _, n in todo]),
    }
    if removed:
        opts[f"snapshot-property.{PROP_REMOVED}"] = json.dumps(
            sorted(int(b) for b in removed)
        )
    return opts


def plan_commit(
    todo: list[tuple[int, str, int]],
    removed: list[int] | tuple,
    present: set[int],
    carrier_candidate: int | None,
) -> tuple[list[int], list[int], list[tuple[int, str, int]], list[int], bool]:
    """Pure commit planner for the incremental mirror (unit-testable
    without the jar). Inputs: the stale-bucket work list, the orphan
    buckets to remove, `present` = the todo buckets that actually have
    ≥1 triple row, and `carrier_candidate` = any bucket with ≥1 row in
    the FULL triples output (None iff the whole output is empty).

    Returns (pre_delete, write_buckets, props_todo, post_delete, reset).
    The crash-safe commit ORDER is load-bearing and differs by delete
    kind, because the two hazards are mirror images:

    * pre_delete — zero-row todo buckets, deleted BEFORE the overwrite
      that records their lineage. A crash in between leaves rows absent
      with STALE lineage → re-listed and recomputed next run (benign,
      converges). Recording first would instead mark them done while
      stale rows linger — silent garbage.
    * write_buckets — partitions whose rows ride the one atomic
      `overwritePartitions` snapshot: the row-bearing todos, plus a
      carrier bucket when lineage/removal props must land but no todo
      contributes a row (snapshot properties only ride a snapshot that
      writes data). The carrier's rows are already correct, so its
      rewrite is idempotent; it does NOT need an entry in the props —
      its recorded lineage is already right — so no fingerprint lookup
      is needed and a removal can always be recorded as long as ANY
      bucket in the full output has a row.
    * props_todo — the todo tuples recorded in the snapshot properties
      (zero-row todos included: after pre_delete their correct state IS
      empty, so recording their new fingerprint prevents a permanently
      empty bucket from being recomputed every run).
    * post_delete — orphan buckets, deleted AFTER the overwrite whose
      `kg.removed` property voids their lineage. A crash in between
      leaves rows lingering with VOIDED lineage → if the bucket
      reappears (same fingerprint or not) it is stale and recomputed,
      never skipped against deleted rows; if it stays absent, the next
      run re-lists it from the table's actual partitions (see
      `table_buckets`) and retries the delete. Deleting first would
      instead lose rows permanently when the bucket reappears with an
      identical fingerprint.
    * reset — True when orphan removals MUST be voided but the entire
      output has no row to carry the props: the caller drops and
      recreates the table, voiding all snapshot lineage at once. Only
      reachable when the whole corpus produced zero triples.
    """
    todo = sorted(todo)
    removed = sorted(int(b) for b in removed)
    pre = sorted(int(b) for b, _, _ in todo if int(b) not in present)
    write = sorted(int(b) for b, _, _ in todo if int(b) in present)
    props = todo
    if (todo or removed) and not write:
        if carrier_candidate is None:
            if removed:
                return [], [], [], [], True
            # nothing to void and nothing to write: the zero-row todos
            # are pre-deleted; no snapshot is written, so their lineage
            # stays stale and they are cheaply re-listed next run
            # (benign — the table is empty anyway)
            props = []
        else:
            write = [int(carrier_candidate)]
    return pre, write, props, removed, False


def stale_buckets(
    lineage: list[tuple[int, str, int]] | tuple,
    done: dict[int, str],
) -> list[tuple[int, str, int]]:
    """Incremental-mirror work list: the pipeline's bucket lineage minus
    buckets whose fingerprint already matches the table's recorded lineage
    (read_lineage). A fully-caught-up mirror returns [] → zero commits."""
    return [(int(b), fp, int(n)) for b, fp, n in lineage if done.get(int(b)) != fp]


def plan_for_dataframe(table: str, df: DataFrame) -> str:
    cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    return create_table_ddl(table, cols)


# ------------------------------------------------------------- live writer


def materialize_triples(
    spark: SparkSession,
    triples: DataFrame,
    table: str,
    todo: list[tuple[int, str, int]],
    removed: list[int] | tuple = (),
    ensure_table: bool = True,
) -> None:
    """Write recomputed buckets into the Iceberg triples table.

    `triples` is the FULL pipeline output (bucket column included); the
    todo filter happens here so the carrier-selection logic can see every
    bucket. `removed` lists orphan buckets the current input no longer
    produces: the removal is recorded in the lineage props and THEN their
    rows are deleted, so a later reappearance is recomputed instead of
    skipped against deleted rows (the parquet manifest's "removed" rows).
    `removed` MUST include delete-stranded orphans (lineage voided by a
    prior crashed run, rows still present) for the recovery law to hold —
    use `mirror_triples`, which computes todo and the complete removed
    set itself, unless you are re-implementing that law.

    Commit sequence (see plan_commit for the planning law and the
    per-phase crash analysis): (1) one DELETE clearing zero-row todo
    partitions — buckets whose correct state IS absent — before their
    lineage is recorded; (2) one `overwritePartitions` snapshot that
    atomically replaces every row-bearing todo partition and carries the
    lineage + removal properties; (3) one DELETE clearing orphan
    partitions, after the snapshot that voided their lineage. No
    row-bearing todo partition is ever pre-deleted, and every crash
    window converges: stale-lineage buckets are re-listed by
    `stale_buckets`, and delete-stranded orphans (voided lineage, rows
    still present) are re-listed by diffing `table_buckets` against the
    current input's buckets (`mirror_triples` does both).

    `ensure_table=False` skips the availability probe + CREATE IF NOT
    EXISTS when the caller (mirror_triples) already ran them this call.
    """
    if ensure_table:
        require_iceberg(spark)
        spark.sql(plan_for_dataframe(table, triples))
    todo_buckets = [int(b) for b, _, _ in todo]
    from pyspark.sql import functions as F

    # Persist the todo slice across the present-gate collect AND the write:
    # without the shared cache a plan that recomputes non-identically
    # between the two jobs (lost shuffle block + refreshed input) could
    # judge a bucket present yet produce zero rows at write time —
    # overwritePartitions then never touches that partition, leaving stale
    # rows recorded under a fresh fingerprint, the exact silent-garbage
    # state pre_delete exists to prevent. It also saves 1-2 full
    # recomputations of the triples pipeline per incremental run.
    todo_slice = triples.filter(F.col("bucket").isin(todo_buckets)).persist()
    full_cache = None
    own_full_cache = False
    try:
        # bounded collects: ≤ n_buckets distinct values / a single min row
        present = {
            int(r["bucket"])
            for r in todo_slice.select("bucket").distinct().collect()
        }
        # carrier lazily: plan_commit consults it ONLY when no todo bucket
        # has rows, so the routine incremental run (some row-bearing stale
        # buckets) must not pay a full-output min() scan just to discard
        # the value. The carrier bucket lives OUTSIDE the todo slice, so
        # this rare branch persists the full output across its own
        # gate-then-write pair for the same recompute-divergence reason.
        carrier = None
        if (todo or removed) and not present:
            # adopt a caller-managed cache rather than re-own it: persist()
            # on an already-cached plan is a no-op, but unpersisting it in
            # the finally would evict the CALLER's cache behind its back
            full_cache = triples
            if not triples.is_cached:
                full_cache = triples.persist()
                own_full_cache = True
            row = full_cache.select(F.min("bucket").alias("b")).collect()[0]["b"]
            carrier = int(row) if row is not None else None
        pre_delete, write_buckets, props_todo, post_delete, reset = plan_commit(
            todo, removed, present, carrier
        )
        if reset:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            spark.sql(plan_for_dataframe(table, triples))
            return
        if pre_delete:
            spark.sql(delete_buckets_sql(table, pre_delete))
        if write_buckets:
            src = full_cache if full_cache is not None else todo_slice
            out = src.filter(F.col("bucket").isin(write_buckets))
            writer = out.writeTo(table)
            for k, v in snapshot_lineage_options(props_todo, post_delete).items():
                writer = writer.option(k, v)
            writer.overwritePartitions()
        if post_delete:
            spark.sql(delete_buckets_sql(table, post_delete))
    finally:
        todo_slice.unpersist()
        if own_full_cache:
            full_cache.unpersist()


def mirror_triples(
    spark: SparkSession,
    triples: DataFrame,
    table: str,
    bucket_lineage: list[tuple[int, str, int]],
) -> tuple[list[tuple[int, str, int]], list[int]]:
    """Incrementally mirror the pipeline's triples into the Iceberg table —
    the one entry point that owns the full convergence law, so every
    caller gets crash recovery, not just the ones that remember to apply
    it. Diffs the pipeline's bucket lineage (already computed by
    run_checkpointed — no page rescan) against the table's own snapshot
    lineage and writes ONLY stale buckets; a no-op resume issues zero
    commits. Orphans — buckets the table holds but the current input no
    longer produces — are computed from the UNION of the recorded lineage
    and the table's actual partitions (`table_buckets` — one `.partitions`
    metadata scan, plus a partition-pruned data scan ONLY for buckets whose
    merge-on-read delete counts leave liveness unprovable from metadata:
    see `classify_buckets`), which re-lists orphans whose lineage a prior
    run voided but
    whose DELETE then crashed; their removal is recorded and THEN their
    rows deleted (plan_commit's ordering). Returns (todo, orphans) so
    callers can report what was written."""
    require_iceberg(spark)
    spark.sql(plan_for_dataframe(table, triples))
    done = read_lineage(spark, table)
    todo = stale_buckets(bucket_lineage, done)
    current = {int(b) for b, _, _ in bucket_lineage}
    orphans = sorted((set(done) | table_buckets(spark, table)) - current)
    if todo or orphans:
        materialize_triples(
            spark, triples, table, todo, removed=orphans, ensure_table=False
        )
    return todo, orphans


def table_buckets_sql(table: str) -> str:
    """Distinct partition values from Iceberg's `.partitions` metadata
    table — a metadata-only read (no data-file scan) even at 10^12 rows."""
    return f"SELECT partition.bucket AS bucket FROM {table}.partitions"


def bucket_liveness_sql(table: str) -> str:
    """ONE `.partitions` metadata scan returning per-partition row and
    merge-on-read delete-record counts; liveness classification happens
    driver-side (`classify_buckets` — bucket counts are driver-sized by
    construction). One scan, not two with complementary predicates: each
    query over `.partitions` replans and re-walks the table's manifest
    tree, which at 10^12-row scale is the expensive part."""
    return (
        "SELECT partition.bucket AS bucket, record_count,"
        " COALESCE(position_delete_record_count, 0) AS pd,"
        " COALESCE(equality_delete_record_count, 0) AS ed"
        f" FROM {table}.partitions"
    )


def classify_buckets(rows) -> tuple[set[int], set[int]]:
    """(live_beyond_doubt, ambiguous) from (bucket, record_count, pd, ed)
    mappings. Pure (unit-testable without the jar).

    A bucket is live BEYOND DOUBT from metadata alone when some row proves
    at least one surviving data record:

      * zero merge-on-read delete records → all record_count rows live;
      * position deletes only (ed == 0) with record_count > pd: each
        position-delete record kills AT MOST one row (duplicates across
        delete files only overcount kills), so live ≥ record_count − pd
        > 0 — metadata-only proof, no data scan.

    Equality deletes void both proofs: one equality-delete record is a
    predicate that may kill many rows or none, so counts bound nothing in
    either direction. Those buckets — and pd ≥ record_count ones, where
    position deletes COULD cover every row — go to `ambiguous` for a
    partition-pruned delete-merging data scan. Spec evolution can record
    the same bucket under several rows; any single proving row settles it
    as live."""
    live: set[int] = set()
    ambiguous: set[int] = set()
    for r in rows:
        if r["bucket"] is None or r["record_count"] <= 0:
            continue
        b = int(r["bucket"])
        if r["ed"] == 0 and r["record_count"] > r["pd"]:
            live.add(b)
        else:
            ambiguous.add(b)
    return live, ambiguous - live


def table_buckets(spark: SparkSession, table: str) -> set[int]:
    """Buckets that actually have LIVE rows in the table. Callers diff this
    against the current input's buckets (in addition to the recorded
    lineage) so an orphan whose lineage was voided but whose DELETE
    crashed is re-listed and the delete retried.

    Under merge-on-read, delete-free buckets are classified metadata-only;
    buckets carrying delete files (usually few — compaction clears them)
    get a `SELECT DISTINCT bucket` over exactly those partitions, which
    Iceberg partition-prunes and which merges the deletes — exact in both
    directions where record_count − delete-record arithmetic is not
    (predicate equality deletes, duplicated position deletes)."""
    require_iceberg(spark)
    part_cols = {
        f.name
        for f in spark.sql(f"SELECT * FROM {table}.partitions LIMIT 0").schema.fields
    }
    has_delete_counts = "position_delete_record_count" in part_cols
    if not has_delete_counts:
        return {
            int(r["bucket"])
            for r in spark.sql(table_buckets_sql(table)).collect()
            if r["bucket"] is not None
        }
    live, ambiguous = classify_buckets(
        spark.sql(bucket_liveness_sql(table)).collect()
    )
    if ambiguous:
        blist = ", ".join(str(b) for b in sorted(ambiguous))
        live |= {
            int(r["bucket"])
            for r in spark.sql(
                f"SELECT DISTINCT bucket FROM {table} "
                f"WHERE bucket IN ({blist})"
            ).collect()
        }
    return live


def lineage_from_summaries(summaries: list[dict]) -> dict[int, str]:
    """Replay snapshot summaries in commit order → {bucket: fingerprint}.
    Pure (unit-testable without the jar). Per snapshot: removals first
    (void the bucket's lineage), then updates — a commit's `removed` and
    `todo` sets are disjoint by construction (orphans = recorded − current,
    todo ⊆ current), so the order within one snapshot only matters for
    malformed input."""
    done: dict[int, str] = {}
    for s in summaries:
        s = s or {}
        if PROP_REMOVED in s:
            for b in json.loads(s[PROP_REMOVED]):
                done.pop(int(b), None)
        if PROP_BUCKETS in s:
            bs = json.loads(s[PROP_BUCKETS])
            fps = json.loads(s[PROP_FINGERPRINTS])
            done.update({int(b): fp for b, fp in zip(bs, fps)})
    return done


def read_lineage(spark: SparkSession, table: str) -> dict[int, str]:
    """Latest-commit-wins {bucket: fingerprint} from snapshot summaries —
    the Iceberg equivalent of pipeline.read_manifest's max_by read.

    Restricted to the CURRENT snapshot's ancestry (`.history` rows with
    is_current_ancestor): replaying ALL of `.snapshots` would keep
    counting commits that a `rollback_to_snapshot` removed from the table
    — their buckets would read as done while their rows are gone, and
    stale_buckets would skip them forever (silent data loss in the
    mirror). Rolled-back branches must not contribute lineage.

    Durability caveat (unlike the append-only parquet manifest): routine
    `expire_snapshots` maintenance deletes old summaries, so buckets whose
    last write predates the retention window lose their recorded
    fingerprint and are re-listed as stale — a CORRECT but wasteful
    recompute. Keep snapshot retention longer than the mirror cadence, or
    accept periodic full rewrites."""
    require_iceberg(spark)
    rows = spark.sql(
        f"SELECT s.summary FROM {table}.snapshots s "
        f"WHERE s.snapshot_id IN (SELECT snapshot_id FROM {table}.history "
        "WHERE is_current_ancestor) "
        "ORDER BY s.committed_at"
    ).collect()
    return lineage_from_summaries([r["summary"] for r in rows])
