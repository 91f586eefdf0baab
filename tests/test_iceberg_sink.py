"""Offline tests for the Iceberg sink (bioner_spark/io/iceberg_sink.py).

This container has no Iceberg runtime jar, so the LIVE write path cannot
execute here; these tests pin (a) the deterministic statement/option
builders a jar-equipped cluster will run verbatim, (b) the availability
gate being honest about this environment, and (c) the live entry points
failing loudly (with the fix-it flags) instead of silently writing
nothing.
"""

import json

import pytest

from bioner_spark.io import iceberg_sink as ice


def test_gate_is_false_here(spark):
    assert ice.iceberg_available(spark) is False


def test_require_raises_with_fixit_flags(spark):
    with pytest.raises(ice.IcebergUnavailable, match="--packages org.apache.iceberg"):
        ice.require_iceberg(spark)


def test_materialize_fails_loudly_without_jar(spark):
    df = spark.createDataFrame([("a", "b", "c", "d", 0)],
                               "subj string, pred string, obj string, "
                               "doc_id string, bucket int")
    with pytest.raises(ice.IcebergUnavailable):
        ice.materialize_triples(spark, df, "kg.db.triples", [(0, "fp", 1)])
    with pytest.raises(ice.IcebergUnavailable):
        ice.mirror_triples(spark, df, "kg.db.triples", [(0, "fp", 1)])
    with pytest.raises(ice.IcebergUnavailable):
        ice.read_lineage(spark, "kg.db.triples")


def test_create_table_ddl():
    ddl = ice.create_table_ddl("kg.db.triples", "subj string, bucket int")
    assert ddl == (
        "CREATE TABLE IF NOT EXISTS kg.db.triples "
        "(subj string, bucket int) USING iceberg PARTITIONED BY (bucket)"
    )


def test_plan_for_dataframe_uses_ddl_types(spark):
    df = spark.createDataFrame(
        [("s", "p", "o", "u", 3, 7)],
        "subj string, pred string, obj string, doc_id string, "
        "sentence_id int, bucket int",
    )
    ddl = ice.plan_for_dataframe("kg.db.triples", df)
    assert "subj string" in ddl and "sentence_id int" in ddl
    assert ddl.endswith("USING iceberg PARTITIONED BY (bucket)")


def test_delete_buckets_sql_sorted_ints():
    sql = ice.delete_buckets_sql("t", [5, 1, 3])
    assert sql == "DELETE FROM t WHERE bucket IN (1, 3, 5)"


def test_lineage_options_roundtrip():
    todo = [(4, "fp4", 10), (1, "fp1", 7)]
    opts = ice.snapshot_lineage_options(todo)
    # keys are writer options; values decode back to the sorted lineage
    assert json.loads(opts["snapshot-property.kg.buckets"]) == [1, 4]
    assert json.loads(opts["snapshot-property.kg.fingerprints"]) == ["fp1", "fp4"]
    assert json.loads(opts["snapshot-property.kg.n_docs"]) == [7, 10]


def test_stale_buckets_diff():
    """The incremental mirror writes ONLY buckets whose fingerprint differs
    from the table's recorded lineage; a caught-up mirror returns []."""
    lineage = [(0, "a", 5), (1, "b", 6), (2, "c", 7)]
    assert ice.stale_buckets(lineage, {}) == lineage  # empty table: all stale
    assert ice.stale_buckets(lineage, {0: "a", 1: "b", 2: "c"}) == []  # no-op
    assert ice.stale_buckets(lineage, {0: "a", 1: "OLD", 2: "c"}) == [(1, "b", 6)]
    # numpy/Row ints in the lineage still match plain-int lineage keys
    import numpy as np

    assert ice.stale_buckets([(np.int32(1), "b", np.int64(6))], {1: "b"}) == []


def test_lineage_replay_with_removals():
    """lineage_from_summaries replays commits in order: a kg.removed entry
    voids the bucket's lineage, so a bucket that disappears and later
    reappears with the SAME fingerprint is recomputed, not skipped."""
    c1 = dict(ice.snapshot_lineage_options([(0, "a", 5), (1, "b", 6)]))
    # strip the writer-option prefix back to raw summary keys
    strip = lambda d: {k.split("snapshot-property.", 1)[1]: v for k, v in d.items()}  # noqa: E731
    s1 = strip(c1)
    s2 = strip(ice.snapshot_lineage_options([(2, "c", 7)], removed=[1]))
    assert ice.lineage_from_summaries([s1]) == {0: "a", 1: "b"}
    done = ice.lineage_from_summaries([s1, s2])
    assert done == {0: "a", 2: "c"}  # bucket 1 voided
    # reappearance with the same fingerprint is now stale → recomputed
    assert ice.stale_buckets([(1, "b", 6)], done) == [(1, "b", 6)]
    # a later commit re-adding bucket 1 restores its lineage
    s3 = strip(ice.snapshot_lineage_options([(1, "b", 6)]))
    assert ice.lineage_from_summaries([s1, s2, s3])[1] == "b"
    # snapshots with no kg props (e.g. the row-level DELETE commits) are
    # ignored, including None summaries
    assert ice.lineage_from_summaries([s1, None, {}, s2]) == {0: "a", 2: "c"}


def test_snapshot_lineage_removed_prop():
    opts = ice.snapshot_lineage_options([], removed=[3, 1])
    assert json.loads(opts["snapshot-property.kg.removed"]) == [1, 3]
    assert "snapshot-property.kg.removed" not in ice.snapshot_lineage_options([])


# ------------------------------------------------------------- plan_commit

def _t(*buckets):
    return [(b, f"fp{b}", b + 10) for b in buckets]


def test_plan_commit_deletes_only_absent_partitions():
    # row-bearing todos are NOT pre-deleted (overwritePartitions replaces
    # them atomically); zero-row todos are pre-deleted (before their
    # lineage is recorded), orphans post-deleted (after the snapshot that
    # voids their lineage)
    pre, write, props, post, reset = ice.plan_commit(
        _t(1, 2, 3), removed=[7], present={1, 3}, carrier_candidate=1,
    )
    assert not reset
    assert pre == [2] and post == [7]
    assert write == [1, 3]
    assert [b for b, _, _ in props] == [1, 2, 3]


def test_plan_commit_carrier_when_no_todo_has_rows():
    # orphan removal with empty todo: a row-bearing current bucket
    # carries the removal props; its own (already-correct) lineage is NOT
    # re-recorded, so no fingerprint lookup is needed
    pre, write, props, post, reset = ice.plan_commit(
        [], removed=[7], present=set(), carrier_candidate=4,
    )
    assert not reset
    assert write == [4]                         # carrier, never pre-deleted
    assert props == [] and pre == [] and post == [7]


def test_plan_commit_carrier_records_removal_without_lineage():
    # the finding this pins: a carrier exists but no lineage tuple for it
    # is available anywhere — the removal must STILL be recorded (it rides
    # the carrier's data-bearing snapshot via kg.removed), never silently
    # dropped
    pre, write, props, post, reset = ice.plan_commit(
        [], removed=[3], present=set(), carrier_candidate=5,
    )
    assert not reset and write == [5] and post == [3]


def test_plan_commit_carrier_for_all_zero_row_todos():
    pre, write, props, post, reset = ice.plan_commit(
        _t(2), removed=[9], present=set(), carrier_candidate=5,
    )
    assert not reset
    assert pre == [2]                           # deleted BEFORE props land
    assert write == [5]                         # carrier only
    assert [b for b, _, _ in props] == [2]      # zero-row todo recorded
    assert post == [9]                          # deleted AFTER voiding


def test_plan_commit_resets_when_removal_unrecordable():
    # whole output empty, orphans must be voided -> table reset
    pre, write, props, post, reset = ice.plan_commit(
        [], removed=[3], present=set(), carrier_candidate=None,
    )
    assert reset and pre == [] and write == [] and props == [] and post == []


def test_plan_commit_no_reset_without_removals():
    # all-zero-row todos, nothing removed, no data anywhere: just delete
    # the todo partitions; no snapshot is written, so their lineage stays
    # stale and is benignly re-listed next run
    pre, write, props, post, reset = ice.plan_commit(
        _t(1), removed=[], present=set(), carrier_candidate=None,
    )
    assert not reset and pre == [1]
    assert write == [] and props == [] and post == []


def test_table_buckets_sql():
    assert ice.table_buckets_sql("kg.db.triples") == (
        "SELECT partition.bucket AS bucket FROM kg.db.triples.partitions"
    )


def test_bucket_liveness_classification_is_conservative():
    """Equality deletes are predicates (counts bound nothing), so ANY
    equality-delete record routes the bucket to the pruned data scan. A
    position-delete record kills AT MOST one row — duplication across
    delete files only overcounts kills — so ed == 0 with record_count > pd
    is a sound metadata-only liveness proof (live ≥ record_count − pd > 0):
    routinely-MOR-deleted buckets must NOT pay a data scan on every mirror
    run. pd ≥ record_count stays ambiguous (the deletes COULD cover every
    row... or be dups of one)."""
    rows = [
        {"bucket": 0, "record_count": 10, "pd": 0, "ed": 0},   # live
        {"bucket": 1, "record_count": 10, "pd": 10, "ed": 0},  # ambiguous:
        # 10 position deletes could be 10 dups of one row (9 live) or all
        # 10 rows (dead)
        {"bucket": 2, "record_count": 5, "pd": 0, "ed": 1},    # ambiguous:
        # one equality-delete predicate may kill 0..5 rows
        {"bucket": 3, "record_count": 0, "pd": 0, "ed": 0},    # empty
        {"bucket": None, "record_count": 9, "pd": 0, "ed": 0},  # null part
        # pd-only with record_count > pd: provably ≥ 7 live rows from
        # metadata alone — must NOT be re-scanned every run
        {"bucket": 5, "record_count": 10, "pd": 3, "ed": 0},
        # pd exceeding record_count (heavy delete-file duplication): the
        # proof record_count − pd > 0 fails → ambiguous, never "dead"
        {"bucket": 6, "record_count": 4, "pd": 9, "ed": 0},
        # equality deletes void the position-delete proof too
        {"bucket": 7, "record_count": 10, "pd": 1, "ed": 1},
        # spec evolution: same bucket under two rows — one proving live
        # row settles it as live, not ambiguous
        {"bucket": 4, "record_count": 3, "pd": 0, "ed": 2},
        {"bucket": 4, "record_count": 7, "pd": 0, "ed": 0},
    ]
    live, ambiguous = ice.classify_buckets(rows)
    assert live == {0, 4, 5}
    assert ambiguous == {1, 2, 6, 7}
    # ONE metadata scan feeds the classification (manifest walks are the
    # expensive part at scale)
    sql = ice.bucket_liveness_sql("kg.db.t")
    assert sql.count("FROM kg.db.t.partitions") == 1
    assert "position_delete_record_count" in sql
    assert "equality_delete_record_count" in sql
