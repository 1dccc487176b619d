"""Snapshot/manifest source: file skipping, time travel, correctness.

The pruning contract: results are ALWAYS identical to a full scan +
filter (skipping is an optimization), and with range-clustered files a
narrow predicate must actually skip most of the table's files.
"""

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from gpiv_spark.sources.manifest import (
    plan_scan,
    read_snapshot,
    write_snapshot,
)


@pytest.fixture()
def table_dir():
    d = tempfile.mkdtemp(prefix="manifest_tbl_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _docs(spark, lo, hi):
    # range-cluster by cell so per-file min/max envelopes are disjoint
    # and pruning has teeth
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 64).alias("cell"),
            (F.col("id") * 7 % 1000).alias("score"),
        )
        .repartitionByRange(8, "cell")
    )


def test_prune_matches_full_scan_and_skips_files(spark, table_dir):
    write_snapshot(_docs(spark, 0, 20_000), table_dir, stats_cols=["cell"])
    plan = plan_scan(table_dir, ranges={"cell": (10, 17)})
    assert plan["files_total"] == 8
    assert plan["files_skipped"] >= 5  # 8/64 cells -> ~1-2 live files
    got = (
        read_snapshot(spark, table_dir, ranges={"cell": (10, 17)})
        .groupBy("cell").count().toPandas()
        .sort_values("cell").reset_index(drop=True)
    )
    want = (
        _docs(spark, 0, 20_000)
        .filter("cell BETWEEN 10 AND 17")
        .groupBy("cell").count().toPandas()
        .sort_values("cell").reset_index(drop=True)
    )
    assert got.equals(want)


def test_append_and_time_travel(spark, table_dir):
    s1 = write_snapshot(_docs(spark, 0, 5_000), table_dir, stats_cols=["cell"])
    s2 = write_snapshot(
        _docs(spark, 5_000, 12_000), table_dir, stats_cols=["cell"]
    )
    assert (s1, s2) == (1, 2)
    # latest sees both writes; snapshot 1 is frozen
    assert read_snapshot(spark, table_dir).count() == 12_000
    assert read_snapshot(spark, table_dir, snapshot=s1).count() == 5_000
    # appended snapshot's manifest carries the parent's files forward
    p2 = plan_scan(table_dir, snapshot=s2)
    p1 = plan_scan(table_dir, snapshot=s1)
    assert set(p1["files"]) < set(p2["files"])
    assert p2["rows_upper_bound"] == 12_000


def test_overwrite_drops_parent_files(spark, table_dir):
    write_snapshot(_docs(spark, 0, 3_000), table_dir, stats_cols=["cell"])
    write_snapshot(
        _docs(spark, 3_000, 4_000), table_dir, stats_cols=["cell"],
        mode="overwrite",
    )
    assert read_snapshot(spark, table_dir).count() == 1_000


def test_residual_filter_inside_kept_files(spark, table_dir):
    """A predicate narrower than a file's envelope must still filter
    rows — file skipping is never the predicate itself."""
    write_snapshot(_docs(spark, 0, 8_000), table_dir, stats_cols=["cell"])
    got = read_snapshot(spark, table_dir, ranges={"cell": (5, 5)})
    assert got.count() == 8_000 // 64
    assert got.agg(F.min("cell"), F.max("cell")).collect()[0] == (5, 5)


def test_missing_stats_column_never_prunes(spark, table_dir):
    write_snapshot(_docs(spark, 0, 2_000), table_dir, stats_cols=["cell"])
    # 'score' has no manifest stats -> all files kept, filter still right
    plan = plan_scan(table_dir, ranges={"score": (0, 10)})
    assert plan["files_skipped"] == 0
    n = read_snapshot(spark, table_dir, ranges={"score": (0, 10)}).count()
    want = (
        _docs(spark, 0, 2_000).filter("score BETWEEN 0 AND 10").count()
    )
    assert n == want


def test_orphan_data_dir_from_crashed_writer_is_harmless(spark, table_dir):
    """A data dir without a committed manifest is garbage, never
    corruption: unique data dirs mean no collision, and the reader
    only sees files listed in committed manifests."""
    orphan = Path(table_dir) / "data" / "snap-crashed"
    orphan.mkdir(parents=True)
    (orphan / "stray.parquet.tmp").write_bytes(b"partial")
    sid = write_snapshot(_docs(spark, 0, 1_000), table_dir, stats_cols=["cell"])
    assert sid == 1
    assert read_snapshot(spark, table_dir).count() == 1_000


def test_commit_race_retries_against_winner(spark, table_dir):
    """Optimistic concurrency: if another writer claims the id first,
    write_snapshot must retry with the winner as parent, never clobber."""
    import json as _json

    write_snapshot(_docs(spark, 0, 1_000), table_dir, stats_cols=["cell"])
    # a concurrent winner grabs id 2 with its own (empty) file list
    (Path(table_dir) / "snapshots" / "2.json").write_text(_json.dumps({
        "snapshot_id": 2, "parent": 1, "mode": "overwrite",
        "stats_cols": ["cell"], "files": [],
    }))
    sid = write_snapshot(
        _docs(spark, 1_000, 1_500), table_dir, stats_cols=["cell"]
    )
    assert sid == 3  # lost the race for 2, committed as 3
    # append chained off the WINNER's (empty) list + its own files
    assert read_snapshot(spark, table_dir).count() == 500
    # loser's retry never touched the winner or snapshot 1
    assert read_snapshot(spark, table_dir, snapshot=1).count() == 1_000


def test_compaction_shrinks_files_and_preserves_history(spark, table_dir):
    for lo in (0, 4_000, 8_000):
        write_snapshot(
            _docs(spark, lo, lo + 4_000), table_dir, stats_cols=["cell"]
        )
    before = plan_scan(table_dir)
    assert before["files_total"] == 24  # 3 snapshots x 8 files
    from gpiv_spark.sources.manifest import compact

    sid = compact(spark, table_dir, target_files=4)
    after = plan_scan(table_dir)
    assert after["snapshot_id"] == sid
    assert after["files_total"] <= 4
    assert read_snapshot(spark, table_dir).count() == 12_000
    # pre-compaction snapshot is untouched history
    assert read_snapshot(spark, table_dir, snapshot=2).count() == 8_000


def test_streaming_sink_commits_a_snapshot_per_batch(spark, table_dir):
    import tempfile as tf

    from gpiv_spark.sources.manifest import streaming_sink

    src = Path(tf.mkdtemp(prefix="sink_src_"))
    ckpt = Path(tf.mkdtemp(prefix="sink_ckpt_"))
    try:
        # one FILE per source write: the file-stream's directory listing
        # can catch a multi-file write half-landed and split it across
        # two micro-batches, which would nondeterministically add a
        # third snapshot (observed once) — a single file is atomic
        _docs(spark, 0, 2_000).coalesce(1).write.mode(
            "overwrite").parquet(str(src))
        stream = spark.readStream.schema(
            "doc_id long, cell long, score long"
        ).parquet(str(src))
        q = (
            stream.writeStream
            .foreachBatch(streaming_sink(table_dir, ["cell"]))
            .option("checkpointLocation", str(ckpt))
            .start()
        )
        q.processAllAvailable()
        _docs(spark, 2_000, 3_000).coalesce(1).write.mode(
            "append").parquet(str(src))
        q.processAllAvailable()
        q.stop()
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    plan = plan_scan(table_dir)
    assert plan["snapshot_id"] == 2  # one commit per micro-batch
    assert read_snapshot(spark, table_dir).count() == 3_000
    assert read_snapshot(spark, table_dir, snapshot=1).count() == 2_000


def test_overwrite_derived_from_stale_snapshot_raises(spark, table_dir):
    """Lost-update guard: a rewrite (compaction) derived from snapshot
    S must FAIL if another writer commits after S — silently committing
    would drop the concurrent append from the new latest."""
    from gpiv_spark.sources.manifest import ConcurrentOverwrite

    s1 = write_snapshot(_docs(spark, 0, 1000), table_dir, stats_cols=["cell"])
    # a concurrent append lands after the rewriter read s1
    write_snapshot(_docs(spark, 1000, 2000), table_dir, stats_cols=["cell"])
    rewritten = read_snapshot(spark, table_dir, snapshot=s1).coalesce(1)
    with pytest.raises(ConcurrentOverwrite):
        write_snapshot(rewritten, table_dir, stats_cols=["cell"],
                       mode="overwrite", expected_parent=s1)
    # nothing was committed; both snapshots' rows remain the latest
    assert read_snapshot(spark, table_dir).count() == 2000


def test_compact_still_works_without_contention(spark, table_dir):
    from gpiv_spark.sources.manifest import compact

    write_snapshot(_docs(spark, 0, 5000), table_dir, stats_cols=["cell"])
    sid = compact(spark, table_dir, target_files=2)
    plan = plan_scan(table_dir, snapshot=sid)
    assert len(plan["files"]) <= 2
    assert read_snapshot(spark, table_dir).count() == 5000


def test_non_numeric_stats_column_rejected(spark, table_dir):
    """Envelope pruning is only sound for numeric physical types;
    requesting string/binary stats must raise, not degrade silently."""
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t-"), F.col("id")).alias("text"),
    )
    with pytest.raises(ValueError, match="physical type"):
        write_snapshot(df, table_dir, stats_cols=["text"])


def test_equality_deletes_merge_on_read(spark, table_dir):
    from gpiv_spark.sources.manifest import append_equality_deletes

    write_snapshot(_docs(spark, 0, 1000), table_dir, stats_cols=["cell"])
    keys = spark.range(0, 1000).filter("id % 7 = 0").select(
        F.col("id").alias("doc_id")
    )
    snap2 = append_equality_deletes(keys, table_dir, ["doc_id"])
    live = read_snapshot(spark, table_dir)
    ids = {r.doc_id for r in live.collect()}
    assert ids == {i for i in range(1000) if i % 7 != 0}
    # time travel: the pre-delete snapshot still shows everything
    before = read_snapshot(spark, table_dir, snapshot=snap2 - 1)
    assert before.count() == 1000


def test_deletes_respect_sequence_reinsert(spark, table_dir):
    """A key re-appended AFTER its delete is visible again (Iceberg v2
    sequence rule): deletes only apply to older data files."""
    from gpiv_spark.sources.manifest import append_equality_deletes

    write_snapshot(_docs(spark, 0, 100), table_dir, stats_cols=["cell"])
    append_equality_deletes(
        spark.createDataFrame([(14,), (15,)], "doc_id long"),
        table_dir, ["doc_id"],
    )
    write_snapshot(_docs(spark, 14, 15), table_dir, stats_cols=["cell"])
    ids = sorted(r.doc_id for r in read_snapshot(spark, table_dir).collect())
    assert 14 in ids and 15 not in ids
    assert ids.count(14) == 1  # the old row is dead, the new one live
    assert len(ids) == 99  # 100 - deleted {14,15} + re-added {14}


def test_compact_folds_deletes(spark, table_dir):
    from gpiv_spark.sources.manifest import (
        _load_manifest,
        _snapshot_ids,
        append_equality_deletes,
        compact,
    )

    write_snapshot(_docs(spark, 0, 500), table_dir, stats_cols=["cell"])
    append_equality_deletes(
        spark.range(0, 500).filter("id % 5 = 0").select(
            F.col("id").alias("doc_id")),
        table_dir, ["doc_id"],
    )
    expect = sorted(i for i in range(500) if i % 5 != 0)
    snap3 = compact(spark, table_dir, target_files=2)
    man = _load_manifest(table_dir, snap3)
    assert man["delete_files"] == []  # MoR folded into copy-on-write
    ids = sorted(r.doc_id for r in read_snapshot(spark, table_dir).collect())
    assert ids == expect
    # pruning still sound on the compacted snapshot
    plan = plan_scan(table_dir, ranges={"cell": (0, 5)})
    assert plan["files_total"] == 2
    assert _snapshot_ids(table_dir)[-1] == snap3


def test_deletes_null_safe_and_empty_table_guard(spark, table_dir):
    """Spec semantics: a NULL in a delete key row matches NULL data
    values; and a delete on an empty table is refused (it could never
    apply to anything)."""
    from gpiv_spark.sources.manifest import append_equality_deletes

    with pytest.raises(FileNotFoundError):
        append_equality_deletes(
            spark.createDataFrame([(1,)], "doc_id long"),
            table_dir, ["doc_id"],
        )
    rows = spark.createDataFrame(
        [(1, "en"), (2, None), (3, "de"), (4, None)],
        "doc_id long, lang string",
    )
    write_snapshot(rows, table_dir, stats_cols=["doc_id"])
    append_equality_deletes(
        spark.createDataFrame([(None,)], "lang string"),
        table_dir, ["lang"],
    )
    live = sorted(r.doc_id for r in read_snapshot(spark, table_dir).collect())
    assert live == [1, 3]  # both NULL-lang rows dead


def test_delete_scan_groups_by_applicable_set(spark, table_dir):
    """Many append snapshots + one delete must NOT fan the read into a
    scan per snapshot: files group by applicable-delete-set (2 groups
    here), so the plan stays O(#delete boundaries), not O(#appends)."""
    from gpiv_spark.sources.manifest import append_equality_deletes

    for lo in range(0, 50, 10):  # 5 append snapshots
        write_snapshot(_docs(spark, lo, lo + 10), table_dir,
                       stats_cols=["cell"])
    append_equality_deletes(
        spark.createDataFrame([(7,), (23,)], "doc_id long"),
        table_dir, ["doc_id"],
    )
    write_snapshot(_docs(spark, 50, 60), table_dir, stats_cols=["cell"])
    df = read_snapshot(spark, table_dir)
    ids = sorted(r.doc_id for r in df.collect())
    assert ids == sorted(set(range(60)) - {7, 23})
    # exactly 2 scan groups -> 1 anti-join in the (final) plan; AQE's
    # explain prints final + initial, so inspect the final section only
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple").split("Initial Plan")[0]
    assert plan.count("LeftAnti") == 1, plan


def test_empty_plan_with_pos_keeps_handle_columns(spark, table_dir):
    """A range predicate that prunes EVERY file must still return the
    promised _file_path/_pos handles (ADVICE r4): positional-delete
    builders select them from the scan and expect zero rows, not an
    AnalysisException."""
    write_snapshot(_docs(spark, 0, 1000), table_dir, stats_cols=["cell"])
    df = read_snapshot(
        spark, table_dir, ranges={"cell": (900, 999)}, with_pos=True
    )
    assert df.select("_file_path", "_pos", "doc_id").count() == 0
    # and without with_pos the helper columns stay absent
    plain = read_snapshot(spark, table_dir, ranges={"cell": (900, 999)})
    assert "_file_path" not in plain.columns
    assert plain.count() == 0


def test_positional_deletes_surgical_row_removal(spark, table_dir):
    """Positional deletes kill specific physical rows — including one
    of two byte-identical duplicates, which equality deletes cannot
    distinguish — and compact() folds them away."""
    from gpiv_spark.sources.manifest import (
        _load_manifest,
        _snapshot_ids,
        append_positional_deletes,
        compact,
    )

    # two byte-identical rows (doc_id 42 twice) + distinct neighbors
    rows = spark.createDataFrame(
        [(41, "a"), (42, "dup"), (42, "dup"), (43, "b")],
        "doc_id long, payload string",
    ).coalesce(1)
    write_snapshot(rows, table_dir, stats_cols=["doc_id"])
    scan = read_snapshot(spark, table_dir, with_pos=True)
    assert {"_file_path", "_pos"} < set(scan.columns)
    # keep the FIRST of each duplicate run, delete the rest
    import pyspark.sql.window as W

    w = W.Window.partitionBy("doc_id", "payload").orderBy("_pos")
    losers = (
        scan.withColumn("_rk", F.row_number().over(w))
        .filter("_rk > 1")
        .select(F.col("_file_path").alias("file_path"),
                F.col("_pos").alias("pos"))
    )
    append_positional_deletes(losers, table_dir)
    live = read_snapshot(spark, table_dir)
    assert "_file_path" not in live.columns  # helper cols dropped
    got = sorted((r.doc_id, r.payload) for r in live.collect())
    assert got == [(41, "a"), (42, "dup"), (43, "b")]
    # compaction folds the positional delete into copy-on-write
    sid = compact(spark, table_dir, target_files=1)
    assert _load_manifest(table_dir, sid)["delete_files"] == []
    got2 = sorted((r.doc_id, r.payload)
                  for r in read_snapshot(spark, table_dir).collect())
    assert got2 == got
    assert _snapshot_ids(table_dir)[-1] == sid


def test_positional_and_equality_deletes_compose(spark, table_dir):
    from gpiv_spark.sources.manifest import (
        append_equality_deletes,
        append_positional_deletes,
    )

    write_snapshot(_docs(spark, 0, 100), table_dir, stats_cols=["cell"])
    append_equality_deletes(
        spark.createDataFrame([(10,), (11,)], "doc_id long"),
        table_dir, ["doc_id"],
    )
    scan = read_snapshot(spark, table_dir, with_pos=True)
    append_positional_deletes(
        scan.filter("doc_id = 20").select(
            F.col("_file_path").alias("file_path"),
            F.col("_pos").alias("pos"),
        ),
        table_dir,
    )
    ids = sorted(r.doc_id for r in read_snapshot(spark, table_dir).collect())
    assert ids == sorted(set(range(100)) - {10, 11, 20})
    # bad schema refused
    with pytest.raises(ValueError):
        append_positional_deletes(
            spark.createDataFrame([(1,)], "x long"), table_dir
        )


def test_positional_delete_racing_compact_raises(spark, table_dir):
    """A positional delete derived from a pre-compact scan references
    file paths no longer live; committing it must raise
    ConcurrentOverwrite instead of landing a delete that silently kills
    nothing (the lost-update hole the OCC machinery exists to close)."""
    from gpiv_spark.sources.manifest import (
        ConcurrentOverwrite,
        append_positional_deletes,
        compact,
    )

    write_snapshot(_docs(spark, 0, 2_000), table_dir, stats_cols=["cell"])
    scan = read_snapshot(spark, table_dir, with_pos=True)
    losers = scan.filter("doc_id % 2 = 1").select(
        F.col("_file_path").alias("file_path"), F.col("_pos").alias("pos")
    )
    losers = losers.localCheckpoint()  # pin paths before they go stale
    compact(spark, table_dir, 2)      # concurrent writer rewrites files
    with pytest.raises(ConcurrentOverwrite):
        append_positional_deletes(losers, table_dir)


def test_eq_delete_expected_parent_guard(spark, table_dir):
    """append_equality_deletes(expected_parent=...) refuses to land keys
    derived from a snapshot that is no longer the latest."""
    from gpiv_spark.sources.manifest import (
        ConcurrentOverwrite,
        append_equality_deletes,
    )

    parent = write_snapshot(_docs(spark, 0, 1_000), table_dir,
                            stats_cols=["cell"])
    keys = spark.createDataFrame([(1,), (3,)], "doc_id long")
    # concurrent overwrite replaces the table wholesale
    write_snapshot(_docs(spark, 5_000, 6_000), table_dir,
                   stats_cols=["cell"], mode="overwrite")
    with pytest.raises(ConcurrentOverwrite):
        append_equality_deletes(keys, table_dir, ["doc_id"],
                                expected_parent=parent)


def test_append_inherits_table_stats_cols(spark, table_dir):
    """The stats_cols contract is set at creation and survives appends:
    an append passing a different list must not relabel the manifest
    (which would make the next compact() rewrite the table with no
    stats, silently killing pruning forever)."""
    from gpiv_spark.sources.manifest import _load_manifest, _snapshot_ids

    write_snapshot(_docs(spark, 0, 5_000), table_dir, stats_cols=["cell"])
    write_snapshot(_docs(spark, 5_000, 10_000), table_dir, stats_cols=[])
    man = _load_manifest(table_dir, _snapshot_ids(table_dir)[-1])
    assert man["stats_cols"] == ["cell"]
    # the appended files carry REAL cell envelopes under the inherited
    # contract, so pruning still works across both snapshots' files
    assert all(
        "cell" in f["stats"] for f in man["files"]
    ), [f["stats"] for f in man["files"]]
    plan = plan_scan(table_dir, ranges={"cell": (0, 7)})
    assert len(plan["files"]) < len(man["files"])
