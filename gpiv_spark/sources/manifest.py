"""Snapshot/manifest table layout: Iceberg's scan-planning core, from scratch.

The north rule's input is an Iceberg table; the sandbox has no Iceberg
runtime jar (sources/tables.py routes catalog identifiers to a real
catalog on a cluster). This module implements the part of the format
that MATTERS for a 10^12-doc scan — metadata-driven file skipping and
snapshot isolation — in pure PySpark + pyarrow:

- a TABLE is a directory: ``data/snap-N/*.parquet`` plus append-only
  ``snapshots/N.json`` manifests;
- each manifest lists every live data file with its row count and
  per-column min/max harvested from the parquet FOOTER (the same
  statistics Iceberg stores in its manifest entries — no data read);
- a SNAPSHOT is immutable and points at its parent, so reading an old
  snapshot id is time travel and a writer crash can never corrupt a
  reader's view (the manifest is written last, atomically via rename);
- scan planning happens DRIVER-SIDE from the manifest: a range
  predicate keeps only files whose [min, max] envelope overlaps, so a
  selective query on a 100 TB table opens O(matching files), not the
  whole directory — Spark's own parquet row-group pruning then applies
  WITHIN each surviving file via the residual filter.

- EQUALITY DELETE files (format v2 merge-on-read): a delete snapshot
  commits the key tuples to drop without rewriting data; readers
  anti-join each data file group against the deletes with a HIGHER
  sequence number (so re-appended keys reappear), and ``compact``
  folds deletes into a clean copy-on-write rewrite.

Layout and pruning semantics follow the public Iceberg spec's
manifest-entry design (format v2, metadata-value counts elided); the
implementation shares no code with any Iceberg runtime.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ConcurrentOverwrite(RuntimeError):
    """An overwrite commit found snapshots it did not derive from."""


# Parquet physical types whose footer min/max are totally ordered and
# never writer-truncated — the set for which envelope pruning is SOUND.
# BYTE_ARRAY (string/binary) stats can be truncated by writers (and
# bytes aren't JSON-serializable); BOOLEAN/INT96 add nothing.
_NUMERIC_PHYSICAL = {"INT32", "INT64", "FLOAT", "DOUBLE"}

# read_snapshot broadcasts delete key sets up to this many manifest-
# counted rows (~tens of MB of narrow key tuples — the regime where a
# hash build on every executor beats shuffling the data side). Bigger
# delete sets fall back to a plain shuffled anti-join: forcing a
# broadcast build of an unbounded delete backlog is how a reader OOMs
# its driver, and a 100 TB table can accrete millions of delete rows
# between compactions. Tests monkeypatch this to pin both plans.
BROADCAST_DELETE_ROWS = 1_000_000


def _file_stats(path: str, stats_cols: list[str]) -> dict:
    """Row count + per-column min/max from the parquet footer only.

    Raises on non-numeric stats columns: plan_scan's pruning contract
    ("provably misses") only holds for exact, totally-ordered footer
    statistics, so requesting stats on a string/binary column is a
    caller bug, not a degraded mode.
    """
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    names = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out = {"path": path, "rows": md.num_rows, "stats": {}}
    for col in stats_cols:
        idx = names[col]
        phys = md.schema.column(idx).physical_type
        if phys not in _NUMERIC_PHYSICAL:
            raise ValueError(
                f"stats column {col!r} has physical type {phys}; only "
                f"{sorted(_NUMERIC_PHYSICAL)} give sound envelope pruning"
            )
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                lo = hi = None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            out["stats"][col] = [lo, hi]
    return out


def _snapshot_ids(table_dir: str | os.PathLike) -> list[int]:
    sdir = Path(table_dir) / "snapshots"
    if not sdir.is_dir():
        return []
    return sorted(int(p.stem) for p in sdir.glob("*.json"))


def write_snapshot(df: DataFrame, table_dir: str | os.PathLike,
                   stats_cols: list[str], mode: str = "append",
                   expected_parent: int | None = None, *,
                   equality_delete_cols: list[str] | None = None,
                   positional_deletes: bool = False) -> int:
    """Commit ``df`` as a new snapshot; returns its id.

    mode="append" keeps the parent snapshot's files live; "overwrite"
    starts the file list fresh (and clears delete files — an overwrite
    replaces the table's contents wholesale). ``expected_parent`` pins
    the snapshot the write was DERIVED from: if any other writer
    commits first, the commit raises ConcurrentOverwrite instead of
    silently dropping the concurrent snapshot's rows from the new
    latest (the lost-update hazard of a blind overwrite). Appends
    don't need it — an append retried onto a newer parent keeps every
    concurrent file live.

    ``equality_delete_cols`` commits ``df`` as an EQUALITY DELETE file
    set instead of data (Iceberg v2 merge-on-read): ``df`` holds the
    key tuples to delete, the parent's data files stay untouched, and
    readers drop matching rows from every data file with a LOWER
    sequence number than the delete (so a key re-appended after the
    delete is visible again — the spec's sequence-number rule). Every
    manifest entry carries ``seq`` = the snapshot id that added it.

    ``positional_deletes`` commits ``df`` as a POSITIONAL DELETE file
    set (the other Iceberg v2 flavor): ``df`` must be exactly
    ``(file_path string, pos long)`` rows naming a data file (the
    ``_file_path`` URI exposed by ``read_snapshot(with_pos=True)``)
    and a 0-based row index within it. Since a file path identifies
    exactly one immutable data file, path matching subsumes the
    sequence rule for positional deletes.

    Concurrency: data files land in a UNIQUE directory (no dependence
    on the snapshot id), and the commit point is an exclusive
    hard-link of the staged manifest into ``snapshots/N.json`` —
    optimistic concurrency exactly like a real table format. If two
    writers race for the same id, the loser's link raises
    FileExistsError and it retries against the winner's snapshot as
    the new parent; no writer ever touches another writer's files.
    A crashed writer leaves only an unreferenced data dir (garbage,
    never corruption) — readers only see committed manifests.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown mode {mode!r}")
    if equality_delete_cols is not None and positional_deletes:
        raise ValueError("one delete flavor per commit")
    is_delete = equality_delete_cols is not None or positional_deletes
    if positional_deletes and set(df.columns) != {"file_path", "pos"}:
        raise ValueError(
            f"positional deletes need (file_path, pos), got {df.columns}"
        )
    if is_delete:
        if mode != "append":
            raise ValueError("delete commits are appends by construction")
        if not _snapshot_ids(table_dir):
            # a delete with no parent would commit a snapshot with no
            # data files AND a delete that (seq rule) never applies to
            # anything — a silently dead commit, refuse up front
            raise FileNotFoundError(
                f"cannot commit deletes to empty table {table_dir}"
            )
    table_dir = Path(table_dir)
    (table_dir / "data").mkdir(parents=True, exist_ok=True)
    data_dir = Path(tempfile.mkdtemp(dir=table_dir / "data", prefix="snap-"))
    data_dir.rmdir()  # Spark wants to create the leaf dir itself
    ref_paths: set[str] = set()
    if equality_delete_cols is not None:
        df = df.select(*equality_delete_cols).distinct()
    elif positional_deletes:
        df = df.select("file_path", "pos").distinct()
        # the data files these (file_path, pos) rows were derived from;
        # validated against the COMMIT-TIME parent inside the loop — a
        # positional delete racing a compact()/overwrite would otherwise
        # commit fine but reference paths no longer in any live
        # manifest, silently deleting nothing (lost update)
        ref_paths = {r[0] for r in df.select("file_path").distinct().collect()}
    df.write.mode("errorifexists").parquet(str(data_dir))
    new_files = [
        _file_stats(str(p), [] if is_delete else stats_cols)
        for p in sorted(data_dir.glob("*.parquet"))
    ]

    sdir = table_dir / "snapshots"
    sdir.mkdir(parents=True, exist_ok=True)
    while True:
        ids = _snapshot_ids(table_dir)
        new_id = (ids[-1] + 1) if ids else 1
        parent = ids[-1] if ids else None
        if expected_parent is not None and parent != expected_parent:
            raise ConcurrentOverwrite(
                f"derived from snapshot {expected_parent} but latest is "
                f"now {parent}; re-plan against the new snapshot"
            )
        for f in new_files:  # inside the loop: a lost race changes id
            f["seq"] = new_id
        parent_man = (
            _load_manifest(table_dir, parent) if parent is not None else None
        )
        if is_delete:
            if parent_man is None:  # table emptied between guard+commit
                raise FileNotFoundError(
                    f"cannot commit deletes to empty table {table_dir}"
                )
            files = parent_man["files"]
            if positional_deletes:
                # _metadata.file_path handles are file: URIs; manifest
                # entries are plain paths — normalize both forms
                norm = lambda p: re.sub("^file:/*", "/", p)  # noqa: E731
                live = {norm(f["path"]) for f in files}
                stale = {p for p in ref_paths if norm(p) not in live}
                if stale:
                    raise ConcurrentOverwrite(
                        f"positional deletes reference {len(stale)} data "
                        f"file(s) not live in parent snapshot {parent} "
                        f"(e.g. {sorted(stale)[0]}): the scan they were "
                        "derived from predates a compact/overwrite — "
                        "re-plan against the current snapshot"
                    )
            # a delete commit keeps the TABLE's stats_cols contract
            stats_cols = parent_man["stats_cols"]
            marker = (
                {"positional": True} if positional_deletes
                else {"eq_cols": list(equality_delete_cols)}
            )
            deletes = parent_man.get("delete_files", []) + [
                dict(f, **marker) for f in new_files
            ]
        elif mode == "append" and parent_man is not None:
            # the TABLE's stats_cols contract is set at creation /
            # overwrite and survives appends: a caller passing a
            # different list would otherwise silently relabel the
            # manifest (and the next compact() would rewrite the whole
            # table under the degraded contract, killing pruning)
            if parent_man["stats_cols"] != stats_cols:
                stats_cols = parent_man["stats_cols"]
                new_files = [
                    dict(_file_stats(f["path"], stats_cols), seq=new_id)
                    for f in new_files
                ]
            files = parent_man["files"] + new_files
            deletes = parent_man.get("delete_files", [])
        else:  # first commit or overwrite: fresh lists, deletes folded
            files = new_files
            deletes = []
        manifest = {
            "snapshot_id": new_id,
            "parent": parent,
            "mode": mode,
            "stats_cols": stats_cols,
            "files": files,
            "delete_files": deletes,
        }
        fd, tmp = tempfile.mkstemp(dir=str(sdir), suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump(manifest, fh)
        try:
            os.link(tmp, sdir / f"{new_id}.json")  # atomic, exclusive
            return new_id
        except FileExistsError:
            continue  # lost the race: re-read parent chain and retry
        finally:
            os.unlink(tmp)


def append_equality_deletes(keys_df: DataFrame,
                            table_dir: str | os.PathLike,
                            eq_cols: list[str],
                            expected_parent: int | None = None) -> int:
    """Commit an equality-delete snapshot: every row of the table whose
    ``eq_cols`` tuple appears in ``keys_df`` is dead for readers of
    this snapshot onward — WITHOUT rewriting any data file (the
    merge-on-read half of the dedup endgame: the canonicalizer's
    losing doc_ids become one small delete file). Keys re-appended by
    a LATER snapshot are visible again (sequence rule). Returns the
    new snapshot id; same OCC commit path as data writes (which also
    enforces the non-empty-table precondition and carries the table's
    stats_cols contract forward). ``expected_parent`` pins the snapshot
    the keys were derived from: a concurrent overwrite would otherwise
    let stale keys apply to brand-new rows (pass the snapshot id the
    planning scan read; positional deletes additionally get an
    automatic path-liveness check)."""
    return write_snapshot(keys_df, table_dir, stats_cols=[],
                          equality_delete_cols=eq_cols,
                          expected_parent=expected_parent)


def append_positional_deletes(pos_df: DataFrame,
                              table_dir: str | os.PathLike,
                              expected_parent: int | None = None) -> int:
    """Commit a POSITIONAL delete snapshot: ``pos_df`` is
    ``(file_path string, pos long)`` rows — the ``_file_path``/``_pos``
    handles from ``read_snapshot(..., with_pos=True)`` — each killing
    one physical row of one data file. The row-level flavor for
    surgical dedup (keep row 0 of a duplicate run, delete rows 1..n-1
    even when every column is byte-identical, where equality deletes
    cannot distinguish the keeper). Returns the new snapshot id. The
    commit validates that every referenced file_path is still live in
    the commit-time parent (a racing compact/overwrite invalidates the
    handles — ConcurrentOverwrite instead of a delete that silently
    kills nothing); ``expected_parent`` additionally pins the exact
    planning snapshot."""
    return write_snapshot(pos_df, table_dir, stats_cols=[],
                          positional_deletes=True,
                          expected_parent=expected_parent)


def _load_manifest(table_dir: str | os.PathLike, snapshot: int) -> dict:
    with open(Path(table_dir) / "snapshots" / f"{snapshot}.json") as fh:
        return json.load(fh)


def plan_scan(table_dir: str | os.PathLike, snapshot: int | None = None,
              ranges: dict[str, tuple] | None = None) -> dict:
    """Driver-side scan plan: the manifest's files minus every file
    whose stats envelope provably misses ``ranges`` ({col: (lo, hi)},
    either bound None for open). Files lacking stats for a predicate
    column are KEPT — pruning must be sound, never speculative."""
    ids = _snapshot_ids(table_dir)
    if not ids:
        raise FileNotFoundError(f"no snapshots under {table_dir}")
    snap = ids[-1] if snapshot is None else snapshot
    man = _load_manifest(table_dir, snap)
    keep, skipped = [], 0
    for f in man["files"]:
        live = True
        for col, (lo, hi) in (ranges or {}).items():
            st = f["stats"].get(col)
            if st is None:
                continue
            if (hi is not None and st[0] > hi) or (
                lo is not None and st[1] < lo
            ):
                live = False
                break
        if live:
            keep.append(f)
        else:
            skipped += 1
    return {
        "snapshot_id": snap,
        "files": [f["path"] for f in keep],
        "file_seqs": [f.get("seq", 0) for f in keep],
        "delete_files": man.get("delete_files", []),
        "rows_upper_bound": sum(f["rows"] for f in keep),
        "files_skipped": skipped,
        "files_total": len(man["files"]),
    }


def read_snapshot(spark: SparkSession, table_dir: str | os.PathLike,
                  snapshot: int | None = None,
                  ranges: dict[str, tuple] | None = None,
                  with_pos: bool = False) -> DataFrame:
    """DataFrame over the pruned file set, residual range filter and
    equality deletes applied (merge-on-read).

    Delete application follows the Iceberg v2 sequence rule: a delete
    file drops matching rows from data files with a LOWER seq only.
    Data files are grouped by their APPLICABLE-DELETE-SET (not raw
    seq: a streaming table with hundreds of append snapshots and one
    delete still plans just two scan groups), and each group is
    anti-joined against the union of its deletes with NULL-SAFE key
    equality (a NULL in a delete key row matches NULL data values, as
    the spec requires). POSITIONAL deletes anti-join on
    ``(_metadata.file_path, _metadata.row_index)`` — path identity
    subsumes the sequence rule since data files are immutable. Delete
    key sets are broadcast — they are metadata-scale next to the data
    (a deployment that accretes delete files beyond broadcast size
    runs ``compact`` to fold them in).

    ``with_pos=True`` appends ``_file_path``/``_pos`` columns (the
    handles a caller needs to CONSTRUCT positional deletes from a
    scan, e.g. "delete the 2nd..nth duplicates I just identified").

    Delete key sets are broadcast while the manifest's own row counts
    say they are metadata-scale (``BROADCAST_DELETE_ROWS``); past that
    the anti-join degrades to a plain shuffled join instead of forcing
    an over-threshold broadcast build — a 100 TB table can carry
    millions of delete rows between ``compact`` runs."""
    plan = plan_scan(table_dir, snapshot, ranges)
    if not plan["files"]:
        any_file = _load_manifest(
            table_dir, plan["snapshot_id"]
        )["files"]
        if not any_file:
            raise FileNotFoundError("snapshot has no data files")
        schema = spark.read.parquet(any_file[0]["path"]).schema
        if with_pos:  # keep the promised handle columns on empty plans
            from pyspark.sql.types import LongType, StringType

            schema = schema.add("_file_path", StringType()).add(
                "_pos", LongType()
            )
        return spark.createDataFrame([], schema)

    def residual(df: DataFrame) -> DataFrame:
        for col, (lo, hi) in (ranges or {}).items():
            if lo is not None:
                df = df.filter(F.col(col) >= lo)
            if hi is not None:
                df = df.filter(F.col(col) <= hi)
        return df

    deletes = plan["delete_files"]
    if not deletes and not with_pos:
        return residual(spark.read.parquet(*plan["files"]))
    eq_dels = [d for d in deletes if not d.get("positional")]
    pos_dels = [d for d in deletes if d.get("positional")]

    def with_meta(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "_file_path", F.col("_metadata.file_path")
        ).withColumn("_pos", F.col("_metadata.row_index"))

    def applicable(seq: int) -> tuple:
        return tuple(d["path"] for d in eq_dels if d["seq"] > seq)

    groups: dict[tuple, list[str]] = {}
    for p, s in zip(plan["files"], plan["file_seqs"]):
        groups.setdefault(applicable(s), []).append(p)

    # per-(path, cols) distinct frames, built once and SHARED across the
    # applicable-delete-set groups (whose sets are nested prefixes when
    # D delete snapshots interleave with appends): each branch of the
    # final union then contains the identical scan->distinct subtree,
    # whose shuffle Exchange Spark reuses (ReusedExchange), so every
    # delete parquet is read O(1) times instead of O(groups) times.
    _path_frames: dict[tuple, DataFrame] = {}

    def delete_side(dels: list[dict], key_cols):
        """Distinct key frame for a delete-file set, broadcast only
        while the manifest's row counts stay metadata-scale. Built as a
        union of cached per-path distinct frames (anti-join semantics
        are insensitive to duplicate keys across paths)."""
        parts = []
        for d in dels:
            k = (d["path"], tuple(key_cols))
            if k not in _path_frames:
                _path_frames[k] = spark.read.parquet(
                    d["path"]).select(*key_cols).distinct()
            parts.append(_path_frames[k])
        keys = parts[0]
        for p in parts[1:]:
            keys = keys.unionByName(p)
        if sum(d["rows"] for d in dels) <= BROADCAST_DELETE_ROWS:
            keys = F.broadcast(keys)
        return keys

    # group-independent: build (and, when small, broadcast) the
    # positional-key frame ONCE, not per applicable-delete-set group
    pkeys = (
        delete_side(pos_dels, ("file_path", "pos")).alias("_pk")
        if pos_dels else None
    )

    out = None
    for del_paths, group in groups.items():
        gdf = spark.read.parquet(*group)
        if pos_dels or with_pos:
            gdf = with_meta(gdf)
        gdf = residual(gdf)
        if pos_dels:  # path identity scopes these, no seq grouping
            gdf = gdf.alias("_pt").join(
                pkeys,
                (F.col("_pt._file_path") == F.col("_pk.file_path"))
                & (F.col("_pt._pos") == F.col("_pk.pos")),
                "left_anti",
            )
        dels = [d for d in eq_dels if d["path"] in set(del_paths)]
        # one anti-join per distinct key-column set among the
        # applicable deletes (usually exactly one)
        for cols in {tuple(d["eq_cols"]) for d in dels}:
            keys = delete_side(
                [d for d in dels if tuple(d["eq_cols"]) == cols], cols
            ).alias("_dk")
            ga = gdf.alias("_dt")
            cond = None
            for c in cols:  # null-safe: NULL delete keys match NULLs
                term = F.col(f"_dt.{c}").eqNullSafe(F.col(f"_dk.{c}"))
                cond = term if cond is None else cond & term
            gdf = ga.join(keys, cond, "left_anti")
        if (pos_dels or with_pos) and not with_pos:
            gdf = gdf.drop("_file_path", "_pos")
        out = gdf if out is None else out.unionByName(gdf)
    return out


def compact(spark: SparkSession, table_dir: str | os.PathLike,
            target_files: int) -> int:
    """Rewrite the latest snapshot's data into ``target_files`` files
    (small-file compaction, the maintenance half of any manifest
    format: streaming ingest accretes per-batch files until scans are
    metadata-bound). Commits an OVERWRITE snapshot with identical rows;
    older snapshots keep reading their own file lists (time travel is
    unaffected)."""
    ids = _snapshot_ids(table_dir)
    if not ids:
        raise FileNotFoundError(f"no snapshots under {table_dir}")
    man = _load_manifest(table_dir, ids[-1])
    # merge-on-read view: compaction FOLDS equality deletes into the
    # rewrite (the MoR -> copy-on-write flip), so the new snapshot
    # carries identical LIVE rows and an empty delete list
    df = read_snapshot(spark, table_dir, snapshot=ids[-1])
    # pin the source snapshot: an append committed between this read
    # and the commit must fail the rewrite (ConcurrentOverwrite), not
    # vanish from the new latest
    return write_snapshot(
        df.coalesce(target_files), table_dir,
        stats_cols=man["stats_cols"], mode="overwrite",
        expected_parent=ids[-1],
    )


def streaming_sink(table_dir: str | os.PathLike, stats_cols: list[str]):
    """foreachBatch sink: every micro-batch commits one append
    snapshot, so the stream's history is queryable (and revertable)
    per batch. Usage:

        q = (df.writeStream.foreachBatch(streaming_sink(dir, cols))
               .option("checkpointLocation", ckpt).start())

    Exactly-once note: the snapshot commit is atomic (manifest
    rename), but a crash BETWEEN the data write and the engine's
    checkpoint advance can replay a batch as a duplicate snapshot —
    the same at-least-once contract as Spark's file sinks; readers
    that need exactly-once pin a snapshot id.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        write_snapshot(batch_df, table_dir, stats_cols, mode="append")

    return _sink
