"""Spark-4 Python DataSource WRITER: a manifest-committed JSONL sink.

The reader half of the custom-source story lives in
``snapshot_source.py`` (batch + stream, pushFilters pruning); this is
the writer half, demonstrating the full task-commit protocol the
Python DataSource API exposes:

1. each task writes its partition to its own ``part-*.jsonl`` file and
   returns a :class:`WriterCommitMessage` naming the file and row
   count (executor-side, parallel);
2. the driver's ``commit`` writes ``_MANIFEST.json`` listing exactly
   the committed files — readers trust the manifest, never directory
   listing, so concurrent/failed tasks can leave orphan files without
   corrupting the table (the Iceberg/Delta commit idea in miniature);
3. ``abort`` removes any files named by completed tasks.

At scale the data files are written by the cluster; only the
(files-count-sized) manifest passes through the driver.

Filesystem contract: ``commit`` runs on the DRIVER and assumes the
sink path is a filesystem the driver can see (local FS in tests; a
shared mount in a cluster — for object stores this sink would need a
Hadoop-FS port). Concurrent append jobs to the SAME path serialize
their read-modify-write of ``_MANIFEST.json`` through an exclusive
``fcntl`` lock on ``_MANIFEST.lock``, so two simultaneous appends on
one host cannot drop each other's files; cross-host writers need an
external coordinator (as real table formats use a catalog/CAS).
"""

from __future__ import annotations

import dataclasses
import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclasses.dataclass
class _FileCommit(WriterCommitMessage):
    filename: str
    n_rows: int


class ManifestJsonWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("manifest_json sink requires a path")
        self.overwrite = overwrite
        # Optional streaming-batch provenance: a foreachBatch caller
        # passes its batch_id so the manifest records which micro-batch
        # committed each file — the hook idempotent_batch_writer uses
        # to skip replayed batches (exactly-once on top of
        # foreachBatch's at-least-once contract).
        bid = options.get("batch_id")
        self.batch_id = None if bid is None else int(bid)

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        fname = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, fname), "w") as f:
            for row in iterator:
                # default=str: timestamps/dates/decimals serialize as
                # their string form (this is an audit/export sink, not
                # a typed round-trip format)
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _FileCommit(filename=fname, n_rows=n)

    def commit(self, messages):
        # Empty partitions produce zero-row part files; keep them out
        # of the manifest (and off disk) so file count tracks data,
        # not the writer's partitioning.
        for m in messages:
            if m is not None and m.n_rows == 0:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except FileNotFoundError:
                    pass
        entries = sorted(
            (
                {"file": m.filename, "n_rows": m.n_rows}
                | (
                    {}
                    if self.batch_id is None
                    else {"batch_id": self.batch_id}
                )
                for m in messages
                if m is not None and m.n_rows > 0
            ),
            key=lambda e: e["file"],
        )
        # Exclusive lock: commit is a read-modify-write of the
        # manifest; two concurrent append writers must serialize or
        # the last os.replace silently drops the other's files.
        import fcntl

        os.makedirs(self.path, exist_ok=True)
        lock_path = os.path.join(self.path, "_MANIFEST.lock")
        with open(lock_path, "w") as lock_f:
            fcntl.flock(lock_f, fcntl.LOCK_EX)
            self._commit_locked(entries)

    def _commit_locked(self, entries):
        mpath = os.path.join(self.path, "_MANIFEST.json")
        prior: list = []
        prior_compacted: list = []
        if os.path.exists(mpath):
            with open(mpath) as f:
                prior_manifest = json.load(f)
            if self.overwrite:
                # overwrite: the old table's committed files are
                # superseded — remove them so they can't leak (and
                # their batch provenance dies with them)
                for e in prior_manifest["files"]:
                    try:
                        os.remove(os.path.join(self.path, e["file"]))
                    except FileNotFoundError:
                        pass
            else:
                # append: the new manifest carries forward every
                # previously committed file AND the batch ids whose
                # files compaction has since merged (losing those
                # would reopen the exactly-once replay window)
                prior = prior_manifest["files"]
                prior_compacted = prior_manifest.get(
                    "compacted_batch_ids", []
                )
        entries = sorted(prior + entries, key=lambda e: e["file"])
        manifest = {
            "files": entries,
            "total_rows": sum(e["n_rows"] for e in entries),
        }
        if prior_compacted:
            manifest["compacted_batch_ids"] = sorted(prior_compacted)
        # atomic publish: a crash mid-write must never destroy the
        # previously valid manifest
        tmp = mpath + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        os.replace(tmp, mpath)

    def abort(self, messages):
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.filename))
            except FileNotFoundError:
                pass


class ManifestJsonSink(DataSource):
    @classmethod
    def name(cls):
        return "manifest_json"

    def writer(self, schema, overwrite: bool):
        return ManifestJsonWriter(self.options, overwrite)


def read_manifest_table(spark, path: str):
    """Read back ONLY the manifest-committed files (orphans from
    failed/zombie tasks are invisible — the commit protocol's whole
    point)."""
    with open(os.path.join(path, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    files = [os.path.join(path, e["file"]) for e in manifest["files"]]
    if not files:
        raise ValueError(f"empty manifest at {path}")
    return spark.read.json(files), manifest


def committed_batch_ids(path: str) -> set[int]:
    """Micro-batch ids already recorded in the manifest (empty when no
    manifest exists yet) — per-file provenance plus the ids whose
    files compaction merged (``compacted_batch_ids``): a replayed
    batch must be skipped even after its part files were rewritten."""
    mpath = os.path.join(path, "_MANIFEST.json")
    if not os.path.exists(mpath):
        return set()
    with open(mpath) as f:
        manifest = json.load(f)
    return {
        e["batch_id"] for e in manifest["files"] if "batch_id" in e
    } | set(manifest.get("compacted_batch_ids", []))


def idempotent_batch_writer(path: str):
    """foreachBatch handler giving EXACTLY-ONCE manifest commits on
    top of foreachBatch's at-least-once replay contract: a micro-batch
    whose batch_id is already in the manifest is skipped wholesale
    (Structured Streaming replays a batch only in full and with the
    same batch_id, so skip-if-committed is the standard idempotence
    recipe). The data write itself may leave orphan part files on a
    crash between write and commit — readers never see them because
    ``read_manifest_table`` trusts only the manifest.
    """

    def write_batch(df, batch_id: int) -> None:
        if int(batch_id) in committed_batch_ids(path):
            return
        (
            df.write.format("manifest_json")
            .option("path", path)
            .option("batch_id", str(int(batch_id)))
            .mode("append")
            .save()
        )

    return write_batch


def compact_manifest_table(
    spark,
    path: str,
    target_rows_per_file: int = 100_000,
) -> dict:
    """OPTIMIZE-style small-file compaction for a manifest table:
    merge committed files smaller than ``target_rows_per_file`` into
    ~target-sized files and atomically swap the manifest — readers
    see either the old file set or the new one, never a mixture, and
    read equivalence is exact because the rewrite moves the JSONL
    LINES verbatim (``spark.read.text``; no parse/re-serialize drift).

    Protocol:
    1. snapshot the manifest and pick the small committed files;
    2. rewrite their lines via a distributed text job into a staging
       dir, rename the outputs to fresh ``part-*.jsonl`` names inside
       the table (uncommitted, hence invisible — same orphan rule as
       a crashed write task);
    3. under the manifest lock, re-read the manifest, verify every
       compacted source file is STILL committed (a concurrent
       overwrite aborts the swap and cleans up the staged files),
       replace their entries with the merged files', publish
       atomically;
    4. delete the superseded files after publish (a reader holding
       the pre-swap manifest object should finish before compaction
       runs — same visibility caveat as VACUUM).

    Returns {"before_files", "after_files", "rows_compacted",
    "skipped"} — skipped=True when compaction cannot help: fewer than
    two small files exist, the rewrite could not reduce the file
    count (e.g. two 90k-row files under a 100k target), or a
    concurrent overwrite retired the source files mid-run.
    """
    import fcntl
    import glob
    import math
    import shutil
    import tempfile

    mpath = os.path.join(path, "_MANIFEST.json")
    with open(mpath) as f:
        manifest = json.load(f)
    before = len(manifest["files"])
    small = [
        e for e in manifest["files"] if e["n_rows"] < target_rows_per_file
    ]
    if len(small) < 2:
        return {
            "before_files": before,
            "after_files": before,
            "rows_compacted": 0,
            "skipped": True,
        }
    total = sum(e["n_rows"] for e in small)
    n_out = max(1, math.ceil(total / target_rows_per_file))
    if n_out >= len(small):
        # rewrite cannot reduce the file count — without this guard a
        # maintenance loop would churn the same still-small files
        # (full rewrite + swap + delete) on every run, forever
        return {
            "before_files": before,
            "after_files": before,
            "rows_compacted": 0,
            "skipped": True,
        }

    staging = tempfile.mkdtemp(prefix="manifest_compact_")
    src_paths = [os.path.join(path, e["file"]) for e in small]
    (
        spark.read.text(src_paths)
        .repartition(n_out)
        .write.mode("overwrite")
        .option("compression", "none")
        .text(staging)
    )
    new_entries = []
    for staged in sorted(glob.glob(os.path.join(staging, "part-*"))):
        n_rows = 0
        with open(staged) as f:
            for _ in f:
                n_rows += 1
        if n_rows == 0:  # empty output partition: don't commit it
            os.remove(staged)
            continue
        fname = f"part-{uuid.uuid4().hex}.jsonl"
        shutil.move(staged, os.path.join(path, fname))
        new_entries.append({"file": fname, "n_rows": n_rows})
    shutil.rmtree(staging, ignore_errors=True)

    compacted_names = {e["file"] for e in small}
    lock_path = os.path.join(path, "_MANIFEST.lock")
    with open(lock_path, "w") as lock_f:
        fcntl.flock(lock_f, fcntl.LOCK_EX)
        with open(mpath) as f:
            current = json.load(f)
        current_names = {e["file"] for e in current["files"]}
        if not compacted_names <= current_names:
            # a concurrent overwrite retired our sources: abort —
            # remove the staged (uncommitted, invisible) outputs
            for e in new_entries:
                try:
                    os.remove(os.path.join(path, e["file"]))
                except FileNotFoundError:
                    pass
            return {
                "before_files": before,
                "after_files": len(current["files"]),
                "rows_compacted": 0,
                "skipped": True,
            }
        kept = [
            e for e in current["files"] if e["file"] not in compacted_names
        ]
        entries = sorted(kept + new_entries, key=lambda e: e["file"])
        # Batch provenance of the merged files must survive the
        # rewrite: idempotent_batch_writer's skip-if-committed check
        # would otherwise re-append a replayed batch whose part files
        # compaction retired — a silent exactly-once break.
        merged_bids = {
            e["batch_id"]
            for e in current["files"]
            if e["file"] in compacted_names and "batch_id" in e
        } | set(current.get("compacted_batch_ids", []))
        new_manifest = {
            "files": entries,
            "total_rows": sum(e["n_rows"] for e in entries),
        }
        if merged_bids:
            new_manifest["compacted_batch_ids"] = sorted(merged_bids)
        tmp = mpath + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(new_manifest, f, indent=2, sort_keys=True)
        os.replace(tmp, mpath)
    for name in compacted_names:
        try:
            os.remove(os.path.join(path, name))
        except FileNotFoundError:
            pass
    return {
        "before_files": before,
        "after_files": len(entries),
        "rows_compacted": total,
        "skipped": False,
    }


def register(spark) -> None:
    spark.dataSource.register(ManifestJsonSink)
