"""Write-Audit-Publish (WAP) sink: stage → audit → atomic pointer flip.

The reference writes extracted records straight into its store
(`PodioApiGateway.py:111-178` upserts as they arrive), so a bad batch
is visible to consumers the moment it lands. The warehouse-grade sink
pattern decouples that: a batch is written to an invisible staging
directory, data-quality audits run against the STAGED files (the same
bytes a reader would get, not the in-memory frame), and only when every
audit passes does a single atomic manifest swap make the new version
current. Readers resolve the manifest first, so they see the old
version or the new one — never a partial write, never an unaudited row.

Mechanics on a filesystem: the manifest is a one-line JSON file whose
replacement goes through ``os.replace`` (atomic POSIX rename within a
directory). Rejected batches move under ``_rejected/`` with the audit
failures beside them for forensics; published versions are retained so
the pointer can also be flipped BACK (instant rollback — the SCD2
time-travel read is the row-level sibling of this file-level facility).

At cluster scale the same protocol runs against an object store with a
conditional-put manifest (or a real table format's commit log — this
module is the minimal honest form of what Iceberg/Delta commit
machinery does); the Spark-side shape is unchanged: full-parallel
write to staging, audits as ordinary DataFrame queries over the staged
path, and a metadata-only publish step.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

Audit = Callable[[DataFrame], tuple[bool, str]]

_MANIFEST = "_current.json"


def _manifest_path(table_root: str) -> str:
    return os.path.join(table_root, _MANIFEST)


def current_version(table_root: str) -> int | None:
    """Version the manifest points at, or None before the first publish."""
    try:
        with open(_manifest_path(table_root)) as fh:
            return int(json.load(fh)["version"])
    except FileNotFoundError:
        return None


def _next_version(table_root: str) -> int:
    """1 + the highest version number that exists ON DISK — published
    (``vN``), staged (``_staging_vN``), or rejected (``_rejected/vN``,
    with or without an attempt suffix).

    The manifest pointer is NOT the allocator: after ``rollback(1)`` the
    pointer reads 1 while ``v2`` is still retained on disk, so
    ``current_version()+1`` would re-allocate 2 and the final
    ``os.rename`` would collide with the retained directory. Rejected
    versions count too, so two consecutive audit-rejected publishes get
    distinct numbers and distinct forensics reports."""
    taken = [0]
    for entry in os.listdir(table_root) if os.path.isdir(table_root) else []:
        for prefix in ("v", "_staging_v"):
            if entry.startswith(prefix) and entry[len(prefix):].isdigit():
                taken.append(int(entry[len(prefix):]))
    rejected_root = os.path.join(table_root, "_rejected")
    if os.path.isdir(rejected_root):
        for entry in os.listdir(rejected_root):
            core = entry.removeprefix("v").split(".")[0]
            if entry.startswith("v") and core.isdigit():
                taken.append(int(core))
    return max(taken) + 1


def publish(
    spark: SparkSession,
    df: DataFrame,
    table_root: str,
    audits: Sequence[tuple[str, Audit]] = (),
) -> tuple[bool, int | None, list[str]]:
    """Stage ``df``, audit the staged read-back, flip the manifest.

    Returns ``(published, version, failures)``: on success the new
    version number and no failures; on audit failure the manifest is
    untouched, the staged directory is quarantined under ``_rejected/``
    with the failure report beside it, and the failing audit messages
    come back to the caller.
    """
    os.makedirs(table_root, exist_ok=True)
    version = _next_version(table_root)
    staged = os.path.join(table_root, f"_staging_v{version}")
    df.write.mode("overwrite").parquet(staged)

    # audit the STAGED BYTES — the exact files a reader would scan
    staged_df = spark.read.parquet(staged)
    failures = []
    for name, audit in audits:
        ok, detail = audit(staged_df)
        if not ok:
            failures.append(f"{name}: {detail}")
    if failures:
        rejected = os.path.join(table_root, "_rejected", f"v{version}")
        os.makedirs(os.path.dirname(rejected), exist_ok=True)
        shutil.move(staged, rejected)
        with open(rejected + ".audit_failures.json", "w") as fh:
            json.dump(failures, fh)
        return False, None, failures

    final = os.path.join(table_root, f"v{version}")
    os.rename(staged, final)
    tmp = _manifest_path(table_root) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"version": version, "path": final}, fh)
    os.replace(tmp, _manifest_path(table_root))  # the atomic publish
    return True, version, []


def rollback(table_root: str, version: int) -> None:
    """Point the manifest back at an already-published version —
    metadata-only instant rollback; no data files move."""
    final = os.path.join(table_root, f"v{version}")
    if not os.path.isdir(final):
        raise FileNotFoundError(f"version {version} was never published: {final}")
    tmp = _manifest_path(table_root) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"version": version, "path": final}, fh)
    os.replace(tmp, _manifest_path(table_root))


def read_published(spark: SparkSession, table_root: str) -> DataFrame:
    """Read whatever version the manifest currently points at."""
    with open(_manifest_path(table_root)) as fh:
        manifest = json.load(fh)
    return spark.read.parquet(manifest["path"])
