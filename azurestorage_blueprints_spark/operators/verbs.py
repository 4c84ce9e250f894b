"""The reference's four pipeline verbs as distributed catalog operations.

upload / download / move / delete (``/root/reference/
azurestorage_blueprints/{upload,download,move,delete}_file.py``)
re-expressed Spark-first:

plan phase (lazy, Catalyst):   scan → match predicate → destination-name
                               projection (P1-P6 column expressions) →
                               enumeration window (X1/X2)
execute phase (distributed):   ``mapPartitions`` over the planned catalog —
                               each executor performs its partition's file
                               operations and emits a status row; the
                               driver never holds the file list in Python
                               memory (100 TB posture: the reference's
                               per-file loop, ``upload_file.py:215``,
                               becomes task parallelism).

Per-verb semantic matrix preserved from the reference (SURVEY.md §2.1):

| verb     | overwrite        | empty-match policy      | enumeration (regex path)     |
|----------|------------------|-------------------------|------------------------------|
| upload   | never (error)    | noop (:213)             | always, _1.. (:220)          |
| download | yes (:181)       | noop (:213)             | always, _1.. (:219)          |
| move     | yes (:97)        | error 200 (:126-128)    | only if >1 match (:135)      |
| delete   | n/a              | error 200 (:122-124)    | n/a                          |

Deviation (documented): the reference enumerates files in service-listing
order; the engine enumerates in lexicographic path order (row_number over
orderBy(path)) so results are deterministic under distribution.

Transport: ``file://`` paths are handled with portable Python I/O inside
the executor task. An ``abfss://`` / cloud path would use the same planned
catalog with the Azure SDK inside ``_execute`` (import-gated; not bundled
in this environment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from azurestorage_blueprints_spark.catalog import REGEX_MATCH, match_files, scan
from azurestorage_blueprints_spark.errors import (
    AlreadyExistsError,
    DeleteError,
    MoveError,
    NoMatchesFoundError,
)
from azurestorage_blueprints_spark.functions.paths import (
    determine_destination_full_path,
)

_STATUS_SCHEMA = "source_path string, dest_path string, status string, detail string"


def _plan(
    spark: SparkSession,
    source_root: str,
    pattern: str,
    match_type: str,
    destination_folder: str | None,
    destination_file_name: str | None,
    *,
    enumerate_always: bool,
) -> DataFrame:
    """Build the lazy verb plan: matched catalog + dest_path column."""
    cat = match_files(scan(spark, source_root), pattern, match_type)
    n_total = F.count(F.lit(1)).over(Window.partitionBy())
    rn = F.row_number().over(Window.orderBy("path"))
    if match_type == REGEX_MATCH:
        if enumerate_always:
            # upload/download: always enumerate on the regex path, even a
            # single match gets _1 (upload_file.py:220, download_file.py:219)
            file_number = rn
        else:
            # move: suppress the suffix when exactly one match (move_file.py:135)
            file_number = F.when(n_total > 1, rn).otherwise(F.lit(None))
    else:
        file_number = F.lit(None).cast("int")
    dest = determine_destination_full_path(
        F.lit(destination_folder or ""),
        F.lit(destination_file_name),
        F.col("path"),
        file_number,
    )
    return cat.withColumn("dest_path", dest)


def _execute(plan: DataFrame, op: str, dest_root: str | None) -> DataFrame:
    """Run the verb distributed; returns the status DataFrame (collected
    small — one row per file operated on, not per byte).

    The worker is a self-contained nested closure (stdlib imports only)
    so cloudpickle serializes it by value — executors do not need this
    package importable on their own ``sys.path``.
    """
    plan_cols = plan
    if dest_root is not None:
        plan_cols = plan.withColumn(
            "dest_path", F.concat_ws("/", F.lit(dest_root.rstrip("/")), F.col("dest_path"))
        )

    def worker(batches):
        import os as _os
        import shutil as _shutil

        import pandas as pd

        def run_one(src, dst):
            try:
                if op == "delete":
                    _os.remove(src)
                    return (src, None, "ok", None)
                _os.makedirs(_os.path.dirname(dst) or ".", exist_ok=True)
                if op == "upload":
                    # never-overwrite: O_EXCL gives an atomic existence check
                    with open(src, "rb") as fin, open(
                        _os.open(dst, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY), "wb"
                    ) as fout:
                        _shutil.copyfileobj(fin, fout)
                elif op == "download":
                    with open(src, "rb") as fin, open(dst, "wb") as fout:
                        _shutil.copyfileobj(fin, fout)
                elif op == "move":
                    _shutil.copy(src, dst)
                    _os.remove(src)
                return (src, dst, "ok", None)
            except FileExistsError:
                return (src, dst, "exists", None)
            except OSError as ex:
                return (src, dst, "error", str(ex))

        for pdf in batches:
            out = [
                run_one(r["path"], r.get("dest_path"))
                for r in pdf.to_dict("records")
            ]
            yield pd.DataFrame(out, columns=["source_path", "dest_path", "status", "detail"])

    return plan_cols.select("path", *(["dest_path"] if op != "delete" else [])).mapInPandas(
        worker, schema=_STATUS_SCHEMA
    )


def _check_empty(status_rows: list, on_empty: str) -> None:
    if not status_rows and on_empty == "error":
        # delete & move sys.exit(200) on zero matches (delete_file.py:122-124)
        raise NoMatchesFoundError("no files matched the predicate")


def upload(
    spark: SparkSession,
    source_root: str,
    pattern: str,
    match_type: str,
    destination_root: str,
    destination_folder: str | None = None,
    destination_file_name: str | None = None,
) -> list:
    """K1: local → store. Never overwrites (ResourceExistsError semantics,
    ``upload_file.py:184,188-190``); zero matches is a silent no-op."""
    plan = _plan(
        spark, source_root, pattern, match_type, destination_folder, destination_file_name,
        enumerate_always=True,
    )
    rows = _execute(plan, "upload", destination_root).collect()
    _check_empty(rows, "noop")
    exists = [r for r in rows if r.status == "exists"]
    if exists:
        raise AlreadyExistsError(
            f"destination exists (upload never overwrites): {exists[0].dest_path}"
        )
    return rows


def download(
    spark: SparkSession,
    source_root: str,
    pattern: str,
    match_type: str,
    destination_root: str,
    destination_folder: str | None = None,
    destination_file_name: str | None = None,
) -> list:
    """K2: store → local. Overwrites (plain 'wb' open, ``download_file.py:181``);
    zero matches is a silent no-op."""
    plan = _plan(
        spark, source_root, pattern, match_type, destination_folder, destination_file_name,
        enumerate_always=True,
    )
    rows = _execute(plan, "download", destination_root).collect()
    _check_empty(rows, "noop")
    bad = [r for r in rows if r.status == "error"]
    if bad:
        raise MoveError(f"download failed: {bad[0].detail}")
    return rows


def move(
    spark: SparkSession,
    source_root: str,
    pattern: str,
    match_type: str,
    destination_root: str,
    destination_folder: str | None = None,
    destination_file_name: str | None = None,
) -> list:
    """K3: copy + delete. Overwrites; errors on zero matches (exit 200);
    enumerates only when more than one file matched (``move_file.py:135``)."""
    plan = _plan(
        spark, source_root, pattern, match_type, destination_folder, destination_file_name,
        enumerate_always=False,
    )
    rows = _execute(plan, "move", destination_root).collect()
    _check_empty(rows, "error")
    bad = [r for r in rows if r.status == "error"]
    if bad:
        raise MoveError(f"move failed: {bad[0].detail}")
    return rows


def delete(spark: SparkSession, source_root: str, pattern: str, match_type: str) -> list:
    """K4: delete matched files. Errors on zero matches (exit 200,
    ``delete_file.py:122-124``)."""
    cat = match_files(scan(spark, source_root), pattern, match_type)
    rows = _execute(cat, "delete", None).collect()
    _check_empty(rows, "error")
    bad = [r for r in rows if r.status == "error"]
    if bad:
        raise DeleteError(f"delete failed: {bad[0].detail}")
    return rows
