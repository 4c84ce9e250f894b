"""File-catalog DataFrame: the engine's reification of a blob/file namespace.

The reference's unit of data is a file identified by its name in a
container/folder namespace (SURVEY.md §1.1). The engine turns that
namespace into a DataFrame — ``(path, folder, file, size, mtime)`` —
so every reference verb becomes a relational query:

- S1 local scan  (``upload_file.py:147-155`` recursive glob)  →
  ``binaryFile`` source with ``recursiveFileLookup``
- S2 prefix-pushdown scan (``download_file.py:144-151``
  ``list_blobs(prefix=...)``) → ``pathGlobFilter`` / path prefix in the
  load URI, which Spark's file index applies during listing (server-side
  for object stores)
- F1 regex filter (``upload_file.py:158-167``) → ``rlike`` (both are
  unanchored-search semantics)
- F2 exact match → equality predicate

Listing is distributed (Spark's InMemoryFileIndex fans out across
executors for large directories) and the ``content`` column of the
``binaryFile`` source is only read when a verb actually selects it —
column pruning keeps catalog-only operations metadata-only. The same
code path serves ``file://`` (tests) and ``abfss://`` (production
Azure: hierarchical-namespace accounts give atomic rename, which the
move verb exploits just like the reference's server-side copy,
``move_file.py:97``).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azurestorage_blueprints_spark.functions.paths import basename

#: match-type enum mirroring the reference CLI contract
#: (``upload_file.py:16-22`` choices={'exact_match','regex_match'})
EXACT_MATCH = "exact_match"
REGEX_MATCH = "regex_match"


def scan(
    spark: SparkSession,
    root: str,
    *,
    recursive: bool = True,
    glob: str | None = None,
    with_content: bool = False,
    prefix: str | None = None,
) -> DataFrame:
    """Build the catalog DataFrame for a directory / container root.

    ``glob`` is pushed into the file listing (``pathGlobFilter``) and
    ``prefix`` narrows the listing to ``root/prefix`` while keeping
    ``rel_path`` relative to ``root`` — together the engine's analogue
    of the reference's server-side prefix pushdown
    (``list_blobs(prefix=...)``, ``download_file.py:151``: the listing
    is folder-scoped but returned blob names stay container-relative).
    """
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true" if recursive else "false")
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    load_path = f"{root.rstrip('/')}/{prefix.strip('/')}" if prefix else root
    df = reader.load(load_path)
    cols = [
        F.col("path"),
        F.col("length").alias("size"),
        F.col("modificationTime").alias("mtime"),
    ]
    if with_content:
        cols.append(F.col("content"))
    df = df.select(*cols)
    # strip the file: scheme so paths compare like the reference's os paths
    df = df.withColumn("path", F.regexp_replace("path", "^file:", ""))
    # root-relative path = the reference's "blob name": download/move/
    # delete match patterns against the container-relative name, not the
    # absolute URI (download_file.py:160, delete_file.py:73, move_file.py:74)
    root_plain = re.sub("^file:", "", root).rstrip("/")
    if "://" not in root_plain:
        root_plain = os.path.abspath(root_plain)
    df = df.withColumn(
        "rel_path", F.regexp_replace("path", "^" + re.escape(root_plain) + "/?", "")
    )
    return df.withColumn("file", basename(F.col("path"))).withColumn(
        "folder",
        F.expr("substring(path, 1, greatest(length(path) - length(file) - 1, 0))"),
    )


def match_files(catalog: DataFrame, pattern: str, match_type: str, *, on: str = "path") -> DataFrame:
    """Apply the reference's predicate-selection semantics (F1/F2).

    ``regex_match`` is unanchored search (Python ``re.search`` ≡ Spark
    ``rlike``); ``exact_match`` is string equality. ``on`` selects which
    column the pattern applies to — the reference matches the absolute
    local path on upload but the container-relative name on
    download/delete/move (SURVEY.md §2.1 fine print).
    """
    if match_type == EXACT_MATCH:
        return catalog.filter(F.col(on) == pattern)
    if match_type == REGEX_MATCH:
        return catalog.filter(F.col(on).rlike(pattern))
    raise ValueError(f"match_type must be {EXACT_MATCH!r} or {REGEX_MATCH!r}, got {match_type!r}")
