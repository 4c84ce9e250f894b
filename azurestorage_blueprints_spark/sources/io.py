"""Multi-format table IO — the engine's source/sink surface.

The reference moves opaque files (SURVEY.md §2.1 S1/S2, K1-K4); the
engine additionally reads and writes STRUCTURED tables in the formats
a Spark pipeline meets in practice. One reader/writer pair, format as
a parameter, so every query in the registry can run against any
supported encoding of the same data.

Formats and their scale posture:

- ``parquet``  — the default: columnar, predicate pushdown + column
  pruning reach the scan, splittable, per-column compression.
- ``csv`` / ``json`` — interchange formats. Schema should be supplied
  (or read from a sibling parquet) — inference costs an extra full
  scan at 100 TB. Both splittable (json = JSON Lines).
- ``text``     — one string column per line; the raw-corpus source.
- ``binaryFile`` — read-only by Spark design: (path, modificationTime,
  length, content) — the multimodal ingestion source (documents,
  images, audio). Binary WRITES go through the catalog verbs
  (operators/verbs.py) which stream bytes inside executors.

Write modes map the reference's per-verb overwrite matrix
(upload = errorifexists, download/move = overwrite; SURVEY.md §2.1).
``partition_by`` produces Hive-style partition directories so
equality/range filters on those columns prune entire directories at
listing time — the 100 TB analogue of the reference's server-side
prefix pushdown (``download_file.py:151``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

READ_FORMATS = ("parquet", "csv", "json", "text", "binaryFile", "orc")
WRITE_FORMATS = ("parquet", "csv", "json", "text", "orc")

#: options applied when the caller supplies none, chosen so that a
#: write→read round-trip is lossless where the format permits
_DEFAULT_READ_OPTIONS: dict[str, dict[str, str]] = {
    "csv": {"header": "true", "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"},
    "json": {"timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"},
}
_DEFAULT_WRITE_OPTIONS: dict[str, dict[str, str]] = {
    "csv": {"header": "true", "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"},
    "json": {"timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"},
}


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read a table; ``schema`` is required for csv/json at scale
    (inference is a full extra pass) but optional for convenience."""
    if fmt not in READ_FORMATS:
        raise ValueError(f"unsupported read format {fmt!r}; expected one of {READ_FORMATS}")
    opts = {**_DEFAULT_READ_OPTIONS.get(fmt, {}), **options}
    reader = spark.read.format(fmt).options(**opts)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt == "csv":
        reader = reader.option("inferSchema", "true")
    return reader.load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "errorifexists",
    partition_by: tuple[str, ...] = (),
    **options: str,
) -> None:
    """Write a table. ``mode`` ∈ {errorifexists, overwrite, append,
    ignore} — the reference's upload verb is ``errorifexists``,
    download/move are ``overwrite``. ``partition_by`` emits Hive-style
    ``col=value/`` directories for partition pruning."""
    if fmt not in WRITE_FORMATS:
        raise ValueError(f"unsupported write format {fmt!r}; expected one of {WRITE_FORMATS}")
    opts = {**_DEFAULT_WRITE_OPTIONS.get(fmt, {}), **options}
    writer = df.write.format(fmt).mode(mode).options(**opts)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
