"""Oracle-checked queries for the reference's file-pipeline surface.

The verbs themselves (upload/download/move/delete) are side-effecting
and covered by tests/test_verbs.py; the *relational core* of each verb
— predicate selection (F1/F2), name projections (P1-P6), and the
enumeration window (X1/X2) — is pure and oracle-checkable. These
queries synthesize a file namespace from the ``documents`` table
(source → folder, doc_id → file name) and push it through the exact
column expressions the verbs use, so the driver's DuckDB gate verifies
the reference semantics themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from azurestorage_blueprints_spark.functions import paths as P
from azurestorage_blueprints_spark.queries import register
from azurestorage_blueprints_spark.tables import table


def _namespace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized catalog: //src{N}//doc_{id}.txt[.gz for odd ids]."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "source",
        F.concat(F.lit("//"), "source", F.lit("//")).alias("folder"),
        F.concat(
            F.lit("doc_"),
            F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 2 == 1, ".txt.gz").otherwise(".txt"),
        ).alias("file"),
    )


@register(
    "q_fileops_catalog_projection",
    oracle="""
    WITH ns AS (
      SELECT doc_id,
             '//' || source || '//' AS folder,
             'doc_' || CAST(doc_id AS VARCHAR) ||
               (CASE WHEN doc_id % 2 = 1 THEN '.txt.gz' ELSE '.txt' END) AS file
      FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(folder, '^/+|/+$', '', 'g'), '/+', '/', 'g') AS folder_clean,
           CASE WHEN regexp_replace(regexp_replace(folder, '^/+|/+$', '', 'g'), '/+', '/', 'g') = ''
                THEN file
                ELSE regexp_replace(regexp_replace(folder, '^/+|/+$', '', 'g'), '/+', '/', 'g') || '/' || file
           END AS full_path
    FROM ns
    """,
    doc="P4 folder normalization + P5 path concat as relational projections "
    "(clean_folder_name / combine_folder_and_file_name, upload_file.py:107-127).",
)
def q_fileops_catalog_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ns = _namespace(spark, sf_dir)
    return ns.select(
        "doc_id",
        P.clean_folder_name(F.col("folder")).alias("folder_clean"),
        P.combine_folder_and_file_name(F.col("folder"), F.col("file")).alias("full_path"),
    )


@register(
    "q_fileops_regex_filter",
    oracle="""
    WITH ns AS (
      SELECT doc_id,
             regexp_replace(source, '^/+|/+$', '', 'g') || '/doc_' || CAST(doc_id AS VARCHAR) ||
               (CASE WHEN doc_id % 2 = 1 THEN '.txt.gz' ELSE '.txt' END) AS path
      FROM documents)
    SELECT doc_id, path FROM ns
    WHERE regexp_matches(path, 'src1[0-9]/doc_[0-9]*[37]\\.')
    """,
    doc="F1 regex predicate filter: unanchored search semantics (re.search ≡ rlike ≡ "
    "regexp_matches), matching the reference's find_all_file_matches "
    "(upload_file.py:158-167).",
)
def q_fileops_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ns = _namespace(spark, sf_dir)
    paths = ns.select(
        "doc_id",
        P.combine_folder_and_file_name(F.col("folder"), F.col("file")).alias("path"),
    )
    # sources hold doc_id ≡ k (mod 20), so a single-source pattern can
    # only ever see one last-digit class; match the src1X family against
    # two digit classes so the predicate genuinely partitions the data
    return paths.filter(F.col("path").rlike(r"src1[0-9]/doc_[0-9]*[37]\."))


@register(
    "q_fileops_enumerated_rename",
    oracle="""
    WITH ns AS (
      SELECT doc_id, source,
             'doc_' || CAST(doc_id AS VARCHAR) ||
               (CASE WHEN doc_id % 2 = 1 THEN '.txt.gz' ELSE '.txt' END) AS file
      FROM documents),
    numbered AS (
      SELECT doc_id, source, file,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS fnum,
             count(*)     OVER (PARTITION BY source) AS n_in_group
      FROM ns)
    SELECT doc_id, source, fnum,
           CASE WHEN file LIKE '%.%'
                THEN regexp_replace(file, '^([^.]*)\\.', '\\1_' || CAST(fnum AS VARCHAR) || '.')
                ELSE file || '_' || CAST(fnum AS VARCHAR) END AS renamed,
           CASE WHEN n_in_group > 1
                THEN CASE WHEN file LIKE '%.%'
                          THEN regexp_replace(file, '^([^.]*)\\.', '\\1_' || CAST(fnum AS VARCHAR) || '.')
                          ELSE file || '_' || CAST(fnum AS VARCHAR) END
                ELSE file END AS renamed_move_rule
    FROM numbered
    """,
    doc="P2 first-dot enumeration + X1/X2 windows: row_number per folder replaces the "
    "reference's sequential loop counter (upload_file.py:215, move_file.py:135); "
    "the move rule suppresses the suffix for single-match groups.",
)
def q_fileops_enumerated_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    ns = _namespace(spark, sf_dir).select("doc_id", "source", "file")
    w = Window.partitionBy("source").orderBy("doc_id")
    numbered = ns.withColumn("fnum", F.row_number().over(w)).withColumn(
        "n_in_group", F.count(F.lit(1)).over(Window.partitionBy("source"))
    )
    renamed = P.enumerate_file_name(F.col("file"), F.col("fnum"))
    move_rule = F.when(F.col("n_in_group") > 1, renamed).otherwise(F.col("file"))
    return numbered.select(
        "doc_id",
        "source",
        "fnum",
        renamed.alias("renamed"),
        move_rule.alias("renamed_move_rule"),
    )


@register(
    "q_fileops_basename_dispatch",
    oracle="""
    WITH ns AS (
      SELECT doc_id,
             regexp_replace(source, '^/+|/+$', '', 'g') || '/sub/doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS path
      FROM documents)
    SELECT doc_id, path,
           str_split(path, '/')[-1] AS base,
           (path = 'src3/sub/doc_33.txt') AS is_exact,
           regexp_matches(path, 'doc_3[0-9]\\.txt$') AS is_regex
    FROM ns
    """,
    doc="P1 basename projection + F2 match-type dispatch (exact equality vs regex) "
    "— the per-verb branch at upload_file.py:209 as vectorized predicates.",
)
def q_fileops_basename_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    paths = d.select(
        "doc_id",
        P.combine_folder_and_file_name(
            F.col("source"),
            F.concat(F.lit("sub/doc_"), F.col("doc_id").cast("string"), F.lit(".txt")),
        ).alias("path"),
    )
    return paths.select(
        "doc_id",
        "path",
        P.basename(F.col("path")).alias("base"),
        (F.col("path") == "src3/sub/doc_33.txt").alias("is_exact"),
        F.col("path").rlike(r"doc_3[0-9]\.txt$").alias("is_regex"),
    )


@register(
    "q_fileops_compaction_bins",
    oracle="""
    WITH ns AS (
      SELECT source AS folder,
             'doc_' || CAST(doc_id AS VARCHAR) ||
               (CASE WHEN doc_id % 2 = 1 THEN '.txt.gz' ELSE '.txt' END) AS file,
             n_chars AS bytes
      FROM documents),
    binned AS (
      SELECT folder, file, bytes,
             CAST((sum(bytes) OVER (PARTITION BY folder ORDER BY file
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - bytes) // 4096 AS BIGINT) AS bin
      FROM ns)
    SELECT folder, bin,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(bytes) AS BIGINT) AS total_bytes,
           min(file) AS first_file,
           max(file) AS last_file
    FROM binned GROUP BY folder, bin
    """,
    doc="Small-file compaction planner: greedy bin-packing of a folder's "
    "files into ~4 KiB output groups via a running-sum window (bin = "
    "bytes-before-this-file div target). The maintenance job every "
    "large parquet table needs — billions of small files is the #1 "
    "operational failure mode at 100 TB; this plan shuffles only the "
    "file CATALOG (one row per file), never the data, and each bin maps "
    "to one coalesced rewrite task. Deterministic: files ordered by "
    "name within folder, all-integer arithmetic.",
)
def q_fileops_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    files = d.select(
        F.col("source").alias("folder"),
        F.concat(
            F.lit("doc_"),
            F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 2 == 1, ".txt.gz").otherwise(".txt"),
        ).alias("file"),
        F.col("n_chars").alias("bytes"),
    )
    w = Window.partitionBy("folder").orderBy("file").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    binned = files.withColumn("cum", F.sum("bytes").over(w)).withColumn(
        "bin", F.expr("cast((cum - bytes) div 4096 as bigint)")
    )
    return binned.groupBy("folder", "bin").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("bytes").alias("total_bytes"),
        F.min("file").alias("first_file"),
        F.max("file").alias("last_file"),
    )
