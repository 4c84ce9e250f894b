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
             regexp_replace(regexp_replace(source, '^/+|/+$', '', 'g'), '/+', '/', 'g') || '/doc_' || CAST(doc_id AS VARCHAR) ||
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


# ---------------------------------------------------------------------------
# Catalog sync-diff (r7) — the rsync/azcopy-sync plan the reference's
# verbs execute one file at a time: given a source listing and a stale
# destination listing, classify every path into copy_new /
# overwrite_changed / skip_same / delete_orphan. This is the MERGE
# row-action shape (q_merge_upsert) applied to the FILE CATALOG — the
# reference's never-overwrite upload (upload_file.py:184-190) and
# overwrite download (download_file.py:181-183) are the two executor
# policies this plan feeds. The destination is synthesized
# deterministically: every 3rd doc missing (new), every 5th of the
# rest size-drifted (changed), every 7th doc leaves a '.bak' orphan.


@register(
    "q_fileops_sync_diff",
    oracle="""
    WITH src AS (
      SELECT regexp_replace(regexp_replace(source, '^/+|/+$', '', 'g'), '/+', '/', 'g') || '/doc_' ||
               CAST(doc_id AS VARCHAR) AS path,
             CAST(n_chars AS BIGINT) AS size
      FROM documents
    ),
    dst AS (
      SELECT regexp_replace(regexp_replace(source, '^/+|/+$', '', 'g'), '/+', '/', 'g') || '/doc_' ||
               CAST(doc_id AS VARCHAR) AS path,
             CAST(CASE WHEN doc_id % 5 = 0 THEN n_chars + 17 ELSE n_chars END
                  AS BIGINT) AS size
      FROM documents WHERE doc_id % 3 <> 0
      UNION ALL
      SELECT regexp_replace(regexp_replace(source, '^/+|/+$', '', 'g'), '/+', '/', 'g') || '/doc_' ||
               CAST(doc_id AS VARCHAR) || '.bak' AS path,
             CAST(100 AS BIGINT) AS size
      FROM documents WHERE doc_id % 7 = 0
    ),
    plan AS (
      SELECT CASE
               WHEN d.path IS NULL THEN 'copy_new'
               WHEN s.path IS NULL THEN 'delete_orphan'
               WHEN s.size = d.size THEN 'skip_same'
               ELSE 'overwrite_changed'
             END AS action,
             COALESCE(s.size, d.size) AS bytes
      FROM src s FULL OUTER JOIN dst d ON s.path = d.path
    )
    SELECT action,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(bytes) AS BIGINT) AS total_bytes
    FROM plan GROUP BY action ORDER BY action
    """,
    doc="Sync-plan reconciliation between a source catalog and a stale "
    "destination mirror (the azcopy-sync / rsync planning pass): one "
    "FULL OUTER equi-join on path classifies every file as copy_new / "
    "overwrite_changed / skip_same / delete_orphan with exact byte "
    "totals per action. Extends the reference's per-verb overwrite "
    "matrix (upload never overwrites, upload_file.py:184-190; download "
    "always does, download_file.py:181-183) from one-file-at-a-time "
    "decisions to the whole-namespace plan those verbs would execute. "
    "Shape (100 TB namespace): both listings shuffle once on the path "
    "key for the join; the report is action-cardinality sized. The "
    "destination mirror is synthesized from doc_id residues so the "
    "plan is deterministic and fully oracle-checked.",
)
def q_fileops_sync_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    base_path = F.concat(
        P.clean_folder_name(F.col("source")),
        F.lit("/doc_"),
        F.col("doc_id").cast("string"),
    )
    src = d.select(base_path.alias("path"), F.col("n_chars").cast("bigint").alias("size"))
    dst = (
        d.filter(F.col("doc_id") % 3 != 0)
        .select(
            base_path.alias("path"),
            F.when(F.col("doc_id") % 5 == 0, F.col("n_chars") + 17)
            .otherwise(F.col("n_chars"))
            .cast("bigint")
            .alias("size"),
        )
        .unionAll(
            d.filter(F.col("doc_id") % 7 == 0).select(
                F.concat(base_path, F.lit(".bak")).alias("path"),
                F.lit(100).cast("bigint").alias("size"),
            )
        )
    )
    joined = src.alias("s").join(
        dst.alias("d"), F.col("s.path") == F.col("d.path"), "full_outer"
    )
    plan = joined.select(
        F.when(F.col("d.path").isNull(), F.lit("copy_new"))
        .when(F.col("s.path").isNull(), F.lit("delete_orphan"))
        .when(F.col("s.size") == F.col("d.size"), F.lit("skip_same"))
        .otherwise(F.lit("overwrite_changed"))
        .alias("action"),
        F.coalesce(F.col("s.size"), F.col("d.size")).alias("bytes"),
    )
    return (
        plan.groupBy("action")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("bytes").cast("bigint").alias("total_bytes"),
        )
        .orderBy("action")
    )
