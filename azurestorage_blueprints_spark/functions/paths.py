"""File-name / path projections as pure Spark Column expressions.

These re-express the reference's name-manipulation helpers (SURVEY.md
P1-P6) as JVM-side column expressions — no Python UDFs — so they run
inside whole-stage codegen and are usable in any DataFrame plan at any
scale. Reference semantics (file:line cites against
``/root/reference/azurestorage_blueprints/``):

- P1 basename            — ``upload_file.py:61-67``  (``os.path.basename``)
- P2 enumerated rename   — ``upload_file.py:70-81``  (``_{n}`` before the
  FIRST dot: ``archive.tar.gz`` → ``archive_1.tar.gz``; append if no dot)
- P3 destination-name    — ``upload_file.py:84-104`` (provided-name ▷
  enumerated ▷ basename fallback)
- P4 folder normalize    — ``upload_file.py:107-115`` (strip ``/``,
  normpath-collapse duplicate slashes)
- P5 path concat         — ``upload_file.py:118-127`` (conditional ``/``)
- P6 full destination    — ``upload_file.py:130-144`` (P3 ∘ P5)

Every expression has a straightforward ANSI-SQL twin (DuckDB dialect)
used by the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def basename(path: Column) -> Column:
    """P1: final path segment (``os.path.basename`` semantics for
    ``/``-delimited names; a trailing ``/`` yields an empty basename)."""
    return F.element_at(F.split(path, "/"), -1)


def enumerate_file_name(name: Column, file_number: Column) -> Column:
    """P2: collision-avoidance rename.

    Inserts ``_{n}`` before the FIRST ``.`` if the name contains a dot
    (``re.sub(r'\\.', f'_{n}.', name, 1)`` in the reference), else
    appends ``_{n}``. ``file_number`` NULL means "no enumeration" and
    returns the name unchanged (move's single-match rule,
    ``move_file.py:135``).
    """
    # anchored first-dot pattern: everything before the first dot, the dot,
    # then the rest. Spark regexp_replace replaces all matches, so anchor
    # with ^ to guarantee a single replacement site.
    renamed = F.when(
        name.contains("."),
        F.regexp_replace(
            name, r"^([^.]*)\.", F.concat(F.lit("$1_"), file_number.cast("string"), F.lit("."))
        ),
    ).otherwise(F.concat(name, F.lit("_"), file_number.cast("string")))
    return F.when(file_number.isNull(), name).otherwise(renamed)


def determine_destination_file_name(
    source_path: Column, destination_file_name: Column, file_number: Column
) -> Column:
    """P3: provided-name ▷ enumerated-name ▷ basename fallback.

    Matches ``determine_destination_file_name`` (``upload_file.py:84-104``):
    when a destination name is provided AND a file_number is present, the
    *provided* name is enumerated; a NULL destination name falls back to
    the source basename (never enumerated on the exact-match path).
    """
    # reference uses Python truthiness: empty string == "not provided"
    provided = destination_file_name.isNotNull() & (destination_file_name != "")
    return (
        F.when(provided & file_number.isNotNull(), enumerate_file_name(destination_file_name, file_number))
        .when(provided, destination_file_name)
        .otherwise(basename(source_path))
    )


def clean_folder_name(folder: Column) -> Column:
    """P4: strip leading/trailing ``/`` and collapse duplicate slashes
    (the reference uses ``strip('/')`` + ``os.path.normpath``,
    ``upload_file.py:107-115``). NULL/empty folder → empty string."""
    stripped = F.regexp_replace(F.coalesce(folder, F.lit("")), r"^/+|/+$", "")
    return F.regexp_replace(stripped, r"/+", "/")


def combine_folder_and_file_name(folder: Column, file_name: Column) -> Column:
    """P5: join folder and file with a single ``/``; empty folder yields
    the bare file name (``upload_file.py:118-127``)."""
    cleaned = clean_folder_name(folder)
    return F.when(cleaned == "", file_name).otherwise(
        F.concat_ws("/", cleaned, file_name)
    )


def determine_destination_full_path(
    destination_folder_name: Column,
    destination_file_name: Column,
    source_full_path: Column,
    file_number: Column,
) -> Column:
    """P6: the full destination path — P3 composed with P5
    (``upload_file.py:130-144``)."""
    name = determine_destination_file_name(source_full_path, destination_file_name, file_number)
    return combine_folder_and_file_name(destination_folder_name, name)
