"""Golden-table tests for the P1-P6 name/path projections.

Expected values follow the reference's semantics exactly
(``upload_file.py:61-144``): first-dot enumeration rule, empty-name
fallback to basename, slash normalization. Table-driven over a
single-pass DataFrame so one Spark job checks every case.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azurestorage_blueprints_spark.functions import paths as P

CASES = [
    # (folder, dest_name, source_path, file_number, expected_full_path)
    ("dest", "out.csv", "/src/report.csv", None, "dest/out.csv"),
    ("dest", "out.csv", "/src/report.csv", 2, "dest/out_2.csv"),
    # first-dot rule: multi-extension enumerates before the FIRST dot
    ("dest", "archive.tar.gz", "/src/archive.tar.gz", 1, "dest/archive_1.tar.gz"),
    # no-dot name: suffix appended
    ("dest", "noext", "/src/noext", 3, "dest/noext_3"),
    # no destination name → basename fallback, never enumerated on exact path
    ("dest", None, "/src/nested/deep.txt", None, "dest/deep.txt"),
    # empty destination name behaves as not-provided (Python truthiness)
    ("dest", "", "/src/a.bin", None, "dest/a.bin"),
    # folder normalization: strip + collapse slashes
    ("/nested//b///", "x.txt", "/src/x.txt", None, "nested/b/x.txt"),
    ("", "y.txt", "/src/y.txt", None, "y.txt"),
    (None, "z.txt", "/src/z.txt", None, "z.txt"),
    # enumeration of provided name with number on regex path
    ("out", "data.json", "/src/d1.json", 1, "out/data_1.json"),
    ("out", "data.json", "/src/d2.json", 2, "out/data_2.json"),
]


def test_destination_full_path_golden_table(spark):
    df = spark.createDataFrame(
        [(i, f, d, s, n) for i, (f, d, s, n, _) in enumerate(CASES)],
        "id int, folder string, dest_name string, source string, fnum int",
    )
    out = df.select(
        "id",
        P.determine_destination_full_path(
            F.col("folder"), F.col("dest_name"), F.col("source"), F.col("fnum")
        ).alias("full"),
    ).collect()
    got = {r.id: r.full for r in out}
    for i, (_, _, _, _, expected) in enumerate(CASES):
        assert got[i] == expected, f"case {i}: got {got[i]!r}, want {expected!r}"


@pytest.mark.parametrize(
    "name,num,expected",
    [
        ("report.csv", 1, "report_1.csv"),
        ("archive.tar.gz", 5, "archive_5.tar.gz"),
        ("noext", 2, "noext_2"),
        (".hidden", 1, "_1.hidden"),  # leading dot is still the first dot
        ("a.b.c.d", 9, "a_9.b.c.d"),
    ],
)
def test_enumerate_first_dot_rule(spark, name, num, expected):
    df = spark.range(1).select(
        P.enumerate_file_name(F.lit(name), F.lit(num)).alias("out")
    )
    assert df.first().out == expected


def test_basename(spark):
    df = spark.createDataFrame(
        [("/a/b/c.txt",), ("rel/path.bin",), ("justfile",)], "p string"
    )
    vals = [r[0] for r in df.select(P.basename(F.col("p"))).collect()]
    assert vals == ["c.txt", "path.bin", "justfile"]
