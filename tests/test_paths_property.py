"""Property-based spot checks (SURVEY.md §5.3) for the P1-P6 path
expressions: each Spark column expression is compared against an
independent pure-Python model of the reference's documented semantics
over hypothesis-generated inputs, batched one DataFrame per example
set to keep Spark invocations bounded."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from azurestorage_blueprints_spark.functions import paths as P

# path-ish alphabet: segments, slashes, dots, spaces, underscores
_PATHCHARS = st.text(
    alphabet="abcXYZ019._ /", min_size=0, max_size=30
)
_NAMES = st.text(alphabet="abcXYZ019._ ", min_size=1, max_size=20)


def _clean_model(folder: str) -> str:
    """Reference P4 semantics: strip outer slashes, collapse runs."""
    out = folder.strip("/")
    while "//" in out:
        out = out.replace("//", "/")
    return out


def _eval(spark, rows, expr, schema: str):
    df = spark.createDataFrame(rows, schema)
    return [r.out for r in df.select(expr.alias("out")).collect()]


@settings(max_examples=15, deadline=None)
@given(st.lists(_PATHCHARS, min_size=1, max_size=25))
def test_clean_folder_matches_model_and_is_idempotent(spark, folders):
    rows = [(f,) for f in folders]
    got = _eval(spark, rows, P.clean_folder_name(F.col("f")), "f string")
    want = [_clean_model(f) for f in folders]
    assert got == want
    # idempotence: cleaning a cleaned folder is a no-op
    got2 = _eval(spark, [(g,) for g in got], P.clean_folder_name(F.col("f")), "f string")
    assert got2 == got


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(_PATHCHARS, _NAMES), min_size=1, max_size=25))
def test_combine_model(spark, pairs):
    rows = list(pairs)
    got = _eval(
        spark,
        rows,
        P.combine_folder_and_file_name(F.col("folder"), F.col("file")),
        "folder string, file string",
    )
    for (folder, file), g in zip(pairs, got):
        cleaned = _clean_model(folder)
        assert g == (file if cleaned == "" else f"{cleaned}/{file}")


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(_NAMES, st.integers(1, 99)), min_size=1, max_size=25))
def test_enumerate_first_dot_rule(spark, pairs):
    rows = [(n, i) for n, i in pairs]
    got = _eval(
        spark,
        rows,
        P.enumerate_file_name(F.col("name"), F.col("n")),
        "name string, n int",
    )
    for (name, n), g in zip(pairs, got):
        if "." in name:
            head, tail = name.split(".", 1)
            assert g == f"{head}_{n}.{tail}", (name, n, g)
        else:
            assert g == f"{name}_{n}"


@settings(max_examples=15, deadline=None)
@given(st.lists(_PATHCHARS, min_size=1, max_size=25))
def test_basename_matches_python(spark, paths):
    rows = [(p,) for p in paths]
    got = _eval(spark, rows, P.basename(F.col("p")), "p string")
    want = [p.split("/")[-1] for p in paths]
    assert got == want
