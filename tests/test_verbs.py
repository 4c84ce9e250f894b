"""End-to-end file-verb tests against tmpdir trees (no Azure dependency).

Exercises the per-verb semantic matrix from SURVEY.md §2.1: byte
identity, collision renaming, the overwrite matrix (upload never /
download+move always), empty-result policies (noop vs error 200),
move's single-match no-suffix rule, per-verb match targets (upload:
absolute path; download/move/delete: root-relative name), and move's
metadata-only rename property.
"""

from __future__ import annotations

import os

import pytest

from azurestorage_blueprints_spark.errors import (
    AlreadyExistsError,
    EngineError,
    NoMatchesFoundError,
)
from azurestorage_blueprints_spark.operators import verbs


@pytest.fixture()
def tree(tmp_path):
    src = tmp_path / "src"
    (src / "nested" / "a").mkdir(parents=True)
    (src / "report.csv").write_bytes(b"csv-data-1")
    (src / "report_old.csv").write_bytes(b"csv-data-2")
    (src / "archive.tar.gz").write_bytes(b"tarball")
    (src / "noext").write_bytes(b"raw")
    (src / "nested" / "a" / "deep.txt").write_bytes(b"deep")
    dst = tmp_path / "dst"
    dst.mkdir()
    return src, dst


def test_upload_regex_enumerates_and_preserves_bytes(spark, tree):
    src, dst = tree
    res = verbs.upload(
        spark, str(src), r"report.*\.csv", "regex_match", str(dst),
        destination_folder="up", destination_file_name="out.csv",
    )
    assert res.total == 2 and res.ok == 2
    # lexicographic path order: report.csv → _1, report_old.csv → _2
    assert (dst / "up" / "out_1.csv").read_bytes() == b"csv-data-1"
    assert (dst / "up" / "out_2.csv").read_bytes() == b"csv-data-2"


def test_upload_single_regex_match_still_enumerates(spark, tree):
    # upload/download always enumerate on the regex path (upload_file.py:220)
    src, dst = tree
    verbs.upload(
        spark, str(src), r"archive\.tar\.gz", "regex_match", str(dst),
        destination_file_name="archive.tar.gz",
    )
    # first-dot rule: _1 goes before .tar.gz
    assert (dst / "archive_1.tar.gz").read_bytes() == b"tarball"


def test_upload_never_overwrites(spark, tree):
    src, dst = tree
    (dst / "report.csv").write_bytes(b"already-here")
    with pytest.raises(AlreadyExistsError):
        verbs.upload(
            spark, str(src), str(src / "report.csv"), "exact_match", str(dst)
        )
    assert (dst / "report.csv").read_bytes() == b"already-here"


def test_upload_raises_on_failed_write(spark, tree):
    # the reference upload raises on any blob upload failure
    # (upload_file.py:188-193); error rows must not be silently dropped
    # (an over-long destination name fails open() with ENAMETOOLONG even
    # when the test runs privileged)
    src, dst = tree
    with pytest.raises(EngineError):
        verbs.upload(
            spark, str(src), str(src / "report.csv"), "exact_match", str(dst),
            destination_file_name="x" * 300 + ".bin",
        )


def test_upload_empty_match_is_noop(spark, tree):
    src, dst = tree
    res = verbs.upload(spark, str(src), r"nomatch\.xyz", "regex_match", str(dst))
    assert res.total == 0


def test_download_overwrites(spark, tree):
    src, dst = tree
    (dst / "report.csv").write_bytes(b"stale")
    # download matches the ROOT-RELATIVE name (download_file.py:160)
    verbs.download(spark, str(src), "report.csv", "exact_match", str(dst))
    assert (dst / "report.csv").read_bytes() == b"csv-data-1"


def test_download_matches_relative_not_absolute(spark, tree):
    src, dst = tree
    # an absolute-path exact pattern must NOT match for download —
    # the reference compares container-relative blob names
    res = verbs.download(
        spark, str(src), str(src / "report.csv"), "exact_match", str(dst)
    )
    assert res.total == 0
    # nested relative name with folder prefix matches
    verbs.download(spark, str(src), "nested/a/deep.txt", "exact_match", str(dst))
    assert (dst / "deep.txt").read_bytes() == b"deep"


def test_move_single_match_no_suffix(spark, tree):
    # move suppresses enumeration when exactly one match (move_file.py:135)
    src, dst = tree
    verbs.move(
        spark, str(src), r"archive.*", "regex_match", str(dst),
        destination_file_name="moved.tar.gz",
    )
    assert (dst / "moved.tar.gz").read_bytes() == b"tarball"
    assert not (src / "archive.tar.gz").exists()


def test_move_is_metadata_only_rename(spark, tree):
    # same-filesystem move must rename, not copy: the inode survives
    # (the reference's move never streams data through the client,
    # move_file.py:97)
    src, dst = tree
    ino = (src / "archive.tar.gz").stat().st_ino
    verbs.move(
        spark, str(src), "archive.tar.gz", "exact_match", str(dst),
        destination_file_name="kept.tar.gz",
    )
    assert (dst / "kept.tar.gz").stat().st_ino == ino


def test_move_multi_match_enumerates_and_deletes_sources(spark, tree):
    src, dst = tree
    verbs.move(
        spark, str(src), r"report.*\.csv", "regex_match", str(dst),
        destination_file_name="m.csv",
    )
    assert (dst / "m_1.csv").read_bytes() == b"csv-data-1"
    assert (dst / "m_2.csv").read_bytes() == b"csv-data-2"
    assert not (src / "report.csv").exists()
    assert not (src / "report_old.csv").exists()


def test_move_empty_match_errors(spark, tree):
    src, dst = tree
    with pytest.raises(NoMatchesFoundError):
        verbs.move(spark, str(src), r"nope", "regex_match", str(dst))


def test_hadoop_rename_on_local_fs(spark, tmp_path):
    # the cloud-store move path, driven directly on file:// — Hadoop
    # FileSystem.rename with mkdirs + overwrite-delete semantics
    a = tmp_path / "a.bin"
    a.write_bytes(b"payload")
    dst = tmp_path / "sub" / "b.bin"
    assert verbs.hadoop_rename(spark, f"file://{a}", f"file://{dst}")
    assert not a.exists()
    assert dst.read_bytes() == b"payload"
    # overwrite: rename onto an existing target replaces it (move semantics)
    c = tmp_path / "c.bin"
    c.write_bytes(b"new-payload")
    assert verbs.hadoop_rename(spark, f"file://{c}", f"file://{dst}")
    assert dst.read_bytes() == b"new-payload"


def test_cloud_move_rename_false_raises_move_error(spark, tmp_path):
    """Pin the cloud-root failure matrix: a Hadoop rename that returns
    False (dest exists on a non-overwriting FS, cross-filesystem rename)
    or throws must surface as MoveError from move() — the engine's
    analogue of the reference's copy-status poll + abort_copy
    (move_file.py:98-104); atomic rename leaves nothing to abort."""
    from azurestorage_blueprints_spark.errors import MoveError

    plan = spark.createDataFrame(
        [("fake://src/x.bin", "x.bin"), ("fake://src/y.bin", "y.bin")],
        "path string, dest_path string",
    )

    calls = []

    def refuse(_spark, src, dst):
        calls.append((src, dst))
        return False

    result = verbs._move_via_hadoop(spark, plan, "fake://dst/", rename=refuse)
    assert result.total == 2
    assert result.counts == {"ok": 0, "error": 2}
    assert [c[1] for c in calls] == ["fake://dst/x.bin", "fake://dst/y.bin"]
    assert all(f[2] == "rename returned false" for f in result.failures)

    # a throwing rename is collected per file, never a stage crash
    def explode(_spark, src, dst):
        raise OSError("wire dropped")

    result = verbs._move_via_hadoop(spark, plan, "fake://dst", rename=explode)
    assert result.counts["error"] == 2 and "wire dropped" in result.failures[0][2]

    # and move() converts collected failures into the typed MoveError,
    # matching the reference's raise on a failed server-side copy
    with pytest.raises(MoveError, match="rename returned false"):
        result = verbs._move_via_hadoop(spark, plan, "fake://dst", rename=refuse)
        if result.failures:
            raise MoveError(f"move failed: {result.failures[0][2]}")


def test_delete_regex(spark, tree):
    src, _ = tree
    verbs.delete(spark, str(src), r"report.*\.csv", "regex_match")
    assert not (src / "report.csv").exists()
    assert not (src / "report_old.csv").exists()
    assert (src / "archive.tar.gz").exists()


def test_delete_empty_match_errors(spark, tree):
    src, _ = tree
    with pytest.raises(NoMatchesFoundError):
        verbs.delete(spark, str(src), r"zzz", "regex_match")


def test_recursive_scan_reaches_nested(spark, tree):
    src, dst = tree
    verbs.download(spark, str(src), r"deep\.txt", "regex_match", str(dst))
    # no destination name → basename fallback, which is NEVER enumerated
    # (determine_destination_file_name, upload_file.py:84-104)
    assert (dst / "deep.txt").read_bytes() == b"deep"


def test_exact_match_no_enumeration(spark, tree):
    src, dst = tree
    verbs.download(spark, str(src), "noext", "exact_match", str(dst))
    assert (dst / "noext").read_bytes() == b"raw"
