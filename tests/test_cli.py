"""CLI adapter: verb dispatch and the reference's exit-code contract
(E1/E2: delete & move exit 200 on zero matches; upload/download no-op)."""

from __future__ import annotations

import pytest

from azurestorage_blueprints_spark import cli


@pytest.fixture()
def tree(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    for name in ("a.csv", "b.csv", "notes.txt"):
        (src / name).write_bytes(f"data-{name}".encode())
    dst = tmp_path / "dst"
    dst.mkdir()
    return src, dst


def test_upload_regex_basenames(spark, tree):
    src, dst = tree
    rc = cli.main(
        [
            "upload",
            "--source-root", str(src),
            "--destination-root", str(dst),
            "--source-file-name", r".*\.csv",
            "--source-file-name-match-type", "regex_match",
        ]
    )
    assert rc == 0
    # no destination name provided → P3 basename fallback, no enumeration
    assert sorted(p.name for p in dst.iterdir()) == ["a.csv", "b.csv"]
    assert (dst / "a.csv").read_bytes() == b"data-a.csv"


def test_upload_regex_enumerates_provided_name(spark, tree):
    src, dst = tree
    rc = cli.main(
        [
            "upload",
            "--source-root", str(src),
            "--destination-root", str(dst),
            "--source-file-name", r".*\.csv",
            "--source-file-name-match-type", "regex_match",
            "--destination-file-name", "out.csv",
        ]
    )
    assert rc == 0
    # provided name + regex path → always enumerated, even for the first
    # match (upload_file.py:220): out_1.csv, out_2.csv
    assert sorted(p.name for p in dst.iterdir()) == ["out_1.csv", "out_2.csv"]


def test_delete_no_match_exits_200(spark, tree):
    src, _ = tree
    rc = cli.main(
        [
            "delete",
            "--source-root", str(src),
            "--source-file-name", r"nothing-matches-\d+",
            "--source-file-name-match-type", "regex_match",
        ]
    )
    assert rc == 200  # EXIT_CODE_NO_MATCHES_FOUND (delete_file.py:122-124)
    assert len(list(src.iterdir())) == 3  # nothing deleted


def test_download_no_match_is_noop(spark, tree):
    src, dst = tree
    rc = cli.main(
        [
            "download",
            "--source-root", str(src),
            "--destination-root", str(dst),
            "--source-file-name", r"nothing-matches-\d+",
            "--source-file-name-match-type", "regex_match",
        ]
    )
    assert rc == 0  # upload/download fall through silently (download_file.py:213)
    assert list(dst.iterdir()) == []


def test_move_single_match_keeps_name(spark, tree):
    src, dst = tree
    rc = cli.main(
        [
            "move",
            "--source-root", str(src),
            "--destination-root", str(dst),
            "--source-file-name", r"notes\.txt",
            "--source-file-name-match-type", "regex_match",
        ]
    )
    assert rc == 0
    # move suppresses the _N suffix for a single match (move_file.py:135)
    assert [p.name for p in dst.iterdir()] == ["notes.txt"]
    assert not (src / "notes.txt").exists()


def test_delete_exact(spark, tree):
    src, _ = tree
    rc = cli.main(
        [
            "delete",
            "--source-root", str(src),
            "--source-file-name", str(src / "a.csv"),
        ]
    )
    assert rc == 0
    assert sorted(p.name for p in src.iterdir()) == ["b.csv", "notes.txt"]
