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
    # delete matches the ROOT-RELATIVE name (delete_file.py:73)
    rc = cli.main(
        [
            "delete",
            "--source-root", str(src),
            "--source-file-name", "a.csv",
        ]
    )
    assert rc == 0
    assert sorted(p.name for p in src.iterdir()) == ["b.csv", "notes.txt"]


# ---------------------------------------------------------------------------
# C1/C2: the reference's exact CLI contract — --container-name +
# --connection-string argv (upload_file.py:10-47) runs unchanged.
# ---------------------------------------------------------------------------

_CONN = (
    "DefaultEndpointsProtocol=https;AccountName=testacct;"
    "AccountKey=c2VjcmV0a2V5;EndpointSuffix=core.windows.net"
)


@pytest.fixture()
def container(tmp_path, monkeypatch):
    """A file://-backed 'container' via the root-template override."""
    store = tmp_path / "store"
    (store / "mycontainer" / "in").mkdir(parents=True)
    (store / "mycontainer" / "in" / "data.csv").write_bytes(b"blob-bytes")
    (store / "mycontainer" / "in" / "other.txt").write_bytes(b"text")
    monkeypatch.setenv(
        "SPARK_GRAFT_CONTAINER_ROOT_TEMPLATE", f"file://{store}/{{container}}"
    )
    work = tmp_path / "work"
    work.mkdir()
    monkeypatch.chdir(work)
    return store / "mycontainer", work


def test_reference_argv_download(spark, container):
    croot, work = container
    rc = cli.main(
        [
            "download",
            "--container-name", "mycontainer",
            "--connection-string", _CONN,
            "--source-file-name", r".*\.csv",
            "--source-file-name-match-type", "regex_match",
            "--source-folder-name", "in",
            "--destination-folder-name", "got",
        ]
    )
    assert rc == 0
    # regex path + no destination name → basename fallback... but the
    # reference ALWAYS enumerates regex downloads with a provided name
    # only; basename fallback is never enumerated
    assert (work / "got" / "data.csv").read_bytes() == b"blob-bytes"


def test_reference_argv_download_exact(spark, container):
    croot, work = container
    rc = cli.main(
        [
            "download",
            "--container-name", "mycontainer",
            "--connection-string", _CONN,
            "--source-file-name", "data.csv",
            "--source-folder-name", "in",
        ]
    )
    assert rc == 0
    assert (work / "data.csv").read_bytes() == b"blob-bytes"


def test_reference_argv_upload(spark, container):
    croot, work = container
    (work / "up").mkdir()
    (work / "up" / "local.csv").write_bytes(b"local-bytes")
    rc = cli.main(
        [
            "upload",
            "--container-name", "mycontainer",
            "--connection-string", _CONN,
            "--source-file-name", "local.csv",
            "--source-folder-name", "up",
            "--destination-folder-name", "landed",
        ]
    )
    assert rc == 0
    assert (croot / "landed" / "local.csv").read_bytes() == b"local-bytes"


def test_reference_argv_move_and_delete(spark, container):
    croot, _ = container
    rc = cli.main(
        [
            "move",
            "--container-name", "mycontainer",
            "--connection-string", _CONN,
            "--source-file-name", r"in/data\.csv",
            "--source-file-name-match-type", "regex_match",
            "--destination-folder-name", "archive",
        ]
    )
    assert rc == 0
    assert (croot / "archive" / "data.csv").read_bytes() == b"blob-bytes"
    assert not (croot / "in" / "data.csv").exists()
    rc = cli.main(
        [
            "delete",
            "--container-name", "mycontainer",
            "--connection-string", _CONN,
            "--source-file-name", "other.txt",
            "--source-folder-name", "in",
        ]
    )
    assert rc == 0
    assert not (croot / "in" / "other.txt").exists()


def test_connection_string_maps_to_hadoop_conf(spark):
    from azurestorage_blueprints_spark.credentials import (
        apply_connection_string,
        hadoop_conf_for,
    )

    conf = hadoop_conf_for(_CONN)
    assert conf["fs.azure.account.key.testacct.dfs.core.windows.net"] == "c2VjcmV0a2V5"
    assert conf["fs.azure.account.auth.type.testacct.dfs.core.windows.net"] == "SharedKey"
    applied = apply_connection_string(spark, _CONN)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in applied.items():
        assert hconf.get(k) == v


def test_connection_string_sas_and_errors(spark):
    from azurestorage_blueprints_spark.credentials import hadoop_conf_for
    from azurestorage_blueprints_spark.errors import IncorrectCredentialsError

    sas = hadoop_conf_for("AccountName=a;SharedAccessSignature=sv=2024&sig=x")
    assert sas["fs.azure.account.auth.type.a.dfs.core.windows.net"] == "SAS"
    assert sas["fs.azure.sas.fixed.token.a.dfs.core.windows.net"] == "sv=2024&sig=x"
    with pytest.raises(IncorrectCredentialsError):
        hadoop_conf_for("AccountName=a")  # no key, no SAS
    with pytest.raises(IncorrectCredentialsError):
        hadoop_conf_for("AccountKey=k")  # no account
    with pytest.raises(IncorrectCredentialsError):
        hadoop_conf_for("")
