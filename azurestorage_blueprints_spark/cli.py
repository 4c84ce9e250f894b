"""CLI adapter: the reference's four entry points on the Spark engine.

Drop-in parity with the argparse surface of
``/root/reference/azurestorage_blueprints/{upload,download,move,delete}_file.py``
(C2 in SURVEY.md §2.1): the reference's exact argv —

    upload --container-name c --connection-string 'AccountName=...;AccountKey=...' \
           --source-file-name '.*\\.csv' --source-file-name-match-type regex_match \
           --source-folder-name in --destination-folder-name out

— parses and runs unchanged. ``--connection-string`` (C1) is parsed
into Hadoop ABFS conf keys (``fs.azure.account.key.*`` / SAS fixed
token, see ``credentials.py``) and applied to the session before the
verb plans; ``--container-name`` resolves to the ``abfss://`` container
root (or a local root via ``$SPARK_GRAFT_CONTAINER_ROOT_TEMPLATE`` for
Azure-free runs).

The engine additionally accepts explicit ``--source-root`` /
``--destination-root`` filesystem roots (``file://`` locally, any
Hadoop-supported scheme in production) as the Spark-native spelling;
exactly one of the two forms is required. Typed engine exceptions map
back to the reference's integer exit codes (E1).

Per-verb root resolution under ``--container-name`` (mirrors the
reference's data flow):

| verb     | source side                             | destination side          |
|----------|-----------------------------------------|---------------------------|
| upload   | local cwd (+ ``--source-folder-name``)  | container root            |
| download | container root                          | local cwd                 |
| move     | container root                          | container root (same)     |
| delete   | container root                          | —                         |

(upload reads local files under ``cwd/<source-folder-name>``,
``upload_file.py:147-155,203-205``; download writes into cwd,
``download_file.py:196-204``; move/delete act within the container.)
"""

from __future__ import annotations

import argparse
import os
import sys
from collections.abc import Sequence

from azurestorage_blueprints_spark.catalog import EXACT_MATCH, REGEX_MATCH
from azurestorage_blueprints_spark.credentials import (
    apply_connection_string,
    container_root,
)
from azurestorage_blueprints_spark.errors import EngineError
from azurestorage_blueprints_spark.operators import verbs
from azurestorage_blueprints_spark.session import get_spark

VERBS = ("upload", "download", "move", "delete")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="azurestorage_blueprints_spark")
    sub = p.add_subparsers(dest="verb", required=True)
    for verb in VERBS:
        sp = sub.add_parser(verb)
        # --- reference-contract arguments (C2, upload_file.py:10-47) ---
        sp.add_argument("--container-name", dest="container_name", default=None)
        sp.add_argument("--connection-string", dest="connection_string", default=None)
        sp.add_argument("--source-file-name", dest="pattern", required=True)
        sp.add_argument(
            "--source-file-name-match-type",
            dest="match_type",
            default=EXACT_MATCH,
            choices={EXACT_MATCH, REGEX_MATCH},
        )
        sp.add_argument("--source-folder-name", dest="source_folder", default="")
        # --- engine-native explicit roots (Spark spelling) ---
        sp.add_argument("--source-root", dest="source_root", default=None)
        if verb != "delete":  # delete has no destination args (C2)
            sp.add_argument("--destination-root", dest="destination_root", default=None)
            sp.add_argument(
                "--destination-folder-name", dest="destination_folder", default=""
            )
            sp.add_argument(
                "--destination-file-name", dest="destination_file_name", default=None
            )
    return p


def _join_root(root: str, folder: str) -> str:
    return f"{root.rstrip('/')}/{folder.strip('/')}" if folder else root


def resolve_invocation(args: argparse.Namespace) -> dict:
    """Per-verb verb-call arguments from either CLI form.

    Returns the keyword set for the ``verbs.<verb>`` call:
    ``source_root``, ``pattern``, ``destination_root`` and
    ``source_prefix`` (the S2 listing-prefix — the matched name stays
    root-relative, exactly like ``list_blobs(prefix=...)`` returning
    full blob names, ``download_file.py:144-151``).
    """
    pattern = args.pattern
    if args.container_name:
        croot = container_root(args.container_name, args.connection_string)
        cwd = os.getcwd()
        if args.verb == "upload":
            # upload reads the local tree under cwd/<source-folder-name>
            # and matches the ABSOLUTE local path (upload_file.py:153-164);
            # exact_match resolves the name against that folder (:203-205)
            source_root = _join_root(cwd, args.source_folder)
            if args.match_type == EXACT_MATCH:
                pattern = f"{source_root.rstrip('/')}/{pattern}"
            return {
                "source_root": source_root,
                "pattern": pattern,
                "destination_root": croot,
                "source_prefix": None,
            }
        dest = {"download": cwd, "move": croot, "delete": None}[args.verb]
        # download/move/delete match the container-relative blob NAME
        # (folder prefix included); exact_match resolves folder/file
        # via combine_folder_and_file_name (download_file.py:196-198)
        if args.match_type == EXACT_MATCH and args.source_folder:
            pattern = f"{args.source_folder.strip('/')}/{pattern}"
        return {
            "source_root": croot,
            "pattern": pattern,
            "destination_root": dest,
            "source_prefix": args.source_folder or None,
        }
    if not args.source_root:
        raise EngineError("either --container-name or --source-root is required")
    dest = getattr(args, "destination_root", None)
    if args.verb != "delete" and dest is None:
        raise EngineError("either --container-name or --destination-root is required")
    return {
        "source_root": args.source_root,
        "pattern": pattern,
        "destination_root": dest,
        "source_prefix": (args.source_folder or None) if args.verb != "upload" else None,
    }


def main(argv: Sequence[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark = get_spark(app_name=f"cli-{args.verb}")
    try:
        if args.connection_string:
            # C1: credential injection — CLI value overrides any system
            # default, like set_environment_variables (upload_file.py:50-58)
            apply_connection_string(spark, args.connection_string)
        inv = resolve_invocation(args)
        if args.verb == "delete":
            verbs.delete(
                spark, inv["source_root"], inv["pattern"], args.match_type,
                source_prefix=inv["source_prefix"],
            )
        elif args.verb == "upload":
            verbs.upload(
                spark, inv["source_root"], inv["pattern"], args.match_type,
                inv["destination_root"],
                destination_folder=args.destination_folder or None,
                destination_file_name=args.destination_file_name,
            )
        else:
            fn = getattr(verbs, args.verb)
            fn(
                spark, inv["source_root"], inv["pattern"], args.match_type,
                inv["destination_root"],
                destination_folder=args.destination_folder or None,
                destination_file_name=args.destination_file_name,
                source_prefix=inv["source_prefix"],
            )
    except EngineError as e:
        print(f"error: {e}", file=sys.stderr)
        return e.exit_code
    return 0


if __name__ == "__main__":
    sys.exit(main())
