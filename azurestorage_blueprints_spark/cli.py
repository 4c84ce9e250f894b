"""CLI adapter: the reference's four entry points on the Spark engine.

Mirrors the argparse surface of
``/root/reference/azurestorage_blueprints/{upload,download,move,delete}_file.py``
(C2 in SURVEY.md §2.1: ``--source-file-name`` required,
``--source-file-name-match-type`` ∈ {exact_match, regex_match},
optional source/destination folder and destination file name) and maps
the engine's typed exceptions back to the reference's integer exit
codes (E1) so pipeline orchestrators keep the same contract:

    python -m azurestorage_blueprints_spark.cli upload \
        --source-root /data/in --destination-root /data/out \
        --source-file-name '.*\\.csv' --source-file-name-match-type regex_match

Containers become filesystem/object-store roots (``file://`` locally,
``abfss://`` on Azure); everything else is verb-for-verb identical.
"""

from __future__ import annotations

import argparse
import sys
from collections.abc import Sequence

from azurestorage_blueprints_spark.catalog import EXACT_MATCH, REGEX_MATCH
from azurestorage_blueprints_spark.errors import EngineError
from azurestorage_blueprints_spark.operators import verbs
from azurestorage_blueprints_spark.session import get_spark

VERBS = ("upload", "download", "move", "delete")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="azurestorage_blueprints_spark")
    sub = p.add_subparsers(dest="verb", required=True)
    for verb in VERBS:
        sp = sub.add_parser(verb)
        sp.add_argument("--source-root", dest="source_root", required=True)
        sp.add_argument("--source-file-name", dest="pattern", required=True)
        sp.add_argument(
            "--source-file-name-match-type",
            dest="match_type",
            default=EXACT_MATCH,
            choices={EXACT_MATCH, REGEX_MATCH},
        )
        if verb != "delete":  # delete has no destination args (C2)
            sp.add_argument("--destination-root", dest="destination_root", required=True)
            sp.add_argument(
                "--destination-folder-name", dest="destination_folder", default=None
            )
            sp.add_argument(
                "--destination-file-name", dest="destination_file_name", default=None
            )
    return p


def main(argv: Sequence[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark = get_spark(app_name=f"cli-{args.verb}")
    try:
        if args.verb == "delete":
            verbs.delete(spark, args.source_root, args.pattern, args.match_type)
        else:
            fn = getattr(verbs, args.verb)
            fn(
                spark,
                args.source_root,
                args.pattern,
                args.match_type,
                args.destination_root,
                destination_folder=args.destination_folder,
                destination_file_name=args.destination_file_name,
            )
    except EngineError as e:
        print(f"error: {e}", file=sys.stderr)
        return e.exit_code
    return 0


if __name__ == "__main__":
    sys.exit(main())
