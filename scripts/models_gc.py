"""Model-store garbage collection (r9 verdict task 7).

The persisted model tables under ``models/`` are written on first use
with a path that encodes geometry version + dataset basename + dataset
content fingerprint. That path law guarantees a stale table is never
silently REUSED — but nothing deletes one, so version bumps, dataset
regenerations, and retired model names accumulate orphans forever.
This CLI lists every model table as live/orphaned against the data
dirs that currently exist, and removes orphans with ``--delete``.

Usage:  python scripts/models_gc.py [--delete] [data_dir ...]
        (default data dirs: /root/testdata/sf* plus the repo-local
        .localdata/sf1 and .localdata/sf10_pairs when present)
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def default_data_dirs() -> list[str]:
    dirs = sorted(glob.glob("/root/testdata/sf*"))
    for local in ("sf1", "sf10_pairs"):
        p = os.path.join(REPO, ".localdata", local)
        if os.path.isdir(p):
            dirs.append(p)
    return dirs


def main(argv: list[str]) -> int:
    from azurestorage_blueprints_spark.queries.similarity import models_gc

    delete = "--delete" in argv
    dirs = [a for a in argv if not a.startswith("--")] or default_data_dirs()
    keep, orphans = models_gc(dirs, delete=delete)
    for e in keep:
        print(f"live    {e}")
    for e in orphans:
        print(f"{'deleted' if delete else 'ORPHAN'} {e}")
    print(f"== {len(keep)} live, {len(orphans)} orphaned against {len(dirs)} data dirs")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
