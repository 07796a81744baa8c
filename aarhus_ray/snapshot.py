"""CLI: snapshot / restore an index repository.

    python -m aarhus_ray.snapshot create  --index IDX --snap DIR
    python -m aarhus_ray.snapshot restore --snap DIR  --dest IDX2

Pure file operations over an immutable completed index (no Ray session —
see pipelines/maintain.snapshot_index for the consistency argument).
Restore verifies every file's blake2b against the catalog and refuses a
tampered repository, leaving the destination unqueryable (no _INDEX_DONE).
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Snapshot / restore an index")
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("create", help="snapshot a completed index")
    c.add_argument("--index", required=True)
    c.add_argument("--snap", required=True)
    r = sub.add_parser("restore", help="restore a snapshot (checksum-verified)")
    r.add_argument("--snap", required=True)
    r.add_argument("--dest", required=True)
    args = p.parse_args(argv)

    from .pipelines.maintain import restore_index, snapshot_index

    if args.cmd == "create":
        print(json.dumps(snapshot_index(args.index, args.snap)))
    else:
        print(json.dumps(restore_index(args.snap, args.dest)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
