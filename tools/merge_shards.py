#!/usr/bin/env python
"""Merge per-process shard output files into single-writer files.

Usage:  python tools/merge_shards.py OUTDIR [--dest DIR]

Finds every ``<stream>[_<split>]_p<rank>.nc`` group written by
``mckpp_tpu.cli --output-mode shard`` (the XIOS multiple_file analog) in
OUTDIR and writes the merged ``(time, z, y, x)`` file per group — the same
bytes the single-writer mode would have produced.
"""

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mckpp_tpu.io.diagnostics import merge_shard_files  # noqa: E402

SHARD_RE = re.compile(r"^(?P<base>.+)_p(?P<rank>\d+)\.nc$")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("outdir")
    ap.add_argument("--dest", default=None,
                    help="directory for merged files (default: OUTDIR)")
    args = ap.parse_args(argv)
    dest = args.dest or args.outdir
    os.makedirs(dest, exist_ok=True)
    groups = collections.defaultdict(list)
    for name in sorted(os.listdir(args.outdir)):
        m = SHARD_RE.match(name)
        if m:
            groups[m.group("base")].append(os.path.join(args.outdir, name))
    if not groups:
        print(f"no shard files (*_pN.nc) found in {args.outdir}")
        return 1
    for base, paths in sorted(groups.items()):
        out = os.path.join(dest, f"{base}.nc")
        merge_shard_files(paths, out)
        print(f"merged {len(paths)} shards -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
