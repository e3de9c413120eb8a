#!/usr/bin/env python
"""Digest a ``--profile`` trace (jax.profiler / TensorBoard xplane.pb)
into a per-op device-time table — the SURVEY §5 tracing deliverable's
reporting half (VERDICT r4 item 7).

The CLI's ``--profile DIR`` writes ``DIR/plugins/profile/<ts>/
<host>.xplane.pb`` (plus a derived trace.json.gz for TraceViewer).  On
the dev-box axon tunnel the JSON export carries only host events; the
device plane ('/device:TPU:0') lives in the xplane protobuf.  This tool
needs the TF profiler protos (tensorflow is in the image; the tool is
optional and degrades with a clear message without it).

Usage: python tools/summarize_trace.py TRACE_DIR [--top 15]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys


def find_xplane(trace_dir: str) -> str:
    pats = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.xplane.pb")))
    if not pats:
        raise SystemExit(f"no *.xplane.pb under {trace_dir}/plugins/profile/")
    return pats[-1]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=15)
    a = ap.parse_args(argv)

    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        raise SystemExit(
            "tensorflow profiler protos unavailable — open the trace in "
            "TensorBoard (tensorboard-plugin-profile) instead")

    path = find_xplane(a.trace_dir)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    print(f"# trace digest: {path}")
    for p in xs.planes:
        is_dev = p.name.startswith("/device:")
        n_ev = sum(len(ln.events) for ln in p.lines)
        if not n_ev:
            continue
        print(f"\n## plane {p.name}  ({n_ev} events)")
        if not is_dev:
            # host planes are huge (tens of millions of python events);
            # report volume only — TraceViewer is the browsing tool
            continue
        meta = {k: v.name for k, v in p.event_metadata.items()}
        for line in p.lines:
            if not line.events:
                continue
            tot = collections.defaultdict(float)
            cnt = collections.Counter()
            for e in line.events:
                name = meta.get(e.metadata_id, "?")
                tot[name] += e.duration_ps / 1e12
                cnt[name] += 1
            span = (max(e.offset_ps + e.duration_ps for e in line.events)
                    - min(e.offset_ps for e in line.events)) / 1e12
            busy = sum(tot.values())
            print(f"\n### line '{line.name}': busy {busy:.3f}s over "
                  f"{span:.3f}s span ({100*busy/max(span,1e-9):.1f}% duty)")
            for name, s in sorted(tot.items(), key=lambda kv: -kv[1])[:a.top]:
                print(f"  {s*1e3:9.2f} ms  n={cnt[name]:5d}  {name[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
