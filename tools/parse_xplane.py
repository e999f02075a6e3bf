"""Offline xplane parser: per-op-category device time from a
jax.profiler trace (run with /opt/venv/bin/python — the axon pyenv
python lacks the tsl profiler protos; CLAUDE.md).

Usage: /opt/venv/bin/python tools/parse_xplane.py /tmp/hr_trace [top_n]

Prints the TPU line totals grouped by HLO-op name prefix (fusion
buckets keep their full name up to the first digit run), sorted by
total duration (not self time; hierarchical lines double-count their
children).  Lines on the async/DMA planes are listed separately
so overlapped copies aren't misread as wall-time additive (the
round-2 lesson recorded in ROADMAP.md).
"""
import collections
import glob
import re
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hr_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    paths = sorted(glob.glob(root + "/plugins/profile/*/*.xplane.pb"))
    if not paths:
        raise SystemExit(f"no xplane.pb under {root}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name:
            continue
        print(f"== plane: {plane.name} ==")
        ev_names = plane.event_metadata
        for line in plane.lines:
            tot = collections.Counter()
            cnt = collections.Counter()
            span = 0
            for ev in line.events:
                name = ev_names[ev.metadata_id].name
                key = re.split(r"[.\d]", name, maxsplit=1)[0][:48]
                if not key:  # names starting with a digit keep the full name
                    key = name[:48]
                tot[key] += ev.duration_ps
                cnt[key] += 1
                span += ev.duration_ps
            if span == 0:
                continue
            # durations, not self time: hierarchical lines (e.g. an "XLA
            # Modules" line whose module event spans all ops) double-count
            print(f"-- line: {line.name}  total duration {span/1e12*1e3:.1f} ms")
            for key, ps in tot.most_common(top_n):
                print(f"   {ps/1e12*1e3:9.2f} ms  x{cnt[key]:<5d} {key}")


if __name__ == "__main__":
    main()
