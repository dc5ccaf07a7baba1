"""Summarize a jax.profiler xplane trace: aggregate TPU 'XLA Ops' event
durations by op name (grouped by fusion/kernel family).

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python \
    tools/xplane_summary.py [/tmp/fluidlab_trace] [n_substeps]

The tensorboard_plugin_profile converter is broken in this image
(pywrap mismatch), so we parse the xplane proto directly.
"""

import collections
import glob
import re
import sys


def classify(name: str) -> str:
    """Collapse an HLO op name into a kernel family."""
    n = name.lower()
    # pallas custom-calls keep their kernel name
    m = re.search(r"(kernel[_a-z0-9]*|custom-call[.\d]*)", n)
    if "fusion" in n:
        return "fusion"
    return name.split(".")[0]


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fluidlab_trace"
    nsub = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not files:
        print("no xplane files under", trace_dir)
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(files[0], "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name:
            continue
        meta = plane.event_metadata
        stats_meta = plane.stat_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            tot = collections.Counter()
            cnt = collections.Counter()
            t0, t1 = None, None
            for ev in line.events:
                name = meta[ev.metadata_id].name
                dur = ev.duration_ps / 1e9  # ms
                tot[name] += dur
                cnt[name] += 1
                s = ev.offset_ps
                e = ev.offset_ps + ev.duration_ps
                t0 = s if t0 is None else min(t0, s)
                t1 = e if t1 is None else max(t1, e)
            wall = (t1 - t0) / 1e9 if t0 is not None else 0.0
            total = sum(tot.values())
            print(f"== {plane.name} / {line.name}: {len(line.events)} events,"
                  f" busy {total:.3f} ms, wall {wall:.3f} ms"
                  f" ({total / nsub:.3f} ms busy /substep)")
            print(f"{'ms':>9} {'ms/sub':>8} {'%':>6} {'n':>5}  op")
            for name, ms in tot.most_common(40):
                print(f"{ms:9.3f} {ms / nsub:8.3f} {100 * ms / total:6.1f}"
                      f" {cnt[name]:5d}  {name[:90]}")


if __name__ == "__main__":
    main()
