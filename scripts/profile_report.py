"""Summarize a jax.profiler trace: top ops by accumulated duration.

The reference's only profiling was wall-clock prints with
CUDA_LAUNCH_BLOCKING=1 (lib/solver.py:404-446); here `--profile N` on the
trainers writes a real device trace, and this tool reads it back without
tensorboard — per-op totals straight from the xplane proto via
jax.profiler.ProfileData.

Run: python scripts/profile_report.py --trace outputs/<stamp>/profile [--top 25]
"""

from __future__ import annotations

import argparse
import glob
import os
from collections import defaultdict


def summarize(trace_dir: str, top: int = 25, plane_filter: str = "device"):
    import jax

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise SystemExit(f"no *.xplane.pb under {trace_dir}")

    rows = []
    for path in paths:
        data = jax.profiler.ProfileData.from_file(path)
        planes = list(data.planes)
        selected = [p for p in planes
                    if plane_filter.lower() in p.name.lower()]
        if not selected:        # CPU-only runs: fall back to host planes
            selected = [p for p in planes if "CPU" in p.name]
        for plane in selected:
            agg = defaultdict(lambda: [0.0, 0])
            for line in plane.lines:
                for ev in line.events:
                    a = agg[ev.name]
                    a[0] += float(ev.duration_ns)
                    a[1] += 1
            total = sum(v[0] for v in agg.values()) or 1.0
            rows.append((plane.name, total, agg))

    for plane_name, total, agg in rows:
        print(f"\n== {plane_name}  (Σ event time {total/1e6:.2f} ms)")
        print(f"{'op':60s} {'total ms':>10s} {'count':>8s} {'%':>6s}")
        ranked = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
        for name, (ns, cnt) in ranked:
            print(f"{name[:60]:60s} {ns/1e6:10.3f} {cnt:8d} "
                  f"{100.0*ns/total:6.1f}")
    return rows


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--trace", type=str, required=True,
                   help="profile dir written by --profile (contains "
                        "plugins/profile/...)")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--plane", type=str, default="device",
                   help="substring selecting planes (default: device)")
    args = p.parse_args()
    summarize(args.trace, args.top, args.plane)
