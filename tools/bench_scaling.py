"""Weak-scaling harness: rollouts/s vs device count (BASELINE.json axis
"rollouts/s at 1 chip / 1 host / N hosts; >=80% weak scaling").

Runs tools/bench_rollouts.py in a subprocess per device count with the
per-device rollout load held constant (K = K_PER_DEV * n_dev) and
reports weak-scaling efficiency  eff(n) = r(n) / (n * r(1)).

Defaults saturate each device (K/dev=4 at N=8192, H=10 — ~82k
particle-substeps in flight per device) rather than the r2 sweep's
mechanics-only load (K/dev=2 at 4k), per the r3 verdict.

On CPU the device counts are virtualized via
``--xla_force_host_platform_device_count`` (new process per point — the
flag is read once at backend init).  On real TPU pods run one point per
slice size.  NOTE: virtual CPU devices share this VM's 4 cores, so CPU
"efficiency" here validates the collective/sharding *code path*, not
hardware scaling.

Usage: python tools/bench_scaling.py [devcounts csv] [K_per_dev] [N] [H]
Env: BENCH_PLATFORM=cpu (default) | tpu.
"""

import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_point(n_dev, k, n_particles, horizon, platform):
    env = dict(os.environ)
    env["BENCH_PLATFORM"] = platform
    flags = env.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    if platform == "cpu":
        flags += f" --xla_force_host_platform_device_count={n_dev}"
    env["XLA_FLAGS"] = flags.strip()
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "bench_rollouts.py"),
         str(k), str(n_particles), str(horizon)],
        capture_output=True, text=True, env=env, cwd=ROOT, timeout=3600,
    )
    text = out.stdout + out.stderr
    m = re.search(r"([\d.]+) rollouts/s", text)
    if not m:
        print(text[-2000:])
        raise RuntimeError(f"no rollouts/s line for n_dev={n_dev}")
    return float(m.group(1))


def main():
    devcounts = [int(x) for x in
                 (sys.argv[1] if len(sys.argv) > 1 else "1,2,4,8").split(",")]
    k_per_dev = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_particles = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
    horizon = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    platform = os.environ.get("BENCH_PLATFORM", "cpu")

    r1 = None
    print(f"weak scaling: K/dev={k_per_dev} N={n_particles} H={horizon} "
          f"platform={platform}")
    for nd in devcounts:
        r = run_point(nd, k_per_dev * nd, n_particles, horizon, platform)
        if r1 is None:
            r1 = r / nd  # per-device baseline from the first point
        eff = r / (nd * r1)
        print(f"  devices={nd:3d}  rollouts/s={r:9.3f}  "
              f"weak-eff={eff:6.1%}", flush=True)


if __name__ == "__main__":
    main()
