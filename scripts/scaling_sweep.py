#!/usr/bin/env python
"""Multi-device scaling sweep on the virtual CPU mesh (VERDICT r3
missing #4): the analog of the reference's 1->32 thread column
(reference perf_benchmark.py:27-30, BASELINE.md scaling rows).

HONEST LABELING: this environment has ONE real TPU chip, so these rows
are measured on N_DEV VIRTUAL CPU devices sharing one physical core —
absolute rates are meaningless and "speedup" cannot exceed 1 here.  What
the sweep DOES validate is the SHAPE of the multi-chip programs: that
per-device work and collective volume scale as designed (per-chip arrays
O(N/chips + halo) on the domain path), that every (devices, N) point
compiles and executes, and the relative cost of the collective patterns.
The CSV carries backend=cpu-virtual in the file name; treat the
steps/s column as a program-shape diagnostic, not a performance claim.

Writes results/scaling_virtual_r4.csv in the reference ';' schema (one
file per device count via perf_benchmark.main), then a merged file.

Run serially on the single-core host — NEVER beside a TPU job or another
CPU mesh job (CLAUDE.md: the 20 s/40 s XLA CPU collective rendezvous
timeouts F-abort contended runs; the conftest raises them, this script
must do it itself).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# single-core host: raise the XLA CPU collective rendezvous timeouts BEFORE
# jax initializes, or an 8-virtual-device program whose slow "devices" miss
# the 40 s rendezvous gets F-aborted mid-run (CLAUDE.md)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "collective_call_terminate" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from perf_benchmark import main as bench_main  # noqa: E402

RESULTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "results")
DEVICES = [1, 2, 4, 8]
POINTS = ["20000", "65536"]


def main():
    outs = []
    for d in DEVICES:
        out = os.path.join(RESULTS, f"scaling_virtual_r4_d{d}.csv")
        outs.append(out)
        if os.path.exists(out):
            print(f"[scaling] skip devices={d} (exists)", flush=True)
            continue
        argv = ["-o", out, "-p", *POINTS, "--engines", "bh",
                "--steps", "10", "--repeats", "2", "--chunk", "10"]
        if d > 1:
            argv += ["--devices", str(d)]
        print(f"[scaling] devices={d} ...", flush=True)
        bench_main(argv)
    merged = os.path.join(RESULTS, "scaling_virtual_r4.csv")
    with open(merged, "w") as f:
        for out in outs:
            with open(out) as g:
                f.write(g.read())
    print(f"wrote {merged}")


if __name__ == "__main__":
    main()
