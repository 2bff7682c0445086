#!/usr/bin/env python
"""Diagnose the XLA:CPU compile-footprint blowup on production-budget
adaptive programs (round 4): all three virtual-mesh domain-adaptive
attempts ballooned past 86-130 GB N-independently.  This script compiles
the SINGLE-CHIP adaptive program at the same budgets on CPU with an RSS
watchdog, to split the blame between (a) the adaptive walk program
itself on XLA:CPU and (b) the 8-partition domain lowering.

Run alone (it may legitimately eat RAM — the watchdog aborts at the cap
so the host survives):  python scripts/diag_cpu_compile_blowup.py
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RSS_CAP_GB = float(os.environ.get("DIAG_RSS_CAP_GB", "60"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nbody_tpu.core.state import ParticleState, SimParams  # noqa: E402
from nbody_tpu.ops.traversal import (ADAPTIVE_TIGHT_OVERRIDES,  # noqa: E402
                                     BHConfig, bh_accel)
from nbody_tpu.scenes import self_gravitating_disc  # noqa: E402


def rss_gb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1048576
    return 0.0


def watchdog():
    peak = 0.0
    while True:
        time.sleep(5)
        r = rss_gb()
        if r > peak + 2:
            peak = r
            print(f"[watchdog] RSS {r:.1f} GB", flush=True)
        if r > RSS_CAP_GB:
            print(f"[watchdog] RSS {r:.1f} GB > cap {RSS_CAP_GB} — "
                  "ABORT (blowup reproduced single-chip)", flush=True)
            os._exit(42)


def main():
    threading.Thread(target=watchdog, daemon=True).start()
    n = 1 << 19
    pos, vel, mass = self_gravitating_disc(n - 1, seed=0)
    state = ParticleState.create(pos, vel, mass, capacity=n,
                                 dtype=jnp.float32)
    params = SimParams.create(g_soft=0.02, theta2=1.0, bounds_width=10.0,
                              dtype=jnp.float32)
    # same production budgets as the OOM'd virtual-mesh attempts
    cfg = BHConfig.auto_for(n, **ADAPTIVE_TIGHT_OVERRIDES)
    print(f"single-chip CPU compile: n={n} group={cfg.group_size} "
          f"cg={cfg.chunk_groups} L={cfg.max_level} R={cfg.refine_levels}",
          flush=True)
    t0 = time.perf_counter()
    fn = jax.jit(lambda p, m: bh_accel(p, m, params.bounds, params.theta2,
                                       params.g, params.g_soft, cfg)[0])
    lowered = fn.lower(state.pos, state.effective_mass())
    print(f"lowered in {time.perf_counter() - t0:.0f}s, RSS {rss_gb():.1f} "
          "GB; compiling...", flush=True)
    t0 = time.perf_counter()
    lowered.compile()
    print(f"COMPILED in {time.perf_counter() - t0:.0f}s, peak-ish RSS "
          f"{rss_gb():.1f} GB — single-chip is fine; the blowup is the "
          "8-partition domain lowering", flush=True)


if __name__ == "__main__":
    main()
