#!/usr/bin/env python
"""CPU accuracy gate for the round-3h window_pad flip (contingency path).

The TPU tunnel died mid-round (host OOM killed the relay — CLAUDE.md
hazards), so the usual 1M/131k on-TPU gates (scripts/accuracy_1m.py /
accuracy_midn.py) could not run for the window_pad defaults.  This script
gates the SAME traversal code path on the CPU backend at N=65536, where
the exact O(N^2) reference is single-core-feasible:

  * the mid preset (auto_for: group 4096, dual, cap 2048) at window_pad
    2048 (round-2 value) vs 1024 (new default) vs 512, and
  * the large-tier CONFIG (group 8192, subgroups 128, cap 512, dual 1.2 —
    what auto_for picks above 262k) applied at this N via explicit
    overrides, window_pad 2048 vs 512.

Numerics differ slightly from TPU (no Pallas kernel; XLA eval path), but
the window/fallback mechanics being gated are backend-independent: a
window cut moves near cells from window-exact rows to the gathered-near /
exact-multipole-fallback path, and the gate checks that p99 force error
does not move materially.  Appends to results/accuracy_wp_cpu.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.engines import get_engine
from nbody_tpu.ops.traversal import BHConfig, bh_accel
from nbody_tpu.scenes import self_gravitating_disc

OUT = os.path.join(os.path.dirname(__file__), "..", "results",
                   "accuracy_wp_cpu.jsonl")
N = 1 << 16 if len(sys.argv) < 2 else int(sys.argv[1])

LARGE = dict(group_size=8192, subgroups=128, block_dual=True,
             dual_margin=1.2, near_particle_cap=512)

CONFIGS = {
    # mid preset (what auto_for(65536) resolves, minus the wp default)
    "cpu_mid_wp2048": dict(window_pad=2048),
    "cpu_mid_wp1024": dict(window_pad=1024),
    "cpu_mid_wp512": dict(window_pad=512),
    # the large-N tier's config shape, applied at this N
    "cpu_large_wp2048": dict(LARGE, window_pad=2048),
    "cpu_large_wp1024": dict(LARGE, window_pad=1024),
    "cpu_large_wp512": dict(LARGE, window_pad=512),
    # round-3l group-size-cut candidates (pre-gated here so a TPU perf
    # win can flip defaults without another gate round): the large-tier
    # config at half/quarter groups.  Smaller groups shrink the window's
    # absolute coverage, shifting near/fb pressure — not a free knob.
    "cpu_large_g4096_wp512": dict(LARGE, group_size=4096, subgroups=64,
                                  window_pad=512),
    "cpu_large_g2048_wp512": dict(LARGE, group_size=2048, subgroups=64,
                                  window_pad=512),
    "cpu_large_g4096_wp1024": dict(LARGE, group_size=4096, subgroups=64,
                                   window_pad=1024),
}
if N != 1 << 16:  # non-default N: large rows always, mid rows in-tier
    CONFIGS = {f"{k}_n{N >> 10}k": v for k, v in CONFIGS.items()
               if "large" in k or N <= 262144}


def main():
    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["name"])
                except Exception:
                    pass

    pos, vel, mass = self_gravitating_disc(N - 1, seed=0)
    state = ParticleState.create(pos, vel, mass, capacity=N,
                                 dtype=jnp.float32)
    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=10.0, dtype=jnp.float32)
    m = state.effective_mass()

    print(f"computing exact reference ({N}^2 pairs, CPU)...", flush=True)
    brute = get_engine("brute")
    t0 = time.perf_counter()
    ref = jax.jit(lambda p, mm: brute.force(p, mm, params))(state.pos, m)
    r = np.asarray(ref)
    print(f"reference done in {time.perf_counter() - t0:.1f}s", flush=True)
    rn = np.linalg.norm(r, axis=1)
    alive = np.asarray(m) > 0

    for name, opts in CONFIGS.items():
        if name in done:
            continue
        cfg = BHConfig.auto_for(N, **opts)
        t0 = time.perf_counter()
        acc, stats = bh_accel(state.pos, m, params.bounds, params.theta2,
                              params.g, params.g_soft, cfg)
        acc.block_until_ready()
        a = np.asarray(acc)
        err = np.linalg.norm(a - r, axis=1)[alive] / np.maximum(
            rn[alive], 1e-30)
        rec = {
            "name": name,
            "n": N,
            "median": float(np.median(err)),
            "p99": float(np.percentile(err, 99)),
            "max": float(err.max()),
            "near_fallback": int(stats["near_fallback"]),
            "fb_spill": int(stats["fb_spill"]),
            "wall_s": round(time.perf_counter() - t0, 1),
            "ts": time.time(),
        }
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)


if __name__ == "__main__":
    main()
