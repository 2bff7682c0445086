#!/usr/bin/env python
"""Op-level device profile of the ADAPTIVE bh force at a 1M Plummer core
(VERDICT r3 #5: the 1.55-1.72 steps/s adaptive rate was never
decomposed).  Same xplane aggregation as profile_1m.py, but the scene is
the steep-core regime the profile exists for and the config is the deep
adaptive stack (ADAPTIVE_OVERRIDES; pass the width as argv[2] to probe
the tight-box regime instead — the resolver picks the measured stack).

Usage: python scripts/profile_adaptive.py [log2N=20] [width=40]
"""

import collections
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.ops.traversal import (BHConfig, bh_accel,
                                     resolve_adaptive_overrides)
from nbody_tpu.scenes import plummer_sphere

_LOG2N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
WIDTH = float(sys.argv[2]) if len(sys.argv) > 2 else 40.0
N = 1 << _LOG2N
TRACE_DIR = f"/tmp/jaxtrace_ada_{_LOG2N}_{int(WIDTH)}"


def main():
    # stale traces from earlier sessions in the same dir get aggregated
    # alongside the fresh run (round-5 bug: the round-4 xplane shadowed
    # the current one) — start clean
    import shutil

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    pos, vel, mass = plummer_sphere(N, scale=1.0, seed=0)
    keep = np.all(np.abs(np.asarray(pos)) <= WIDTH / 2, axis=1)
    pos, vel, mass = pos[keep], vel[keep], mass[keep]
    state = ParticleState.create(pos, vel, mass, capacity=N,
                                 dtype=jnp.float32)
    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=WIDTH, dtype=jnp.float32)
    ov = resolve_adaptive_overrides(pos, (0.0, 0.0, 0.0), WIDTH)
    cfg = BHConfig.auto_for(N, **ov)
    print("resolved stack:", {k: ov[k] for k in
                              ("max_level", "refine_levels",
                               "refine_threshold")}, flush=True)
    m = state.effective_mass()

    fn = jax.jit(lambda p, mm: bh_accel(p, mm, params.bounds, params.theta2,
                                        params.g, params.g_soft, cfg)[0])
    acc = fn(state.pos, m)
    float(acc[0, 0])  # compile + sync

    t0 = time.perf_counter()
    for _ in range(3):
        acc = fn(state.pos, m)
        float(acc[0, 0])
    per = (time.perf_counter() - t0) / 3
    print(f"force-only: {per * 1e3:.1f} ms/call ({1 / per:.2f} calls/s)",
          flush=True)

    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(3):
        acc = fn(state.pos, m)
        float(acc[0, 0])
    jax.profiler.stop_trace()

    paths = glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                      recursive=True)
    print("xplane files:", paths, flush=True)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            total = collections.Counter()
            for line in plane.lines:
                for ev in line.events:
                    md = plane.event_metadata[ev.metadata_id]
                    total[md.name] += ev.duration_ps
            if not total:
                continue
            print(f"\n=== plane: {plane.name} (lines={len(plane.lines)}) ===")
            for name, ps in total.most_common(40):
                print(f"{ps/1e9/3:10.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
