#!/usr/bin/env python
"""Op-level device profile of the default bh force at N=1M (TPU).

Captures a jax.profiler trace around a few force calls and aggregates
XEvent durations per HLO op name from the device plane of the xplane.pb,
printing the top-k ops by total time.  Answers "where do the ~340 ms go"
at op granularity instead of ablation granularity.
"""

import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.ops.traversal import BHConfig, bh_accel
from nbody_tpu.scenes import self_gravitating_disc

# optional argv: log2(N) (default 20 — the 1M flagship)
_LOG2N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
N = 1 << _LOG2N
TRACE_DIR = f"/tmp/jaxtrace_{_LOG2N}"


def main():
    pos, vel, mass = self_gravitating_disc(N - 1, seed=0)
    state = ParticleState.create(pos, vel, mass, capacity=N,
                                 dtype=jnp.float32)
    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=10.0, dtype=jnp.float32)
    cfg = BHConfig.auto_for(N)
    m = state.effective_mass()

    fn = jax.jit(lambda p, mm: bh_accel(p, mm, params.bounds, params.theta2,
                                        params.g, params.g_soft, cfg)[0])
    acc = fn(state.pos, m)
    float(acc[0, 0])  # compile + sync

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
            for name, ps in total.most_common(35):
                print(f"{ps/1e9/3:10.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
