"""Prove the large-N visualizer path at the flagship scale (VERDICT r2 #7's
literal done-criterion: ``python -m nbody_tpu.vis --n 1000000`` interactive
over the tunnel).

Boots the real VisServer (HTTP thread + SimLoop stepping thread) in-process
with a 1M-particle BH sim on the TPU, then drives it through the same HTTP
surface the browser uses:

  1. /api/meta before any stepping (server boots without compiling),
  2. /api/positions — the decimated payload must be browser/tunnel sized
     (~1.2 MB at max_points=100k, NOT the ~12 MB full set),
  3. unpause -> the SimLoop takes real TPU steps (first one compiles),
  4. /api/positions latency WHILE the sim steps (the poll path competes
     with stepping for the device),
  5. pause, report steps/s seen by the loop.

Writes ONE json line to results/vis_1m_tpu.json.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from nbody_tpu.api import Simulation
from nbody_tpu.scenes import self_gravitating_disc
from nbody_tpu.vis.server import VisServer


def get(base, path):
    t0 = time.perf_counter()
    with urllib.request.urlopen(base + path, timeout=900) as r:
        data = r.read()
    return data, time.perf_counter() - t0


def post(base, body):
    req = urllib.request.Request(
        base + "/api/control", json.dumps(body).encode(),
        {"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=900) as r:
        return json.loads(r.read())


def main(n=1_000_000):
    t_boot = time.perf_counter()
    pos, vel, mass = self_gravitating_disc(n, seed=0)
    sim = Simulation(pos, vel, mass, engine="bh", dt=3e-2, g_soft=0.02,
                     theta2=1.0, dtype=jnp.float32)
    srv = VisServer(sim, port=8123, max_points=100_000)
    srv.serve(block=False)
    base = "http://127.0.0.1:8123"
    boot_s = time.perf_counter() - t_boot

    meta = json.loads(get(base, "/api/meta")[0])
    assert meta["n_alive"] == n + 1, meta["n_alive"]
    stride = meta["point_stride"]

    blob, t_pos_paused = get(base, "/api/positions")
    pts = np.frombuffer(blob, np.float32).reshape(-1, 3)
    full_mb = (n + 1) * 12 / 1e6
    blob_mb = len(blob) / 1e6
    assert blob_mb < 1.5, blob_mb  # decimation actually engaged

    # unpause: the loop's first step compiles the fused path (60-400 s cold)
    post(base, {"cmd": "pause"})
    t0 = time.perf_counter()
    steps = 0
    compile_s = None
    while time.perf_counter() - t0 < 420:
        meta = json.loads(get(base, "/api/meta")[0])
        if meta["steps"] > 0 and compile_s is None:
            compile_s = time.perf_counter() - t0
        steps = meta["steps"]
        if compile_s is not None and steps >= 12:
            break
        time.sleep(2.0)
    assert steps > 0, "no steps after 420 s"

    # position poll while stepping (competes with the device loop)
    _, t_pos_live = get(base, "/api/positions")
    meta = json.loads(get(base, "/api/meta")[0])
    post(base, {"cmd": "pause"})

    row = dict(
        n=n,
        engine="bh",
        boot_s=round(boot_s, 1),
        point_stride=stride,
        streamed_points=int(pts.shape[0]),
        payload_mb=round(blob_mb, 3),
        full_payload_mb=round(full_mb, 1),
        pos_latency_paused_s=round(t_pos_paused, 3),
        pos_latency_stepping_s=round(t_pos_live, 3),
        first_step_compile_s=round(compile_s, 1),
        steps_seen=steps,
        step_time_ms=meta["step_time_ms"],
        loop_fps=meta["fps"],
    )
    print(json.dumps(row))
    with open("results/vis_1m_tpu.json", "a") as f:
        f.write(json.dumps(row) + "\n")
    srv.stop()


if __name__ == "__main__":
    main()
