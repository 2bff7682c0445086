#!/usr/bin/env python
"""bh vs bh-lazy on TPU with the round-2 Pallas eval (VERDICT round-1 #6).

With the fused group-force kernel the build (sort ~100 ms @1M) is now ~1/3
of the step, so the lazy engine's sort-skip is worth re-racing — round 1
also handicapped it (lazy ran group 4096 vs bh's auto 8192 preset at 1M;
fixed in engines/barnes_hut.py).  Appends JSON lines to
results/sweep_lazy_r2.jsonl."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from nbody_tpu.core.state import ParticleState, SimParams
from nbody_tpu.core.stepper import make_run, make_run_stateful
from nbody_tpu.engines import get_engine
from nbody_tpu.scenes import self_gravitating_disc

OUT = os.path.join(os.path.dirname(__file__), "..", "results",
                   "sweep_lazy_r2.jsonl")
STEPS = 25

CASES = [
    # (name, n, dt, engine)
    ("bh_1m_dt3e-2", 1 << 20, 3e-2, "bh"),
    ("lazy_1m_dt3e-2", 1 << 20, 3e-2, "bh-lazy"),
    ("bh_1m_dt3e-3", 1 << 20, 3e-3, "bh"),
    ("lazy_1m_dt3e-3", 1 << 20, 3e-3, "bh-lazy"),
    ("bh_131k_dt3e-3", 1 << 17, 3e-3, "bh"),
    ("lazy_131k_dt3e-3", 1 << 17, 3e-3, "bh-lazy"),
]


def main():
    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["name"])
                except Exception:
                    pass

    for name, n, dt, engine_name in CASES:
        if name in done:
            continue
        pos, vel, mass = self_gravitating_disc(n - 1, seed=0)
        state = ParticleState.create(pos, vel, mass, capacity=n,
                                     dtype=jnp.float32)
        params = SimParams.create(dt=dt, g_soft=0.02, theta2=1.0,
                                  bounds_width=10.0, dtype=jnp.float32)
        engine = get_engine(engine_name)
        t0 = time.perf_counter()
        if engine.force_carry is not None:
            run = make_run_stateful(engine)
            carry = engine.init_carry(state.pos, state.effective_mass(),
                                      params)
            out, carry = run(state, carry, params, STEPS)
            float(out.time)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            out, carry = run(out, carry, params, STEPS)
            float(out.time)
        else:
            run = make_run(engine.force)
            out = run(state, params, STEPS)
            float(out.time)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = run(out, params, STEPS)
            float(out.time)
        dt_wall = time.perf_counter() - t0
        rec = {
            "name": name,
            "n": n,
            "dt": dt,
            "engine": engine_name,
            "steps_per_s": round(STEPS / dt_wall, 3),
            "ms_per_step": round(dt_wall / STEPS * 1e3, 1),
            "compile_s": round(compile_s, 1),
            "ts": time.time(),
        }
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)


if __name__ == "__main__":
    main()
