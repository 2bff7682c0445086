"""Headline benchmark — prints ONE JSON line.

Round-1 metric: brute-force all-pairs throughput at N=64k on one chip
(BASELINE.json: target >=100x the reference's serial Rust direct sum,
src/manual/brute_force.rs:64-82).

Reported as steps/second on the benchmark config (disc scene, dt=3e-2,
eps=0.02, 64k particles).  ``vs_baseline`` compares against the reference
brute-force rate at N=64k.  The reference's committed CSVs contain no
brute-force rows (SURVEY.md §6), so the baseline is measured with the C++
oracle in native/oracle.cpp (same serial symmetric pair loop and force law as
src/manual/brute_force.rs:64-82, g++ -O3, strict FP, single thread — the
engine is serial in the reference too): **0.076 steps/s at N=65536** on this
machine (13.15 s/step, 2026-08-16).  Calibration: the same oracle's
Barnes-Hut at N=10k runs ~28 steps/s single-threaded, matching the
reference's own measured 27-28 steps/s at 1 thread (BASELINE.md), so this
core is representative of the reference hardware.
"""

import json
import time

import jax
import jax.numpy as jnp


N = 65536
STEPS = 25
RUST_BF_64K_STEPS_PER_S = 0.076  # measured: native/oracle.cpp serial brute
# v5e published peak: 197 TFLOP/s bf16 (MXU).  The brute kernel is
# rsqrt/VPU-bound f32, so MFU vs the bf16 MXU peak is a deliberately harsh
# denominator — it answers "how much single-chip headroom remains" (VERDICT
# round-1 #10), not "is the VPU saturated".
V5E_PEAK_FLOPS = 197e12
# The RIGHT roofline for this op (VALIDATION.md §11): the v5e VPU is an
# 8x128-lane, 4-ALU vector unit at ~0.94 GHz ≈ 3.8 Tops/s f32; the MXU is
# unusable here (K=3/N=8 contractions pad to 128 columns x 6 passes,
# measured 30x worse).  vpu_roofline_frac below can legitimately EXCEED
# 1.0: pairs are counted one-directional (N² per step) while the shipped
# Newton-3 symmetric kernel evaluates each unordered pair once and
# accumulates both directions — beating the one-direction VPU roofline is
# exactly the sym kernel's win (§11 table: 1.28-1.33x).
V5E_VPU_F32_OPS = 3.8e12


def _axon_relay_dead() -> bool:
    """True when this container reaches the TPU only through the axon
    loopback relay (JAX_PLATFORMS=axon, sitecustomize) and that relay is
    not listening.  jax backend init HANGS FOREVER in that state (no
    timeout in the PJRT dial loop, measured), which would eat the whole
    harness budget and lose the JSON line — so probe the relay port
    first and retry ~2 min (the relay occasionally restarts).  On real
    TPU hosts (no PALLAS_AXON_POOL_IPS) this never triggers."""
    import os
    import socket

    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return False
    deadline = time.perf_counter() + 120.0
    while time.perf_counter() < deadline:
        try:
            with socket.create_connection(("127.0.0.1", 8082), timeout=2):
                return False
        except OSError:
            time.sleep(10)
    return True


def main():
    t_start = time.perf_counter()
    if _axon_relay_dead():
        print(json.dumps({
            "metric": "brute_force_steps_per_s_n64k",
            "value": 0.0,
            "unit": "steps/s",
            "vs_baseline": 0.0,
            "error": "axon relay down: TPU unreachable from this container "
                     "(jax init would hang); last recorded TPU numbers are "
                     "in results/dual_r3.jsonl",
        }))
        return
    from nbody_tpu.core.state import ParticleState, SimParams
    from nbody_tpu.core.stepper import make_run
    from nbody_tpu.engines import get_engine
    from nbody_tpu.scenes import self_gravitating_disc

    pos, vel, mass = self_gravitating_disc(N - 1, seed=0)
    state = ParticleState.create(pos, vel, mass, dtype=jnp.float32)
    params = SimParams.create(
        dt=3e-2, g_soft=0.02, theta2=1.0, bounds_width=10.0, dtype=jnp.float32
    )

    engine = get_engine(
        "brute-pallas" if jax.default_backend() == "tpu" else "brute"
    )
    run = make_run(engine.force, "leapfrog")
    run.lower(state, params, STEPS, None).compile()

    # warmup execution (first axon-relay execution pays a one-time program
    # load); sync via scalar transfer — jax.block_until_ready is unreliable
    # under the relay
    out = run(state, params, STEPS, None)
    float(out.time)

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(out, params, STEPS, None)
        float(out.time)
    elapsed = time.perf_counter() - t0

    steps_per_s = STEPS * reps / elapsed
    pairs_per_s = steps_per_s * float(N) * float(N)
    # achieved FLOP/s from the kernel's own cost model (18 flops/pair,
    # ops/pairwise.py CostEstimate) — the same accounting perf_benchmark.py
    # uses via XLA cost analysis
    achieved_flops = pairs_per_s * 18.0
    result = {
        "metric": "brute_force_steps_per_s_n64k",
        "value": round(steps_per_s, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / RUST_BF_64K_STEPS_PER_S, 1),
        "pairs_per_s": f"{pairs_per_s:.3e}",
        "achieved_tflops": round(achieved_flops / 1e12, 2),
        "mfu_vs_v5e_bf16_peak": round(achieved_flops / V5E_PEAK_FLOPS, 4),
        # the honest denominator (see V5E_VPU_F32_OPS): >1.0 = the Newton-3
        # symmetric kernel beats the one-direction VPU roofline
        "vpu_roofline_frac": round(achieved_flops / V5E_VPU_F32_OPS, 3),
        "n": N,
        "engine": engine.name,
        "backend": jax.default_backend(),
    }

    # Secondaries are wall-clock guarded: big compiles range 40-600+ s
    # depending on remote-compile load, and blowing the harness timeout
    # would lose the PRIMARY metric's JSON line too.  Budget overridable
    # via BENCH_BUDGET_S.
    import os
    budget = float(os.environ.get("BENCH_BUDGET_S", "420"))

    # secondary A: the reference's exact headline workload — 100k disc,
    # 1000 leapfrog steps (BASELINE.md: reference manual BH 123.8 s on 32
    # cores; this path measured 24.9 s / 40.1 steps/s on one v5e,
    # VALIDATION.md §10).  ~75 s warm; cheaper than the 1M secondary, so it
    # gets first claim on the remaining budget.
    if budget - (time.perf_counter() - t_start) > 150:
        try:
            n_fl = 100000
            pos, vel, mass = self_gravitating_disc(n_fl, seed=0)
            state_fl = ParticleState.create(pos, vel, mass, dtype=jnp.float32)
            bh_fl = get_engine("bh")
            run_fl = make_run(bh_fl.force, "leapfrog")
            out = run_fl(state_fl, params, 200, None)
            float(out.time)  # compile + program load, outside timing
            t0 = time.perf_counter()
            for _ in range(5):
                out = run_fl(out, params, 200, None)
            float(out.time)
            dt_fl = time.perf_counter() - t0
            result["flagship_100k_1000steps_s"] = round(dt_fl, 1)
            result["flagship_100k_steps_per_s"] = round(1000 / dt_fl, 2)
            result["flagship_vs_ref_32core"] = round(123.8 / dt_fl, 2)
        except Exception as e:  # never fail the primary metric
            result["flagship_100k_1000steps_s"] = f"error: {type(e).__name__}"
    else:
        result["flagship_100k_1000steps_s"] = "skipped: budget"

    # secondary B (round 5, VERDICT r4 #5): the adaptive steep-core
    # capability — 1M Plummer w40, deep stack (ADAPTIVE_OVERRIDES), the
    # round-4/5 tuning target.  Force-only calls/s + sampled-exact p99
    # from ONE compiled program (a separate fused-scan compile would blow
    # the budget; the fused rate runs ~0.9x of calls/s — 2.13 vs 2.31 in
    # results/ada_tune_r4.jsonl — with the ~25 ms/step relay overhead
    # note in CLAUDE.md).  Runs BEFORE the 1M-disc secondary so the
    # adaptive trend always lands in BENCH_r*.json (the disc numbers have
    # been flat since r03).
    spent = time.perf_counter() - t_start
    if budget - spent > 180:
        try:
            import numpy as np

            from nbody_tpu.ops.pairwise import pairwise_acc_pallas_targets
            from nbody_tpu.ops.traversal import (ADAPTIVE_OVERRIDES,
                                                 BHConfig, bh_accel)
            from nbody_tpu.scenes import plummer_sphere

            n_ad = 1 << 20
            pos, vel, mass = plummer_sphere(n_ad, scale=1.0, seed=0)
            keep = np.all(np.abs(np.asarray(pos)) <= 20.0, axis=1)
            pos, vel, mass = pos[keep], vel[keep], mass[keep]
            state_ad = ParticleState.create(pos, vel, mass, capacity=n_ad,
                                            dtype=jnp.float32)
            params_ad = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                                         bounds_width=40.0,
                                         dtype=jnp.float32)
            m_ad = state_ad.effective_mass()
            cfg_ad = BHConfig.auto_for(n_ad, **ADAPTIVE_OVERRIDES)
            fn_ad = jax.jit(lambda p, mm: bh_accel(
                p, mm, params_ad.bounds, params_ad.theta2, params_ad.g,
                params_ad.g_soft, cfg_ad)[0])
            acc = fn_ad(state_ad.pos, m_ad)
            float(acc[0, 0])  # compile + load outside timing
            t0 = time.perf_counter()
            for _ in range(3):
                acc = fn_ad(state_ad.pos, m_ad)
                float(acc[0, 0])
            per = (time.perf_counter() - t0) / 3
            result["adaptive_1m_plummer_force_calls_per_s"] = round(
                1 / per, 3)
            rng = np.random.default_rng(0)
            samp = np.sort(rng.choice(len(pos), 4096, replace=False))
            ref = np.asarray(pairwise_acc_pallas_targets(
                state_ad.pos[samp], state_ad.pos, m_ad, params_ad.g,
                params_ad.g_soft))
            rn = np.linalg.norm(ref, axis=1)
            err = np.linalg.norm(np.asarray(acc)[samp] - ref, axis=1) \
                / np.maximum(rn, float(np.median(rn)))
            result["adaptive_1m_plummer_p99_typ"] = round(
                float(np.percentile(err, 99)), 4)
        except Exception as e:  # never fail the primary metric
            result["adaptive_1m_plummer_force_calls_per_s"] = (
                f"error: {type(e).__name__}")
    else:
        result["adaptive_1m_plummer_force_calls_per_s"] = "skipped: budget"

    # secondary C: the BASELINE.json north-star (Barnes-Hut steps/s at N=1M)
    spent = time.perf_counter() - t_start
    if spent > budget:
        result["bh_n1m_steps_per_s"] = (
            f"skipped: {spent:.0f}s spent > {budget:.0f}s budget "
            "(degraded remote-compile latency)"
        )
        print(json.dumps(result))
        return
    try:
        n_bh = 1 << 20
        pos, vel, mass = self_gravitating_disc(n_bh - 1, seed=0)
        state = ParticleState.create(pos, vel, mass, capacity=n_bh,
                                     dtype=jnp.float32)
        bh = get_engine("bh")
        run_bh = make_run(bh.force, "leapfrog")
        out = run_bh(state, params, 10, None)
        float(out.time)  # compile + one-time program load, outside timing
        t0 = time.perf_counter()
        out = run_bh(out, params, 10, None)
        float(out.time)
        result["bh_n1m_steps_per_s"] = round(10 / (time.perf_counter() - t0), 3)
    except Exception as e:  # never fail the primary metric
        result["bh_n1m_steps_per_s"] = f"error: {type(e).__name__}"

    print(json.dumps(result))


if __name__ == "__main__":
    main()
