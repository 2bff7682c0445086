"""Shared harness for the force-accuracy gate scripts (review r3 #4).

One copy of the resume-by-name scan, the benchmark-scene state build, the
error-percentile record, and the jsonl append — accuracy_1m.py,
accuracy_midn.py, and accuracy_wp_cpu.py were drifting three copies of
this skeleton (different sync calls, different record fields).  The
backend-specific pieces stay with the callers: how the exact reference is
computed (Pallas direct sum on TPU, the XLA brute engine on CPU) and any
extra record fields.
"""

import json
import os
import time

import jax.numpy as jnp
import numpy as np


def load_done(path):
    """Names already recorded in the jsonl (resume-by-name)."""
    done = set()
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["name"])
                except Exception:
                    pass
    return done


def benchmark_state(n):
    """The benchmark disc scene at capacity n (f32), with its SimParams."""
    from nbody_tpu.core.state import ParticleState, SimParams
    from nbody_tpu.scenes import self_gravitating_disc

    pos, vel, mass = self_gravitating_disc(n - 1, seed=0)
    state = ParticleState.create(pos, vel, mass, capacity=n,
                                 dtype=jnp.float32)
    params = SimParams.create(dt=3e-2, g_soft=0.02, theta2=1.0,
                              bounds_width=10.0, dtype=jnp.float32)
    return state, params


def append_record(path, rec):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


def sample_alive(state, k, seed=11):
    """k alive row indices (int32, sorted) for sampled-target gating."""
    alive = np.asarray(state.effective_mass()) > 0
    rng = np.random.default_rng(seed)
    idx = rng.choice(np.flatnonzero(alive), size=k, replace=False)
    return np.sort(idx).astype(np.int32)


def run_gate(configs, n, out, ref, state, params, extra_fields=None,
             sample_idx=None):
    """Gate every config in ``configs`` (name -> auto_for overrides) not yet
    in ``out`` against the precomputed exact reference ``ref`` [N, 3] — or,
    with ``sample_idx`` [K], a sampled-target reference [K, 3] (rows of the
    BH result are gathered at those indices; indices must be alive rows).

    Sync is a host transfer of the first element (``float(acc[0, 0])``) —
    reliable under the axon relay where block_until_ready is not
    (CLAUDE.md); on CPU it is equivalent.  ``extra_fields``: optional
    callable (stats dict) -> dict merged into each record.
    """
    from nbody_tpu.ops.traversal import BHConfig, bh_accel

    done = load_done(out)
    m = state.effective_mass()
    r = np.asarray(ref)
    rn = np.linalg.norm(r, axis=1)
    if sample_idx is None:
        alive = np.asarray(m) > 0
    else:
        alive = np.ones(len(sample_idx), dtype=bool)

    for name, opts in configs.items():
        if name in done:
            continue
        cfg = BHConfig.auto_for(n, **opts)
        t0 = time.perf_counter()
        acc, stats = bh_accel(state.pos, m, params.bounds, params.theta2,
                              params.g, params.g_soft, cfg)
        float(acc[0, 0])
        a = np.asarray(acc)
        if sample_idx is not None:
            a = a[sample_idx]
        abs_err = np.linalg.norm(a - r, axis=1)[alive]
        err = abs_err / np.maximum(rn[alive], 1e-30)
        # Floored-relative error: |Δa| / max(|a_ref|, median|a_ref|).  The
        # plain relative metric is scene-sensitive — in spherical scenes
        # (Plummer) the force vanishes toward the center, so tiny absolute
        # errors on near-zero denominators dominate p99; this variant reads
        # "absolute error in units of the typical force, unless the local
        # force is larger" and is comparable across scenes.
        typ = float(np.median(rn[alive]))
        err_fl = abs_err / np.maximum(rn[alive], typ)
        rec = {
            "name": name,
            "n": n,
            "median": float(np.median(err)),
            "p99": float(np.percentile(err, 99)),
            "max": float(err.max()),
            "p99_typ": float(np.percentile(err_fl, 99)),
            "max_typ": float(err_fl.max()),
            "near_fallback": int(stats["near_fallback"]),
            "fb_spill": int(stats["fb_spill"]),
            "wall_s": round(time.perf_counter() - t0, 1),
            "ts": time.time(),
            # snapshot the RESOLVED config: preset tiers move between
            # sessions, so a name like "defaults_2m" alone is ambiguous
            # across re-runs (rows on file before 2026-08-18 predate this
            # field — their configs are pinned in VALIDATION.md §9/§12)
            "config": {"group_size": cfg.group_size,
                       "window_pad": cfg.window_pad,
                       "near_particle_cap": cfg.near_particle_cap,
                       "block_dual": cfg.block_dual,
                       "multipole": cfg.multipole,
                       "refine_levels": cfg.refine_levels},
        }
        if sample_idx is not None:
            rec["sampled"] = int(len(sample_idx))
        if extra_fields is not None:
            rec.update(extra_fields(stats))
        append_record(out, rec)


def run_drift_gate(configs, n, out, state, params, steps=200,
                   control_name="control", max_ratio=3.0):
    """Secular energy-drift ship gate (round 4, VERDICT r3 #6/#7): the
    round-3 window-pad cut passed every per-step force gate yet carried a
    10x secular drift regression (rel drift 1.34e-3 vs 3.73e-4 per 200
    steps @1M, results/comp_drift_1m.jsonl) — correlated whole-cell
    multipole error integrates even when p99 force error is flat.  Ship
    criteria must therefore include drift, not force percentiles alone.

    ``configs``: name -> auto_for overrides; the entry named
    ``control_name`` is the reference stack.  Each candidate's
    |E_200 - E_0| / |E_0| (EXACT pair potential, f32 state) must stay
    within ``max_ratio`` x the control's, measured back-to-back in the
    same session (remote-compile latency drifts across hours — CLAUDE.md).
    Appends records with the ratio and a pass flag; resume-by-name."""
    from nbody_tpu.core.energy import total_energy
    from nbody_tpu.core.stepper import make_run
    from nbody_tpu.engines import get_engine

    done = load_done(out)
    todo = {k: v for k, v in configs.items() if k not in done}
    ratios_missing = [k for k in configs if k != control_name
                      and f"{k}_vs_{control_name}" not in done]
    if not todo and not ratios_missing:
        return
    assert control_name in configs, (
        f"drift gate needs a {control_name!r} config to ratio against")

    drifts = {}
    for rec_line in (open(out) if os.path.exists(out) else []):
        try:
            d = json.loads(rec_line)
            drifts[d["name"]] = d["rel_drift"]
        except Exception:
            pass

    for name, opts in configs.items():
        if name in done and name != control_name:
            continue
        if name in drifts:
            continue
        eng = get_engine("bh", **opts)
        run = make_run(eng.force)
        e0 = float(total_energy(state, params, method="exact"))
        t0 = time.perf_counter()
        outst = run(state, params, steps, None)
        float(outst.time)
        e1 = float(total_energy(outst, params, method="exact"))
        drifts[name] = abs(e1 - e0) / abs(e0)
        append_record(out, {
            "name": name, "n": n, "steps": steps,
            "rel_drift": drifts[name],
            "e0": e0, "e1": e1,
            "wall_s": round(time.perf_counter() - t0, 1),
            "ts": time.time(),
        })

    ctrl = drifts[control_name]
    # iterate every non-control config whose RATIO record is missing, not
    # just names measured this run: a candidate whose rel_drift row landed
    # in a previously interrupted run would otherwise never get its
    # drift_ratio/pass verdict on resume (advisor r4).
    for name in configs:
        if name == control_name:
            continue
        if f"{name}_vs_{control_name}" in done:
            continue
        ratio = drifts[name] / max(ctrl, 1e-30)
        ok = ratio <= max_ratio
        append_record(out, {
            "name": f"{name}_vs_{control_name}",
            "drift_ratio": round(ratio, 2),
            "max_ratio": max_ratio,
            "pass": bool(ok),
            "ts": time.time(),
        })
        if not ok:
            print(f"DRIFT GATE FAIL: {name} drifts {ratio:.1f}x the "
                  f"{control_name} stack (> {max_ratio}x)", flush=True)
