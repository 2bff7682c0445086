#!/usr/bin/env python
"""Bisect the XLA:CPU compile-footprint blowup on production-budget
adaptive programs to its driving knob (VERDICT r4 #1).

Round-4 facts (VALIDATION §20): 8M and 4M DEEP domain-adaptive compiles
on the 8-virtual-device CPU mesh both OOM'd at an identical 130.7 GB
RSS; a 512k TIGHT attempt passed 86 GB at 14 min — budget-driven
(group 8192 / chunk_groups 8 / round-4 caps), not N-driven.  The
small-budget suite configs of the SAME code path compile in seconds.

This harness runs one compile per (mode, knob) config in a FRESH
subprocess with an RSS watchdog (exit 42 at the cap — the host
survives), and records peak RSS + phase + wall time per config to
results/compile_blowup_bisect.jsonl (resume-by-name).

Parent:  python scripts/bisect_compile_blowup.py [names...]
Child:   (internal) --child '<json>'

Run alone — no concurrent TPU or big CPU jobs (CLAUDE.md: host has ONE
core / 125 GB, and the axon relay dies if we spike host memory).
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

OUT = os.path.join(ROOT, "results", "compile_blowup_bisect.jsonl")
RSS_CAP_GB = float(os.environ.get("BISECT_RSS_CAP_GB", "45"))
CHILD_TIMEOUT_S = int(os.environ.get("BISECT_TIMEOUT_S", "2400"))

# The killed round-4 attempts used the TIGHT production stack at 512k
# and the DEEP stack at 4M/8M.  512k tight reproduces the pathology at
# the smallest footprint, so the matrix bisects from there.
BASE_N = 1 << 19


def configs():
    """(name, child-config) pairs, ordered cheapest-information-first."""
    tight = "tight"
    out = []
    # 1. split single-chip vs domain lowering at the EXACT killed config
    out.append(("single_base", dict(mode="single", n=BASE_N, stack=tight)))
    out.append(("domain_base", dict(mode="domain", n=BASE_N, stack=tight)))
    # 1b. phase split: lower+compile stopped at 0.9 GB for every config —
    # the round-4 "compile RSS" blowup must be the EXECUTE phase (the
    # proof script's fn() call fuses compile+run).  These rows run it.
    out.append(("domain_base_exec", dict(mode="domain", n=BASE_N,
                                         stack=tight, execute=True)))
    out.append(("domain_deep_exec", dict(mode="domain", n=BASE_N,
                                         stack="deep", execute=True)))
    out.append(("domain_deep_4m_exec", dict(mode="domain", n=1 << 22,
                                            stack="deep", execute=True)))
    # 2. unrefined control (8M unrefined fit with tens of GB spare)
    out.append(("domain_unrefined", dict(mode="domain", n=BASE_N,
                                         stack="none")))
    out.append(("single_unrefined", dict(mode="single", n=BASE_N,
                                         stack="none")))
    # 3. knob sweep on whichever mode reproduces (run all; cheap ones
    #    that don't blow up finish in minutes)
    for mode in ("single", "domain"):
        out.append((f"{mode}_cg1", dict(mode=mode, n=BASE_N, stack=tight,
                                        overrides=dict(chunk_groups=1))))
        out.append((f"{mode}_g4096", dict(mode=mode, n=BASE_N, stack=tight,
                                          overrides=dict(group_size=4096))))
        out.append((f"{mode}_g2048", dict(mode=mode, n=BASE_N, stack=tight,
                                          overrides=dict(group_size=2048))))
        out.append((f"{mode}_r1", dict(mode=mode, n=BASE_N, stack=tight,
                                       overrides=dict(refine_levels=1))))
        out.append((f"{mode}_r2", dict(mode=mode, n=BASE_N, stack=tight,
                                       overrides=dict(refine_levels=2))))
        out.append((f"{mode}_rnp4096", dict(
            mode=mode, n=BASE_N, stack=tight,
            overrides=dict(refine_near_particle_cap=4096))))
        out.append((f"{mode}_rfr256", dict(
            mode=mode, n=BASE_N, stack=tight,
            overrides=dict(refine_frontier=256))))
    return out


# ---------------------------------------------------------------- child


def child_main(cfg):
    import threading

    cap = float(cfg.get("rss_cap_gb", RSS_CAP_GB))

    def rss_gb():
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1048576
        return 0.0

    peak = [0.0]

    def watchdog():
        while True:
            time.sleep(2)
            r = rss_gb()
            if r > peak[0]:
                peak[0] = r
                print(f"[rss] {r:.1f}", flush=True)
            if r > cap:
                print(f"[rss] {r:.1f} CAP", flush=True)
                os._exit(42)

    if cfg["mode"] == "domain":
        # must land before jax import.  Collective timeouts: 8 virtual
        # devices share ONE core, so a big program trivially starves a
        # device past the default 40 s rendezvous and the run F-aborts
        # in CollectivePermute (CLAUDE.md) — raise them for the execute
        # phase.
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
            + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
            + " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
            + " --xla_cpu_collective_timeout_seconds=7200")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from nbody_tpu.core.state import ParticleState, SimParams
    from nbody_tpu.ops.traversal import (ADAPTIVE_TIGHT_OVERRIDES,
                                         ADAPTIVE_OVERRIDES, BHConfig,
                                         bh_accel)

    threading.Thread(target=watchdog, daemon=True).start()

    n = cfg["n"]
    stack = {"tight": ADAPTIVE_TIGHT_OVERRIDES,
             "deep": ADAPTIVE_OVERRIDES,
             "none": {}}[cfg["stack"]]
    ov = {**stack, **cfg.get("overrides", {})}
    bh_cfg = BHConfig.auto_for(n, **ov)
    print(f"[cfg] group={bh_cfg.group_size} cg={bh_cfg.chunk_groups} "
          f"L={bh_cfg.max_level} R={bh_cfg.refine_levels} "
          f"rnp={bh_cfg.refine_near_particle_cap} "
          f"rfr={bh_cfg.refine_frontier}", flush=True)

    # tiny synthetic state: compile footprint is what we measure, the
    # data never executes.  numpy-built (CLAUDE.md: never eager).
    rng = np.random.default_rng(0)
    pos = rng.standard_normal((n, 3)).astype(np.float32)
    vel = np.zeros((n, 3), np.float32)
    mass = np.ones((n,), np.float32)
    state = ParticleState.create(pos, vel, mass, capacity=n,
                                 dtype=jnp.float32)
    params = SimParams.create(g_soft=0.02, theta2=1.0, bounds_width=10.0,
                              dtype=jnp.float32)
    m = state.effective_mass()

    t0 = time.perf_counter()
    if cfg["mode"] == "single":
        fn = jax.jit(lambda p, mm: bh_accel(
            p, mm, params.bounds, params.theta2, params.g, params.g_soft,
            bh_cfg)[0])
        lowered = fn.lower(state.pos, m)
    else:
        from jax.sharding import PartitionSpec as P

        from nbody_tpu.parallel.domain import domain_accel
        from nbody_tpu.parallel.mesh import PARTICLE_AXIS, make_mesh

        mesh = make_mesh(8)

        def body(p_loc, m_loc):
            return domain_accel(p_loc, m_loc, params.bounds, params.theta2,
                                params.g, params.g_soft, bh_cfg,
                                PARTICLE_AXIS, 8)[0]

        sm = jax.shard_map(
            body, mesh=mesh, in_specs=(P(PARTICLE_AXIS), P(PARTICLE_AXIS)),
            out_specs=P(PARTICLE_AXIS), check_vma=False)
        fn = jax.jit(sm)
        lowered = fn.lower(state.pos, m)
    print(f"[phase] lowered {time.perf_counter() - t0:.0f}s "
          f"rss {rss_gb():.1f}", flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"[phase] compiled {time.perf_counter() - t0:.0f}s "
          f"rss {rss_gb():.1f} peak {peak[0]:.1f}", flush=True)
    try:
        ma = compiled.memory_analysis()
        print(f"[mem] temp {ma.temp_size_in_bytes / 1e9:.2f}GB "
              f"args {ma.argument_size_in_bytes / 1e9:.2f}GB "
              f"out {ma.output_size_in_bytes / 1e9:.2f}GB "
              f"code {ma.generated_code_size_in_bytes / 1e6:.1f}MB",
              flush=True)
    except Exception as e:  # backend-dependent API
        print(f"[mem] unavailable: {e}", flush=True)
    if cfg.get("dump_big_shapes"):
        # scan the optimized HLO for the monster buffers
        import re as _re

        txt = compiled.as_text()
        sizes = {}
        for m_ in _re.finditer(r"(f32|s32|u32|pred|f64|s64)\[([\d,]+)\]",
                               txt):
            dims = [int(x) for x in m_.group(2).split(",") if x]
            nel = 1
            for d in dims:
                nel *= d
            bs = nel * (8 if "64" in m_.group(1) else
                        1 if m_.group(1) == "pred" else 4)
            key = f"{m_.group(1)}[{m_.group(2)}]"
            sizes[key] = max(sizes.get(key, 0), bs)
        for k, v in sorted(sizes.items(), key=lambda kv: -kv[1])[:12]:
            print(f"[shape] {v / 1e9:8.3f}GB {k}", flush=True)
    if cfg.get("execute", True):
        t0 = time.perf_counter()
        out = compiled(state.pos, m)
        out = jax.block_until_ready(out)
        print(f"[phase] executed {time.perf_counter() - t0:.0f}s "
              f"rss {rss_gb():.1f} peak {peak[0]:.1f}", flush=True)
    print("[done]", flush=True)


# --------------------------------------------------------------- parent


def parse_tail(text):
    info = {"peak_rss_gb": 0.0, "phase": "lower", "lower_s": None,
            "compile_s": None, "execute_s": None}
    for line in text.splitlines():
        if line.startswith("[rss]"):
            info["peak_rss_gb"] = max(info["peak_rss_gb"],
                                      float(line.split()[1]))
        elif line.startswith("[phase] lowered"):
            info["phase"] = "compile"
            info["lower_s"] = float(line.split()[2].rstrip("s"))
        elif line.startswith("[phase] compiled"):
            info["phase"] = "execute"
            info["compile_s"] = float(line.split()[2].rstrip("s"))
        elif line.startswith("[phase] executed"):
            info["phase"] = "done"
            info["execute_s"] = float(line.split()[2].rstrip("s"))
        elif line.startswith("[cfg]"):
            info["cfg_line"] = line[6:]
    return info


def main():
    only = set(sys.argv[1:])
    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["name"])
                except Exception:
                    pass
    for name, cfg in configs():
        if only and name not in only:
            continue
        if name in done:
            print(f"skip {name} (done)", flush=True)
            continue
        print(f"=== {name}: {cfg}", flush=True)
        t0 = time.perf_counter()
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 json.dumps(cfg)],
                capture_output=True, text=True, timeout=CHILD_TIMEOUT_S,
                cwd=ROOT)
            rc, out = r.returncode, r.stdout + r.stderr
        except subprocess.TimeoutExpired as e:
            rc, out = -9, ((e.stdout or b"").decode(errors="replace")
                           if isinstance(e.stdout, bytes)
                           else (e.stdout or ""))
        info = parse_tail(out)
        verdict = ("ok" if rc == 0 else
                   "rss_cap" if rc == 42 else
                   "timeout" if rc == -9 else f"rc{rc}")
        rec = {"name": name, **cfg, **info, "verdict": verdict,
               "wall_s": round(time.perf_counter() - t0, 1),
               "rss_cap_gb": RSS_CAP_GB, "ts": time.time()}
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"--- {name}: {verdict} peak {info['peak_rss_gb']:.1f} GB "
              f"phase {info['phase']} wall {rec['wall_s']}s", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child_main(json.loads(sys.argv[2]))
    else:
        main()
