"""Executable spec for the in-browser engine (nbody_tpu/vis/static/sim.js).

No JS runtime exists in this image (no node/quickjs/browser), so sim.js —
the analog of the reference's WASM client-side run-mode (reference
Cargo.toml:33-46, src/vis.rs:384-412) — is validated by a line-for-line
Python transliteration of its Octree + step loop, checked against this
repo's own exact brute force.  If sim.js's algorithm changes, this port
must change with it (both cite each other).

Covers:
  * pointer-octree insert/split/finalize/force matches exact summation
    (theta2=0) and is BH-accurate at theta2=1
  * the step_by sequence (half drift -> retain cull -> force -> kick +
    half drift) conserves energy at benchmark dt
  * the cull really deletes out-of-bounds particles (Vec::retain analog)
  * the disc-scene formulas match scenes/disc.py (same formulas, the JS
    PRNG stream differs — distribution-level check)
"""

from __future__ import annotations

import numpy as np
import pytest

from nbody_tpu.scenes.disc import self_gravitating_disc

MAX_DEPTH = 32


class PyOctree:
    """Transliteration of sim.js's Octree (arena layout flattened into
    Python lists; same insert/split/finalize/force control flow)."""

    def __init__(self):
        self.child = []
        self.pidx = []
        self.com = []
        self.m = []
        self.c = []
        self.hw = []

    def alloc(self, cx, cy, cz, hw):
        self.child.append(-1)
        self.pidx.append(-1)
        self.com.append([0.0, 0.0, 0.0])
        self.m.append(0.0)
        self.c.append([cx, cy, cz])
        self.hw.append(hw)
        return len(self.m) - 1

    def build(self, pos, mass, center, half_width):
        root = self.alloc(center[0], center[1], center[2], half_width)
        for p in range(len(mass)):
            self.insert(root, pos, mass, p, 0)
        self.finalize(root)
        return root

    def octant(self, node, pos, p):
        return (
            (1 if pos[p][0] > self.c[node][0] else 0)
            | (2 if pos[p][1] > self.c[node][1] else 0)
            | (4 if pos[p][2] > self.c[node][2] else 0)
        )

    def insert(self, node, pos, mass, p, depth):
        while True:
            if self.pidx[node] == -1 and self.child[node] == -1:
                self.pidx[node] = p
                self.m[node] = mass[p]
                self.com[node] = list(pos[p])
                return
            if self.child[node] == -1:
                if depth >= MAX_DEPTH:
                    m0, m1 = self.m[node], mass[p]
                    mt = m0 + m1
                    if mt > 0:
                        self.com[node] = [
                            (self.com[node][k] * m0 + pos[p][k] * m1) / mt
                            for k in range(3)
                        ]
                    self.m[node] = mt
                    return
                q = self.pidx[node]
                base = len(self.m)
                h = self.hw[node] / 2
                for k in range(8):
                    self.alloc(
                        self.c[node][0] + (h if k & 1 else -h),
                        self.c[node][1] + (h if k & 2 else -h),
                        self.c[node][2] + (h if k & 4 else -h),
                        h,
                    )
                self.child[node] = base
                self.pidx[node] = -1
                self.m[node] = 0.0
                self.insert(
                    base + self.octant(node, pos, q), pos, mass, q, depth + 1
                )
            node = self.child[node] + self.octant(node, pos, p)
            depth += 1

    def finalize(self, node):
        if self.child[node] == -1:
            return
        m = 0.0
        acc = [0.0, 0.0, 0.0]
        for k in range(8):
            c = self.child[node] + k
            self.finalize(c)
            m += self.m[c]
            for j in range(3):
                acc[j] += self.com[c][j] * self.m[c]
        self.m[node] = m
        if m > 0:
            self.com[node] = [a / m for a in acc]

    def force(self, pos, p, theta2, g, soft2):
        px, py, pz = pos[p]
        ax = ay = az = 0.0
        stack = [0]
        while stack:
            node = stack.pop()
            m = self.m[node]
            if m == 0:
                continue
            dx = self.com[node][0] - px
            dy = self.com[node][1] - py
            dz = self.com[node][2] - pz
            d2 = dx * dx + dy * dy + dz * dz
            leaf = self.child[node] == -1
            w = 2 * self.hw[node]
            if leaf or w * w < theta2 * d2:
                if leaf and self.pidx[node] == p:
                    continue
                if d2 == 0:
                    continue
                inv = 1.0 / np.sqrt(d2 + soft2)
                f = g * m * inv * inv * inv
                ax += f * dx
                ay += f * dy
                az += f * dz
            else:
                base = self.child[node]
                stack.extend(range(base, base + 8))
        return np.array([ax, ay, az])


def py_forces(pos, mass, theta2, g=1.0, g_soft=0.02, bounds_width=20.0):
    tree = PyOctree()
    tree.build(pos, mass, [0.0, 0.0, 0.0], bounds_width / 2)
    return np.stack(
        [tree.force(pos, p, theta2, g, g_soft * g_soft) for p in range(len(mass))]
    )


def exact_forces(pos, mass, g=1.0, g_soft=0.02):
    d = pos[None, :, :] - pos[:, None, :]
    r2 = (d * d).sum(-1) + g_soft * g_soft
    np.fill_diagonal(r2, np.inf)
    w = g * mass[None, :] / r2 ** 1.5
    return (w[..., None] * d).sum(1)


@pytest.fixture(scope="module")
def scene():
    pos, vel, mass = self_gravitating_disc(511, seed=3)
    return pos, vel, mass


def test_theta0_matches_exact(scene):
    """theta2=0 never accepts an internal node -> exact summation."""
    pos, _, mass = scene
    got = py_forces(pos, mass, theta2=0.0)
    want = exact_forces(pos, mass)
    scale = np.linalg.norm(want, axis=1) + 1e-12
    err = np.linalg.norm(got - want, axis=1) / scale
    assert err.max() < 1e-10, err.max()


def test_bh_accuracy_scales_with_theta(scene):
    """Monopole-walk error envelope: measured n=512 disc values are p99
    8.4e-3 / 2.4e-2 / 8.6e-2 at theta2 = 0.25 / 0.5 / 1.0 (plain monopole
    — the TPU path's quad multipoles are tighter).  Assert each with
    headroom plus strict monotone growth in theta: a broken acceptance
    test fails the scaling even when it passes a single loose bound."""
    pos, _, mass = scene
    want = exact_forces(pos, mass)
    scale = np.linalg.norm(want, axis=1) + 1e-12
    p99 = {}
    for t2 in (0.25, 0.5, 1.0):
        got = py_forces(pos, mass, theta2=t2)
        err = np.linalg.norm(got - want, axis=1) / scale
        p99[t2] = np.quantile(err, 0.99)
    assert p99[0.25] < 2e-2, p99
    assert p99[0.5] < 5e-2, p99
    assert p99[1.0] < 1.5e-1, p99
    assert p99[0.25] < p99[0.5] < p99[1.0], p99


def step_by(pos, vel, mass, dt, theta2=1.0, g=1.0, g_soft=0.02, bw=20.0):
    """sim.js LocalSim.stepBy: half drift -> retain cull -> force -> kick +
    half drift."""
    pos = pos + vel * (dt / 2)
    hw = bw / 2
    keep = np.all((pos >= -hw) & (pos <= hw), axis=1)
    pos, vel, mass = pos[keep], vel[keep], mass[keep]
    acc = py_forces(pos, mass, theta2, g, g_soft, bw)
    vel = vel + acc * dt
    pos = pos + vel * (dt / 2)
    return pos, vel, mass


def energy(pos, vel, mass, g=1.0, g_soft=0.02):
    ke = 0.5 * (mass * (vel * vel).sum(1)).sum()
    d = pos[None, :, :] - pos[:, None, :]
    r = np.sqrt((d * d).sum(-1) + g_soft * g_soft)
    iu = np.triu_indices(len(mass), 1)
    pe = -(g * mass[iu[0]] * mass[iu[1]] / r[iu]).sum()
    return ke + pe


def test_energy_drift(scene):
    """50 benchmark-dt steps of the browser stepper: |dE/E| bounded.  The
    drift here is dominated by the theta2=1 MONOPOLE force error (measured
    1.6e-3; the symplectic integrator itself is f64 end-to-end), so the
    gate is 5e-3 — display-quality, not the TPU quad path's envelope."""
    pos, vel, mass = scene
    e0 = energy(pos, vel, mass)
    for _ in range(50):
        pos, vel, mass = step_by(pos, vel, mass, 3e-2)
    e1 = energy(pos, vel, mass)
    assert abs((e1 - e0) / e0) < 5e-3, (e0, e1)


def test_cull_retains():
    """Out-of-bounds particles are deleted, in-bounds survive (the JS path
    mirrors the reference's Vec::retain, src/shared.rs:95-101)."""
    pos = np.array([[0.0, 0, 0], [100.0, 0, 0], [1.0, 1, 1]])
    vel = np.zeros_like(pos)
    mass = np.array([1.0, 1.0, 1.0])
    p2, v2, m2 = step_by(pos, vel, mass, 0.0)
    assert len(m2) == 2


def test_rewind_retraces(scene):
    """step(+dt) then step(-dt) returns to the start (no cull crossings) —
    the browser path's ArrowLeft rewind semantics."""
    pos, vel, mass = scene
    p1, v1, m1 = step_by(pos, vel, mass, 3e-2)
    p2, v2, m2 = step_by(p1, v1, m1, -3e-2)
    assert len(m2) == len(mass)
    assert np.abs(p2 - pos).max() < 1e-9
    assert np.abs(v2 - vel).max() < 1e-9


def test_sim_js_served_and_referenced():
    """index.html loads sim.js; the server exposes the /sim.js route; the
    static file parses as balanced JS (crude brace check — no JS runtime
    in this image)."""
    import os

    import nbody_tpu.vis.server as srv

    static = os.path.join(os.path.dirname(srv.__file__), "static")
    js = open(os.path.join(static, "sim.js")).read()
    html = open(os.path.join(static, "index.html")).read()
    assert 'src="sim.js"' in html
    assert "LocalSim" in js and "startLocal" in html
    assert '"/sim.js"' in open(srv.__file__).read()
    for o, c in ["{}", "()", "[]"]:
        assert js.count(o) == js.count(c), (o, js.count(o), js.count(c))
