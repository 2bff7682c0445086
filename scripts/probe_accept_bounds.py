"""Measure how much of the collect-walk acceptance tensor a two-stage
bound scheme could skip — BEFORE building it (the round-3 rule: arithmetic
or measurement first).

The walk's dominant cost at 1M is the [F, S, 3] box-distance tensor
(VALIDATION.md §13: S=64 halves the 34 ms walk but explodes the near
field).  A two-stage EXACT-equivalent test:

  stage 1 (cheap, [F, K, 3] with K in {1 group box, 8 super boxes}):
    * lower bound  rlo2 <= rmin2: distance to a COVERING box (group box or
      the 8 bounding boxes of 16 subgroups each).  If
      w2 < margin*theta2*rlo2 the node is ACCEPT-SURE.
    * upper bound  rhi2 >= rmin2: min over super boxes of
      (dist(com, superbox) + diam(superbox))^2 — some subgroup inside that
      super box is at most that far.  If w2 >= margin*theta2*rhi2 the node
      is REJECT-SURE (must expand).
  stage 2: the full [shell, S, 3] test only for undecided nodes.

This script replays the EXACT walk (same schedule, caps, covered-window
logic as ops/traversal._group_collect) in numpy on a sample of groups at
the shipped 1M config and reports the per-level decided fractions.  If
the shell is small, stage 2 on a compacted buffer wins; if not, the lever
dies here — either way the numbers go in VALIDATION.md.

Pure numpy on purpose: no contention with jit caches, exact control.
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from nbody_tpu.core.state import SimParams  # noqa: E402
from nbody_tpu.ops.traversal import BHConfig  # noqa: E402
from nbody_tpu.scenes.disc import self_gravitating_disc  # noqa: E402


def morton3(x, y, z, L):
    """Interleave 3x L-bit ints (numpy, vectorized)."""
    code = np.zeros(x.shape, np.int64)
    for b in range(L):
        code |= ((x >> b) & 1).astype(np.int64) << (3 * b + 2)
        code |= ((y >> b) & 1).astype(np.int64) << (3 * b + 1)
        code |= ((z >> b) & 1).astype(np.int64) << (3 * b + 0)
    return code


def main(n=1 << 20, sample_groups=16, seed=0):
    pos, vel, mass = self_gravitating_disc(n, seed=seed)
    pos = np.asarray(pos, np.float32)
    mass = np.asarray(mass, np.float32)
    params = SimParams.create(dt=1e-3, g_soft=0.0, theta2=1.0)
    cfg = BHConfig.auto_for(n)
    # capacity-pad to a group multiple with dead (mass-0) particles — the
    # engine parks them at the sorted tail via the sentinel code
    cap = -(-pos.shape[0] // cfg.group_size) * cfg.group_size
    padn = cap - pos.shape[0]
    pos = np.concatenate([pos, np.zeros((padn, 3), np.float32)])
    mass = np.concatenate([mass, np.zeros(padn, np.float32)])
    n = cap
    L = cfg.max_level
    S = cfg.subgroups
    B = cfg.group_size
    margin = cfg.accept_margin
    theta2 = 1.0

    # grid = half-leaf-cell-shifted bounds (ops/tree.grid_bounds)
    bc = np.asarray(params.bounds.center, np.float32)
    bw = float(params.bounds.width)
    cell = bw / (1 << L)
    gc0 = bc + cell * 0.5
    glo_dom = gc0 - bw / 2

    n_leaf = 1 << (3 * L)
    q = np.clip(((pos - glo_dom) / cell).astype(np.int64), 0, (1 << L) - 1)
    codes = morton3(q[:, 0], q[:, 1], q[:, 2], L)
    codes = np.where(mass > 0, codes, n_leaf)  # dead -> sorted tail
    order = np.argsort(codes, kind="stable")
    pos_s, mass_s, code_s = pos[order], mass[order], codes[order]

    # level tables: COM per cell per level + per-level cell widths
    leaf_m = np.zeros(n_leaf, np.float64)
    leaf_mp = np.zeros((n_leaf, 3), np.float64)
    al = code_s < n_leaf
    np.add.at(leaf_m, code_s[al], mass_s[al])
    np.add.at(leaf_mp, code_s[al], pos_s[al] * mass_s[al][:, None])
    level_m = [None] * (L + 1)
    level_mp = [None] * (L + 1)
    level_m[L], level_mp[L] = leaf_m, leaf_mp
    for l in range(L - 1, -1, -1):
        level_m[l] = level_m[l + 1].reshape(-1, 8).sum(1)
        level_mp[l] = level_mp[l + 1].reshape(-1, 8, 3).sum(1)
    # particle ranges per cell per level from leaf counts
    leaf_cnt = np.zeros(n_leaf, np.int64)
    np.add.at(leaf_cnt, code_s[al], 1)
    leaf_starts = np.concatenate([[0], np.cumsum(leaf_cnt)])

    cell_w2 = [(bw / (1 << l)) ** 2 for l in range(L + 1)]

    n_groups = n // B
    rng = np.random.default_rng(1)
    gsel = rng.choice(n_groups, size=min(sample_groups, n_groups),
                      replace=False)

    tot = np.zeros(L + 1, np.int64)        # tested (non-covered occupied)
    acc_sure_g = np.zeros(L + 1, np.int64)  # group-box lower bound decides
    acc_sure_8 = np.zeros(L + 1, np.int64)  # 8-super-box lower bound decides
    rej_sure_8 = np.zeros(L + 1, np.int64)  # 8-super-box upper bound decides
    acc_full = np.zeros(L + 1, np.int64)    # true accepts (full S test)

    def boxdist2(com, blo, bhi):
        """[F,3] x [K,3] -> [F,K] squared distance point-to-box (f64: the
        1e30 parked boxes overflow f32 squares to inf, which is fine
        semantically but noisy)."""
        d = np.maximum(blo[None] - com[:, None], 0) + np.maximum(
            com[:, None] - bhi[None], 0
        )
        d = d.astype(np.float64)
        return (d * d).sum(-1)

    for gi in gsel:
        gpos = pos_s[gi * B:(gi + 1) * B]
        gmass = mass_s[gi * B:(gi + 1) * B]
        has = (gmass > 0).reshape(S, -1)
        spos = gpos.reshape(S, -1, 3)
        big = np.float32(np.finfo(np.float32).max)
        slo = np.where(has[..., None], spos, big).min(1)
        shi = np.where(has[..., None], spos, -big).max(1)
        alive = has.any(1)
        slo = np.where(alive[:, None], slo, 1e30)
        shi = np.where(alive[:, None], shi, 1e30)
        # group box over alive members
        glo = np.where(has[..., None], spos, big).reshape(-1, 3).min(0)
        ghi = np.where(has[..., None], spos, -big).reshape(-1, 3).max(0)
        # 8 super boxes = bounding boxes of S//8 consecutive ALIVE subgroup
        # boxes (the 1e30 parked boxes of dead subgroups must not leak into
        # extents: they would both inflate the box — underestimating the
        # lower-bound distance — and zero the diam, breaking the upper bound)
        K = 8
        slo_m = np.where(alive[:, None], slo, big)
        shi_m = np.where(alive[:, None], shi, -big)
        slo8 = slo_m.reshape(K, -1, 3).min(1)
        shi8 = shi_m.reshape(K, -1, 3).max(1)
        alive8 = alive.reshape(K, -1).any(1)
        slo8 = np.where(alive8[:, None], slo8, 1e30)
        shi8 = np.where(alive8[:, None], shi8, 1e30)
        diam8 = np.where(
            alive8, np.linalg.norm((shi8 - slo8).astype(np.float64), axis=1),
            np.inf,
        )

        wstart = max(0, gi * B - cfg.window_pad)
        wend = min(n, wstart + B + 2 * cfg.window_pad)

        ids = np.arange(8 ** cfg.start_level)
        for l in range(cfg.start_level, L + 1):
            m = level_m[l][ids]
            occ = m > 0
            com = level_mp[l][ids] / np.where(occ, m, 1)[:, None]
            com = com.astype(np.float32)
            stride = 1 << (3 * (L - l))
            cs = leaf_starts[ids * stride]
            ce = leaf_starts[(ids + 1) * stride]
            covered = occ & (cs >= wstart) & (ce <= wend)
            test = occ & ~covered
            idsT = ids[test]
            comT = com[test]
            w2 = cell_w2[l]
            thr = margin * theta2

            rmin2 = boxdist2(comT, slo, shi).min(-1)
            accept = w2 < thr * rmin2
            rlo2_g = boxdist2(comT, glo[None], ghi[None])[:, 0]
            rlo2_8 = boxdist2(comT, slo8, shi8)
            rhi = np.sqrt(rlo2_8) + diam8[None]
            rhi2 = np.where(np.isfinite(diam8)[None], rhi * rhi,
                            np.inf).min(-1)

            tot[l] += idsT.size
            acc_sure_g[l] += int((w2 < thr * rlo2_g).sum())
            acc_sure_8[l] += int((w2 < thr * rlo2_8.min(-1)).sum())
            rej_sure_8[l] += int((w2 >= thr * rhi2).sum())
            acc_full[l] += int(accept.sum())
            # sanity: bounds must bracket the exact test
            assert ((w2 < thr * rlo2_g) <= accept).all()
            assert ((w2 < thr * rlo2_8.min(-1)) <= accept).all()
            assert ((w2 >= thr * rhi2) <= ~accept).all()

            expand = test.copy()
            expand[test] = ~accept
            if l < L:
                ids = (ids[expand][:, None] * 8 + np.arange(8)).ravel()

    out = []
    for l in range(cfg.start_level, L + 1):
        t = int(tot[l])
        if t == 0:
            continue
        shell8 = t - int(acc_sure_8[l]) - int(rej_sure_8[l])
        out.append(dict(
            level=l, tested=t,
            accept_frac=round(acc_full[l] / t, 4),
            group_lb_decides=round(acc_sure_g[l] / t, 4),
            super8_lb_decides=round(acc_sure_8[l] / t, 4),
            super8_ub_decides=round(rej_sure_8[l] / t, 4),
            shell_frac=round(shell8 / t, 4),
        ))
    T = int(tot.sum())
    shell_total = T - int(acc_sure_8.sum()) - int(rej_sure_8.sum())
    summary = dict(
        n=n, groups=len(gsel), S=S, B=B, margin=margin,
        tested_total=T,
        group_lb_total=round(acc_sure_g.sum() / T, 4),
        super8_decided_total=round(
            (acc_sure_8.sum() + rej_sure_8.sum()) / T, 4),
        shell_total_frac=round(shell_total / T, 4),
        # stage-1 cost is K/S of the full tensor; stage-2 only on the shell
        est_tensor_cost_vs_now=round(
            (8 / S) + shell_total / T, 4),
    )
    for row in out:
        print(json.dumps(row))
    print(json.dumps(summary))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    main(n)
