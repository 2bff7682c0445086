#!/usr/bin/env python
"""Scene-detection robustness table (VERDICT r4 #8).

The steep-core auto-detection cut (STEEP_CONTRAST = 40) was calibrated
on two families at a handful of (N, width) points: disc 13-15, Plummer
54-8435.  This script measures the occupancy-contrast statistic across
>= 5 scene families x 3 N values (positions only — detection never sees
velocities), appending rows to results/scene_contrast.jsonl and printing
the table for VALIDATION.md.  numpy-only; runs on the host CPU in
seconds per row.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from nbody_tpu.ops.traversal import (STEEP_CONTRAST,  # noqa: E402
                                     detect_scene_profile, scene_occupancy)
from nbody_tpu.scenes import (disc_bulge, hernquist_sphere,  # noqa: E402
                              plummer_sphere, self_gravitating_disc,
                              uniform_cube)

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "results", "scene_contrast.jsonl")

# (family, width, builder) — widths are each family's natural benchmark
# box (disc w10 is the headline config; Plummer/Hernquist get the w40
# box the adaptive tuning used and their own tight boxes).
FAMILIES = [
    ("disc", 10.0, lambda n, s: self_gravitating_disc(n, seed=s)[0]),
    ("cube", 10.0, lambda n, s: uniform_cube(n, width=8.0, seed=s)[0]),
    ("plummer_w40", 40.0, lambda n, s: plummer_sphere(n, scale=1.0,
                                                      seed=s)[0]),
    ("plummer_w10", 10.0, lambda n, s: plummer_sphere(n, scale=1.0,
                                                      seed=s)[0]),
    ("hernquist_w40", 40.0, lambda n, s: hernquist_sphere(n, scale=1.0,
                                                          seed=s)[0]),
    ("hernquist_w10", 10.0, lambda n, s: hernquist_sphere(n, scale=1.0,
                                                          seed=s)[0]),
    ("disc_bulge", 10.0, lambda n, s: disc_bulge(n, seed=s)[0]),
    ("disc_bulge_heavy", 10.0,
     lambda n, s: disc_bulge(n, bulge_frac=0.5, bulge_scale=0.2,
                             seed=s)[0]),
]
NS = [1 << 17, 1 << 20, 1 << 22]
CENTER = (0.0, 0.0, 0.0)


def main():
    done = set()
    if os.path.exists(OUT):
        for line in open(OUT):
            try:
                done.add(json.loads(line)["name"])
            except Exception:
                pass
    rows = []
    for fam, width, build in FAMILIES:
        for n in NS:
            name = f"{fam}_n{n >> 10}k"
            if name in done:
                continue
            pos = build(n, 0)
            occ = scene_occupancy(pos, CENTER, width)
            prof = detect_scene_profile(pos, CENTER, width, occupancy=occ)
            rec = {"name": name, "family": fam, "n": n, "width": width,
                   "contrast": round(occ["contrast"], 1),
                   "frac_over128_l7": round(occ["frac_over128_l7"], 4),
                   "n_in": occ["n_in"], "profile": prof,
                   "cut": STEEP_CONTRAST, "ts": time.time()}
            rows.append(rec)
            os.makedirs(os.path.dirname(OUT), exist_ok=True)
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(f"{name:28s} contrast {rec['contrast']:8.1f}  "
                  f"frac128 {rec['frac_over128_l7']:7.4f}  -> {prof}",
                  flush=True)


if __name__ == "__main__":
    main()
