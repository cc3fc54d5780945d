"""Reproduce the bench's order-3 10M leg (BENCH r4a: ResourceExhausted)
with a full traceback + device-bytes accounting, standalone.

Usage: python benchmarks/o3_oom.py [N]
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000


def main():
    from pynbodyext_tpu.gravity.tree import Octree
    from pynbodyext_tpu.gravity import tree_tpu as tt

    rng = np.random.default_rng(0)
    rt = rng.exponential(3.0, N)
    vt = rng.normal(size=(N, 3))
    vt /= np.linalg.norm(vt, axis=1, keepdims=True)
    pos = vt * rt[:, None]
    mass = rng.uniform(0.5, 2.0, N)

    from pynbodyext_tpu.gravity.tree import stage_records
    stage_records()
    t0 = time.perf_counter()
    tree = Octree(pos, mass, leaf_capacity=128, multipole_order=3)
    print(f"build: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    prep = tt.prepare_tree_pallas(tree, theta=0.7, group_leaves=8)
    print(f"prep: {time.perf_counter() - t0:.1f}s  far_pre="
          f"{prep['far_pre']}", flush=True)
    agg = {}
    for lbl, s in stage_records():
        agg[lbl] = round(agg.get(lbl, 0.0) + s, 2)
    print(f"  stages: {agg}", flush=True)
    # device-resident class payload accounting
    tot = 0
    for lbl in ("far_classes", "gfar_classes"):
        if lbl in prep:
            for e in prep[lbl][0]:
                tot += e[2].nbytes
    print(f"class payload device bytes: {tot/1e9:.2f} GB "
          f"(tiles {prep['tiles'].nbytes/1e9:.2f} GB)", flush=True)

    for accel in (False, True):
        fn = (tt.tree_accelerations_device_pallas if accel
              else tt.tree_potentials_device_pallas)
        lbl = "acc" if accel else "pot"
        r = fn(tree, prep=prep)  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn(tree, prep=prep)
            ts.append(round(time.perf_counter() - t0, 2))
        print(f"o3 {lbl}: median {sorted(ts)[1]:.2f}s all={ts}", flush=True)
        print(f"  legs: {dict(tt.EVAL_INFO)}", flush=True)


if __name__ == "__main__":
    main()
