"""Round-4/5 prep profiling: cold 10M prep stage breakdown + warm
save/load/solve timings, standalone on the attached device.

Usage: python benchmarks/prep_profile_r4.py [N] [order]
       python benchmarks/prep_profile_r4.py --warm [N]   # load-only rerun
                # against the persistent /tmp/pnx-prep-prof cache (skips
                # the cold build; errors if no prior full run saved it)
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

args = [a for a in sys.argv[1:] if a != "--warm"]
WARM_ONLY = "--warm" in sys.argv[1:]
N = int(args[0]) if args else 10_000_000
ORDER = int(args[1]) if len(args) > 1 else 0
CACHE = pathlib.Path("/tmp/pnx-prep-prof") / f"prep-{N}-{ORDER}.pkl"


def agg_stages(records):
    agg = {}
    for lbl, s in records:
        agg[lbl] = round(agg.get(lbl, 0.0) + s, 2)
    return agg


def warm_only():
    from pynbodyext_tpu.gravity import tree_tpu as tt
    from pynbodyext_tpu.gravity.prep_cache import load_tree_prep
    from pynbodyext_tpu.gravity.tree import stage_records

    stage_records()
    t0 = time.perf_counter()
    prep2 = load_tree_prep(CACHE)
    float(np.asarray(prep2["tiles"][0, 0, 0]))  # sync tile upload
    load_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    phi_w = tt.tree_potentials_device_pallas(None, prep=prep2)
    solve_s = time.perf_counter() - t0
    print(f"warm load: {load_s:.1f}s  first solve: {solve_s:.1f}s  "
          f"phi0={float(phi_w[0]):.1f}", flush=True)
    print(f"  warm stages: {agg_stages(stage_records())}", flush=True)


def main():
    from pynbodyext_tpu.gravity import tree_tpu as tt
    from pynbodyext_tpu.gravity.prep_cache import (load_tree_prep,
                                                   save_tree_prep)
    from pynbodyext_tpu.gravity.tree import Octree, stage_records

    rng = np.random.default_rng(0)
    rt = rng.exponential(3.0, N)
    vt = rng.normal(size=(N, 3))
    vt /= np.linalg.norm(vt, axis=1, keepdims=True)
    pos = vt * rt[:, None]
    mass = rng.uniform(0.5, 2.0, N)

    stage_records()
    t0 = time.perf_counter()
    tree = Octree(pos, mass, leaf_capacity=128, multipole_order=ORDER)
    build_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    prep = tt.prepare_tree_pallas(tree, theta=0.7, group_leaves=8)
    prep_s = time.perf_counter() - t0
    print(f"build: {build_s:.1f}s  prep: {prep_s:.1f}s  "
          f"far_pre={prep['far_pre']}", flush=True)
    print(f"  stages: {agg_stages(stage_records())}", flush=True)

    phi = tt.tree_potentials_device_pallas(tree, prep=prep)  # warm/compile
    t0 = time.perf_counter()
    phi = tt.tree_potentials_device_pallas(tree, prep=prep)
    print(f"pot eval: {time.perf_counter() - t0:.2f}s", flush=True)

    pth = CACHE
    pth.parent.mkdir(parents=True, exist_ok=True)
    t0 = time.perf_counter()
    ok = save_tree_prep(prep, pth)
    print(f"save: {time.perf_counter() - t0:.1f}s ok={ok}", flush=True)
    stage_records()
    t0 = time.perf_counter()
    prep2 = load_tree_prep(pth)
    float(np.asarray(prep2["tiles"][0, 0, 0]))  # sync tile upload
    load_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    phi_w = tt.tree_potentials_device_pallas(None, prep=prep2)
    solve_s = time.perf_counter() - t0
    rel = float(np.max(np.abs((phi_w - phi) / phi)))
    print(f"warm load: {load_s:.1f}s  first solve: {solve_s:.1f}s  "
          f"rel={rel:.2e}", flush=True)
    print(f"  warm stages: {agg_stages(stage_records())}", flush=True)


if __name__ == "__main__":
    warm_only() if WARM_ONLY else main()
