"""Validate + time the new device-tree defaults on the real TPU.

1) 1M clustered: potentials+accels with near_engine='diag' (new auto)
   vs 'packed' — max deviation must sit at the f32 noise floor; times
   for both engines (same run).
2) 10M: _build_diag_band host cost on a cache-loaded prep, then e2e
   tree_potentials/accelerations under the new auto defaults.
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def clustered(n, rng):
    rt = rng.exponential(3.0, n)
    vt = rng.normal(size=(n, 3))
    vt /= np.linalg.norm(vt, axis=1, keepdims=True)
    return vt * rt[:, None], rng.uniform(0.5, 2.0, n)


def main():
    from pynbodyext_tpu.gravity.prep_cache import load_tree_prep
    from pynbodyext_tpu.gravity.tree import Octree
    from pynbodyext_tpu.gravity import tree_tpu as tt

    rng = np.random.default_rng(0)

    # ---- 1M cross-validation + timing --------------------------------
    pos, m = clustered(1_000_000, rng)
    tree = Octree(pos, m, leaf_capacity=128, multipole_order=0)
    prep = tt.prepare_tree_pallas(tree, theta=0.7, group_leaves=8)
    out = {}
    for eng in ("packed", "diag", "classes"):
        for accel in (False, True):
            fn = (tt.tree_accelerations_device_pallas if accel
                  else tt.tree_potentials_device_pallas)
            r = fn(tree, prep=prep, near_engine=eng)  # warm
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                r = fn(tree, prep=prep, near_engine=eng)
                ts.append(time.perf_counter() - t0)
            out[(eng, accel)] = np.asarray(r)
            print(f"1M {eng:8s} {'acc' if accel else 'pot'} median "
                  f"{sorted(ts)[1]:6.2f}s  all={[round(t, 2) for t in ts]}",
                  flush=True)
    for accel in (False, True):
        a = out[("packed", accel)]
        b = out[("diag", accel)]
        s = np.abs(a).max()
        print(f"1M diag vs packed {'acc' if accel else 'pot'}: "
              f"max|Δ|/scale {np.abs(b - a).max() / s:.2e}", flush=True)

    # ---- 10M: band build cost + e2e new defaults ---------------------
    rng = np.random.default_rng(0)
    pos, m = clustered(10_000_000, rng)
    cache = pathlib.Path(__file__).resolve().parents[1] / ".bench_cache"
    tree10 = Octree(pos, m, leaf_capacity=128, multipole_order=0)
    prep10 = load_tree_prep(cache / "prof_prep_10000000.pkl")
    if prep10 is None:
        prep10 = tt.prepare_tree_pallas(tree10, theta=0.7, group_leaves=8)
    t0 = time.perf_counter()
    tt._pack_dense_tiles(prep10, 5)
    t1 = time.perf_counter()
    tt._build_diag_band(prep10, 5, 8, 9, 4)
    t2 = time.perf_counter()
    print(f"10M pack_dense_tiles {t1 - t0:.1f}s  build_diag_band "
          f"{t2 - t1:.1f}s", flush=True)
    for accel in (False, True):
        fn = (tt.tree_accelerations_device_pallas if accel
              else tt.tree_potentials_device_pallas)
        r = fn(tree10, prep=prep10)  # warm (auto defaults)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn(tree10, prep=prep10)
            ts.append(time.perf_counter() - t0)
        print(f"10M auto {'acc' if accel else 'pot'} e2e median "
              f"{sorted(ts)[1]:6.2f}s  all={[round(t, 2) for t in ts]}",
              flush=True)
        print(f"  [0] = {np.asarray(r).reshape(-1)[0]:.6g}", flush=True)


if __name__ == "__main__":
    main()
