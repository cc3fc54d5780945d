"""10M: MXU far engine vs default + host-only prep cache timings."""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    from pynbodyext_tpu.gravity import tree_tpu
    from pynbodyext_tpu.gravity.prep_cache import (load_tree_prep,
                                                   save_tree_prep)
    from pynbodyext_tpu.gravity.tree import Octree

    rng = np.random.default_rng(0)
    rt = rng.exponential(3.0, n)
    vt = rng.normal(size=(n, 3))
    vt /= np.linalg.norm(vt, axis=1, keepdims=True)
    pos_t = vt * rt[:, None]
    m_t = rng.uniform(0.5, 2.0, n)

    t0 = time.perf_counter()
    tree = Octree(pos_t, m_t, leaf_capacity=128, multipole_order=0)
    prep = tree_tpu.prepare_tree_pallas(tree, theta=0.7, group_leaves=8)
    print(f"build+prep {time.perf_counter()-t0:.1f} s", flush=True)

    def med(label, fn, warm=1, reps=3):
        for _ in range(warm):
            fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        print(f"  {label:28s} {sorted(ts)[len(ts)//2]:7.2f} s "
              f"(all: {' '.join(f'{t:.2f}' for t in ts)})", flush=True)

    for eng in ("auto", "mxu"):
        med(f"leaf far pot [{eng}]",
            lambda e=eng: tree_tpu._far_eval(prep, accel=False,
                                             interpret=False, far_engine=e))
        med(f"group far pot [{eng}]",
            lambda e=eng: tree_tpu._group_far_eval(prep, accel=False,
                                                   far_engine=e))
        med(f"leaf far accel [{eng}]",
            lambda e=eng: tree_tpu._far_eval(prep, accel=True,
                                             interpret=False, far_engine=e))
        med(f"group far accel [{eng}]",
            lambda e=eng: tree_tpu._group_far_eval(prep, accel=True,
                                                   far_engine=e))
    # cross-validate mxu vs auto on the device (far only)
    fa = tree_tpu._far_eval(prep, accel=False, interpret=False)
    fm = tree_tpu._far_eval(prep, accel=False, interpret=False,
                            far_engine="mxu")
    rel = np.abs((fm - fa) / np.maximum(np.abs(fa), 1e-6))
    print(f"far pot mxu-vs-auto rel: max {rel.max():.2e} "
          f"median {np.median(rel):.2e}", flush=True)

    med("TOTAL accel [far=mxu]",
        lambda: tree_tpu.tree_accelerations_device_pallas(
            tree, prep=prep, far_engine="mxu"))
    med("TOTAL pot [far=mxu]",
        lambda: tree_tpu.tree_potentials_device_pallas(
            tree, prep=prep, far_engine="mxu"))

    path = "/tmp/pnx_prep_cache_v5.pkl"
    t0 = time.perf_counter()
    save_tree_prep(prep, path)
    print(f"prep cache save {time.perf_counter()-t0:.1f} s", flush=True)
    # free the first prep's ~8 GB of HBM before the reload (a process
    # holds ONE prep in real use; two 10M preps exceed 16 GB)
    import gc
    del prep
    gc.collect()
    t0 = time.perf_counter()
    prep2 = load_tree_prep(path)
    print(f"prep cache load {time.perf_counter()-t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    phi = tree_tpu.tree_potentials_device_pallas(None, prep=prep2)
    print(f"first solve on cached prep {time.perf_counter()-t0:.1f} s "
          f"phi0={phi[0]:.4e}", flush=True)
    import os
    print(f"cache file {os.path.getsize(path)/1e9:.2f} GB", flush=True)


if __name__ == "__main__":
    main()
