"""Stage-level profiling of the device-tree path (run on the TPU).

Usage: PNX_GRAVITY_TIMING=1 python benchmarks/profile_tree.py [N]

Prints prep stage timings (native build / lists / tiles / classes),
then per-leg eval timings (near packed, leaf-far, group-far) for both
potentials and accelerations, steady-state medians.
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pynbodyext_tpu.gravity import tree_tpu
    from pynbodyext_tpu.gravity.tree import Octree

    rng = np.random.default_rng(0)
    rt = rng.exponential(3.0, n)
    vt = rng.normal(size=(n, 3))
    vt /= np.linalg.norm(vt, axis=1, keepdims=True)
    pos_t = vt * rt[:, None]
    m_t = rng.uniform(0.5, 2.0, n)

    t0 = time.perf_counter()
    tree = Octree(pos_t, m_t, leaf_capacity=128, multipole_order=0)
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    prep = tree_tpu.prepare_tree_pallas(tree, theta=0.7, group_leaves=8)
    t_prep = time.perf_counter() - t0
    print(f"build {t_build:.1f} s   prep {t_prep:.1f} s   "
          f"n_leaves={prep['n_blocks']}", flush=True)

    kern = prep["kernel"] or "none"

    def med(fn, label, warm=1):
        for _ in range(warm):
            fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        print(f"  {label:28s} {sorted(ts)[len(ts)//2]:7.2f} s   "
              f"(all: {' '.join(f'{t:.2f}' for t in ts)})", flush=True)
        return sorted(ts)[len(ts) // 2]

    # lazy structures built here (timed as 'first near packed')
    t0 = time.perf_counter()
    tree_tpu._near_packed(prep, kern, False, accel=False)
    print(f"first near packed (incl. lazy builds + compile) "
          f"{time.perf_counter() - t0:.1f} s", flush=True)

    print("potentials legs:", flush=True)
    med(lambda: tree_tpu._near_packed(prep, kern, False, accel=False),
        "near packed", warm=0)
    med(lambda: tree_tpu._far_eval(prep, accel=False, interpret=False),
        "leaf far (pallas)")
    med(lambda: tree_tpu._group_far_eval(prep, accel=False),
        "group far (pallas)")
    med(lambda: tree_tpu._far_eval(prep, accel=False, interpret=False,
                                   far_engine="xla"),
        "leaf far (xla)")
    med(lambda: tree_tpu._group_far_eval(prep, accel=False,
                                         far_engine="xla"),
        "group far (xla)")
    med(lambda: tree_tpu.tree_potentials_device_pallas(tree, prep=prep),
        "TOTAL potentials", warm=0)

    print("acceleration legs:", flush=True)
    med(lambda: tree_tpu._near_packed(prep, kern, False, accel=True),
        "near packed", warm=1)
    med(lambda: tree_tpu._far_eval(prep, accel=True, interpret=False),
        "leaf far (pallas)")
    med(lambda: tree_tpu._group_far_eval(prep, accel=True),
        "group far (pallas)")
    med(lambda: tree_tpu._far_eval(prep, accel=True, interpret=False,
                                   far_engine="xla"),
        "leaf far (xla)")
    med(lambda: tree_tpu._group_far_eval(prep, accel=True,
                                         far_engine="xla"),
        "group far (xla)")
    med(lambda: tree_tpu.tree_accelerations_device_pallas(tree, prep=prep),
        "TOTAL accelerations", warm=0)


if __name__ == "__main__":
    main()
