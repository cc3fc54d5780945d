"""Reproduce the bench's accel slowdown (BENCH r4a: accel legs 3-4x the
builder's same-run shootout medians while pot legs matched).

Runs, in ONE process on the real TPU, with device memory stats between
steps:
  1. load cached 10M prep (.bench_cache/prof_prep_10000000.pkl)
  2. accel legs ISOLATED (diag near, mxu_t far leaf, mxu_t far group)
  3. pot e2e (tree_potentials_device_pallas)
  4. accel e2e x3 (tree_accelerations_device_pallas) -- the bench's exact
     call -- to see whether step-3 state degrades it.
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
STEPS = sys.argv[2].split(",") if len(sys.argv) > 2 else None


def memstats(tag):
    import jax
    try:
        ms = jax.local_devices()[0].memory_stats() or {}
        print(f"[mem {tag}] in_use={ms.get('bytes_in_use', 0)/1e9:.2f} GB "
              f"peak={ms.get('peak_bytes_in_use', 0)/1e9:.2f} GB "
              f"limit={ms.get('bytes_limit', 0)/1e9:.2f} GB", flush=True)
    except Exception as e:
        print(f"[mem {tag}] unavailable: {type(e).__name__}: {e}",
              flush=True)


def med3(name, fn):
    fn()  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    m = sorted(ts)[1]
    print(f"{name:22s} median {m:7.2f}s  all={[round(t, 2) for t in ts]}",
          flush=True)
    return m


def main():
    from pynbodyext_tpu.gravity.prep_cache import load_tree_prep
    from pynbodyext_tpu.gravity.tree import Octree
    from pynbodyext_tpu.gravity import tree_tpu as tt

    rng = np.random.default_rng(0)
    rt = rng.exponential(3.0, N)
    vt = rng.normal(size=(N, 3))
    vt /= np.linalg.norm(vt, axis=1, keepdims=True)
    pos = vt * rt[:, None]
    mass = rng.uniform(0.5, 2.0, N)

    pth = (pathlib.Path(__file__).resolve().parents[1] / ".bench_cache"
           / f"prof_prep_{N}.pkl")
    t0 = time.perf_counter()
    prep = load_tree_prep(pth)
    if prep is None:
        tree = Octree(pos, mass, leaf_capacity=128, multipole_order=0)
        prep = tt.prepare_tree_pallas(tree, theta=0.7, group_leaves=8)
    else:
        tree = Octree(pos, mass, leaf_capacity=128, multipole_order=0)
    print(f"prep ready: {time.perf_counter() - t0:.1f}s", flush=True)
    tt._ensure_far_classes(prep)
    kern = prep["kernel"] or tt.KERNEL_NONE
    memstats("after prep")

    def run(name):
        return STEPS is None or name in STEPS

    if run("cal"):
        import jax.numpy as jnp
        big = jnp.zeros((256, 1024, 128), jnp.float32) + 1.0  # 134 MB
        float(np.asarray(big[0, 0, 0]))
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(big)
            dt = time.perf_counter() - t0
            print(f"readback 134MB: {dt:6.3f}s = {0.134/dt:.2f} GB/s",
                  flush=True)
        small = jnp.zeros((640, 3, 128), jnp.float32) + 1.0  # 983 KB
        float(np.asarray(small[0, 0, 0]))
        t0 = time.perf_counter()
        for _ in range(20):
            np.asarray(small)
        dt = (time.perf_counter() - t0) / 20
        print(f"readback 983KB x20: {dt*1e3:.1f} ms each", flush=True)
        del big, small

    if run("nearab"):
        # accel_form A/B on the diag near engine (CLAUDE round-3 claims
        # conflict: the packed shootout crowned "diff", the diag line
        # says "accel (with transposed bundle) 24.4 s")
        def timed(name, fn):
            tt._PH.clear()
            med3(name, fn)
            print(f"  phases: {dict(tt._PH)}", flush=True)

        timed("neardiag_pot", lambda: tt._near_diag(prep, kern, False,
                                                    False))
        timed("neardiag_acc diff", lambda: tt._near_diag(prep, kern, False,
                                                         True))
        timed("neardiag_acc bundle_t",
              lambda: tt._near_diag(prep, kern, False, True,
                                    accel_form="bundle_t"))

    if run("iso"):
        med3("ISO neardiag_acc",
             lambda: tt._near_diag(prep, kern, False, True))
        memstats("after neardiag_acc")
        med3("ISO farleaf_acc_t",
             lambda: tt._far_eval(prep, accel=True, interpret=False,
                                  row_slice=slice(0, 3),
                                  far_engine="mxu_t"))
        memstats("after farleaf_acc_t")
        med3("ISO fargrp_acc_t",
             lambda: tt._group_far_eval(prep, accel=True, interpret=False,
                                        far_engine="mxu_t"))
        memstats("after fargrp_acc_t")

    if run("pot"):
        med3("E2E pot",
             lambda: tt.tree_potentials_device_pallas(tree, prep=prep))
        print("  pot legs:", dict(tt.EVAL_INFO), flush=True)
        memstats("after pot e2e")

    if run("acc"):
        med3("E2E acc",
             lambda: tt.tree_accelerations_device_pallas(tree, prep=prep))
        print("  acc legs:", dict(tt.EVAL_INFO), flush=True)
        memstats("after acc e2e")


if __name__ == "__main__":
    main()
