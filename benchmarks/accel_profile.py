"""Per-leg timing of the 10M device-tree ACCELERATION path on the TPU.

Times each leg (packed near, leaf far, group far) separately for both the
potentials and accelerations variants on the SAME prep, median of 3 —
relay variance makes cross-run comparisons useless, so every ratio here is
same-run.  Prep is persisted to .bench_cache/ so reruns skip the ~2-min
host build.
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000


def med3(fn):
    fn()  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1], ts


def main():
    from pynbodyext_tpu.gravity.prep_cache import (load_tree_prep,
                                                   save_tree_prep)
    from pynbodyext_tpu.gravity.tree import Octree
    from pynbodyext_tpu.gravity import tree_tpu as tt

    rng = np.random.default_rng(0)
    rt = rng.exponential(3.0, N)
    vt = rng.normal(size=(N, 3))
    vt /= np.linalg.norm(vt, axis=1, keepdims=True)
    pos = vt * rt[:, None]
    mass = rng.uniform(0.5, 2.0, N)

    cache = pathlib.Path(__file__).resolve().parents[1] / ".bench_cache"
    cache.mkdir(exist_ok=True)
    pth = cache / f"prof_prep_{N}.pkl"
    tree = Octree(pos, mass, leaf_capacity=128, multipole_order=0)
    prep = load_tree_prep(pth)
    if prep is None:
        t0 = time.perf_counter()
        prep = tt.prepare_tree_pallas(tree, theta=0.7, group_leaves=8)
        print(f"prep build: {time.perf_counter() - t0:.1f}s", flush=True)
        save_tree_prep(prep, pth)
    else:
        print("prep loaded from cache", flush=True)
    tt._ensure_far_classes(prep)
    kern = prep["kernel"] or tt.KERNEL_NONE

    legs = {}

    def near(accel, form="bundle"):
        return tt._near_packed(prep, kern, False, accel, accel_form=form)

    def far_leaf(accel, engine):
        rs = slice(0, 3) if accel else slice(0, 1)
        return tt._far_eval(prep, accel=accel, interpret=False,
                            row_slice=rs, far_engine=engine)

    def far_group(accel, engine):
        return tt._group_far_eval(prep, accel=accel, interpret=False,
                                  far_engine=engine)

    def near_diag(accel):
        return tt._near_diag(prep, kern, False, accel)

    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    for name, fn in [
        ("near_pot", lambda: near(False)),
        ("near_acc", lambda: near(True)),
        ("near_acc_diff", lambda: near(True, "diff")),
        ("near_acc_t", lambda: near(True, "bundle_t")),
        ("near_acc_bf16", lambda: near(True, "bundle_bf16")),
        ("neardiag_pot", lambda: near_diag(False)),
        ("neardiag_acc", lambda: near_diag(True)),
        ("farleaf_pot", lambda: far_leaf(False, "auto")),
        ("farleaf_acc_mxu", lambda: far_leaf(True, "mxu")),
        ("farleaf_acc_t", lambda: far_leaf(True, "mxu_t")),
        ("farleaf_acc_pal", lambda: far_leaf(True, "pallas")),
        ("fargrp_pot", lambda: far_group(False, "auto")),
        ("fargrp_acc_mxu", lambda: far_group(True, "mxu")),
        ("fargrp_acc_t", lambda: far_group(True, "mxu_t")),
        ("fargrp_acc_pal", lambda: far_group(True, "pallas")),
    ]:
        if only and name not in only:
            continue
        try:
            m, ts = med3(fn)
        except Exception as e:  # noqa: BLE001 — keep profiling other legs
            print(f"{name:18s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        legs[name] = m
        print(f"{name:18s} median {m:7.2f}s  all={[round(t, 2) for t in ts]}",
              flush=True)

    if "near_pot" in legs and "near_acc" in legs:
        print("\nratios (same-run):", flush=True)
        print(f"  near acc/pot      "
              f"{legs['near_acc'] / legs['near_pot']:.2f}")


if __name__ == "__main__":
    main()
