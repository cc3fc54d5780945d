"""Same-process A/B of the two far-field feeding modes at large N:

A) far_pre=True  — host pre-gathered padded class payload matrices
   (prep-heavy: ~60 s of far-class build + ~1.7 GB upload at 10M o0)
B) far_pre=False — compact (n_nodes+1, P) payload resident on device,
   in-jit per-chunk row gathers (`_far_gather_pre`): prep builds only
   int32 list matrices; eval pays the device gather.

Decides whether gather-by-default wins end-to-end (prep + eval) — the
reference's lazy cached tree has no prep/eval split at all
(pynbodyext/gravity/base.py:174-238), so the driver-visible cold cost
here is prep + first solve.

Usage: python benchmarks/far_mode_ab.py [N]
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000


def run_mode(tag, tree, tt):
    from pynbodyext_tpu.gravity.tree import stage_records
    stage_records()
    t0 = time.perf_counter()
    prep = tt.prepare_tree_pallas(tree, theta=0.7, group_leaves=8)
    prep_s = time.perf_counter() - t0
    agg = {}
    for lbl, s in stage_records():
        agg[lbl] = round(agg.get(lbl, 0.0) + s, 2)
    print(f"[{tag}] prep {prep_s:.1f}s far_pre={prep['far_pre']}",
          flush=True)
    print(f"  stages: {agg}", flush=True)
    dev_bytes = 0
    for lbl in ("far_classes", "gfar_classes"):
        if lbl in prep:
            for e in prep[lbl][0]:
                dev_bytes += e[2].nbytes
    if "_payload_dev" in prep:
        dev_bytes += prep["_payload_dev"].nbytes
    print(f"  far device bytes: {dev_bytes/1e9:.2f} GB", flush=True)
    out = {}
    for accel in (False, True):
        fn = (tt.tree_accelerations_device_pallas if accel
              else tt.tree_potentials_device_pallas)
        lbl = "acc" if accel else "pot"
        r = fn(tree, prep=prep)  # warm/compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn(tree, prep=prep)
            ts.append(round(time.perf_counter() - t0, 2))
        info = dict(tt.EVAL_INFO)
        info.pop("phases", None)
        print(f"[{tag}] {lbl}: median {sorted(ts)[1]:.2f}s all={ts}"
              f"  legs={info}", flush=True)
        out[lbl] = r
    del prep
    return out


def main():
    from pynbodyext_tpu.gravity import tree_tpu as tt
    from pynbodyext_tpu.gravity.tree import Octree

    rng = np.random.default_rng(0)
    rt = rng.exponential(3.0, N)
    vt = rng.normal(size=(N, 3))
    vt /= np.linalg.norm(vt, axis=1, keepdims=True)
    pos = vt * rt[:, None]
    mass = rng.uniform(0.5, 2.0, N)

    t0 = time.perf_counter()
    tree = Octree(pos, mass, leaf_capacity=128, multipole_order=0)
    print(f"build: {time.perf_counter() - t0:.1f}s", flush=True)

    a = run_mode("pre", tree, tt)
    old = tt._FAR_PREGATHER_BUDGET
    try:
        tt._FAR_PREGATHER_BUDGET = 0
        b = run_mode("gather", tree, tt)
    finally:
        tt._FAR_PREGATHER_BUDGET = old
    dp = np.abs((a["pot"] - b["pot"]) / b["pot"])
    sc = np.abs(b["acc"]).max(1).clip(1e-30)
    da = np.abs(a["acc"] - b["acc"]).max(1) / sc
    print(f"pre-vs-gather: pot rel max {dp.max():.2e} med "
          f"{np.median(dp):.2e}; acc rel max {da.max():.2e}", flush=True)


if __name__ == "__main__":
    main()
