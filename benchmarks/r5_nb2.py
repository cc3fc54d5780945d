"""Follow-up diag band half-width probe (round 5): nb2 ∈ {3, 7} at 10M.

r5_ab measured (same-process steady near leg, 10M): nb2=5 → 2.31 s,
nb2=9 (old default) → 3.15 s, nb2=13 → 4.0 s.  This script brackets the
minimum.  Usage: python benchmarks/r5_nb2.py [N] [nb2 ...]
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if a.isdigit()]
    n = int(args[0]) if args else 10_000_000
    nb2s = [int(a) for a in args[1:]] or [3, 7, 5]
    import jax
    import pynbodyext_tpu.gravity.tree_tpu as tt
    from pynbodyext_tpu.gravity.tree import Octree
    interp = jax.devices()[0].platform == "cpu"

    rng = np.random.default_rng(0)
    r = rng.exponential(3.0, n)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pos = v * r[:, None]
    m = rng.uniform(0.5, 2.0, n)
    t0 = time.perf_counter()
    tree = Octree(pos, m, leaf_capacity=128, multipole_order=0)
    prep = tt.prepare_tree_pallas(tree, theta=0.7, group_leaves=8)
    tt._ensure_far_classes(prep)  # classes build in background now
    print(json.dumps({"exp": "prep", "n": n,
                      "prep_s": round(time.perf_counter() - t0, 2)}),
          flush=True)
    kern = prep["kernel"] or tt.KERNEL_NONE

    def sync(x):
        return float(np.asarray(x[tuple(0 for _ in x.shape)]))

    sweep = {}
    for nb2 in nb2s:
        reps = []
        for _ in range(3):
            t1 = time.perf_counter()
            nearbuf = tt._near_diag(prep, kern, interp, accel=False,
                                    nb2=nb2, device_out=True)
            sync(nearbuf)
            reps.append(round(time.perf_counter() - t1, 3))
            del nearbuf
        areps = []
        for _ in range(2):
            t1 = time.perf_counter()
            nearbuf = tt._near_diag(prep, kern, interp, accel=True,
                                    nb2=nb2, device_out=True)
            sync(nearbuf)
            areps.append(round(time.perf_counter() - t1, 3))
            del nearbuf
        d = prep.get(("diag", tt._PACK_K, 8, nb2, 4, 1), {})
        sweep[str(nb2)] = {
            "pot": reps, "acc": areps,
            "band_frac": round(d.get("band_frac", -1), 4),
            "G": d.get("G"), "npt_pad": d.get("npt_pad")}
        prep.pop(("diag", tt._PACK_K, 8, nb2, 4, 1), None)
        print(json.dumps({"exp": "nb2", str(nb2): sweep[str(nb2)]}),
              flush=True)


if __name__ == "__main__":
    main()
