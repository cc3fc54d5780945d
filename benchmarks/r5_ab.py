"""Round-5 same-process A/Bs on the real TPU (VERDICT r4 items 5 + 8).

One 10M prep, then:

1. per-leg accel vs pot split with an explicit host-readback sync after
   every leg (the fused combine path hides the split — r4 accel/pot =
   1.86 vs the 1.38 flop ratio; find where the extra time lives);
2. far-engine A/B for the accel far legs: the default over-budget gather
   path (`_far_gather_pre`) vs the pre-gathered payload path with the
   transposed MXU contraction (`far_engine='mxu_t'`), enabled by raising
   the pregather budget in-process (second prep);
3. diag band-occupancy sweep (item 8): nb2 ∈ {5, 9, 13} half-widths at
   fixed SB — narrower bands trade empty band slots for packed-window
   remainder chunks.

Usage: python benchmarks/r5_ab.py [N] [--skip-pre] — prints one JSON
line per experiment.  All timings are same-process medians; relay
variance makes cross-process deltas under ~2× meaningless (CLAUDE.md).
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def sync(x) -> float:
    """Relay-safe device sync: block on a 1-element host readback.
    Scalar-index (NOT reshape — that compiles a full-buffer copy: a
    459 MB 'output of copy' allocation per sync at 10M)."""
    if isinstance(x, tuple):
        x = x[0]
    return float(np.asarray(x[tuple(0 for _ in x.shape)]))


def hbm_gb() -> float:
    import jax
    try:
        return round(jax.devices()[0].memory_stats()
                     ["bytes_in_use"] / 1e9, 2)
    except Exception:
        return -1.0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 10_000_000
    skip_pre = "--skip-pre" in sys.argv
    import jax
    import pynbodyext_tpu.gravity.tree_tpu as tt
    from pynbodyext_tpu.gravity.tree import Octree
    interp = jax.devices()[0].platform == "cpu"  # CPU smoke only

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
                      "prep_s": round(time.perf_counter() - t0, 2),
                      "far_pre": bool(prep.get("far_pre"))}), flush=True)
    kern = prep["kernel"] or tt.KERNEL_NONE

    def legs(pp, accel, far_engine="auto", reps=3, nb2=9):
        rows = 3 if accel else 1
        out = []
        for _ in range(reps):
            t = {}
            t1 = time.perf_counter()
            fl_cat, fl_inv = tt._far_eval(pp, accel=accel, interpret=interp,
                                          far_engine=far_engine,
                                          device_out=True)
            sync(fl_cat)
            t["far_leaf"] = round(time.perf_counter() - t1, 3)
            t1 = time.perf_counter()
            fg_cat = fg_inv = None
            if "gfar_classes" in pp:
                fg_cat, fg_inv = tt._group_far_eval(
                    pp, accel=accel, interpret=interp,
                    far_engine=far_engine, device_out=True)
                sync(fg_cat)
            t["far_group"] = round(time.perf_counter() - t1, 3)
            t["hbm_far"] = hbm_gb()
            t1 = time.perf_counter()
            nearbuf = tt._near_diag(pp, kern, interp, accel=accel,
                                    nb2=nb2, device_out=True)
            sync(nearbuf)
            t["near"] = round(time.perf_counter() - t1, 3)
            t1 = time.perf_counter()
            ppos, flidx = tt._ensure_combine_idx(pp)
            dev = tt._combine_device(nearbuf, fl_cat, fl_inv, fg_cat,
                                     fg_inv, ppos, flidx, rows=rows,
                                     nb=pp["n_blocks"])
            np.asarray(dev)
            t["combine"] = round(time.perf_counter() - t1, 3)
            t["total"] = round(sum(t.values()), 3)
            t["hbm_gb"] = hbm_gb()
            out.append(t)
            del fl_cat, fg_cat, nearbuf, dev
        return out

    # -- exp 1: per-leg pot vs accel split --------------------------------
    pot_legs = legs(prep, accel=False)
    acc_legs = legs(prep, accel=True)
    print(json.dumps({"exp": "legsplit", "pot": pot_legs,
                      "acc": acc_legs}), flush=True)

    # -- exp 3: diag band nb2 sweep (potentials near leg only) ------------
    sweep = {}
    for nb2 in (5, 13):
        reps = []
        for _ in range(3):
            t1 = time.perf_counter()
            nearbuf = tt._near_diag(prep, kern, interp, accel=False,
                                    nb2=nb2, device_out=True)
            sync(nearbuf)
            reps.append(round(time.perf_counter() - t1, 3))
            del nearbuf
        d = prep.get(("diag", tt._PACK_K, 8, nb2, 4, 1), {})
        sweep[str(nb2)] = {"reps": reps,
                           "band_frac": round(d.get("band_frac", -1), 4)}
        prep.pop(("diag", tt._PACK_K, 8, nb2, 4, 1), None)  # free HBM
    d0 = prep.get(("diag", tt._PACK_K, 8, 9, 4, 1), {})
    sweep["9"] = {"reps": [x["near"] for x in pot_legs],
                  "band_frac": round(d0.get("band_frac", -1), 4)}
    print(json.dumps({"exp": "nb2_sweep", "sweep": sweep}), flush=True)

    if skip_pre:
        return
    # -- exp 2: pre+mxu_t far vs gather far -------------------------------
    del prep
    import gc
    gc.collect()
    tt._FAR_PREGATHER_BUDGET = 4_000_000_000
    t0 = time.perf_counter()
    prep2 = tt.prepare_tree_pallas(tree, theta=0.7, group_leaves=8)
    tt._ensure_far_classes(prep2)
    print(json.dumps({"exp": "prep_pre", "prep_s":
                      round(time.perf_counter() - t0, 2),
                      "far_pre": bool(prep2.get("far_pre"))}), flush=True)
    res = {}
    for eng in ("mxu_t", "pallas"):
        res[f"acc_{eng}"] = legs(prep2, accel=True, far_engine=eng, reps=2)
    res["pot_pallas"] = legs(prep2, accel=False, far_engine="pallas",
                             reps=2)
    print(json.dumps({"exp": "far_pre_ab", **res}), flush=True)


if __name__ == "__main__":
    main()
