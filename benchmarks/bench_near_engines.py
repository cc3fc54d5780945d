"""Measure near-field engines on the real chip (1M clustered galaxy).

Usage: python benchmarks/bench_near_engines.py [N] [engines...]
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main(n, engines):
    import jax.numpy as jnp  # noqa: F401  (device init)
    from pynbodyext_tpu.gravity import tree_tpu
    from pynbodyext_tpu.gravity.tree import Octree

    rng = np.random.default_rng(0)
    rt = rng.exponential(3.0, n)
    vt = rng.normal(size=(n, 3))
    vt /= np.linalg.norm(vt, axis=1, keepdims=True)
    pos = vt * rt[:, None]
    m = rng.uniform(0.5, 2.0, n)
    t0 = time.perf_counter()
    tree = Octree(pos, m, leaf_capacity=128, multipole_order=0)
    print(f"build {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    prep = tree_tpu.prepare_tree_pallas(tree, theta=0.7, group_leaves=8)
    print(f"prep {time.perf_counter()-t0:.1f}s stats={prep['stats']}",
          flush=True)
    kern = prep["kernel"] or "none"
    accel = False
    if engines and engines[0] == "accel":
        accel = True
        engines = engines[1:]
    ref = None
    for eng in engines:
        R = None
        kwargs = {}
        name = eng
        if eng.startswith("banded"):
            parts = eng.split(":")
            R = int(parts[1]) if len(parts) > 1 else 8
            Gn = int(parts[2]) if len(parts) > 2 else 1
            name = f"banded R={R} Gn={Gn}"
        elif eng.startswith("pdma"):
            parts = eng.split(":")
            if len(parts) > 1:
                kwargs["nbuf"] = int(parts[1])
            if len(parts) > 2:
                kwargs["R"] = int(parts[2])
            eng = "pdma"
        for rep in range(3):
            t0 = time.perf_counter()
            if R is not None:
                out = tree_tpu._near_banded(prep, kern, False, accel=accel,
                                            R=R, Gn=Gn)
            else:
                fn = {"classes": tree_tpu._near_chunked,
                      "dma": tree_tpu._near_dma,
                      "group": tree_tpu._near_group,
                      "gdma": tree_tpu._near_gdma,
                      "packed": tree_tpu._near_packed,
                      "pdma": tree_tpu._near_pdma}[eng]
                out = fn(prep, kern, False, accel=accel, **kwargs)
            dt = time.perf_counter() - t0
            print(f"{name:>12} rep{rep}: {dt*1e3:8.1f} ms", flush=True)
        if ref is None:
            ref = np.asarray(out, np.float64)
        else:
            o = np.asarray(out, np.float64)
            rel = np.abs(o - ref) / np.maximum(np.abs(ref), 1e-6)
            print(f"{name:>12} vs first: max rel {rel.max():.2e} "
                  f"med {np.median(rel):.2e}", flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    engines = sys.argv[2:] or ["classes", "banded:8", "banded:16",
                               "banded:32", "banded:4"]
    main(n, engines)
