"""Gravity benchmark suite (reference parity: ``benchmarks/bench_gravity.py``).

Parametrized timings matching the reference's ASV harness:
* octree construction: leaf_capacity × softening × multipole_order
  (reference ``bench_gravity.py:105-122``);
* tree_potentials vs opening angle θ ∈ {0.5, 0.7, 1.0} (``:124-134``);
* tree_potentials vs multipole order ∈ {2,3,4,5} (``:136-146``);
* full pipeline (θ=0.7, softening, spline, order 3) (``:148-188``);
plus the TPU-native additions: Pallas direct-sum throughput and the fused
KappaRot pipeline.

Run: ``python benchmarks/bench_gravity.py [N]`` — prints a table; emits a
JSON summary line at the end for machine consumption.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

# runnable as `python benchmarks/bench_gravity.py` from the repo root
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _timeit(fn, reps=3, sync=lambda x: None):
    out = fn()
    sync(out)  # warm / compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn())
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 15_682  # halo[0] size
    rng = np.random.default_rng(0)
    pos = rng.normal(0, 1, (n, 3))
    mass = rng.uniform(0.5, 2, n)
    results = {}

    from pynbodyext_tpu.gravity.tree import Octree

    # -- tree construction (leaf × softening × order) ----------------------
    print(f"== octree construction (N={n}) ==")
    for leaf in (8, 32, 128):
        for soft in (None, 0.288):
            for order in (0, 3, 5):
                h = None if soft is None else np.full(n, soft)
                dt = _timeit(lambda: Octree(pos, mass, leaf_capacity=leaf,
                                            multipole_order=order,
                                            softenings=h,
                                            kernel=None if soft is None
                                            else "spline"), reps=2)
                key = f"build_leaf{leaf}_soft{soft}_o{order}"
                results[key] = dt
                print(f"  leaf={leaf:<4} soft={str(soft):<6} order={order}: "
                      f"{dt * 1e3:8.1f} ms")

    # -- tree potentials vs theta -----------------------------------------------
    print("== tree_potentials vs θ (order 3) ==")
    tree = Octree(pos, mass, leaf_capacity=32, multipole_order=3)
    for theta in (0.5, 0.7, 1.0):
        dt = _timeit(lambda: tree.compute_potentials(theta=theta))
        results[f"tree_pot_theta{theta}"] = dt
        print(f"  θ={theta}: {dt * 1e3:8.1f} ms "
              f"({n / dt / 1e6:.2f} Mparticles/s)")

    # -- tree potentials vs order -------------------------------------------------
    print("== tree_potentials vs multipole order (θ=0.7) ==")
    for order in (2, 3, 4, 5):
        t2 = Octree(pos, mass, leaf_capacity=32, multipole_order=order)
        dt = _timeit(lambda: t2.compute_potentials(theta=0.7))
        results[f"tree_pot_order{order}"] = dt
        print(f"  order={order}: {dt * 1e3:8.1f} ms")

    # -- full tree pipeline (reference main(): θ=0.7, soft, spline, order 3) ---
    h = np.full(n, 0.001)

    def full_pipeline():
        t3 = Octree(pos, mass, leaf_capacity=32, multipole_order=3,
                    softenings=h, kernel="spline")
        return t3.compute_potentials(theta=0.7)

    dt = _timeit(full_pipeline, reps=2)
    results["full_tree_pipeline"] = dt
    print(f"== full tree pipeline: {dt * 1e3:.1f} ms ==")

    # -- Pallas / jnp direct-sum throughput ------------------------------------------
    import jax
    import jax.numpy as jnp
    on_tpu = jax.devices()[0].platform != "cpu"
    from pynbodyext_tpu.gravity import (direct_potentials,
                                        direct_potentials_ref)
    solver = direct_potentials if on_tpu else direct_potentials_ref
    pos32 = pos.astype(np.float32)
    m32 = mass.astype(np.float32)

    def sync(x):
        float(np.asarray(x.reshape(-1)[0]))

    dt = _timeit(lambda: solver(pos32, m32, kernel="none"), sync=sync)
    results["direct_potentials"] = dt
    print(f"== direct potentials ({'pallas' if on_tpu else 'jnp'}): "
          f"{dt * 1e3:.1f} ms, {n * n / dt / 1e9:.2f} Gpairs/s ==")

    print(json.dumps({"n": n, "timings_s": results}))


if __name__ == "__main__":
    main()
