"""Relay readback bandwidth A/B (round 5).

The 10M combine readback measured ~22-25 MB/s through the axon relay
(pot (n,1) 40 MB ≈ 1.8 s, accel (n,3) 120 MB ≈ 4.5 s — the accel/pot
ratio is wire, not compute).  Candidates:

1. single np.asarray (baseline);
2. K concurrent row-slice readbacks from a thread pool (does the relay
   parallelize transfers?);
3. on-device f16 cast then readback (half the bytes; value drift
   printed).

jax caches the host copy on the array (`_npy_value`), so every rep
reads back a FRESH device buffer (x+0 through jit).

Usage: python benchmarks/readback_ab.py [MB]
"""
from __future__ import annotations

import json
import pathlib
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    n = mb * (1 << 20) // 12  # (n, 3) f32
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(n, 3)).astype(np.float32))
    fresh = jax.jit(lambda a: a + 0.0)
    cast16 = jax.jit(lambda a: a.astype(jnp.float16))
    float(np.asarray(x[0, 0]))  # settle upload
    res = {"mb": round(x.size * 4 / 1e6, 1)}

    def timeit(label, readback, make=None, reps=3, bytes_out=None):
        make = make or (lambda: fresh(x))
        ts = []
        for _ in range(reps):
            z = make()
            float(np.asarray(z[0, 0]))  # compute settled; time wire only
            t0 = time.perf_counter()
            readback(z)
            ts.append(round(time.perf_counter() - t0, 3))
            del z
        bo = bytes_out or x.size * 4
        res[label] = {"reps": ts,
                      "mbps": round(bo / 1e6 / max(sorted(ts)[1], 1e-9), 1)}

    timeit("single", lambda z: np.asarray(z))

    for K in (4, 16):
        bounds = np.linspace(0, n, K + 1).astype(np.int64)

        def threaded(z, K=K, bounds=bounds):
            with ThreadPoolExecutor(max_workers=K) as ex:
                list(ex.map(lambda i: np.asarray(
                    z[bounds[i]:bounds[i + 1]]), range(K)))

        timeit(f"threads{K}", threaded)

    y16 = np.asarray(cast16(x))
    res["f16_max_rel"] = float(np.max(np.abs(
        (y16.astype(np.float32) - np.asarray(x))
        / np.maximum(np.abs(np.asarray(x)), 1e-6))))
    timeit("f16", lambda z: np.asarray(z), make=lambda: cast16(fresh(x)),
           bytes_out=x.size * 2)

    K = 8
    bounds = np.linspace(0, n, K + 1).astype(np.int64)

    def threaded16(z):
        with ThreadPoolExecutor(max_workers=K) as ex:
            list(ex.map(lambda i: np.asarray(
                z[bounds[i]:bounds[i + 1]]), range(K)))

    timeit("threads8_f16", threaded16, make=lambda: cast16(fresh(x)),
           bytes_out=x.size * 2)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
