"""Engine-path KappaRot latency at scale (vs the fused jit pipeline).

Usage: python benchmarks/bench_engine_kappa.py [N] [reps]
       PNX_LOG_TRANSFERS=1 ... — log every device↔host transfer (finds
       per-phase host syncs; each costs a ~29 ms relay round trip).
"""

import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import jax
    if os.environ.get("PNX_LOG_TRANSFERS"):
        jax.config.update("jax_transfer_guard", "log")

    import jax.numpy as jnp
    import pynbodyext_tpu as px
    from pynbodyext_tpu.compiled import kappa_rot_pipeline
    from pynbodyext_tpu.quantity import QArray
    from pynbodyext_tpu.snap.snapshot import Snapshot

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(250.0, 8.0, (n, 3)), jnp.float32)
    vel = jnp.asarray(rng.normal(0.0, 100.0, (n, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(1e6, 2e6, n), jnp.float32)
    nstar = n // 3
    snap = Snapshot(
        fields={"pos": QArray(pos, "kpc"), "vel": QArray(vel, "km s**-1"),
                "mass": QArray(mass, "Msol")},
        family_slices={"star": slice(0, nstar), "dm": slice(nstar, n)},
        properties={"boxsize": QArray(500.0, "kpc")},
    )

    sel = px.Sphere("30 kpc") & px.FamilyFilter("star")
    chain = (px.WrapBox(convention="minirange")
             .then(px.ShiftPosTo("ssc"))
             .then(px.ShiftVelTo("com").measure_with(sel))
             .then(px.AlignVec(px.AngMomVec()).measure_with(sel)))
    calc = px.KappaRot().transform(chain).filter(sel)

    def engine_once():
        return float(calc(snap))

    def fused_once():
        star = snap.family_mask("star")
        return float(kappa_rot_pipeline(pos, vel, mass, star,
                                        jnp.float32(500.0)))

    for label, fn in (("fused", fused_once), ("engine", engine_once)):
        v = fn()  # warm/compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            v = fn()
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"{label:7s} kappa={v:.5f}  median {med*1e3:8.2f} ms   "
              f"(all: {' '.join(f'{t*1e3:.1f}' for t in ts)})", flush=True)


if __name__ == "__main__":
    main()
