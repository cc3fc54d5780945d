"""End-to-end walkthrough of pynbodyext_tpu.

Runs everywhere (CPU included); on a TPU host the same code uses the
accelerator automatically.  Usage: ``python examples/walkthrough.py``.
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import pynbodyext_tpu as px  # noqa: E402


def main():
    # 1. A snapshot: load a gadget HDF5 file or make the deterministic test
    #    galaxy (disk + halo displaced to box center, wrapped).
    snap = px.make_test_galaxy(n_star=20_000, n_gas=30_000, n_dm=50_000,
                               wrapped=True)
    print(snap)

    # 2. Composable lazy calculators ------------------------------------
    stars30 = px.Sphere("30 kpc") & px.FamilyFilter("star")
    chain = (px.WrapBox(convention="minirange")
             .then(px.ShiftPosTo("ssc"))
             .then(px.ShiftVelTo("com").measure_with(stars30))
             .then(px.AlignVec(px.AngMomVec()).measure_with(stars30)))

    kappa = px.KappaRot().transform(chain).filter(stars30)
    result = kappa.run(snap, perf_time=True)
    print(f"\nKappaRot = {float(result.value):.4f}")
    print(result.summary())

    # 3. Dynamic calculator-valued parameters ----------------------------
    re = px.ParamContain("r", 0.5, "mass")            # half-mass radius
    m_in = (px.ParamSum("mass")
            .transform(px.WrapBox(convention="minirange")
                       .then(px.ShiftPosTo("ssc")))
            .filter(px.Sphere(2 * re)))
    print(f"mass within 2·r_half = {float(m_in(snap).value):.3e} Msol")

    # 4. Profiles ---------------------------------------------------------
    from pynbodyext_tpu.profiles import RadialProfile
    centered = chain.apply_to(snap)
    pr = RadialProfile(centered, ndim=3, weight="mass",
                       bins_type="equaln", nbins=30, bin_max=150.0)
    print("\nradial profile (equal-N bins):")
    print("  r_half from mass_enc:",
          float(np.interp(0.5, np.asarray(pr["mass_enc"])
                          / np.asarray(pr["mass_enc"])[-1],
                          np.asarray(pr.rbins))), "kpc")
    print("  stellar vr p16/p84 at bin 5:",
          float(np.asarray(pr.s["vr"]["p16"])[5]),
          float(np.asarray(pr.s["vr"]["p84"])[5]))

    # 5. Gravity -----------------------------------------------------------
    sub = centered[px.Sphere(10.0)]
    phi = px.gravity.calculate_potential(sub, softening="0.1 kpc")
    print(f"\npotential of {len(sub)} central particles: "
          f"min {float(np.asarray(phi).min()):.1f} {phi.units}")

    # native Barnes–Hut for big N / CPU:
    from pynbodyext_tpu.gravity.tree import Octree
    pos = np.asarray(centered["pos"])[:20000]
    tree = Octree(pos, leaf_capacity=32, multipole_order=3)
    pot_tree = tree.compute_potentials(theta=0.7)
    print(f"tree potentials (order 3, θ=0.7): mean {pot_tree.mean():.3e}")

    # 6. Fused production pipeline ------------------------------------------
    from pynbodyext_tpu.compiled import kappa_rot_pipeline_from_snapshot
    k_fused = float(kappa_rot_pipeline_from_snapshot(snap))
    print(f"\nfused-jit KappaRot = {k_fused:.4f} (one XLA program)")

    # 7. Out-of-core: the same profile API streams over a chunked
    #    snapshot — equal-N edges come from histogram bisection, one
    #    chunk resident at a time (no snapshot-scale materialization)
    from pynbodyext_tpu.chunk import ChunkedSnapshot
    ch = ChunkedSnapshot(centered, chunk_size=25_000)
    pr_s = RadialProfile(ch, ndim=3, weight="mass",
                         bins_type="equaln", nbins=16, bin_max=150.0)
    print("\nstreamed equal-N profile: vr median at bin 3 =",
          float(np.asarray(pr_s["vr"]["med"])[3]))

    # 8. Multi-chip: every device solver takes a 1-D jax.sharding.Mesh
    #    and shards over its chips (here: all local devices)
    from pynbodyext_tpu.parallel import make_mesh, ring_direct_potentials
    mesh = make_mesh()
    pot_ring = ring_direct_potentials(pos[:4096], mesh=mesh,
                                      interpret=True)
    print(f"ring-sharded potentials over {mesh.devices.size} device(s): "
          f"mean {float(np.asarray(pot_ring).mean()):.3e}")
    # the Barnes–Hut device tree shards the same way:
    #   Gravity(pos, m).tree_potentials(device=True, mesh=mesh)
    #   tree_potentials_device_pallas(tree, prep=prep, mesh=mesh)


if __name__ == "__main__":
    main()
