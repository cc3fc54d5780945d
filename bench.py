"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline metric (BASELINE.json): gravity potential throughput
(particles/sec via pair-rate at the largest N that fits a time budget) plus
the KappaRot pipeline latency, on whatever accelerator is attached.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
denominator is MEASURED on this host: the repo's native C++ direct sum
(csrc ``pnx_direct_potentials``, the role-equivalent of the reference's
rayon direct path) sustains 1.216e8 pair-interactions/s (plummer kernel,
N=65536, f64, single-core host — ``nproc``=1; measured 2026-08-16, see
BASELINE_HOST.json).  Fixed constant so rounds stay comparable.
"""

import json
import os
import pathlib
import sys
import time

# glibc hugepage-backed malloc: this host's 4 KB first-touch faults cost
# ~150 µs each (util/thp.py) — THP arenas make anonymous numpy
# temporaries ~6× faster to first-fill.  Must be set before glibc init,
# so re-exec once.
if (os.environ.get("GLIBC_TUNABLES") is None and sys.platform == "linux"
        and sys.argv and os.path.isfile(sys.argv[0])):
    env = dict(os.environ, GLIBC_TUNABLES="glibc.malloc.hugetlb=1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import numpy as np

# runnable from any cwd
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

REFERENCE_PAIR_RATE = 1.216e8  # MEASURED host-CPU native direct-sum pairs/s


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    on_tpu = dev.platform not in ("cpu",)

    from pynbodyext_tpu.compiled import kappa_rot_pipeline
    from pynbodyext_tpu.gravity import (direct_potentials,
                                        direct_potentials_ref)

    rng = np.random.default_rng(0)

    # -- gravity throughput ------------------------------------------------
    n_grav = 262_144 if on_tpu else 8_192
    pos = jnp.asarray(rng.normal(0, 10, (n_grav, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(1e6, 2e6, n_grav), jnp.float32)
    soft = jnp.float32(0.05)
    solver = direct_potentials if on_tpu else direct_potentials_ref

    def solve():
        return solver(pos, mass, soft, kernel="plummer")

    def sync(x):
        # host readback is the only reliable sync under remote relays
        # (block_until_ready can return early there)
        return float(np.asarray(x.reshape(-1)[0]))

    sync(solve())  # compile + warm
    reps = 3 if on_tpu else 1
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(solve())
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    pair_rate = n_grav * n_grav / dt

    # -- KappaRot pipeline latency ------------------------------------------
    n_pipe = 10_000_000 if on_tpu else 200_000
    pos_p = jnp.asarray(rng.normal(250.0, 8.0, (n_pipe, 3)), jnp.float32)
    vel_p = jnp.asarray(rng.normal(0.0, 100.0, (n_pipe, 3)), jnp.float32)
    mass_p = jnp.asarray(rng.uniform(1e6, 2e6, n_pipe), jnp.float32)
    star_p = jnp.asarray(rng.uniform(size=n_pipe) < 0.3)
    box = jnp.float32(500.0)

    k = kappa_rot_pipeline(pos_p, vel_p, mass_p, star_p, box)
    float(k)  # compile + warm
    ptimes = []
    for _ in range(reps):
        t0 = time.perf_counter()
        k = kappa_rot_pipeline(pos_p, vel_p, mass_p, star_p, box)
        float(k)
        ptimes.append(time.perf_counter() - t0)
    pipe_ms = sorted(ptimes)[len(ptimes) // 2] * 1e3

    # -- tree-device potentials at 10M (the BASELINE.json headline N) -------
    # dense at 10M would be N²/rate ≈ 950 s; the two-level-list device tree
    # is the production path there.  Skipped off-TPU (hours in interpret).
    tree_detail, tree_sidecar = {}, {}
    if on_tpu:
        try:
            from pynbodyext_tpu.gravity import tree_tpu
            from pynbodyext_tpu.gravity.tree import Octree, stage_records
            from pynbodyext_tpu.gravity.tree_tpu import (
                prepare_tree_pallas, release_host_buffers,
                tree_accelerations_device_pallas,
                tree_potentials_device_pallas)
            n_tree = 10_000_000
            rt = rng.exponential(3.0, n_tree)
            vt = rng.normal(size=(n_tree, 3))
            vt /= np.linalg.norm(vt, axis=1, keepdims=True)
            pos_t = vt * rt[:, None]
            m_t = rng.uniform(0.5, 2.0, n_tree)
            stage_records()  # reset the stage log
            t0 = time.perf_counter()
            tree = Octree(pos_t, m_t, leaf_capacity=128, multipole_order=0)
            prep = prepare_tree_pallas(tree, theta=0.7, group_leaves=8)
            prep_s = time.perf_counter() - t0
            # per-stage prep breakdown (aggregate repeated labels)
            prep_stages = {}
            for lbl, s in stage_records():
                prep_stages[lbl] = round(prep_stages.get(lbl, 0.0) + s, 2)
            phi = tree_potentials_device_pallas(tree, prep=prep)  # warm
            # far classes build on a background thread now (r5): their
            # stages land after the first solve synchronizes on them
            for lbl, s in stage_records():
                prep_stages["bg." + lbl] = round(
                    prep_stages.get("bg." + lbl, 0.0) + s, 2)
            release_host_buffers(prep)
            # relay variance is ±50% on a single rep: median of 5 for
            # the headline legs; record every rep + the per-leg split of
            # the last one so variance vs misconfiguration is
            # distinguishable post hoc
            tts, eval_legs = [], []
            for _ in range(5):
                t0 = time.perf_counter()
                phi = tree_potentials_device_pallas(tree, prep=prep)
                tts.append(round(time.perf_counter() - t0, 2))
                eval_legs.append(dict(tree_tpu.EVAL_INFO))
            eval_s = sorted(tts)[2]
            acc = tree_accelerations_device_pallas(tree, prep=prep)  # warm
            ats, accel_legs = [], []
            for _ in range(5):
                t0 = time.perf_counter()
                acc = tree_accelerations_device_pallas(tree, prep=prep)
                ats.append(round(time.perf_counter() - t0, 2))
                accel_legs.append(dict(tree_tpu.EVAL_INFO))
            accel_s = sorted(ats)[2]
            # compute-only (device-resident output) split: the host-path
            # remainder over these is the relay result readback — on a
            # local PCIe TPU it would be negligible (round-5 analysis)
            devout = {}
            try:
                for key, fn in (("pot", tree_potentials_device_pallas),
                                ("acc", tree_accelerations_device_pallas)):
                    t0 = time.perf_counter()
                    d = fn(tree, prep=prep, out="device")
                    float(np.asarray(d.reshape(-1)[0]))  # sync compute
                    devout[f"tree10m_{key}_device_out_s"] = round(
                        time.perf_counter() - t0, 2)
                    del d
            except Exception:
                pass
            # warm-start story: persist the prep and time the disk reload
            # (what a second process pays instead of the host build)
            import tempfile

            from pynbodyext_tpu.gravity.prep_cache import (load_tree_prep,
                                                           save_tree_prep)
            warm_s = warm_solve_s = warm_rel = None
            warm_err = {}
            try:
                with tempfile.TemporaryDirectory() as td:
                    pth = pathlib.Path(td) / "prep.pkl"
                    if save_tree_prep(prep, pth):
                        t0 = time.perf_counter()
                        prep2 = load_tree_prep(pth)
                        # sync the tile re-upload
                        float(np.asarray(prep2["tiles"][0, 0, 0]))
                        warm_s = time.perf_counter() - t0
                        # first solve on the reloaded prep pays the lazy
                        # far-class rebuild + upload — the honest
                        # end-to-end cost a second process sees before
                        # its first result
                        t0 = time.perf_counter()
                        phi_w = tree_potentials_device_pallas(
                            None, prep=prep2)
                        warm_solve_s = time.perf_counter() - t0
                        warm_rel = float(
                            np.max(np.abs((phi_w - phi) / phi)))
                        del prep2, phi_w  # free duplicate device buffers
            except Exception as e:  # keep the eval/accel numbers
                warm_err = {"tree10m_warm_error":
                            f"{type(e).__name__}: {e}"}
            # order-3 multipole far field (reference default operating
            # point: theta=0.7, order 3 — bench_gravity.py:148-166): same
            # particles, order-3 tree + compact moment payload, one warm
            # + median-of-3 timing for pot and accel (VERDICT r3 item 4)
            o3_detail = {}
            try:
                del prep, tree  # free the order-0 device buffers (HBM)
                t0 = time.perf_counter()
                tree3 = Octree(pos_t, m_t, leaf_capacity=128,
                               multipole_order=3)
                prep3 = prepare_tree_pallas(tree3, theta=0.7,
                                            group_leaves=8)
                o3_prep_s = time.perf_counter() - t0
                phi3 = tree_potentials_device_pallas(tree3, prep=prep3)
                release_host_buffers(prep3)
                o3_tts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    phi3 = tree_potentials_device_pallas(tree3, prep=prep3)
                    o3_tts.append(round(time.perf_counter() - t0, 2))
                acc3 = tree_accelerations_device_pallas(tree3, prep=prep3)
                o3_ats = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    acc3 = tree_accelerations_device_pallas(tree3,
                                                            prep=prep3)
                    o3_ats.append(round(time.perf_counter() - t0, 2))
                dphi = np.abs((phi3 - phi) / phi)
                o3_detail = {
                    "tree10m_o3_eval_s": sorted(o3_tts)[1],
                    "tree10m_o3_accel_s": sorted(o3_ats)[1],
                }
                o3_sidecar = {
                    "tree10m_o3_prep_s": round(o3_prep_s, 2),
                    "tree10m_o3_eval_reps": o3_tts,
                    "tree10m_o3_accel_reps": o3_ats,
                    # median |phi_o3 - phi_o0|/|phi_o0|: the far-field
                    # truncation error the order-3 moments remove
                    "tree10m_o3_vs_o0_med": float(np.median(dphi)),
                    "tree10m_o3_far_engine":
                        dict(tree_tpu.EVAL_INFO).get("far_engine"),
                }
                del prep3, tree3, acc3, phi3
            except Exception as e:
                o3_detail = {"tree10m_o3_error":
                             f"{type(e).__name__}: {e}"}
            # order-5 far field: the multipole tables and the fast far
            # engines are order-generic — one timed 10M potentials point
            # matching the reference ASV order axis
            # (/root/reference/benchmarks/bench_gravity.py:136-146)
            o5_detail, o5_sidecar = {}, {}
            try:
                t0 = time.perf_counter()
                tree5 = Octree(pos_t, m_t, leaf_capacity=128,
                               multipole_order=5)
                prep5 = prepare_tree_pallas(tree5, theta=0.7,
                                            group_leaves=8)
                o5_prep_s = time.perf_counter() - t0
                phi5 = tree_potentials_device_pallas(tree5, prep=prep5)
                release_host_buffers(prep5)
                o5_tts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    phi5 = tree_potentials_device_pallas(tree5, prep=prep5)
                    o5_tts.append(round(time.perf_counter() - t0, 2))
                dphi5 = np.abs((phi5 - phi) / phi)
                o5_detail = {"tree10m_o5_eval_s": sorted(o5_tts)[1]}
                o5_sidecar = {
                    "tree10m_o5_prep_s": round(o5_prep_s, 2),
                    "tree10m_o5_eval_reps": o5_tts,
                    "tree10m_o5_vs_o0_med": float(np.median(dphi5)),
                    "tree10m_o5_far_engine":
                        dict(tree_tpu.EVAL_INFO).get("far_engine"),
                }
                del prep5, tree5, phi5
            except Exception as e:
                o5_detail = {"tree10m_o5_error":
                             f"{type(e).__name__}: {e}"}
            # 1M tree point: the diag auto engine now wins at every size
            # (round-5 A/B) — one small-scale anchor in the artifact
            t1m_detail, t1m_sidecar = {}, {}
            try:
                n1 = 1_000_000
                tree1 = Octree(pos_t[:n1], m_t[:n1], leaf_capacity=128,
                               multipole_order=0)
                prep1 = prepare_tree_pallas(tree1, theta=0.7,
                                            group_leaves=8)
                phi1m = tree_potentials_device_pallas(tree1, prep=prep1)
                release_host_buffers(prep1)
                r1p, r1a = [], []
                for _ in range(3):
                    t0 = time.perf_counter()
                    phi1m = tree_potentials_device_pallas(tree1,
                                                          prep=prep1)
                    r1p.append(round(time.perf_counter() - t0, 3))
                acc1m = tree_accelerations_device_pallas(tree1, prep=prep1)
                for _ in range(3):
                    t0 = time.perf_counter()
                    acc1m = tree_accelerations_device_pallas(tree1,
                                                             prep=prep1)
                    r1a.append(round(time.perf_counter() - t0, 3))
                t1m_detail = {"tree1m_eval_s": sorted(r1p)[1],
                              "tree1m_accel_s": sorted(r1a)[1]}
                t1m_sidecar = {"tree1m_eval_reps": r1p,
                               "tree1m_accel_reps": r1a}
                del prep1, tree1, phi1m, acc1m
            except Exception as e:
                t1m_detail = {"tree1m_error": f"{type(e).__name__}: {e}"}
            dense_equiv_s = n_tree * n_tree / pair_rate
            li = accel_legs[-1] if accel_legs else {}
            tree_detail = {
                "tree10m_eval_s": round(eval_s, 2),
                "tree10m_accel_s": round(accel_s, 2),
                **({"tree10m_prep_warm_s": round(warm_s, 2)}
                   if warm_s is not None else {}),
                **({"tree10m_warm_solve_s": round(warm_solve_s, 2)}
                   if warm_solve_s is not None else {}),
                **warm_err,
                "tree10m_particles_per_s": round(n_tree / eval_s),
                "tree10m_prep_s": round(prep_s, 2),
                "tree10m_vs_dense": round(dense_equiv_s / eval_s, 1),
                "tree10m_engines": {
                    "near": li.get("near_engine"),
                    "far": li.get("far_engine")},
                **o3_detail,
                **o5_detail,
                **t1m_detail,
            }
            tree_sidecar = {
                "tree10m_theta": 0.7,
                **devout,
                **t1m_sidecar,
                **({"tree10m_warm_rel": warm_rel}
                   if warm_solve_s is not None else {}),
                "tree10m_phi0": float(phi[0]),
                "tree10m_acc0": float(np.linalg.norm(acc[0])),
                "tree10m_eval_reps": tts,
                "tree10m_accel_reps": ats,
                "tree10m_eval_legs": eval_legs[-1] if eval_legs else {},
                "tree10m_accel_legs": li,
                "tree10m_prep_stages": prep_stages,
                **o3_sidecar,
                **o5_sidecar,
            }
        except Exception as e:  # never fail the whole bench on the tree leg
            tree_detail = {"tree10m_error": f"{type(e).__name__}: {e}"}

    # ONE COMPACT stdout line (the driver tail-captures + parses it; the
    # round-4 full-detail line overflowed the capture and the headline was
    # lost — VERDICT r4 item 1).  Per-rep / per-leg / per-stage detail goes
    # to the BENCH_DETAIL.json sidecar instead.
    compact = {
        "metric": "gravity_pair_interactions_per_sec",
        "value": round(pair_rate / 1e9, 3),
        "unit": "Gpairs/s",
        "vs_baseline": round(pair_rate / REFERENCE_PAIR_RATE, 2),
        "detail": {
            "device": str(dev),
            "gravity_N": n_grav,
            "gravity_ms": round(dt * 1e3, 2),
            "kappa_pipeline_N": n_pipe,
            "kappa_pipeline_ms": round(pipe_ms, 2),
            "kappa_value": round(float(k), 5),
            **tree_detail,
            "detail_file": "BENCH_DETAIL.json",
        },
    }
    try:
        sidecar = dict(compact)
        sidecar["detail"] = {
            **compact["detail"],
            "hugetlb_malloc": "hugetlb" in os.environ.get(
                "GLIBC_TUNABLES", ""),
            **tree_sidecar,
        }
        (pathlib.Path(__file__).resolve().parent
         / "BENCH_DETAIL.json").write_text(json.dumps(sidecar, indent=1))
    except Exception:
        pass  # the sidecar is best-effort; the stdout line is the artifact
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
