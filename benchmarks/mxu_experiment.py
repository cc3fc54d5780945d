"""MXU-potentials experiment: r² via the matmul identity with tile-local
recentring (VERDICT round-2 item 4).

Hypothesis: the dense potential kernel is VPU-bound (12 flops/pair at
~1.3 Tflop/s); computing r² = ‖t−c‖² + ‖s−c‖² − 2(t−c)·(s−c) puts the
6-flop cross term on the MXU and leaves ~4 VPU flops/pair.  The round-1
rejection (catastrophic cancellation) applied at GLOBAL coordinates
(offset ~250); recentring on the target-tile centroid removes the global
offset — the residual spread is the cluster scale.

This script measures BOTH accuracy (vs f64 numpy on clustered data) and
throughput of the baseline vs MXU kernel on the attached device.
"""

import functools
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TINY2 = 1e-38


def _mxu_potential_kernel(tgt_ref, src_ref, out_ref, *, tm, ts):
    """Plummer potentials, cross term on the MXU (tile-local recentring)."""
    t = tgt_ref[0:3, :]                      # (3, tm)
    s = src_ref[0:3, :]                      # (3, ts)
    c = jnp.mean(t, axis=1, keepdims=True)   # target-tile centroid
    tl = t - c
    sl = s - c
    t2 = jnp.sum(tl * tl, axis=0).reshape(tm, 1)
    s2 = jnp.sum(sl * sl, axis=0).reshape(1, ts)
    cross = jax.lax.dot_general(
        tl, sl, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (tm, ts) on the MXU
    # cancellation can drive r² slightly negative for near pairs — clamp
    # (the size of what gets clamped IS the accuracy story measured here)
    r2 = jnp.maximum(t2 + s2 - 2.0 * cross, 0.0)
    h = src_ref[4, 0]
    neg_phi = -jax.lax.rsqrt(r2 + h * h + _TINY2)
    sm = src_ref[3, :]
    pot = jnp.dot(neg_phi, sm, preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[0, :] = pot

    @pl.when(pl.program_id(1) != 0)
    def _():
        out_ref[0, :] = out_ref[0, :] + pot


def _vpu_potential_kernel(tgt_ref, src_ref, out_ref, *, tm, ts):
    """Baseline: elementwise difference form (the production kernel's
    math, without self-masking so both variants compare apples-to-apples)."""
    tx = tgt_ref[0, :].reshape(tm, 1)
    ty = tgt_ref[1, :].reshape(tm, 1)
    tz = tgt_ref[2, :].reshape(tm, 1)
    sx = src_ref[0, :].reshape(1, ts)
    sy = src_ref[1, :].reshape(1, ts)
    sz = src_ref[2, :].reshape(1, ts)
    dx = sx - tx
    dy = sy - ty
    dz = sz - tz
    r2 = dx * dx + dy * dy + dz * dz
    h = src_ref[4, 0]
    neg_phi = -jax.lax.rsqrt(r2 + h * h + _TINY2)
    sm = src_ref[3, :]
    pot = jnp.dot(neg_phi, sm, preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[0, :] = pot

    @pl.when(pl.program_id(1) != 0)
    def _():
        out_ref[0, :] = out_ref[0, :] + pot


@functools.partial(jax.jit, static_argnames=("tm", "ts", "mxu", "interpret"))
def potentials(pack, tm=256, ts=4096, mxu=False, interpret=False):
    n = pack.shape[1]
    kern = functools.partial(
        _mxu_potential_kernel if mxu else _vpu_potential_kernel,
        tm=tm, ts=ts)
    return pl.pallas_call(
        kern,
        grid=(n // tm, n // ts),
        in_specs=[pl.BlockSpec((8, tm), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, ts), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tm), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(pack, pack)[0]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    on_cpu = jax.devices()[0].platform == "cpu"
    rng = np.random.default_rng(0)
    # clustered galaxy at a GLOBAL offset (the hard case): r ~ Exp(3 kpc)
    # around (250, 250, 250)
    rt = rng.exponential(3.0, n)
    vt = rng.normal(size=(n, 3))
    vt /= np.linalg.norm(vt, axis=1, keepdims=True)
    pos = vt * rt[:, None] + 250.0
    mass = rng.uniform(0.5, 2.0, n)
    soft = 0.05

    pack = np.zeros((8, n), np.float32)
    pack[0:3] = pos.T
    pack[3] = mass
    pack[4] = soft

    # f64 reference (no self-exclusion in either kernel: include all pairs)
    sub = rng.choice(n, 2048, replace=False)
    d = pos[sub, None, :] - pos[None, :, :]
    r2 = (d ** 2).sum(-1)
    phi_ref = -(mass[None, :] / np.sqrt(r2 + soft * soft)).sum(1)

    pk = jnp.asarray(pack)
    for mxu in (False, True):
        phi = potentials(pk, mxu=mxu, interpret=on_cpu)
        got = np.asarray(phi)[sub]
        rel = np.abs((got - phi_ref) / phi_ref)
        t0 = time.perf_counter()
        float(np.asarray(potentials(pk, mxu=mxu, interpret=on_cpu))[0])
        reps = 3 if not on_cpu else 1
        ts_ = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(potentials(pk, mxu=mxu,
                                        interpret=on_cpu))[0])
            ts_.append(time.perf_counter() - t0)
        dt = sorted(ts_)[len(ts_) // 2]
        print(f"{'MXU' if mxu else 'VPU'}: {n * n / dt / 1e9:8.1f} Gpairs/s"
              f"   rel err max {rel.max():.3e}  median {np.median(rel):.3e}",
              flush=True)

    # recentred variant with the offset removed up front (best case)
    pack2 = pack.copy()
    pack2[0:3] -= 250.0
    pk2 = jnp.asarray(pack2)
    phi2 = np.asarray(potentials(pk2, mxu=True, interpret=on_cpu))[sub]
    rel2 = np.abs((phi2 - phi_ref) / phi_ref)
    print(f"MXU (pre-centred input): rel err max {rel2.max():.3e} "
          f"median {np.median(rel2):.3e}", flush=True)


if __name__ == "__main__":
    main()
