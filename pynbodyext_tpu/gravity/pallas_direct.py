"""Tiled O(N²) direct-sum gravity as Pallas TPU kernels.

This is the TPU-native replacement for the reference's rayon-parallel Rust
direct sums (``crates/gravity/src/direct.rs``) and the hot leaf loops of its
Barnes–Hut traversal (``tree.rs:98,280``): a flash-attention-style schedule
where target tiles stay resident in VMEM while source tiles stream through,
accumulating φ / a⃗ on-chip (SURVEY.md §7 design translation).

Data layout: particles are packed into an (8, N) f32 array — rows
x, y, z, mass, softening, (spare), ones — so every block is exactly the f32
(8, 128) hardware tile and coordinate broadcasts are lane-aligned.  Padded
source columns carry mass 0 and position +1e15 so they contribute nothing.

Performance notes (v5e ~1024-lane VPU):
* pairwise distances use difference form (dx² + dy² + dz²), NOT the
  ‖t‖²+‖s‖²−2t·s matmul trick — the latter catastrophically cancels for
  close pairs at global coordinates, which gravity (unlike attention)
  cannot tolerate;
* everything downstream works on r² with one ``lax.rsqrt`` per pair
  (no sqrt-then-square round trips);
* the potential reduction Σφ·m runs as an MXU matvec (φ·m terms are
  physically bounded, so the matvec is well-conditioned); accelerations
  stay in the difference form Σw·d⃗ on the VPU for the same accuracy reason;
* self-exclusion masks are built only on tile pairs whose global index
  ranges can actually overlap (``lax.cond`` on scalar offsets).

Conventions match ``direct.rs``: self-set pair softening h = max(hᵢ, hⱼ)
with index-based self-exclusion; at-points uses source softening only;
a⃗ᵢ = Σⱼ mⱼ (r⃗ⱼ − r⃗ᵢ) g(r;h).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernels import KERNEL_NONE, KERNEL_PLUMMER, KERNEL_SPLINE, w2, w2_prime

__all__ = ["direct_potentials", "direct_accelerations", "pack_particles"]

_TINY2 = 1e-38
# padded-source sentinel position: far away but small enough that r² stays
# finite in f32 (1e30 would overflow to inf and 0·inf → NaN)
_PAD_POS = 1e15

# default tile sizes: targets resident (rows), sources streamed (lanes),
# empirically best on v5e from tile sweeps.  The acceleration kernel bounds
# dx/dy/dz liveness by sub-chunking the source tile (_SUB_ACC lanes at a
# time) so any tile shape fits the 16 MB scoped-VMEM budget.  Measured wall
# (v5e, 262k): potentials ~106 Gpairs/s, accelerations ~77 Gpairs/s — BOTH
# are the same ~1.3 Tflop/s VPU elementwise rate (12 vs 18 flops/pair);
# bigger tiles and MXU row-sum reductions measured no faster, so the accel
# gap vs potentials is the flop count of the cancellation-safe difference
# form, not a tiling artifact.
_TM = 512
_TS = 2048
_TM_ACC = 256
_TS_ACC = 4096
_SUB_ACC = 2048


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def pack_particles(pos, mass=None, soft=None, n_pad: Optional[int] = None,
                   tile: int = _TS):
    """Pack (N,3) positions (+mass/softening) into the (8, Npad) layout."""
    pos = jnp.asarray(pos, dtype=jnp.float32)
    n = pos.shape[0]
    n_pad = _round_up(max(n if n_pad is None else n_pad, 1), tile)
    m = jnp.ones(n, jnp.float32) if mass is None else jnp.asarray(
        mass, jnp.float32)
    h = jnp.zeros(n, jnp.float32) if soft is None else jnp.broadcast_to(
        jnp.asarray(soft, jnp.float32), (n,))
    pack = jnp.zeros((8, n_pad), jnp.float32)
    pack = pack.at[0:3, :].set(_PAD_POS)
    pack = pack.at[0, :n].set(pos[:, 0])
    pack = pack.at[1, :n].set(pos[:, 1])
    pack = pack.at[2, :n].set(pos[:, 2])
    pack = pack.at[3, :n].set(m)
    pack = pack.at[4, :n].set(h)
    pack = pack.at[6, :].set(1.0)  # ones row for MXU Σw reductions
    return pack, n


def _r2_and_h(tgt_ref, src_ref, tm, ts, self_set: bool, uniform_soft: bool):
    """Pairwise squared distances (+ pair softening when self_set).

    ``uniform_soft``: every particle shares one softening value — the pair
    max collapses to a scalar read (common Gravity(pos, mass, softening=ε)
    usage, same fast path the reference special-cases in its leaf loops).
    """
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
    if uniform_soft:
        h = src_ref[4, 0]  # scalar, broadcasts for free
    elif self_set:
        th = tgt_ref[4, :].reshape(tm, 1)
        sh = src_ref[4, :].reshape(1, ts)
        h = jnp.maximum(th, sh)
    else:
        sh = src_ref[4, :].reshape(1, ts)
        h = jnp.broadcast_to(sh, (tm, ts))
    return r2, h, (dx, dy, dz)


def _self_mask(off_ref, i, j, tm, ts, r2, src_sub: int = 0,
               src_tile: int = None):
    """+inf into r² on the diagonal, only when tile ranges overlap.

    ``src_sub``/``src_tile``: when the kernel sub-chunks its source tile,
    ``ts`` is the sub-chunk width and ``src_sub`` its offset inside the
    full tile of width ``src_tile``.
    """
    t_lo = off_ref[0] + i * tm
    s_lo = off_ref[1] + j * (ts if src_tile is None else src_tile) + src_sub

    def masked(r2):
        trow = t_lo + jax.lax.broadcasted_iota(jnp.int32, (tm, ts), 0)
        scol = s_lo + jax.lax.broadcasted_iota(jnp.int32, (tm, ts), 1)
        return jnp.where(trow == scol, jnp.inf, r2)

    overlap = jnp.logical_and(t_lo < s_lo + ts, s_lo < t_lo + tm)
    return jax.lax.cond(overlap, masked, lambda x: x, r2)


def _phi_pairs(kernel: str, r2, h):
    """−φ per unit mass from r² (diagonal entries carry r²=+inf → 0)."""
    if kernel == KERNEL_NONE:
        return -jax.lax.rsqrt(r2 + _TINY2)
    if kernel == KERNEL_PLUMMER:
        return -jax.lax.rsqrt(r2 + h * h + _TINY2)
    if kernel == KERNEL_SPLINE:
        r = jnp.sqrt(r2 + _TINY2)
        h_safe = jnp.maximum(h, 1e-30)
        phi = jnp.where(h > 0, w2(r / h_safe) / h_safe,
                        -1.0 / jnp.maximum(r, 1e-30))
        return jnp.where(jnp.isfinite(r2), phi, 0.0)
    raise ValueError(kernel)


def _g_pairs(kernel: str, r2, h):
    """g(r;h) with a⃗ = m·r⃗·g, from r²."""
    if kernel == KERNEL_NONE:
        invr = jax.lax.rsqrt(r2 + _TINY2)
        return invr * invr * invr
    if kernel == KERNEL_PLUMMER:
        invr = jax.lax.rsqrt(r2 + h * h + _TINY2)
        return invr * invr * invr
    if kernel == KERNEL_SPLINE:
        r = jnp.sqrt(r2 + _TINY2)
        h_safe = jnp.maximum(h, 1e-30)
        r_safe = jnp.maximum(r, 1e-30)
        g = jnp.where(h > 0, w2_prime(r / h_safe) / (h_safe * h_safe * r_safe),
                      1.0 / (r_safe * r_safe * r_safe))
        return jnp.where(jnp.isfinite(r2), g, 0.0)
    raise ValueError(kernel)


def _potential_kernel(off_ref, tgt_ref, src_ref, out_ref, *, tm, ts, kernel,
                      self_set, uniform_soft):
    i = pl.program_id(0)
    j = pl.program_id(1)
    r2, h, _ = _r2_and_h(tgt_ref, src_ref, tm, ts, self_set, uniform_soft)
    if self_set:
        r2 = _self_mask(off_ref, i, j, tm, ts, r2)
    neg_phi = _phi_pairs(kernel, r2, h)  # (tm, ts), zeros where r²=inf…
    if kernel in (KERNEL_NONE, KERNEL_PLUMMER):
        # rsqrt(inf)=0 naturally; nothing else needed
        pass
    sm = src_ref[3, :]
    pot = jnp.dot(neg_phi, sm, preferred_element_type=jnp.float32)  # MXU

    @pl.when(j == 0)
    def _():
        out_ref[0, :] = pot

    @pl.when(j != 0)
    def _():
        out_ref[0, :] = out_ref[0, :] + pot


def _acceleration_kernel(off_ref, tgt_ref, src_ref, out_ref, *, tm, ts,
                         kernel, self_set, uniform_soft):
    i = pl.program_id(0)
    j = pl.program_id(1)
    tx = tgt_ref[0, :].reshape(tm, 1)
    ty = tgt_ref[1, :].reshape(tm, 1)
    tz = tgt_ref[2, :].reshape(tm, 1)
    th = None if uniform_soft else tgt_ref[4, :].reshape(tm, 1)
    sub = min(ts, _SUB_ACC)
    ax = jnp.zeros((tm,), jnp.float32)
    ay = jnp.zeros((tm,), jnp.float32)
    az = jnp.zeros((tm,), jnp.float32)
    # sub-chunk the source tile: dx/dy/dz/r²/w live only (tm, sub) at a
    # time, so 512-row target tiles fit scoped VMEM (round-1 bottleneck)
    for c in range(ts // sub):
        lo, hi = c * sub, (c + 1) * sub
        dx = src_ref[0, lo:hi].reshape(1, sub) - tx
        dy = src_ref[1, lo:hi].reshape(1, sub) - ty
        dz = src_ref[2, lo:hi].reshape(1, sub) - tz
        r2 = dx * dx + dy * dy + dz * dz
        if uniform_soft:
            h = src_ref[4, 0]  # scalar, broadcasts for free
        elif self_set:
            h = jnp.maximum(th, src_ref[4, lo:hi].reshape(1, sub))
        else:
            h = jnp.broadcast_to(src_ref[4, lo:hi].reshape(1, sub),
                                 (tm, sub))
        if self_set:
            r2 = _self_mask(off_ref, i, j, tm, sub, r2, src_sub=lo,
                            src_tile=ts)
        g = _g_pairs(kernel, r2, h)
        w = g * src_ref[3, lo:hi].reshape(1, sub)  # rsqrt(inf)=0 on diag
        # accumulate in the physical (difference) form w·dᵢ — every summand
        # is a bounded force term, so no catastrophic cancellation at global
        # coordinates (an MXU Σw·s − t·Σw bundle would cancel badly)
        ax = ax + jnp.sum(w * dx, axis=1)
        ay = ay + jnp.sum(w * dy, axis=1)
        az = az + jnp.sum(w * dz, axis=1)

    @pl.when(j == 0)
    def _():
        out_ref[0, :] = ax
        out_ref[1, :] = ay
        out_ref[2, :] = az
        out_ref[3, :] = jnp.zeros_like(ax)
        out_ref[4, :] = jnp.zeros_like(ax)
        out_ref[5, :] = jnp.zeros_like(ax)
        out_ref[6, :] = jnp.zeros_like(ax)
        out_ref[7, :] = jnp.zeros_like(ax)

    @pl.when(j != 0)
    def _():
        out_ref[0, :] = out_ref[0, :] + ax
        out_ref[1, :] = out_ref[1, :] + ay
        out_ref[2, :] = out_ref[2, :] + az


@functools.partial(jax.jit, static_argnames=("kernel", "self_set", "tm", "ts",
                                             "accel", "interpret",
                                             "uniform_soft"))
def _direct_call(src_pack, tgt_pack, kernel: str, self_set: bool,
                 tm: int, ts: int, accel: bool, interpret: bool = False,
                 tgt_offset=0, src_offset=0, uniform_soft: bool = False):
    n_pad = src_pack.shape[1]
    m_pad = tgt_pack.shape[1]
    grid = (m_pad // tm, n_pad // ts)
    body = _acceleration_kernel if accel else _potential_kernel
    out_rows = 8 if accel else 1
    kern = functools.partial(body, tm=tm, ts=ts, kernel=kernel,
                             self_set=self_set, uniform_soft=uniform_soft)
    flops_per_pair = 18 if accel else 12
    offsets = jnp.asarray([tgt_offset, src_offset], dtype=jnp.int32)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, tm), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, ts), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((out_rows, tm), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_rows, m_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * m_pad * n_pad,
            bytes_accessed=(m_pad + n_pad) * 32 + m_pad * out_rows * 4,
            transcendentals=m_pad * n_pad,
        ),
        interpret=interpret,
    )(offsets, tgt_pack, src_pack)


def _is_uniform_soft(soft) -> bool:
    """Host-static check: one shared softening value (or none at all)."""
    if soft is None:
        return True
    if isinstance(soft, (int, float)):
        return True
    import numpy as np
    if isinstance(soft, np.ndarray):
        return soft.ndim == 0 or (soft.size > 0
                                  and bool((soft == soft.flat[0]).all()))
    return jnp.ndim(soft) == 0  # traced arrays: only 0-d counts as uniform


def _prepare(pos, masses, softenings, targets, target_softenings,
             tm: int, ts: int):
    src_pack, n = pack_particles(pos, masses, softenings, tile=ts)
    uniform = _is_uniform_soft(softenings)
    if targets is None:
        # self-set: targets are the same pack, re-padded to the target tile
        tgt_pack, m = pack_particles(pos, masses, softenings, tile=tm)
        self_set = True
    else:
        tgt_pack, m = pack_particles(targets, None, target_softenings,
                                     tile=tm)
        self_set = False
    return src_pack, tgt_pack, n, m, self_set, uniform


def direct_potentials(pos, masses=None, softenings=None, targets=None,
                      target_softenings=None, kernel: str = KERNEL_NONE,
                      tm: int = _TM, ts: int = _TS, interpret: bool = False):
    """Pallas O(N·M) potentials (self-set when ``targets`` is None)."""
    src, tgt, n, m, self_set, uniform = _prepare(
        pos, masses, softenings, targets, target_softenings, tm, ts)
    out = _direct_call(src, tgt, kernel, self_set, tm, ts, accel=False,
                       interpret=interpret, uniform_soft=uniform)
    return out[0, :m]


def direct_accelerations(pos, masses=None, softenings=None, targets=None,
                         target_softenings=None,
                         kernel: str = KERNEL_NONE,
                         tm: int = _TM_ACC, ts: int = _TS_ACC,
                         interpret: bool = False):
    """Pallas O(N·M) accelerations (self-set when ``targets`` is None)."""
    src, tgt, n, m, self_set, uniform = _prepare(
        pos, masses, softenings, targets, target_softenings, tm, ts)
    out = _direct_call(src, tgt, kernel, self_set, tm, ts, accel=True,
                       interpret=interpret, uniform_soft=uniform)
    return out[0:3, :m].T
