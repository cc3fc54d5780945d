"""Tiled O(N²) direct-sum gravity as Pallas TPU kernels.

This is the TPU-native replacement for the reference's rayon-parallel Rust
direct sums (``crates/gravity/src/direct.rs``) and the hot leaf loops of its
Barnes–Hut traversal (``tree.rs:98,280``): a flash-attention-style schedule
where target tiles stay resident in VMEM while source tiles stream through,
accumulating φ / a⃗ on-chip (SURVEY.md §7 design translation).

Data layout: particles are packed into an (8, N) f32 array — rows
x, y, z, mass, softening — so every block is exactly the f32 (8, 128)
hardware tile and coordinate broadcasts are lane-aligned.  Padded source
columns carry mass 0 and position +1e30 so they contribute nothing.

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

from .kernels import (KERNEL_NONE, kernel_accel_factor,
                      kernel_potential_per_unit_mass)

__all__ = ["direct_potentials", "direct_accelerations", "pack_particles"]

_TINY2 = 1e-38
# padded-source sentinel position: far away but small enough that r² stays
# finite in f32 (1e30 would overflow to inf and 0·inf → NaN)
_PAD_POS = 1e15

# default tile sizes: targets resident (rows), sources streamed (lanes)
_TM = 256
_TS = 1024


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def pack_particles(pos, mass=None, soft=None, n_pad: Optional[int] = None,
                   tile: int = _TS):
    """Pack (N,3) positions (+mass/softening) into the (8, Npad) layout."""
    pos = jnp.asarray(pos, dtype=jnp.float32)
    n = pos.shape[0]
    n_pad = _round_up(n if n_pad is None else n_pad, tile)
    m = jnp.ones(n, jnp.float32) if mass is None else jnp.asarray(
        mass, jnp.float32)
    h = jnp.zeros(n, jnp.float32) if soft is None else jnp.broadcast_to(
        jnp.asarray(soft, jnp.float32), (n,))
    pack = jnp.zeros((8, n_pad), jnp.float32)
    pack = pack.at[3, :].set(0.0)  # padded mass = 0
    pack = pack.at[0:3, :].set(_PAD_POS)
    pack = pack.at[0, :n].set(pos[:, 0])
    pack = pack.at[1, :n].set(pos[:, 1])
    pack = pack.at[2, :n].set(pos[:, 2])
    pack = pack.at[3, :n].set(m)
    pack = pack.at[4, :n].set(h)
    return pack, n


def _pairwise(off_ref, tgt_ref, src_ref, i, j, tm, ts, kernel: str,
              self_set: bool):
    """Shared tile math: returns (r, h, m_j, dx, dy, dz, self_mask).

    ``off_ref`` holds [target_offset, source_offset] global indices (SMEM) so
    self-exclusion stays index-exact under ring sharding (shards see rotated
    source blocks whose global offsets differ per step).
    """
    tx = tgt_ref[0, :].reshape(tm, 1)
    ty = tgt_ref[1, :].reshape(tm, 1)
    tz = tgt_ref[2, :].reshape(tm, 1)
    th = tgt_ref[4, :].reshape(tm, 1)
    sx = src_ref[0, :].reshape(1, ts)
    sy = src_ref[1, :].reshape(1, ts)
    sz = src_ref[2, :].reshape(1, ts)
    sm = src_ref[3, :].reshape(1, ts)
    sh = src_ref[4, :].reshape(1, ts)
    dx = sx - tx
    dy = sy - ty
    dz = sz - tz
    r = jnp.sqrt(dx * dx + dy * dy + dz * dz + _TINY2)
    if self_set:
        h = jnp.maximum(th, sh)
        trow = (off_ref[0] + i * tm
                + jax.lax.broadcasted_iota(jnp.int32, (tm, ts), 0))
        scol = (off_ref[1] + j * ts
                + jax.lax.broadcasted_iota(jnp.int32, (tm, ts), 1))
        same = trow == scol
    else:
        h = jnp.broadcast_to(sh, (tm, ts))
        same = None
    return r, h, sm, dx, dy, dz, same


def _potential_kernel(off_ref, tgt_ref, src_ref, out_ref, *, tm, ts, kernel,
                      self_set):
    i = pl.program_id(0)
    j = pl.program_id(1)
    r, h, sm, _, _, _, same = _pairwise(off_ref, tgt_ref, src_ref, i, j,
                                        tm, ts, kernel, self_set)
    phi = kernel_potential_per_unit_mass(kernel, r, h)
    if same is not None:
        phi = jnp.where(same, 0.0, phi)
    pot = jnp.sum(phi * sm, axis=1)  # (tm,)

    @pl.when(j == 0)
    def _():
        out_ref[0, :] = pot

    @pl.when(j != 0)
    def _():
        out_ref[0, :] = out_ref[0, :] + pot


def _acceleration_kernel(off_ref, tgt_ref, src_ref, out_ref, *, tm, ts,
                         kernel, self_set):
    i = pl.program_id(0)
    j = pl.program_id(1)
    r, h, sm, dx, dy, dz, same = _pairwise(off_ref, tgt_ref, src_ref, i, j,
                                           tm, ts, kernel, self_set)
    g = kernel_accel_factor(kernel, r, h)
    if same is not None:
        g = jnp.where(same, 0.0, g)
    w = g * sm
    ax = jnp.sum(w * dx, axis=1)
    ay = jnp.sum(w * dy, axis=1)
    az = jnp.sum(w * dz, axis=1)

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
                                             "accel", "interpret"))
def _direct_call(src_pack, tgt_pack, kernel: str, self_set: bool,
                 tm: int, ts: int, accel: bool, interpret: bool = False,
                 tgt_offset=0, src_offset=0):
    n_pad = src_pack.shape[1]
    m_pad = tgt_pack.shape[1]
    grid = (m_pad // tm, n_pad // ts)
    body = _acceleration_kernel if accel else _potential_kernel
    out_rows = 8 if accel else 1
    kern = functools.partial(body, tm=tm, ts=ts, kernel=kernel,
                             self_set=self_set)
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


def _prepare(pos, masses, softenings, targets, target_softenings,
             tm: int, ts: int):
    src_pack, n = pack_particles(pos, masses, softenings, tile=ts)
    if targets is None:
        # self-set: targets are the same pack, re-padded to the target tile
        tgt_pack, m = pack_particles(pos, masses, softenings, tile=tm)
        self_set = True
    else:
        tgt_pack, m = pack_particles(targets, None, target_softenings,
                                     tile=tm)
        self_set = False
    return src_pack, tgt_pack, n, m, self_set


def direct_potentials(pos, masses=None, softenings=None, targets=None,
                      target_softenings=None, kernel: str = KERNEL_NONE,
                      tm: int = _TM, ts: int = _TS, interpret: bool = False):
    """Pallas O(N·M) potentials (self-set when ``targets`` is None)."""
    src, tgt, n, m, self_set = _prepare(pos, masses, softenings, targets,
                                        target_softenings, tm, ts)
    out = _direct_call(src, tgt, kernel, self_set, tm, ts, accel=False,
                       interpret=interpret)
    return out[0, :m]


def direct_accelerations(pos, masses=None, softenings=None, targets=None,
                         target_softenings=None, kernel: str = KERNEL_NONE,
                         tm: int = _TM, ts: int = _TS,
                         interpret: bool = False):
    """Pallas O(N·M) accelerations (self-set when ``targets`` is None)."""
    src, tgt, n, m, self_set = _prepare(pos, masses, softenings, targets,
                                        target_softenings, tm, ts)
    out = _direct_call(src, tgt, kernel, self_set, tm, ts, accel=True,
                       interpret=interpret)
    return out[0:3, :m].T
