"""Pallas near-field kernel for the device tree: gather-by-list via
scalar-prefetch block specs (the block-sparse pattern).

The XLA vmap+gather evaluation in :mod:`.tree_tpu` is correct but runs at
~3 G pair-interactions/s — gathers and HBM-staged intermediates dominate.
This kernel hits the same interaction lists with the dense-pipe machinery:

* particles are packed into per-leaf tiles of shape (8, cap) — with
  ``leaf_capacity=128`` every tile is exactly one f32 (8, 128) hardware
  tile: rows x, y, z, mass, softening, orig-index (exact in f32 for
  N < 2²⁴), ones, pad;
* the near-field interaction list (blocks × list of leaf ids) is a
  **scalar-prefetch** operand: the BlockSpec index_map reads it to choose
  which leaf tile the pipeline DMAs next — Pallas double-buffers the
  gather automatically;
* each grid step computes one (targets × leaf-tile) pairwise tile with the
  same rsqrt-on-r² math as :mod:`.pallas_direct`.

The far field stays on the XLA path of :mod:`.tree_tpu` (node payloads are
16-byte scatters — cheap relative to the near field once leaves are 128 wide).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernels import KERNEL_NONE, KERNEL_PLUMMER, KERNEL_SPLINE, w2, w2_prime

__all__ = ["near_field_potentials", "near_field_accelerations",
           "pack_leaf_tiles"]

_TINY2 = 1e-38


def pack_leaf_tiles(pos, mass, soft, orig, lstarts, lcounts, sentinel,
                    cap: int):
    """(n_leaves+1, 8, cap) f32 leaf tiles (+1 all-dummy row).

    Row layout: x, y, z, mass, softening, orig_index, 1, 0.  ``orig`` must
    be < 2²⁴ for exact f32 index comparison.
    """
    n = len(pos)
    if n >= (1 << 24):
        raise ValueError("orig-index-in-f32 packing requires N < 2^24")
    n_leaves = len(lstarts)
    k = np.arange(cap)[None, :]
    idx = np.asarray(lstarts, np.int64)[:, None] + k
    valid = k < np.asarray(lcounts, np.int64)[:, None]
    idx = np.where(valid, idx, n)  # n → dummy particle row
    pos_pad = np.vstack([pos, sentinel[None, :]])
    m_pad = np.concatenate([mass, [0.0]])
    h_pad = np.concatenate([soft, [0.0]])
    o_pad = np.concatenate([orig, [-2]])
    tiles = np.zeros((n_leaves + 1, 8, cap), np.float32)
    tiles[:n_leaves, 0] = pos_pad[idx, 0]
    tiles[:n_leaves, 1] = pos_pad[idx, 1]
    tiles[:n_leaves, 2] = pos_pad[idx, 2]
    tiles[:n_leaves, 3] = m_pad[idx]
    tiles[:n_leaves, 4] = h_pad[idx]
    tiles[:n_leaves, 5] = o_pad[idx]
    tiles[:n_leaves, 6] = 1.0
    # dummy leaf: sentinel position, zero mass
    tiles[n_leaves, 0:3] = sentinel[:, None]
    tiles[n_leaves, 5] = -2.0
    return tiles


def _phi_from_r2(kernel: str, r2, h):
    if kernel == KERNEL_NONE:
        return -jax.lax.rsqrt(r2 + _TINY2)
    if kernel == KERNEL_PLUMMER:
        return -jax.lax.rsqrt(r2 + h * h + _TINY2)
    if kernel == KERNEL_SPLINE:
        r = jnp.sqrt(r2 + _TINY2)
        h_safe = jnp.maximum(h, 1e-30)
        return jnp.where(h > 0, w2(r / h_safe) / h_safe,
                         -1.0 / jnp.maximum(r, 1e-30))
    raise ValueError(kernel)


def _g_from_r2(kernel: str, r2, h):
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
        return jnp.where(h > 0,
                         w2_prime(r / h_safe) / (h_safe * h_safe * r_safe),
                         1.0 / (r_safe * r_safe * r_safe))
    raise ValueError(kernel)


def _near_potential_kernel(lists_ref, tgt_ref, *rest, tb, cap, kernel, k):
    tile_refs, out_ref = rest[:-1], rest[-1]
    t = pl.program_id(1)
    tx = tgt_ref[0, 0, :].reshape(tb, 1)
    ty = tgt_ref[0, 1, :].reshape(tb, 1)
    tz = tgt_ref[0, 2, :].reshape(tb, 1)
    th = tgt_ref[0, 4, :].reshape(tb, 1)
    to = tgt_ref[0, 5, :].reshape(tb, 1)
    pot = jnp.zeros((tb,), jnp.float32)
    for tile_ref in tile_refs:
        sx = tile_ref[0, 0, :].reshape(1, cap)
        sy = tile_ref[0, 1, :].reshape(1, cap)
        sz = tile_ref[0, 2, :].reshape(1, cap)
        sm = tile_ref[0, 3, :]
        sh = tile_ref[0, 4, :].reshape(1, cap)
        so = tile_ref[0, 5, :].reshape(1, cap)
        dx = sx - tx
        dy = sy - ty
        dz = sz - tz
        r2 = dx * dx + dy * dy + dz * dz
        r2 = jnp.where(so == to, jnp.inf, r2)  # exact self exclusion
        h = jnp.maximum(th, sh)
        neg_phi = _phi_from_r2(kernel, r2, h)
        if kernel == KERNEL_SPLINE:
            neg_phi = jnp.where(jnp.isfinite(r2), neg_phi, 0.0)
        # VPU row-sum, NOT jnp.dot: Mosaic cannot fuse a dot into a
        # non-constant accumulator ("only constant accumulators supported")
        pot = pot + jnp.sum(neg_phi * sm.reshape(1, cap), axis=1)

    @pl.when(t == 0)
    def _():
        out_ref[0, 0, :] = pot
        for row in range(1, 8):
            out_ref[0, row, :] = jnp.zeros_like(pot)

    @pl.when(t != 0)
    def _():
        out_ref[0, 0, :] = out_ref[0, 0, :] + pot


def _near_acceleration_kernel(lists_ref, tgt_ref, *rest, tb, cap, kernel, k):
    tile_refs, out_ref = rest[:-1], rest[-1]
    t = pl.program_id(1)
    tx = tgt_ref[0, 0, :].reshape(tb, 1)
    ty = tgt_ref[0, 1, :].reshape(tb, 1)
    tz = tgt_ref[0, 2, :].reshape(tb, 1)
    th = tgt_ref[0, 4, :].reshape(tb, 1)
    to = tgt_ref[0, 5, :].reshape(tb, 1)
    ax = jnp.zeros((tb,), jnp.float32)
    ay = jnp.zeros((tb,), jnp.float32)
    az = jnp.zeros((tb,), jnp.float32)
    # tile-local recentred bundle (see _near_banded_kernel): Σ w·(s−t)
    # = Σ w·s′ − t′·Σw with c = first target lane; error measured
    # identical to the diff form at leaf-window scale
    cx = tgt_ref[0, 0, 0]
    cy = tgt_ref[0, 1, 0]
    cz = tgt_ref[0, 2, 0]
    for tile_ref in tile_refs:
        sx = tile_ref[0, 0, :].reshape(1, cap)
        sy = tile_ref[0, 1, :].reshape(1, cap)
        sz = tile_ref[0, 2, :].reshape(1, cap)
        sm = tile_ref[0, 3, :].reshape(1, cap)
        sh = tile_ref[0, 4, :].reshape(1, cap)
        so = tile_ref[0, 5, :].reshape(1, cap)
        dx = sx - tx
        dy = sy - ty
        dz = sz - tz
        r2 = dx * dx + dy * dy + dz * dz
        r2 = jnp.where(so == to, jnp.inf, r2)
        h = jnp.maximum(th, sh)
        g = _g_from_r2(kernel, r2, h)
        if kernel == KERNEL_SPLINE:
            g = jnp.where(jnp.isfinite(r2), g, 0.0)
        w = g * sm
        sw = jnp.sum(w, axis=1)
        ax = ax + jnp.sum(w * (sx - cx), axis=1) - (tx[:, 0] - cx) * sw
        ay = ay + jnp.sum(w * (sy - cy), axis=1) - (ty[:, 0] - cy) * sw
        az = az + jnp.sum(w * (sz - cz), axis=1) - (tz[:, 0] - cz) * sw

    @pl.when(t == 0)
    def _():
        out_ref[0, 0, :] = ax
        out_ref[0, 1, :] = ay
        out_ref[0, 2, :] = az
        for row in range(3, 8):
            out_ref[0, row, :] = jnp.zeros_like(ax)

    @pl.when(t != 0)
    def _():
        out_ref[0, 0, :] = out_ref[0, 0, :] + ax
        out_ref[0, 1, :] = out_ref[0, 1, :] + ay
        out_ref[0, 2, :] = out_ref[0, 2, :] + az


@functools.partial(jax.jit, static_argnames=("kernel", "accel", "interpret",
                                             "k"))
def near_field_eval(lists, tgt_tiles, leaf_tiles, kernel: str = KERNEL_NONE,
                    accel: bool = False, interpret: bool = False,
                    k: int = 4):
    """Evaluate the near field for every block.

    lists: (nb, Lmax) int32 leaf ids (padded with the dummy leaf id;
    Lmax a multiple of ``k``); tgt_tiles: (nb, 8, TB); leaf_tiles:
    (n_leaves+1, 8, cap).  Each grid step streams ``k`` leaf tiles via
    ``k`` scalar-prefetch source operands — amortizing the ~µs per-step
    overhead that dominates (128×128) single-tile steps.
    Returns (nb, 8, TB) with φ in row 0 (or a⃗ in rows 0–2).
    """
    nb, lmax = lists.shape
    tb = tgt_tiles.shape[2]
    cap = leaf_tiles.shape[2]
    k = max(1, min(k, lmax))
    if lmax % k:
        raise ValueError(f"list width {lmax} not a multiple of k={k}")
    body = _near_acceleration_kernel if accel else _near_potential_kernel
    kern = functools.partial(body, tb=tb, cap=cap, kernel=kernel, k=k)

    def src_spec(i):
        return pl.BlockSpec((1, 8, cap),
                            lambda b, t, L, i=i: (L[b, t * k + i], 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, lmax // k),
        in_specs=[pl.BlockSpec((1, 8, tb), lambda b, t, L: (b, 0, 0))]
        + [src_spec(i) for i in range(k)],
        out_specs=pl.BlockSpec((1, 8, tb), lambda b, t, L: (b, 0, 0)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, 8, tb), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(lists, tgt_tiles, *([leaf_tiles] * k))


def _far_monopole_kernel(tgt_ref, src_ref, out_ref, *, tb, ts, accel):
    j = pl.program_id(1)
    tx = tgt_ref[0, 0, :].reshape(tb, 1)
    ty = tgt_ref[0, 1, :].reshape(tb, 1)
    tz = tgt_ref[0, 2, :].reshape(tb, 1)
    sx = src_ref[0, 0, :].reshape(1, ts)
    sy = src_ref[0, 1, :].reshape(1, ts)
    sz = src_ref[0, 2, :].reshape(1, ts)
    sm = src_ref[0, 3, :]
    dx = sx - tx
    dy = sy - ty
    dz = sz - tz
    r2 = dx * dx + dy * dy + dz * dz
    if accel:
        invr = jax.lax.rsqrt(r2 + _TINY2)
        w = (invr * invr * invr) * sm.reshape(1, ts)
        ax = jnp.sum(w * dx, axis=1)
        ay = jnp.sum(w * dy, axis=1)
        az = jnp.sum(w * dz, axis=1)

        @pl.when(j == 0)
        def _():
            out_ref[0, 0, :] = ax
            out_ref[0, 1, :] = ay
            out_ref[0, 2, :] = az
            for row in range(3, 8):
                out_ref[0, row, :] = jnp.zeros_like(ax)

        @pl.when(j != 0)
        def _():
            out_ref[0, 0, :] = out_ref[0, 0, :] + ax
            out_ref[0, 1, :] = out_ref[0, 1, :] + ay
            out_ref[0, 2, :] = out_ref[0, 2, :] + az
    else:
        neg_phi = -jax.lax.rsqrt(r2 + _TINY2)
        pot = jnp.dot(neg_phi, sm, preferred_element_type=jnp.float32)

        @pl.when(j == 0)
        def _():
            out_ref[0, 0, :] = pot
            for row in range(1, 8):
                out_ref[0, row, :] = jnp.zeros_like(pot)

        @pl.when(j != 0)
        def _():
            out_ref[0, 0, :] = out_ref[0, 0, :] + pot


@functools.partial(jax.jit, static_argnames=("accel", "interpret"))
def far_monopole_eval(tgt_tiles, node_payload, accel: bool = False,
                      interpret: bool = False):
    """Batched-source dense far field: every block has its own node row.

    tgt_tiles: (C, 8, TB); node_payload: (C, 8, Lnpad) with rows
    x, y, z, mass (padded nodes carry zero mass).  Monopole only — the
    multipole far field uses the XLA path.  Returns (C, 8, TB), φ in row 0
    or a⃗ in rows 0–2.
    """
    c, _, tb = tgt_tiles.shape
    lnpad = node_payload.shape[2]
    ts = min(lnpad, 2048)
    # the grid floor-divides: pad the node axis to a multiple of ts so no
    # trailing columns are dropped (zero-mass padding contributes nothing)
    rem = lnpad % ts
    if rem:
        node_payload = jnp.pad(node_payload, ((0, 0), (0, 0), (0, ts - rem)))
        lnpad += ts - rem
    kern = functools.partial(_far_monopole_kernel, tb=tb, ts=ts, accel=accel)
    return pl.pallas_call(
        kern,
        grid=(c, lnpad // ts),
        in_specs=[
            pl.BlockSpec((1, 8, tb), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, ts), lambda b, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, tb), lambda b, j: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, 8, tb), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(tgt_tiles, node_payload)


def _far_payload_kernel(tgt_ref, src_ref, out_ref, *, tb, ts, accel):
    """Monopole far field from PRE-GATHERED per-block payload rows
    (x, y, z, mass) — the far analogue of the dense kernel: no gathers,
    node lanes stream at full width."""
    j = pl.program_id(1)
    tx = tgt_ref[0, 0, :].reshape(tb, 1)
    ty = tgt_ref[0, 1, :].reshape(tb, 1)
    tz = tgt_ref[0, 2, :].reshape(tb, 1)
    sx = src_ref[0, 0, :].reshape(1, ts)
    sy = src_ref[0, 1, :].reshape(1, ts)
    sz = src_ref[0, 2, :].reshape(1, ts)
    sm = src_ref[0, 3, :]
    dx = sx - tx
    dy = sy - ty
    dz = sz - tz
    r2 = dx * dx + dy * dy + dz * dz
    if accel:
        invr = jax.lax.rsqrt(r2 + _TINY2)
        w = (invr * invr * invr) * sm.reshape(1, ts)
        ax = jnp.sum(w * dx, axis=1)
        ay = jnp.sum(w * dy, axis=1)
        az = jnp.sum(w * dz, axis=1)

        @pl.when(j == 0)
        def _():
            out_ref[0, 0, :] = ax
            out_ref[0, 1, :] = ay
            out_ref[0, 2, :] = az
            for row in range(3, 8):
                out_ref[0, row, :] = jnp.zeros_like(ax)

        @pl.when(j != 0)
        def _():
            out_ref[0, 0, :] = out_ref[0, 0, :] + ax
            out_ref[0, 1, :] = out_ref[0, 1, :] + ay
            out_ref[0, 2, :] = out_ref[0, 2, :] + az
    else:
        neg_phi = -jax.lax.rsqrt(r2 + _TINY2)
        pot = jnp.dot(neg_phi, sm, preferred_element_type=jnp.float32)

        @pl.when(j == 0)
        def _():
            out_ref[0, 0, :] = pot
            for row in range(1, 8):
                out_ref[0, row, :] = jnp.zeros_like(pot)

        @pl.when(j != 0)
        def _():
            out_ref[0, 0, :] = out_ref[0, 0, :] + pot


@functools.partial(jax.jit, static_argnames=("accel", "interpret"))
def far_payload_eval(tgt_tiles, payload, accel: bool = False,
                     interpret: bool = False):
    """Dense far field over pre-gathered payload.

    tgt_tiles: (C, 8, TB) leaf/group tiles; payload: (C, 4, W) node rows
    x, y, z, mass (padded nodes carry zero mass).  Monopole only.
    Returns (C, 8, TB): φ in row 0 (or a⃗ in rows 0–2)."""
    c, _, tb = tgt_tiles.shape
    w = payload.shape[2]
    ts = min(w, 2048)
    rem = w % ts
    if rem:
        payload = jnp.pad(payload, ((0, 0), (0, 0), (0, ts - rem)))
        w += ts - rem
    kern = functools.partial(_far_payload_kernel, tb=tb, ts=ts, accel=accel)
    return pl.pallas_call(
        kern,
        grid=(c, w // ts),
        in_specs=[
            pl.BlockSpec((1, 8, tb), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, ts), lambda b, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, tb), lambda b, j: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, 8, tb), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(tgt_tiles, payload)


def _far_batch_kernel(tgt_ref, src_ref, out_ref, *, tb, ts, accel, B,
                      order=0):
    """Row-batched far field: each grid step evaluates B target blocks
    against their (1, P, ts) payload chunks — amortizing the ~3 µs/step
    fixed cost that walls one-row-per-step schedules (the whole-class XLA
    path measured 2.3 Gpairs/s at 10M for the same reason: effectively
    row-at-a-time scheduling).

    ``order ≥ 2`` adds the Cartesian multipole contraction: payload rows
    4… carry the |n| ≥ 2 moments at their canonical index (COMPACT
    layout — M_000 == mass, COM dipoles identically zero; see
    multipole_eval).  The moment polynomials are pure (tb, ts)
    elementwise VPU work sharing the monopole's ri."""
    from .multipole_eval import acc_moments_xyz, phi_moments_xyz

    j = pl.program_id(1)
    rows = 3 if accel else 1
    for b in range(B):
        tx = tgt_ref[b, 0, :].reshape(tb, 1)
        ty = tgt_ref[b, 1, :].reshape(tb, 1)
        tz = tgt_ref[b, 2, :].reshape(tb, 1)
        sx = src_ref[b, 0, :].reshape(1, ts)
        sy = src_ref[b, 1, :].reshape(1, ts)
        sz = src_ref[b, 2, :].reshape(1, ts)
        sm = src_ref[b, 3, :]

        def get_m(p, b=b):
            return src_ref[b, p, :].reshape(1, ts)

        dx = sx - tx
        dy = sy - ty
        dz = sz - tz
        r2 = dx * dx + dy * dy + dz * dz
        if accel:
            invr = jax.lax.rsqrt(r2 + _TINY2)
            w = (invr * invr * invr) * sm.reshape(1, ts)
            if order >= 2:
                # moment evaluators take d = t − com = −(s − t)
                ms = acc_moments_xyz(tx - sx, ty - sy, tz - sz, invr,
                                     get_m, order)
                vals = (jnp.sum(w * (sx - tx) + ms[0], axis=1),
                        jnp.sum(w * (sy - ty) + ms[1], axis=1),
                        jnp.sum(w * (sz - tz) + ms[2], axis=1))
            else:
                # recompute the diffs per component instead of keeping
                # dx/dy/dz live across the three reductions: 3 extra subs
                # for ~half the live (tb, ts) buffers (VMEM pressure was
                # the reason the accel kernel needed the 512k-lane cap)
                vals = (jnp.sum(w * (sx - tx), axis=1),
                        jnp.sum(w * (sy - ty), axis=1),
                        jnp.sum(w * (sz - tz), axis=1))
        elif order >= 2:
            ri = jax.lax.rsqrt(r2 + _TINY2)
            phi = sm.reshape(1, ts) * ri
            phi = phi + phi_moments_xyz(tx - sx, ty - sy, tz - sz, ri,
                                        get_m, order)
            vals = (-jnp.sum(phi, axis=1),)
        else:
            neg_phi = -jax.lax.rsqrt(r2 + _TINY2)
            vals = (jnp.dot(neg_phi, sm,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST),)

        @pl.when(j == 0)
        def _(b=b, vals=vals):
            for row in range(rows):
                out_ref[b, row, :] = vals[row]

        @pl.when(j != 0)
        def _(b=b, vals=vals):
            for row in range(rows):
                out_ref[b, row, :] = out_ref[b, row, :] + vals[row]


def _far_batch_mxu_kernel(tgt_ref, src_ref, out_ref, *, tb, ts, accel, B,
                          tdot=False):
    """Monopole far field on the MXU via tile-local recentring.

    r² = ‖t−c‖² + ‖s−c‖² − 2(t−c)·(s−c) with c = the tile's first target
    lane.  The round-1/2 rejections of the matmul identity and the
    Σw·s − t·Σw acceleration bundles were for GLOBAL coordinates (near
    pairs cancel catastrophically); for the FAR field every source is
    θ-admissible, so ‖s−c‖ ≈ r_pair and the relative r² error stays
    ~few·eps (bounded by the admissibility criterion: an accepted node at
    distance d from the tile satisfies size < θ·(d − r_tile), so
    d/r_pair ≲ 1 + r_tile/dmin is bounded).  The cross term and the
    accel bundles run as real (k ≥ 3 / k = ts) MXU contractions; the VPU
    part drops to rsqrt + w per pair."""
    j = pl.program_id(1)
    rows = 3 if accel else 1
    for b in range(B):
        t = tgt_ref[b, 0:3, :]               # (3, tb)
        c = t[:, 0:1]                        # local origin: first target
        tl = t - c
        sl = src_ref[b, 0:3, :] - c
        t2 = jnp.sum(tl * tl, axis=0).reshape(tb, 1)
        s2 = jnp.sum(sl * sl, axis=0).reshape(1, ts)
        cross = jax.lax.dot_general(
            tl, sl, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)     # (tb, ts) on the MXU
        r2 = jnp.maximum(t2 + s2 - 2.0 * cross, _TINY2)
        sm = src_ref[b, 3, :]
        if accel:
            invr = jax.lax.rsqrt(r2)
            w = (invr * invr * invr) * sm.reshape(1, ts)
            wsum = jnp.sum(w, axis=1)                # (tb,)
            if tdot:
                # (3, ts) @ (ts, tb): result lane dim = tb (full), not 3
                ws = jax.lax.dot_general(
                    sl, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # (3, tb)
                vals = tuple(ws[i, :] - tl[i, :] * wsum for i in range(3))
            else:
                ws = jax.lax.dot_general(
                    w, sl, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # (tb, 3)
                vals = tuple(ws[:, i] - tl[i, :] * wsum for i in range(3))
        else:
            neg_phi = -jax.lax.rsqrt(r2)
            vals = (jnp.dot(neg_phi, sm,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST),)

        @pl.when(j == 0)
        def _(b=b, vals=vals):
            for row in range(rows):
                out_ref[b, row, :] = vals[row]

        @pl.when(j != 0)
        def _(b=b, vals=vals):
            for row in range(rows):
                out_ref[b, row, :] = out_ref[b, row, :] + vals[row]


@functools.partial(jax.jit, static_argnames=("accel", "interpret", "B",
                                             "mxu", "order"))
def far_payload_batch_eval(tgt_tiles, payload, accel: bool = False,
                           interpret: bool = False, B: int = 8,
                           mxu: bool = False, order: int = 0):
    """Row-batched dense far field over pre-gathered payload.

    tgt_tiles: (C, 8, TB); payload: (C, P, W) node rows x, y, z, mass
    [, |n| ≥ 2 moments when order ≥ 2] (padded nodes carry zero mass and
    zero moments); C must be a multiple of B.
    Returns (C, rows, TB) with rows = 3 when accel else 1."""
    c, _, tb = tgt_tiles.shape
    pcols = payload.shape[1]
    w = payload.shape[2]
    if c % B:
        raise ValueError(f"C={c} not a multiple of B={B}")
    # accel working set bounded via the recompute-diff kernel form; keep
    # tb·ts ≤ 512k lanes (tb=1024 × ts=2048 crashed the remote compiler)
    ts = min(w, 2048, max(128, 524288 // tb))
    if order >= 2:
        # the multipole contraction holds ~15-25 live (tb, ts) f32
        # intermediates (power caches + accumulators) vs ~6 for the
        # monopole — shrink the tile so the working set stays ≤ ~12 MB
        ts = min(ts, max(128, 131072 // tb))
    rem = w % ts
    if rem:
        payload = jnp.pad(payload, ((0, 0), (0, 0), (0, ts - rem)))
        w += ts - rem
    rows = 3 if accel else 1
    if mxu and order < 2:
        kern = functools.partial(_far_batch_mxu_kernel, tb=tb, ts=ts,
                                 accel=accel, B=B, tdot=(mxu == "mxu_t"))
    else:
        kern = functools.partial(_far_batch_kernel, tb=tb, ts=ts,
                                 accel=accel, B=B, order=order)
    return pl.pallas_call(
        kern,
        grid=(c // B, w // ts),
        in_specs=[
            pl.BlockSpec((B, 8, tb), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, pcols, ts), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, rows, tb), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, rows, tb), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(tgt_tiles, payload)


def _near_group_kernel(lists_ref, bits_ref, tgt_ref, *rest, tb, cap,
                       kernel, accel, k, G):
    """Group-union near field: each source tile is fetched ONCE for a
    group of ``G`` consecutive leaf blocks; a per-entry bitmask selects
    which member leaves' 128-row bands actually interact with it
    (exactness: a tile outside a leaf's own list is covered by that
    leaf's far terms, so its rows must be masked out)."""
    tile_refs, out_ref = rest[:-1], rest[-1]
    g = pl.program_id(0)
    t = pl.program_id(1)
    tx = tgt_ref[0, 0, :].reshape(tb, 1)
    ty = tgt_ref[0, 1, :].reshape(tb, 1)
    tz = tgt_ref[0, 2, :].reshape(tb, 1)
    th = tgt_ref[0, 4, :].reshape(tb, 1)
    to = tgt_ref[0, 5, :].reshape(tb, 1)
    band = jax.lax.broadcasted_iota(jnp.int32, (tb,), 0) // cap  # leaf idx
    zero = jnp.zeros((tb,), jnp.float32)
    acc = (zero, zero, zero) if accel else (zero,)
    for i, tile_ref in enumerate(tile_refs):
        bits = bits_ref[g, t * k + i]  # SMEM scalar
        incl = ((jax.lax.shift_right_logical(bits, band) & 1)
                .astype(jnp.float32))
        sx = tile_ref[0, 0, :].reshape(1, cap)
        sy = tile_ref[0, 1, :].reshape(1, cap)
        sz = tile_ref[0, 2, :].reshape(1, cap)
        sm = tile_ref[0, 3, :].reshape(1, cap)
        sh = tile_ref[0, 4, :].reshape(1, cap)
        so = tile_ref[0, 5, :].reshape(1, cap)
        dx = sx - tx
        dy = sy - ty
        dz = sz - tz
        r2 = dx * dx + dy * dy + dz * dz
        r2 = jnp.where(so == to, jnp.inf, r2)  # exact self exclusion
        h = jnp.maximum(th, sh)
        if accel:
            gg = _g_from_r2(kernel, r2, h)
            if kernel == KERNEL_SPLINE:
                gg = jnp.where(jnp.isfinite(r2), gg, 0.0)
            w = gg * sm
            ax, ay, az = acc
            acc = (ax + incl * jnp.sum(w * dx, axis=1),
                   ay + incl * jnp.sum(w * dy, axis=1),
                   az + incl * jnp.sum(w * dz, axis=1))
        else:
            neg_phi = _phi_from_r2(kernel, r2, h)
            if kernel == KERNEL_SPLINE:
                neg_phi = jnp.where(jnp.isfinite(r2), neg_phi, 0.0)
            acc = (acc[0] + incl * jnp.sum(neg_phi * sm, axis=1),)

    rows = 3 if accel else 1

    @pl.when(t == 0)
    def _():
        for row in range(rows):
            out_ref[0, row, :] = acc[row]
        for row in range(rows, 8):
            out_ref[0, row, :] = zero

    @pl.when(t != 0)
    def _():
        for row in range(rows):
            out_ref[0, row, :] = out_ref[0, row, :] + acc[row]


@functools.partial(jax.jit, static_argnames=("kernel", "accel", "interpret",
                                             "k", "G"))
def near_field_group_eval(lists, bits, gtgt_tiles, leaf_tiles,
                          kernel: str = KERNEL_NONE, accel: bool = False,
                          interpret: bool = False, k: int = 4, G: int = 8):
    """Union near field over leaf GROUPS (~G/2× fewer tile fetches — the
    measured near-field wall is the per-fetch DMA cost, invariant to
    batching and pipelining).

    lists/bits: (ng, Umax) int32 leaf ids + member bitmasks (padded with
    the dummy leaf / zero bits); gtgt_tiles: (ng, 8, G·cap);
    leaf_tiles: (n_leaves+1, 8, cap).  Returns (ng, 8, G·cap)."""
    ng, umax = lists.shape
    tb = gtgt_tiles.shape[2]
    cap = leaf_tiles.shape[2]
    k = max(1, min(k, umax))
    if umax % k:
        raise ValueError(f"union width {umax} not a multiple of k={k}")
    kern = functools.partial(_near_group_kernel, tb=tb, cap=cap,
                             kernel=kernel, accel=accel, k=k, G=G)

    def src_spec(i):
        return pl.BlockSpec((1, 8, cap),
                            lambda g, t, L, B, i=i: (L[g, t * k + i], 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ng, umax // k),
        in_specs=[pl.BlockSpec((1, 8, tb), lambda g, t, L, B: (g, 0, 0))]
        + [src_spec(i) for i in range(k)],
        out_specs=pl.BlockSpec((1, 8, tb), lambda g, t, L, B: (g, 0, 0)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ng, 8, tb), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(lists, bits, gtgt_tiles, *([leaf_tiles] * k))


def _near_gdma_kernel(offs_ref, cnts_ref, lists_ref, bits_ref, tgt_ref,
                      tiles_hbm, out_ref, *, tb, cap, kernel, accel, nbuf):
    """Group-union near field with register accumulation + manual DMA
    pipeline: one grid step per GROUP, fori_loop over its ragged union
    (no padding), ``nbuf`` tile DMAs in flight, bitmask per entry."""
    g = pl.program_id(0)
    base = offs_ref[g]
    cnt = cnts_ref[g]
    tx = tgt_ref[0, 0, :].reshape(tb, 1)
    ty = tgt_ref[0, 1, :].reshape(tb, 1)
    tz = tgt_ref[0, 2, :].reshape(tb, 1)
    th = tgt_ref[0, 4, :].reshape(tb, 1)
    to = tgt_ref[0, 5, :].reshape(tb, 1)
    band = jax.lax.broadcasted_iota(jnp.int32, (tb,), 0) // cap

    def body(scratch, sem):
        def get_dma(slot, j):
            return pltpu.make_async_copy(
                tiles_hbm.at[lists_ref[base + j]],
                scratch.at[slot], sem.at[slot])

        for i in range(nbuf):
            @pl.when(i < cnt)
            def _(i=i):
                get_dma(i, i).start()

        def step(j, acc):
            slot = jax.lax.rem(j, nbuf)
            get_dma(slot, j).wait()
            incl = ((jax.lax.shift_right_logical(bits_ref[base + j], band)
                     & 1).astype(jnp.float32))
            sx = scratch[slot, 0, :].reshape(1, cap)
            sy = scratch[slot, 1, :].reshape(1, cap)
            sz = scratch[slot, 2, :].reshape(1, cap)
            sm = scratch[slot, 3, :].reshape(1, cap)
            sh = scratch[slot, 4, :].reshape(1, cap)
            so = scratch[slot, 5, :].reshape(1, cap)
            dx = sx - tx
            dy = sy - ty
            dz = sz - tz
            r2 = dx * dx + dy * dy + dz * dz
            r2 = jnp.where(so == to, jnp.inf, r2)

            @pl.when(j + nbuf < cnt)
            def _():
                get_dma(slot, j + nbuf).start()

            h = jnp.maximum(th, sh)
            if accel:
                gg = _g_from_r2(kernel, r2, h)
                if kernel == KERNEL_SPLINE:
                    gg = jnp.where(jnp.isfinite(r2), gg, 0.0)
                w = gg * sm
                ax, ay, az = acc
                return (ax + incl * jnp.sum(w * dx, axis=1),
                        ay + incl * jnp.sum(w * dy, axis=1),
                        az + incl * jnp.sum(w * dz, axis=1))
            neg_phi = _phi_from_r2(kernel, r2, h)
            if kernel == KERNEL_SPLINE:
                neg_phi = jnp.where(jnp.isfinite(r2), neg_phi, 0.0)
            return (acc[0] + incl * jnp.sum(neg_phi * sm, axis=1),)

        zero = jnp.zeros((tb,), jnp.float32)
        init = (zero, zero, zero) if accel else (zero,)
        acc = jax.lax.fori_loop(0, cnt, step, init)
        rows = 3 if accel else 1
        for row in range(rows):
            out_ref[0, row, :] = acc[row]
        for row in range(rows, 8):
            out_ref[0, row, :] = zero

    pl.run_scoped(body,
                  scratch=pltpu.VMEM((nbuf, 8, cap), jnp.float32),
                  sem=pltpu.SemaphoreType.DMA((nbuf,)))


@functools.partial(jax.jit, static_argnames=("kernel", "accel", "interpret",
                                             "nbuf"))
def near_field_group_dma(offsets, counts, flat_lists, flat_bits, gtgt_tiles,
                         leaf_tiles, kernel: str = KERNEL_NONE,
                         accel: bool = False, interpret: bool = False,
                         nbuf: int = 8):
    """Ragged group-union near field, register-accumulated, DMA-pipelined.
    Returns (ng, 8, G·cap)."""
    ng = counts.shape[0]
    tb = gtgt_tiles.shape[2]
    cap = leaf_tiles.shape[2]
    kern = functools.partial(_near_gdma_kernel, tb=tb, cap=cap,
                             kernel=kernel, accel=accel, nbuf=nbuf)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((1, 8, tb), lambda g, O, C, L, B: (g, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # tiles stay in HBM
        ],
        out_specs=pl.BlockSpec((1, 8, tb), lambda g, O, C, L, B: (g, 0, 0)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ng, 8, tb), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(offsets, counts, flat_lists, flat_bits, gtgt_tiles, leaf_tiles)


def _near_dma_kernel(offs_ref, cnts_ref, lists_ref, tgt_ref, tiles_hbm,
                     out_ref, *, tb, cap, kernel, accel, nbuf):
    """Near field with a manual ``nbuf``-deep DMA pipeline.

    The BlockSpec scalar-prefetch path measured ~7 µs per (8,128) leaf-tile
    fetch — pure DMA latency, unoverlapped.  Here the leaf-tile table stays
    in HBM; each target block walks its OWN ragged list (flat SMEM array +
    offsets — zero padding) keeping ``nbuf`` tile DMAs in flight while the
    VPU computes the current tile (pallas guide: Patterns/Double Buffering).
    """
    b = pl.program_id(0)
    base = offs_ref[b]
    cnt = cnts_ref[b]
    tx = tgt_ref[0, 0, :].reshape(tb, 1)
    ty = tgt_ref[0, 1, :].reshape(tb, 1)
    tz = tgt_ref[0, 2, :].reshape(tb, 1)
    th = tgt_ref[0, 4, :].reshape(tb, 1)
    to = tgt_ref[0, 5, :].reshape(tb, 1)

    def body(scratch, sem):
        def get_dma(slot, j):
            return pltpu.make_async_copy(
                tiles_hbm.at[lists_ref[base + j]],
                scratch.at[slot], sem.at[slot])

        for i in range(nbuf):  # warm-up: fill the pipeline
            @pl.when(i < cnt)
            def _(i=i):
                get_dma(i, i).start()

        def step(j, acc):
            slot = jax.lax.rem(j, nbuf)
            get_dma(slot, j).wait()
            sx = scratch[slot, 0, :].reshape(1, cap)
            sy = scratch[slot, 1, :].reshape(1, cap)
            sz = scratch[slot, 2, :].reshape(1, cap)
            sm = scratch[slot, 3, :].reshape(1, cap)
            sh = scratch[slot, 4, :].reshape(1, cap)
            so = scratch[slot, 5, :].reshape(1, cap)
            dx = sx - tx
            dy = sy - ty
            dz = sz - tz
            r2 = dx * dx + dy * dy + dz * dz
            r2 = jnp.where(so == to, jnp.inf, r2)  # exact self exclusion

            # refill the slot before the compute retires
            @pl.when(j + nbuf < cnt)
            def _():
                get_dma(slot, j + nbuf).start()

            h = jnp.maximum(th, sh)
            if accel:
                g = _g_from_r2(kernel, r2, h)
                if kernel == KERNEL_SPLINE:
                    g = jnp.where(jnp.isfinite(r2), g, 0.0)
                w = g * sm
                ax, ay, az = acc
                return (ax + jnp.sum(w * dx, axis=1),
                        ay + jnp.sum(w * dy, axis=1),
                        az + jnp.sum(w * dz, axis=1))
            neg_phi = _phi_from_r2(kernel, r2, h)
            if kernel == KERNEL_SPLINE:
                neg_phi = jnp.where(jnp.isfinite(r2), neg_phi, 0.0)
            return (acc[0] + jnp.sum(neg_phi * sm, axis=1),) + acc[1:]

        zero = jnp.zeros((tb,), jnp.float32)
        init = (zero, zero, zero) if accel else (zero,)
        acc = jax.lax.fori_loop(0, cnt, step, init)
        rows = 3 if accel else 1
        for row in range(rows):
            out_ref[0, row, :] = acc[row]
        for row in range(rows, 8):
            out_ref[0, row, :] = zero

    pl.run_scoped(body,
                  scratch=pltpu.VMEM((nbuf, 8, cap), jnp.float32),
                  sem=pltpu.SemaphoreType.DMA((nbuf,)))


@functools.partial(jax.jit, static_argnames=("kernel", "accel", "interpret",
                                             "nbuf"))
def near_field_eval_dma(offsets, counts, flat_lists, tgt_tiles, leaf_tiles,
                        kernel: str = KERNEL_NONE, accel: bool = False,
                        interpret: bool = False, nbuf: int = 8):
    """Ragged near field with manual DMA pipelining.

    offsets/counts: (nb,) int32 into flat_lists; flat_lists: (F,) int32
    leaf ids; tgt_tiles: (nb, 8, TB); leaf_tiles: (n_leaves+1, 8, cap) —
    stays in HBM, tiles are DMA'd on demand.  Returns (nb, 8, TB)."""
    nb = counts.shape[0]
    tb = tgt_tiles.shape[2]
    cap = leaf_tiles.shape[2]
    kern = functools.partial(_near_dma_kernel, tb=tb, cap=cap,
                             kernel=kernel, accel=accel, nbuf=nbuf)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 8, tb), lambda b, O, C, L: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # tiles stay in HBM
        ],
        out_specs=pl.BlockSpec((1, 8, tb), lambda b, O, C, L: (b, 0, 0)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, 8, tb), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(offsets, counts, flat_lists, tgt_tiles, leaf_tiles)


def _near_banded_kernel(gs_ref, gf_ref, blk_ref, bits_ref, tgt_ref, src_ref,
                        out_ref, *, tb, cap, kernel, accel, R, Gn, ng_out,
                        packed_K=0, accel_form="diff"):
    """Banded union near field, WIDE-LANE layout: one grid step streams R
    CONSECUTIVE leaf tiles as a single (8, R·cap) lane-major block (tree
    order keeps a group's near set in short consecutive runs, so aligned
    R-tile windows cover it with bounded waste) and evaluates them against
    the Gn·cap targets of one leaf group at dense-kernel lane widths.

    Measured drivers (v5e, 1M clustered):
    * the scattered near engines are COMPUTE bound at ~8 Gpairs/s — cap=128
      source lanes waste the VPU (same math at 1024 lanes: ~68 Gpairs/s);
    * an output BlockSpec whose index depends on prefetched scalars stalls
      the pipeline (~60–70 µs/step vs 3.8 µs grid-indexed), so each window
      writes its own output row and a sorted segment-sum reduces to groups;
    * window fetches do not overlap compute (~2 µs/fetch serialized, flat
      in the number of operands per step).

    Exactness needs no far-list changes: window slots outside the union
    carry bits=0 and are masked off — at Gn=1 the mask is target-
    independent and folds into the source mass row (zero broadcast cost).

    Scalar operands are 1-D (SMEM pads a 2-D array's last dim to 128
    lanes): gf = local group id (padding rows: ng_out), blk = window block
    index, bits flat (W·R,)."""
    i = pl.program_id(0)
    S = R * cap
    tx = tgt_ref[0, 0, :].reshape(tb, 1)
    ty = tgt_ref[0, 1, :].reshape(tb, 1)
    tz = tgt_ref[0, 2, :].reshape(tb, 1)
    th = tgt_ref[0, 4, :].reshape(tb, 1)
    to = tgt_ref[0, 5, :].reshape(tb, 1)
    sx = src_ref[0, 0, :].reshape(1, S)
    sy = src_ref[0, 1, :].reshape(1, S)
    sz = src_ref[0, 2, :].reshape(1, S)
    sm = src_ref[0, 3, :].reshape(1, S)
    sh = src_ref[0, 4, :].reshape(1, S)
    so = src_ref[0, 5, :].reshape(1, S)
    # member bitmask per window slot → per-lane mask
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1) // cap
    bl = jnp.zeros((1, S), jnp.int32)
    for r in range(R):
        bl = jnp.where(slot == r, bits_ref[i * R + r], bl)
    if packed_K:
        # dense multi-leaf tiles: row 7 carries the sub-leaf index; bit
        # (tgt_sub·K + src_sub) of the slot mask says whether that leaf
        # pair interacts (near sets are leaf-granular, tiles aren't)
        tsub = tgt_ref[0, 7, :].reshape(tb, 1).astype(jnp.int32)
        ssub = src_ref[0, 7, :].reshape(1, S).astype(jnp.int32)
        idx = tsub * packed_K + ssub
        incl2 = ((jax.lax.shift_right_logical(bl, idx) & 1)
                 .astype(jnp.float32))
    elif Gn == 1:
        # mask is target-independent: fold into the source masses
        sm = sm * (bl & 1).astype(jnp.float32)
        incl2 = None
    else:
        band = jax.lax.broadcasted_iota(jnp.int32, (tb, 1), 0) // cap
        incl2 = ((jax.lax.shift_right_logical(bl, band) & 1)
                 .astype(jnp.float32))
    dx = sx - tx
    dy = sy - ty
    dz = sz - tz
    r2 = dx * dx + dy * dy + dz * dz
    r2 = jnp.where(so == to, jnp.inf, r2)  # exact self exclusion
    h = jnp.maximum(th, sh)
    if accel:
        gg = _g_from_r2(kernel, r2, h)
        if kernel == KERNEL_SPLINE:
            gg = jnp.where(jnp.isfinite(r2), gg, 0.0)
        w = gg * sm
        if incl2 is not None:
            w = w * incl2
        if accel_form == "diff":
            # plain per-axis diff form (dx already live): 6 extra VPU
            # flops/pair over potentials — the measurement control for
            # the MXU bundle below
            out_ref[0, 0, :] = jnp.sum(w * dx, axis=1)
            out_ref[0, 1, :] = jnp.sum(w * dy, axis=1)
            out_ref[0, 2, :] = jnp.sum(w * dz, axis=1)
            return
        # Tile-local recentred bundle: Σ w·(s−t) = Σ w·s′ − t′·Σw with
        # s′ = s−c, t′ = t−c, c = the first target lane.  At leaf-window
        # scale |s′| ~ r_pair, so the global-coordinate cancellation that
        # rejected this form (docs/design.md §5) does not apply —
        # measured error identical to the diff form, incl. unsoftened
        # close pairs (the shared f32 r² term dominates both).  All four
        # weighted reductions (Σw·s′ₓ, Σw·s′ᵧ, Σw·s′𝓏, Σw) run as ONE MXU
        # contraction w @ [s′; 1]ᵀ — r² stays in the accuracy-safe VPU
        # diff form; only the already-validated bundle sums move.
        c = tgt_ref[0, 0:3, 0:1]                       # (3, 1)
        sl = src_ref[0, 0:3, :] - c                    # (3, S)
        tl = tgt_ref[0, 0:3, :] - c                    # (3, tb)
        b4 = jnp.concatenate([sl, jnp.ones((1,) + sl.shape[1:],
                                           jnp.float32)], axis=0)  # (4, S)
        # HIGHEST: default TPU f32 dot demotes to single-pass bf16 (~1e-3
        # rel) — unacceptable for the dominant near term; the multi-pass
        # product is still ~free next to the VPU r²/g work
        prec = (jax.lax.Precision.DEFAULT if accel_form == "bundle_bf16"
                else jax.lax.Precision.HIGHEST)
        if accel_form == "bundle_t":
            # transposed contraction: (4, S) @ (S, tb) keeps the result's
            # minor (lane) dim at tb=128·k instead of 4 — a (tb, 4) result
            # wastes 124/128 lanes of every store
            ws = jax.lax.dot_general(
                b4, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)                        # (4, tb)
            out_ref[0, 0, :] = ws[0, :] - tl[0, :] * ws[3, :]
            out_ref[0, 1, :] = ws[1, :] - tl[1, :] * ws[3, :]
            out_ref[0, 2, :] = ws[2, :] - tl[2, :] * ws[3, :]
            return
        ws = jax.lax.dot_general(
            w, b4, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                            # (tb, 4)
        out_ref[0, 0, :] = ws[:, 0] - tl[0, :] * ws[:, 3]
        out_ref[0, 1, :] = ws[:, 1] - tl[1, :] * ws[:, 3]
        out_ref[0, 2, :] = ws[:, 2] - tl[2, :] * ws[:, 3]
    else:
        neg_phi = _phi_from_r2(kernel, r2, h)
        if kernel == KERNEL_SPLINE:
            neg_phi = jnp.where(jnp.isfinite(r2), neg_phi, 0.0)
        summand = neg_phi * sm
        if incl2 is not None:
            summand = summand * incl2
        out_ref[0, 0, :] = jnp.sum(summand, axis=1)
    # only `rows` output rows exist (out block is (1, rows, tb))


@functools.partial(jax.jit, static_argnames=("kernel", "accel", "interpret",
                                             "R", "Gn", "ng_out", "cap",
                                             "packed_K", "accel_form"))
def near_field_banded_eval(gf, blk, bits, gstart, tgt_blk, src_blk,
                           kernel: str = KERNEL_NONE, accel: bool = False,
                           interpret: bool = False, R: int = 8, Gn: int = 1,
                           ng_out: int = 1024, cap: int = 128,
                           packed_K: int = 0, accel_form: str = "diff"):
    """Banded union near field over one chunk of ``ng_out`` Gn-leaf groups.

    gf: (W,) int32 local group ids, sorted ascending (rows past the
    chunk hold later groups and are clamped to ng_out — their sums land
    in the spill segment and are discarded); blk: (W,) window block
    indices; bits: (W·R,) flat member bitmasks (0 = slot outside the
    union); gstart: (1,) first group of the chunk; tgt_blk:
    (ngb, 8, Gn·cap) blocked target tiles; src_blk: (nwb, 8, R·cap)
    blocked source windows — every fetch is ONE contiguous block (the
    lane-sliced wide-array layout cost 8 strided ~2 KB segments and
    ~3.5 µs fixed time per window).
    Returns (ng_out, rows, Gn·cap) with rows = 3 when accel else 1."""
    nw = gf.shape[0]
    ngb = tgt_blk.shape[0]
    S = R * cap
    tb = Gn * cap
    rows = 3 if accel else 1
    kern = functools.partial(_near_banded_kernel, tb=tb, cap=cap,
                             kernel=kernel, accel=accel, R=R, Gn=Gn,
                             ng_out=ng_out, packed_K=packed_K,
                             accel_form=accel_form)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nw,),
        in_specs=[
            pl.BlockSpec((1, 8, tb),
                         lambda i, GS, GF, BLK, BITS: (
                             jnp.minimum(
                                 jnp.minimum(GF[i], ng_out - 1) + GS[0],
                                 ngb - 1), 0, 0)),
            pl.BlockSpec((1, 8, S),
                         lambda i, GS, GF, BLK, BITS: (BLK[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, tb), lambda i, GS, GF, BLK, BITS: (i, 0, 0)),
    )
    per_window = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nw, rows, tb), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(gstart, gf, blk, bits, tgt_blk, src_blk)
    # per-window rows → per-group sums (gf sorted; pads land in ng_out)
    seg = jax.ops.segment_sum(per_window, gf,
                              num_segments=ng_out + 1,
                              indices_are_sorted=True)
    return seg[:ng_out]


@functools.partial(jax.jit, static_argnames=("kernel", "accel",
                                             "interpret", "R", "Gn",
                                             "ng_out", "cap", "W",
                                             "packed_K", "accel_form"))
def near_field_banded_chunk(gf_all, blk_all, bits_all, wstart, gstart,
                            tgt_blk, src_blk, kernel: str = KERNEL_NONE,
                            accel: bool = False, interpret: bool = False,
                            R: int = 8, Gn: int = 1, ng_out: int = 1024,
                            cap: int = 128, W: int = 8192, packed_K: int = 0,
                            accel_form: str = "diff"):
    """Device-side chunking for the banded near field: slice W windows at
    ``wstart`` out of the ONCE-uploaded global window arrays and localize
    group ids on device — per-chunk host work and uploads were the wall
    (~50 ms/chunk through the remote relay)."""
    ws = wstart[0]
    gf = jax.lax.dynamic_slice(gf_all, (ws,), (W,))
    gf = jnp.minimum(gf - gstart[0], ng_out)  # localize; spill → ng_out
    blk = jax.lax.dynamic_slice(blk_all, (ws,), (W,))
    bits = jax.lax.dynamic_slice(bits_all, (ws * R,), (W * R,))
    return near_field_banded_eval(gf, blk, bits, gstart, tgt_blk, src_blk,
                                  kernel=kernel, accel=accel,
                                  interpret=interpret, R=R, Gn=Gn,
                                  ng_out=ng_out, cap=cap,
                                  packed_K=packed_K, accel_form=accel_form)


def _near_pdma_kernel(gk_ref, woffs_ref, blk_ref, bits_ref, tgt_ref, src_hbm,
                      out_ref, *, cap, kernel, accel, R, packed_K, nbuf):
    """Packed near field, DMA-pipelined: ONE grid step per dense packed
    tile, looping over that tile's window list with an ``nbuf``-deep
    manual DMA pipeline and REGISTER accumulation.

    Why this beats the per-window banded grid (near_engine='packed'):
    the banded engines pay a measured ~3.5 µs/window fixed grid/fetch
    issue cost and write a (n_windows, rows, tb) intermediate that a
    segment-sum then re-reads (~1.2 GB at 10M).  Here the grid is the
    ~24× smaller packed-tile axis, the (8, R·cap) wide window fetches
    overlap compute (pallas guide: Patterns/Double Buffering), and sums
    stay in registers until the single grid-indexed output write.

    Scalars: gk = [ng_eff] (tiles beyond the chunk's real range are
    gated to zero windows — their window lists lie outside the sliced
    SMEM arrays); woffs = LOCAL window offsets (ng+1); blk = window
    block ids into the blocked source table (HBM); bits flat (W·R,)
    K×K leaf-pair adjacency masks per window slot."""
    g = pl.program_id(0)
    S = R * cap
    base = woffs_ref[g]
    cnt = jnp.where(g < gk_ref[0], woffs_ref[g + 1] - base, 0)
    tx = tgt_ref[0, 0, :].reshape(cap, 1)
    ty = tgt_ref[0, 1, :].reshape(cap, 1)
    tz = tgt_ref[0, 2, :].reshape(cap, 1)
    th = tgt_ref[0, 4, :].reshape(cap, 1)
    to = tgt_ref[0, 5, :].reshape(cap, 1)
    tsub = tgt_ref[0, 7, :].reshape(cap, 1).astype(jnp.int32)
    slot_lane = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1) // cap

    def body(scratch, sem):
        def get_dma(slot, j):
            return pltpu.make_async_copy(src_hbm.at[blk_ref[base + j]],
                                         scratch.at[slot], sem.at[slot])

        for i in range(nbuf):  # warm-up: fill the pipeline
            @pl.when(i < cnt)
            def _(i=i):
                get_dma(i, i).start()

        def step(j, acc):
            slot = jax.lax.rem(j, nbuf)
            get_dma(slot, j).wait()
            sx = scratch[slot, 0, :].reshape(1, S)
            sy = scratch[slot, 1, :].reshape(1, S)
            sz = scratch[slot, 2, :].reshape(1, S)
            sm = scratch[slot, 3, :].reshape(1, S)
            sh = scratch[slot, 4, :].reshape(1, S)
            so = scratch[slot, 5, :].reshape(1, S)
            ssub = scratch[slot, 7, :].reshape(1, S).astype(jnp.int32)
            bl = jnp.zeros((1, S), jnp.int32)
            for r in range(R):
                bl = jnp.where(slot_lane == r,
                               bits_ref[(base + j) * R + r], bl)
            idx = tsub * packed_K + ssub
            incl = (jax.lax.shift_right_logical(bl, idx) & 1) \
                .astype(jnp.float32)                  # (cap, S)
            dx = sx - tx
            dy = sy - ty
            dz = sz - tz
            r2 = dx * dx + dy * dy + dz * dz
            r2 = jnp.where(so == to, jnp.inf, r2)     # exact self exclusion

            # refill the slot before the compute retires
            @pl.when(j + nbuf < cnt)
            def _():
                get_dma(slot, j + nbuf).start()

            h = jnp.maximum(th, sh)
            if accel:
                # VPU difference form (w·dx sums): an in-loop MXU bundle
                # dot with the loop-carried accumulator measured 161–450 s
                # at 10M — the tiny (cap,4)×(4,S) dots serialize against
                # the carry instead of pipelining
                gg = _g_from_r2(kernel, r2, h)
                if kernel == KERNEL_SPLINE:
                    gg = jnp.where(jnp.isfinite(r2), gg, 0.0)
                w = gg * sm * incl
                ax, ay, az = acc
                return (ax + jnp.sum(w * dx, axis=1),
                        ay + jnp.sum(w * dy, axis=1),
                        az + jnp.sum(w * dz, axis=1))
            neg_phi = _phi_from_r2(kernel, r2, h)
            if kernel == KERNEL_SPLINE:
                neg_phi = jnp.where(jnp.isfinite(r2), neg_phi, 0.0)
            return (acc[0] + jnp.sum(neg_phi * sm * incl, axis=1),)

        zero = jnp.zeros((cap,), jnp.float32)
        init = (zero, zero, zero) if accel else (zero,)
        acc = jax.lax.fori_loop(0, cnt, step, init)
        for row in range(3 if accel else 1):
            out_ref[0, row, :] = acc[row]

    pl.run_scoped(body,
                  scratch=pltpu.VMEM((nbuf, 8, R * cap), jnp.float32),
                  sem=pltpu.SemaphoreType.DMA((nbuf,)))


@functools.partial(jax.jit, static_argnames=("kernel", "accel", "interpret",
                                             "R", "cap", "gcap", "W",
                                             "packed_K", "nbuf"))
def near_field_pdma_chunk(woffs_all, blk_all, bits_all, wstart, gk,
                          tgt_all, src_blk, kernel: str = KERNEL_NONE,
                          accel: bool = False, interpret: bool = False,
                          R: int = 4, cap: int = 128, gcap: int = 4096,
                          W: int = 16384, packed_K: int = 5,
                          nbuf: int = 8):
    """One chunk of the packed-DMA near field: slice ``gcap`` tiles /
    ``W`` windows out of the once-uploaded global arrays on device
    (per-chunk host slicing + upload measured ~50 ms/chunk through the
    relay) and evaluate with :func:`_near_pdma_kernel`.

    gk = [gstart, ng_eff]; wstart = [first window of the chunk].
    Returns (gcap, rows, cap); rows beyond ng_eff are garbage (gated to
    zero windows, discarded by the caller)."""
    gs = gk[0]
    ws = wstart[0]
    woffs = jax.lax.dynamic_slice(woffs_all, (gs,), (gcap + 1,)) - ws
    blk = jax.lax.dynamic_slice(blk_all, (ws,), (W,))
    bits = jax.lax.dynamic_slice(bits_all, (ws * R,), (W * R,))
    tgt = jax.lax.dynamic_slice(tgt_all, (gs, 0, 0),
                                (gcap, 8, tgt_all.shape[2]))
    rows = 3 if accel else 1
    kern = functools.partial(_near_pdma_kernel, cap=cap, kernel=kernel,
                             accel=accel, R=R, packed_K=packed_K, nbuf=nbuf)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(gcap,),
        in_specs=[
            pl.BlockSpec((1, 8, cap), lambda g, GK, WO, BLK, BITS: (g, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # blocked windows stay in HBM
        ],
        out_specs=pl.BlockSpec((1, rows, cap),
                               lambda g, GK, WO, BLK, BITS: (g, 0, 0)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((gcap, rows, cap), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(gk[1:2], woffs, blk, bits, tgt, src_blk)


def _near_diag_kernel(bits_ref, tgt_ref, src_ref, out_ref, *, cap, kernel,
                      accel, K, SB, NO, accel_form="diff"):
    """Diagonal-band near field: FULLY grid-indexed fetches.

    The packed/banded engines pay a measured ~3.5 µs per window of
    scalar-prefetch fetch-issue cost (prefetch-indexed input fetches do
    not overlap compute) — ~9 s of fixed time at 10M.  Hilbert DFS leaf
    order keeps most near partners close on the tile axis, so the in-band
    majority of pairs can be evaluated by a kernel whose every BlockSpec
    index is pure grid arithmetic: target tile ``i``, source block
    ``i//SB + o`` of SB consecutive packed tiles (the source table is
    pre-padded by (NO-1)/2 sentinel blocks per side so the band never
    clamps), output ``i`` accumulated across the ``o`` steps.  Mosaic can
    then double-buffer every operand at dense-kernel rates.  Out-of-band
    pairs keep the packed-window path (same exactness; see
    ``_build_diag_band`` in tree_tpu.py).

    bits (scalar prefetch, SMEM): flat (G·NO·SB,) int32 — K×K leaf-pair
    adjacency masks per (local target tile, offset block, slot), zero for
    non-interacting ptile pairs.  Same bit layout as the packed engine:
    bit (tgt_sub·K + src_sub).

    Reference role: the near/leaf brute-force sums of tree.rs:98,280.
    """
    i = pl.program_id(0)
    o = pl.program_id(1)
    S = SB * cap
    tx = tgt_ref[0, 0, :].reshape(cap, 1)
    ty = tgt_ref[0, 1, :].reshape(cap, 1)
    tz = tgt_ref[0, 2, :].reshape(cap, 1)
    th = tgt_ref[0, 4, :].reshape(cap, 1)
    to = tgt_ref[0, 5, :].reshape(cap, 1)
    tsub = tgt_ref[0, 7, :].reshape(cap, 1).astype(jnp.int32)
    sx = src_ref[0, 0, :].reshape(1, S)
    sy = src_ref[0, 1, :].reshape(1, S)
    sz = src_ref[0, 2, :].reshape(1, S)
    sm = src_ref[0, 3, :].reshape(1, S)
    sh = src_ref[0, 4, :].reshape(1, S)
    so = src_ref[0, 5, :].reshape(1, S)
    ssub = src_ref[0, 7, :].reshape(1, S).astype(jnp.int32)
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1) // cap
    bl = jnp.zeros((1, S), jnp.int32)
    base = (i * NO + o) * SB
    for k in range(SB):
        bl = jnp.where(slot == k, bits_ref[base + k], bl)
    idx = tsub * K + ssub
    incl = (jax.lax.shift_right_logical(bl, idx) & 1).astype(jnp.float32)
    dx = sx - tx
    dy = sy - ty
    dz = sz - tz
    r2 = dx * dx + dy * dy + dz * dz
    r2 = jnp.where(so == to, jnp.inf, r2)  # exact self exclusion
    h = jnp.maximum(th, sh)
    if accel:
        gg = _g_from_r2(kernel, r2, h)
        if kernel == KERNEL_SPLINE:
            gg = jnp.where(jnp.isfinite(r2), gg, 0.0)
        w = gg * sm * incl
        if accel_form == "diff":
            # plain per-axis diff form: measured 10M near accel at 1.38×
            # the potentials leg (the flop ratio) vs 2.3–3.2× for every
            # MXU bundle variant — narrow-output bundle dots do not pay
            # on this hardware (see CLAUDE.md round-3).  Rows written
            # individually: stacking (1, cap) vectors trips a Mosaic
            # tpu.concatenate offset bug on real TPU.
            ax = jnp.sum(w * dx, axis=1)
            ay = jnp.sum(w * dy, axis=1)
            az = jnp.sum(w * dz, axis=1)

            @pl.when(o == 0)
            def _():
                out_ref[0, 0, :] = ax
                out_ref[0, 1, :] = ay
                out_ref[0, 2, :] = az

            @pl.when(o != 0)
            def _():
                out_ref[0, 0, :] = out_ref[0, 0, :] + ax
                out_ref[0, 1, :] = out_ref[0, 1, :] + ay
                out_ref[0, 2, :] = out_ref[0, 2, :] + az
            return
        # tile-local recentred MXU bundle (see _near_banded_kernel —
        # identical accuracy argument; r² stays in the VPU diff form)
        c = tgt_ref[0, 0:3, 0:1]                       # (3, 1)
        sl = src_ref[0, 0:3, :] - c                    # (3, S)
        tl = tgt_ref[0, 0:3, :] - c                    # (3, cap)
        b4 = jnp.concatenate([sl, jnp.ones((1,) + sl.shape[1:],
                                           jnp.float32)], axis=0)  # (4, S)
        # transposed contraction: (4, S) @ (S, cap) keeps the result's
        # minor (lane) dim at cap=128; the (cap, 4) form also tripped a
        # Mosaic bug when its rows were re-stacked ("result/input offset
        # mismatch on non-concat dimension" in tpu.concatenate)
        ws = jax.lax.dot_general(
            b4, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)       # (4, cap)
        step = ws[0:3, :] - tl * ws[3:4, :]
    else:
        neg_phi = _phi_from_r2(kernel, r2, h)
        if kernel == KERNEL_SPLINE:
            neg_phi = jnp.where(jnp.isfinite(r2), neg_phi, 0.0)
        step = jnp.sum(neg_phi * sm * incl, axis=1)[None, :]

    @pl.when(o == 0)
    def _():
        out_ref[0] = step

    @pl.when(o != 0)
    def _():
        out_ref[0] = out_ref[0] + step


@functools.partial(jax.jit, static_argnames=("kernel", "accel", "interpret",
                                             "K", "SB", "NO", "G", "cap",
                                             "accel_form"))
def near_field_diag_chunk(bits_all, gstart, tgt_all, src_blk_pad,
                          kernel: str = KERNEL_NONE, accel: bool = False,
                          interpret: bool = False, K: int = 5, SB: int = 8,
                          NO: int = 19, G: int = 640, cap: int = 128,
                          accel_form: str = "diff", gsrc=None):
    """One chunk of ``G`` packed target tiles through the diag-band
    kernel.  Slices everything on device from the once-uploaded global
    arrays (``gstart`` must be a multiple of SB; tgt_all/bits_all are
    padded to a multiple of G with sentinel tiles so full-G slices never
    clamp).  ``src_blk_pad``: ((npt_pad+NO-1)//SB… , 8, SB·cap) blocked
    packed tiles with (NO-1)/2 sentinel blocks on each side — local
    source block for (i, o) is ``i//SB + o``, 0-based after the slice.
    ``gsrc``: optional (1,) GLOBAL tile start for the source slice when
    bits/tgt are a mesh shard (local coordinates) but the blocked source
    table stays global (replicated) — the mesh-sharded diag path.
    Returns (G, rows, cap) band-partial sums."""
    gs = gstart[0]
    ss = gs if gsrc is None else gsrc[0]
    bits = jax.lax.dynamic_slice(bits_all, (gs * NO * SB,), (G * NO * SB,))
    tgt = jax.lax.dynamic_slice(tgt_all, (gs, 0, 0), (G, 8, cap))
    src = jax.lax.dynamic_slice(src_blk_pad, (ss // SB, 0, 0),
                                (G // SB + NO - 1, 8, SB * cap))
    rows = 3 if accel else 1
    kern = functools.partial(_near_diag_kernel, cap=cap, kernel=kernel,
                             accel=accel, K=K, SB=SB, NO=NO,
                             accel_form=accel_form)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G, NO),
        in_specs=[
            pl.BlockSpec((1, 8, cap), lambda i, o, BITS: (i, 0, 0)),
            pl.BlockSpec((1, 8, SB * cap),
                         lambda i, o, BITS: (i // SB + o, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, cap),
                               lambda i, o, BITS: (i, 0, 0)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, rows, cap), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(bits, tgt, src)


def _k_for(lists) -> int:
    w = lists.shape[1]
    return 4 if w % 4 == 0 else (2 if w % 2 == 0 else 1)


def near_field_potentials(lists, tgt_tiles, leaf_tiles,
                          kernel: str = KERNEL_NONE,
                          interpret: bool = False):
    out = near_field_eval(lists, tgt_tiles, leaf_tiles, kernel=kernel,
                          accel=False, interpret=interpret,
                          k=_k_for(lists))
    return out[:, 0, :]


def near_field_accelerations(lists, tgt_tiles, leaf_tiles,
                             kernel: str = KERNEL_NONE,
                             interpret: bool = False):
    out = near_field_eval(lists, tgt_tiles, leaf_tiles, kernel=kernel,
                          accel=True, interpret=interpret,
                          k=_k_for(lists))
    return jnp.moveaxis(out[:, 0:3, :], 1, 2)  # (nb, TB, 3)
