"""Tree-accelerated gravity on the device: Barnes–Hut as batched dense ops.

The classic BH traversal is pointer-chasing with divergent control flow —
hostile to TPUs.  The device-friendly decomposition (the GPU-treecode
pattern, here TPU-first):

1. the native octree (``csrc/octree.cpp``) groups targets into blocks of
   consecutive tree-order particles (spatially compact) and runs ONE
   conservative traversal per block, emitting
   * the accepted far-field node list (monopole/multipole sources), and
   * the near-field particle list (to treat exactly);
2. lists are padded to the per-block maxima and shipped to the device once;
3. the device evaluates every block in parallel with two ``vmap``-batched
   dense kernels — a (block × nodes) far-field sum and a (block × leaf
   particles) direct sum — pure gathers + reductions, no control flow.

Cost: O(N·⟨list⟩) instead of O(N²); at 10⁷ particles and θ≈0.7 this is
~10³× less work than the dense pipe while holding BH accuracy (the block
criterion is strictly more conservative than per-particle BH).

Padding waste is bounded by tree-order locality: blocks are spatially
compact, so list lengths are similar across blocks.
"""

from __future__ import annotations

import os
import time as _time
from functools import lru_cache as _lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..log import logger
from ..util.thp import thp_empty, thp_stage, thp_zeros
from .kernels import (KERNEL_NONE, kernel_accel_factor,
                      kernel_potential_per_unit_mass)
from .tree import Octree

__all__ = ["tree_potentials_device", "tree_accelerations_device",
           "prepare_tree_device", "release_host_buffers", "EVAL_INFO"]

_TINY2 = 1e-38
_FAR = 1e15

#: per-call diagnostics from the last device-tree eval: which engines ran
#: and per-leg wall seconds (far leaf / far group / near / scatter).
#: Read by bench.py so driver-captured numbers carry engine labels
#: (VERDICT r3 §next-1: variance vs misconfiguration must be
#: distinguishable from the BENCH artifact alone).
EVAL_INFO: dict = {}

#: intra-leg phase timers (dispatch vs device-sync vs readback vs host
#: scatter, plus chunk counts) for the last eval — merged into EVAL_INFO
#: so the BENCH artifact shows WHERE a leg's time went (relay round-trips
#: vs device compute vs host phases).
_PH: dict = {}


def _ph(key: str, t0: float) -> float:
    """Accumulate ``now - t0`` seconds under ``key``; return now."""
    now = _time.perf_counter()
    _PH[key] = round(_PH.get(key, 0.0) + (now - t0), 3)
    return now


def _sync_tail(res) -> None:
    """Force completion of a device computation chain with a 1-element
    host readback (block_until_ready can return early under the axon
    relay — CLAUDE.md)."""
    float(np.asarray(res.reshape(-1)[0]))


def _ph_leg(info: dict, key: str, t0: float) -> float:
    """Record a per-leg wall time into the EVAL_INFO dict; return now."""
    now = _time.perf_counter()
    info[key] = round(now - t0, 3)
    return now


def _pad_lists(counts, ids, fill):
    """Concatenated ragged lists → (n_blocks, Lmax) padded matrix
    (vectorized: a flat scatter by per-row offsets)."""
    counts = np.asarray(counts, dtype=np.int64)
    n_blocks = len(counts)
    lmax = max(int(counts.max()) if n_blocks else 0, 1)
    out = np.full((n_blocks, lmax), fill, dtype=ids.dtype)
    if len(ids):
        row = np.repeat(np.arange(n_blocks), counts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        col = np.arange(len(ids)) - np.repeat(starts, counts)
        out[row, col] = ids
    return out


def _range_index_matrix(starts, counts, width: int, fill: int) -> np.ndarray:
    """(len(starts), width) matrix of [start, start+count) indices, padded."""
    starts = np.asarray(starts, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    k = np.arange(width, dtype=np.int64)[None, :]
    idx = starts[:, None] + k
    return np.where(k < counts[:, None], idx, fill)


def prepare_tree_device(tree: Octree, theta: float = 0.7,
                        block_size: int = 0, dtype=jnp.float32):
    """Build + pad the interaction lists and device-resident tree data.

    ``block_size=0`` groups targets per leaf (recommended: leaves are
    always spatially compact, so the conservative block criterion stays
    close to per-particle BH).
    """
    lists = tree.block_lists(theta=theta, block_size=block_size)
    com, nmass, _ = tree.node_data()
    pos, pmass, psoft, orig = tree.particles_tree_order()
    n = len(pos)
    nb = lists["n_blocks"]

    # dummy node / particle: zero mass at a moderate offset — far enough
    # from every real particle that 1/r powers stay finite, close enough
    # that the x^a·y^b·z^c multipole monomials don't overflow f32
    extent = float(np.max(pos.max(0) - pos.min(0))) if n else 1.0
    sentinel = pos.mean(0) + 3.0 * max(extent, 1e-3)
    com = np.vstack([com, sentinel[None, :]])
    nmass = np.concatenate([nmass, [0.0]])
    pos_pad = np.vstack([pos, sentinel[None, :]])
    pmass_pad = np.concatenate([pmass, [0.0]])
    psoft_pad = np.concatenate([psoft, [0.0]])
    orig_pad = np.concatenate([orig, [-2]])

    node_mat = _pad_lists(lists["node_counts"], lists["node_ids"],
                          fill=len(nmass) - 1)
    # near-field lists reference whole LEAVES: build (n_leaves+1, cap)
    # tile tables so device gathers move contiguous ~0.5 KB tiles instead
    # of single 16 B particle rows (TPU gathers are row-granular)
    lstarts, lcounts = tree.leaves()
    n_leaves = len(lstarts)
    cap = int(lcounts.max()) if n_leaves else 1
    tile_idx = np.vstack([
        _range_index_matrix(lstarts, lcounts, cap, fill=n),
        np.full((1, cap), n, dtype=np.int64)])
    leaf_mat = _pad_lists(lists["leaf_counts"], lists["leaf_idx"],
                          fill=n_leaves)

    # variable-length target blocks → padded (nb, bmax) index matrix into
    # the padded particle arrays (pad rows point at the dummy particle)
    starts = lists["starts"].astype(np.int64)
    counts = lists["counts"].astype(np.int64)
    bmax = int(counts.max())
    tgt_idx = _range_index_matrix(starts, counts, bmax, fill=n)
    tgt_pos = pos_pad[tgt_idx]
    tgt_soft = psoft_pad[tgt_idx]
    tgt_orig = orig_pad[tgt_idx]
    # padded targets must not collide with the dummy source (-2): use -3
    tgt_orig = np.where(tgt_idx == n, -3, tgt_orig)

    moments = tree.node_moments()
    moments = np.vstack([moments, np.zeros((1, moments.shape[1]))])

    return {
        "n": n, "n_blocks": nb, "block_size": block_size,
        "order": tree.multipole_order, "kernel": tree.kernel,
        "tgt_idx": tgt_idx,
        "tgt_pos": jnp.asarray(tgt_pos, dtype),
        "tgt_soft": jnp.asarray(tgt_soft, dtype),
        "tgt_orig": jnp.asarray(tgt_orig),
        "node_ids": jnp.asarray(node_mat),
        "leaf_ids": jnp.asarray(leaf_mat),
        "node_counts": np.asarray(lists["node_counts"]),
        "leaf_counts": np.asarray(lists["leaf_counts"]),
        "node_com": jnp.asarray(com, dtype),
        "node_mass": jnp.asarray(nmass, dtype),
        "node_moments": jnp.asarray(moments, dtype),
        # leaf tile tables (n_leaves+1, cap, …) — last row is all-dummy
        "leaf_pos": jnp.asarray(pos_pad[tile_idx], dtype),
        "leaf_mass": jnp.asarray(pmass_pad[tile_idx], dtype),
        "leaf_soft": jnp.asarray(psoft_pad[tile_idx], dtype),
        "leaf_orig": jnp.asarray(orig_pad[tile_idx]),
        "orig_index": np.asarray(orig),
        "stats": {
            "mean_nodes": float(lists["node_counts"].mean()),
            "max_nodes": int(lists["node_counts"].max()),
            "mean_leaf": float(lists["leaf_counts"].mean()),
            "max_leaf": int(lists["leaf_counts"].max()),
            "bmax": bmax,
        },
    }


def _phi_multipole_jnp(d, M, order: int):
    """φ contribution of moments M at displacement d (vectorized).

    Matches the native evaluator: φ_partial = Σ_n M_n (−1)^{|n|} D_n(d).
    d: (..., 3), M: (..., nmom) FULL canonical moment layout.  Component
    math via :mod:`multipole_eval` (the (..., 3)-trailing layout only
    survives to the component split; dipoles about the COM are
    identically zero and skipped)."""
    from .multipole_eval import phi_moments_xyz

    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    ri = jax.lax.rsqrt(x * x + y * y + z * z + _TINY2)
    out = M[..., 0] * ri
    ms = phi_moments_xyz(x, y, z, ri, lambda p: M[..., p], order)
    return out if ms is None else out + ms


@partial(jax.jit, static_argnames=("kernel", "order"))
def _eval_potentials(prep_tgt_pos, prep_tgt_soft, tgt_orig, node_ids,
                     leaf_ids, node_com, node_mass, node_moments,
                     leaf_pos, leaf_mass, leaf_soft, leaf_orig,
                     kernel: str, order: int):
    def one_block(tpos, tsoft, torig, nids, lids):
        # far field
        ncom = node_com[nids]              # (Ln, 3)
        nm = node_mass[nids]               # (Ln,)
        d = tpos[:, None, :] - ncom[None, :, :]
        if order == 0:
            r = jnp.sqrt(jnp.sum(d * d, axis=-1) + _TINY2)
            phi_far = -jnp.sum(nm[None, :] / r, axis=1)
        else:
            M = node_moments[nids]         # (Ln, nmom)
            contrib = _phi_multipole_jnp(d, M[None, :, :], order)
            phi_far = -jnp.sum(contrib, axis=1)
        # near field: gather whole leaf tiles (contiguous rows), flatten
        spos = leaf_pos[lids].reshape(-1, 3)    # (Lf*cap, 3)
        sm = leaf_mass[lids].reshape(-1)
        sh = leaf_soft[lids].reshape(-1)
        sorig = leaf_orig[lids].reshape(-1)
        dd = spos[None, :, :] - tpos[:, None, :]
        r = jnp.sqrt(jnp.sum(dd * dd, axis=-1) + _TINY2)
        h = jnp.maximum(tsoft[:, None], sh[None, :])
        phi_pair = kernel_potential_per_unit_mass(kernel, r, h)
        same = torig[:, None] == sorig[None, :]
        phi_near = jnp.sum(jnp.where(same, 0.0, phi_pair) * sm[None, :],
                           axis=1)
        return phi_far + phi_near

    return jax.vmap(one_block)(prep_tgt_pos, prep_tgt_soft, tgt_orig,
                               node_ids, leaf_ids)


def _scatter_out(prep, block_vals: np.ndarray, ncols: int) -> np.ndarray:
    """(nb, bmax[, 3]) block results → original-order (n[, 3]) array."""
    n = prep["n"]
    flat_idx = prep["tgt_idx"].reshape(-1)
    flat = np.asarray(block_vals).reshape(len(flat_idx), -1)
    valid = flat_idx < n
    tree_order = thp_zeros((n, flat.shape[1]), np.float64)
    tree_order[flat_idx[valid]] = flat[valid]
    out = thp_zeros((n, flat.shape[1]), np.float64)
    out[prep["orig_index"]] = tree_order
    return out[:, 0] if ncols == 1 else out


def _chunked_eval(prep, eval_fn, chunk_blocks: int, extra_args):
    """Evaluate block groups in bounded-memory chunks (the per-block gathers
    materialize (blocks × list × payload) intermediates, which must not
    scale with the full snapshot)."""
    nb = prep["n_blocks"]
    # never pad a small solve up to the full chunk budget: a 63-block test
    # snapshot padded to 2048 blocks costs 32x the compute (fatal on the
    # single-core CPU backend: (2048, tb, list, 3) elementwise passes)
    if nb < chunk_blocks:
        chunk_blocks = 1 << (nb - 1).bit_length() if nb > 1 else 1
    outs = []
    nchunks = -(-nb // chunk_blocks)
    for c in range(nchunks):
        lo = c * chunk_blocks
        hi = min(nb, lo + chunk_blocks)
        sl = slice(lo, hi)
        pad = chunk_blocks - (hi - lo)

        def take(x, cols: Optional[int] = None):
            part = x[sl]
            if cols is not None:
                part = part[:, :cols]
            if pad:
                part = jnp.concatenate(
                    [part, jnp.repeat(part[-1:], pad, axis=0)])
            return part

        # one compiled shape for every chunk: global list widths.  (Per-chunk
        # pow2 trimming saves compute on short chunks but costs one XLA
        # compilation per distinct width — a bad trade under remote-compile
        # setups and for one-shot solves.)
        ln = prep["node_ids"].shape[1]
        ll = prep["leaf_ids"].shape[1]
        out = eval_fn(take(prep["tgt_pos"]), take(prep["tgt_soft"]),
                      take(prep["tgt_orig"]), take(prep["node_ids"], ln),
                      take(prep["leaf_ids"], ll), *extra_args)
        outs.append(np.asarray(out)[:hi - lo])
    return np.concatenate(outs, axis=0)


def tree_potentials_device(tree: Octree, theta: float = 0.7,
                           block_size: int = 0, prep=None,
                           dtype=jnp.float32,
                           chunk_blocks: int = 2048) -> np.ndarray:
    """Barnes–Hut potentials evaluated on the device (original order)."""
    if prep is None:
        prep = prepare_tree_device(tree, theta=theta,
                                   block_size=block_size, dtype=dtype)
    kern = prep["kernel"] if prep["kernel"] is not None else KERNEL_NONE
    order = prep["order"]

    def eval_fn(tp, ts, to, ni, li):
        return _eval_potentials(tp, ts, to, ni, li, prep["node_com"],
                                prep["node_mass"], prep["node_moments"],
                                prep["leaf_pos"], prep["leaf_mass"],
                                prep["leaf_soft"], prep["leaf_orig"],
                                kernel=(kern or KERNEL_NONE), order=order)

    phi_blocks = _chunked_eval(prep, eval_fn, chunk_blocks, ())
    return _scatter_out(prep, phi_blocks, 1)


def _acc_multipole_jnp(d, M, order: int):
    """Acceleration contribution of moments M at displacement d = t − com:
    a_i = Σ_n M_n (−1)^{|n|} D_{n+e_i}(d) (matches the native evaluator).
    Component math via :mod:`multipole_eval`; COM dipoles skipped."""
    from .multipole_eval import acc_moments_xyz

    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    ri = jax.lax.rsqrt(x * x + y * y + z * z + _TINY2)
    ri3 = ri * ri * ri
    m0 = M[..., 0] * ri3
    ax, ay, az = -m0 * x, -m0 * y, -m0 * z
    ms = acc_moments_xyz(x, y, z, ri, lambda p: M[..., p], order)
    if ms is not None:
        ax, ay, az = ax + ms[0], ay + ms[1], az + ms[2]
    return jnp.stack([ax, ay, az], axis=-1)


@partial(jax.jit, static_argnames=("kernel", "order"))
def _eval_accelerations(prep_tgt_pos, prep_tgt_soft, tgt_orig, node_ids,
                        leaf_ids, node_com, node_mass, node_moments,
                        leaf_pos, leaf_mass, leaf_soft, leaf_orig,
                        kernel: str, order: int):
    def one_block(tpos, tsoft, torig, nids, lids):
        ncom = node_com[nids]
        nm = node_mass[nids]
        if order == 0:
            # component-wise 2-D math: (t, s, 3) intermediates vectorize
            # poorly (XLA CPU/TPU lay the 3-lane axis minor — measured
            # ~30x slower than three (t, s) passes; same lesson as the
            # pre-gathered far kernels below)
            dx = ncom[None, :, 0] - tpos[:, 0][:, None]
            dy = ncom[None, :, 1] - tpos[:, 1][:, None]
            dz = ncom[None, :, 2] - tpos[:, 2][:, None]
            r2 = dx * dx + dy * dy + dz * dz + _TINY2
            invr = jax.lax.rsqrt(r2)
            g = nm[None, :] * invr * invr * invr
            a_far = jnp.stack([jnp.sum(dx * g, axis=1),
                               jnp.sum(dy * g, axis=1),
                               jnp.sum(dz * g, axis=1)], axis=-1)
        else:
            M = node_moments[nids]
            dt = tpos[:, None, :] - ncom[None, :, :]  # target − com
            contrib = _acc_multipole_jnp(dt, M[None, :, :], order)
            a_far = jnp.sum(contrib, axis=1)
        spos = leaf_pos[lids].reshape(-1, 3)
        sm = leaf_mass[lids].reshape(-1)
        sh = leaf_soft[lids].reshape(-1)
        sorig = leaf_orig[lids].reshape(-1)
        dx = spos[:, 0][None, :] - tpos[:, 0][:, None]
        dy = spos[:, 1][None, :] - tpos[:, 1][:, None]
        dz = spos[:, 2][None, :] - tpos[:, 2][:, None]
        r = jnp.sqrt(dx * dx + dy * dy + dz * dz + _TINY2)
        h = jnp.maximum(tsoft[:, None], sh[None, :])
        g2 = kernel_accel_factor(kernel, r, h)
        same = torig[:, None] == sorig[None, :]
        w = jnp.where(same, 0.0, g2) * sm[None, :]
        a_near = jnp.stack([jnp.sum(dx * w, axis=1),
                            jnp.sum(dy * w, axis=1),
                            jnp.sum(dz * w, axis=1)], axis=-1)
        return a_far + a_near

    return jax.vmap(one_block)(prep_tgt_pos, prep_tgt_soft, tgt_orig,
                               node_ids, leaf_ids)


# ---------------------------------------------------------------------------
# Pallas engine: near field via scalar-prefetch leaf-tile kernel
# (tree_pallas.py), far field via chunked XLA — see docs/design.md §5.
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("order",))
def _far_potentials_pre(tgt_tiles, payload, order: int):
    """Far potentials from PRE-GATHERED node payload (rows, P, w): rows
    x, y, z, mass[, moments |n|≥2] — no device gathers, 2-D component
    math (3-D (tb, w, 3) intermediates measured ~3 Gpairs/s).  Targets
    come as (rows, 8, TB) tiles (same operand as the pallas kernel).
    COMPACT payload: M_000 == mass and COM dipoles are identically
    zero, so row p (p ≥ 4) holds canonical moment index p."""
    from .multipole_eval import phi_moments_xyz

    def one_block(tt, pay):
        if order < 2:
            dx = pay[0][None, :] - tt[0][:, None]
            dy = pay[1][None, :] - tt[1][:, None]
            dz = pay[2][None, :] - tt[2][:, None]
            r2 = dx * dx + dy * dy + dz * dz + _TINY2
            return -jnp.sum(pay[3][None, :] * jax.lax.rsqrt(r2), axis=1)
        dx = tt[0][:, None] - pay[0][None, :]   # t − com, (tb, w)
        dy = tt[1][:, None] - pay[1][None, :]
        dz = tt[2][:, None] - pay[2][None, :]
        ri = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz + _TINY2)
        phi = pay[3][None, :] * ri
        phi = phi + phi_moments_xyz(dx, dy, dz, ri,
                                    lambda p: pay[p][None, :], order)
        return -jnp.sum(phi, axis=1)
    return jax.vmap(one_block)(tgt_tiles, payload)


@partial(jax.jit, static_argnames=("order",))
def _far_accelerations_pre(tgt_tiles, payload, order: int):
    from .multipole_eval import acc_moments_xyz

    def one_block(tt, pay):
        if order < 2:
            dx = pay[0][None, :] - tt[0][:, None]
            dy = pay[1][None, :] - tt[1][:, None]
            dz = pay[2][None, :] - tt[2][:, None]
            r2 = dx * dx + dy * dy + dz * dz + _TINY2
            invr = jax.lax.rsqrt(r2)
            g = pay[3][None, :] * invr * invr * invr
            return jnp.stack([jnp.sum(g * dx, axis=1),
                              jnp.sum(g * dy, axis=1),
                              jnp.sum(g * dz, axis=1)], axis=-1)
        dx = tt[0][:, None] - pay[0][None, :]   # t − com, (tb, w)
        dy = tt[1][:, None] - pay[1][None, :]
        dz = tt[2][:, None] - pay[2][None, :]
        ri = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz + _TINY2)
        ri3 = ri * ri * ri
        g = pay[3][None, :] * ri3
        ax, ay, az = -g * dx, -g * dy, -g * dz
        ms = acc_moments_xyz(dx, dy, dz, ri,
                             lambda p: pay[p][None, :], order)
        return jnp.stack([jnp.sum(ax + ms[0], axis=1),
                          jnp.sum(ay + ms[1], axis=1),
                          jnp.sum(az + ms[2], axis=1)], axis=-1)
    return jax.vmap(one_block)(tgt_tiles, payload)


@partial(jax.jit, static_argnames=("order", "accel"))
def _far_gather_pre(tgt_tiles, node_ids, payload_dev, order: int,
                    accel: bool):
    """Over-budget far path: row-gather the compact (n_nodes+1, P) node
    payload ON DEVICE per chunk and run the 2-D component ``_pre``
    evaluators on the gathered (rows, P, w) matrix — one jit, so the
    gather feeds the fused elementwise→reduce chain directly.  Replaces
    the 3-D-broadcast gather evaluators whose (tb, w, 3)/(tb, w, nmom)
    intermediates XLA materialized at order ≥ 1 (ResourceExhausted at
    10M order 3; reference far math: multipole.rs:1352-1535)."""
    pay = jnp.moveaxis(jnp.take(payload_dev, node_ids, axis=0), 2, 1)
    fn = _far_accelerations_pre if accel else _far_potentials_pre
    return fn(tgt_tiles, pay, order=order)


# pre-gathered far payload budget (DEVICE-resident class bytes, EXACT
# padded Σ class_rows·pcols·width·4 — see _padded_slots); above it the
# compact payload stays device-resident and eval row-gathers it in-jit
# (_far_gather_pre).  Same-process 10M A/B (benchmarks/far_mode_ab.py,
# v5e): gather evals match pre to relay noise (pot 6.8 vs 5.8 s, acc
# 10.9 vs 11.7 s, agreement ≤2.5e-6) while skipping the padded-payload
# build+upload (~25-50 s of prep) and 4-20× of HBM (0.45 vs 1.8 GB at
# order 0; order 3's 8.8 GB pre payload OOMed v5e's 16 GB outright).
# 500 MB keeps ≲3M-particle order-0 preps on the (marginally faster,
# pallas-far-capable) pre path and routes everything bigger to gather.
_FAR_PREGATHER_BUDGET = int(os.environ.get(
    "PNX_FAR_PREGATHER_BUDGET", 500_000_000))


def _class_widths(counts, min_width: int = 128):
    """Power-of-two width class per block — the same rule
    :func:`_build_classes` applies, exposed so prep can compute the
    EXACT padded class footprint before committing to pre-gathering."""
    counts = np.asarray(counts, np.int64)
    lmax = int(counts.max()) if len(counts) else 1
    lmax4 = -(-max(lmax, 1) // 4) * 4
    expo = np.ceil(np.log2(np.maximum(counts, 1) / min_width))
    widths = min_width * (2 ** np.clip(expo, 0, None)).astype(np.int64)
    return np.minimum(np.maximum(widths, min_width),
                      max(lmax4, min_width))


def _padded_slots(counts, min_width: int = 128) -> int:
    """Total padded (row × width) slots the class matrices will hold."""
    return int(_class_widths(counts, min_width).sum())


def prepare_tree_pallas(tree: Octree, theta: float = 0.7, cap: int = 128,
                        group_leaves: int = 8,
                        background_classes: bool = True):
    """Prep for the Pallas engine: leaf tiles + int32 lists + far data.

    ``group_leaves > 1`` uses two-level interaction lists: far nodes
    admissible against a GROUP of consecutive leaves are listed once per
    group (dividing the far-field gather volume, the measured wall, by
    ~``group_leaves``); the per-leaf lists hold only the residual nodes.

    ``background_classes``: build the far width-class structures on a
    background thread (the prep tail's ~15 s at 10M has nothing left to
    overlap with on the main thread); solvers synchronize through
    :func:`_ensure_far_classes` exactly like the warm-reload path, so
    the cost rides under whatever the caller does between prep and the
    first solve.
    """
    import time as _time
    from concurrent.futures import ThreadPoolExecutor
    from .tree import _stage
    _t0 = _time.perf_counter()
    G = max(1, int(group_leaves))
    # particle matrix FIRST (tree order is fixed at build; only the leaf
    # ENUMERATION below needs the list build), its upload issued on a
    # background thread: the 10M relay wire cost (~6–20 s) then rides
    # under the host interaction-list build instead of serializing after
    # it (round-4 prep spent tiles_upload 6.2 + upload 15.3 s waiting on
    # exactly this transfer — VERDICT r4 item 4)
    pos, pmass, psoft, orig = tree.particles_tree_order()
    n = len(pos)
    extent = float(np.max(pos.max(0) - pos.min(0))) if n else 1.0
    sentinel = (pos.mean(0) + 3.0 * max(extent, 1e-3)).astype(np.float64)
    if n >= (1 << 24):
        raise ValueError("orig-index-in-f32 packing requires N < 2^24")
    pm = _build_part_matrix(pos, pmass, psoft, orig, sentinel)
    _stage("prep.tiles", _t0); _t0 = _time.perf_counter()
    _ex = ThreadPoolExecutor(max_workers=1)
    pm_fut = _ex.submit(jnp.asarray, pm)
    _ex.shutdown(wait=False)
    if G > 1:
        gl = tree.group_lists(theta=theta, group_leaves=G)
        leaf_counts, leaf_idx = gl["lleaf_counts"], gl["lleaf_idx"]
        node_counts, node_ids = gl["lnode_counts"], gl["lnode_ids"]
    else:
        lists = tree.block_lists(theta=theta, block_size=0)
        leaf_counts, leaf_idx = lists["leaf_counts"], lists["leaf_idx"]
        node_counts, node_ids = lists["node_counts"], lists["node_ids"]
        gl = None
    _stage("prep.lists", _t0); _t0 = _time.perf_counter()
    lstarts, lcounts = tree.leaves()  # enumerated by the list build
    # kept for the dense-packed near engine (packer rebuilds tile rows)
    n_leaves = len(lstarts)
    cap = max(cap, int(lcounts.max()) if n_leaves else 1)
    # pad the tile table to a multiple of 32 rows (all-dummy rows) so the
    # banded engine's (R, 8, cap) window BlockSpec divides it for any
    # R ∈ {4, 8, 16, 32}; leaf ids (incl. the dummy id n_leaves) unchanged.
    # The pad rows are requested up front: a post-hoc np.concatenate
    # re-allocated the whole 1 GB table (first-touch faults cost ~15 s/GB
    # on this host — util/thp.py).
    # The table itself is gathered ON DEVICE from a compact (n+1, 6)
    # particle matrix: the host C++ pack (8–13 s at 10M) plus the 324 MB
    # table upload (relay wire measured 20–70 MB/s) become a 240 MB
    # upload + one jitted row gather (~1.5 s).
    pad32 = (-(n_leaves + 1)) % 32
    com, nmass, _ = tree.node_data()
    com = np.vstack([com, sentinel[None, :]])
    nmass = np.concatenate([nmass, [0.0]])
    moments = tree.node_moments()
    moments = np.vstack([moments, np.zeros((1, moments.shape[1]))])
    # packed node payload rows [x, y, z, mass, 0…] for the Pallas far field
    nodes_packed = np.zeros((len(nmass), 8), np.float32)
    nodes_packed[:, 0:3] = com
    nodes_packed[:, 3] = nmass
    _stage("prep.nodes", _t0); _t0 = _time.perf_counter()
    tiles_j = _leaf_tiles_on_device(pm_fut.result(), lstarts, lcounts,
                                    n_leaves, pad32, cap)
    _stage("prep.tiles_upload", _t0); _t0 = _time.perf_counter()
    # NOTE: no eager (nb, cap, 3) target-position copy — the only consumer
    # of its layout was .shape[1] (== cap); the eager jnp.moveaxis cost a
    # remote XLA compile + 360 MB HBM at 10M for nothing

    prep = {
        "n": n, "n_blocks": n_leaves, "cap": cap, "theta": float(theta),
        "order": tree.multipole_order, "kernel": tree.kernel,
        "near_counts": np.asarray(leaf_counts, np.int64),
        "near_offsets": np.concatenate(
            [[0], np.cumsum(leaf_counts)[:-1]]).astype(np.int32),
        "near_flat": np.asarray(leaf_idx, np.int32),
        "tiles": tiles_j,
        "tgt_tiles": tiles_j[:n_leaves],
        "node_counts_np": np.asarray(node_counts, np.int64),
        "node_com": jnp.asarray(com, jnp.float32),
        "node_mass": jnp.asarray(nmass, jnp.float32),
        "node_moments": jnp.asarray(moments, jnp.float32),
        "nodes_packed": jnp.asarray(nodes_packed),
        "lstarts": np.asarray(lstarts, np.int64),
        "lcounts": np.asarray(lcounts, np.int64),
        "orig_index": np.asarray(orig),
        "_tree": tree,
        "_particles": (pos, pmass, psoft, orig),
        "_sentinel": np.asarray(sentinel, np.float64),
        "_tiles_np": None,  # lazy (numpy pack) — device table is primary
        "_part_mat": pm,
        "G": G,
        "stats": {"mean_nodes": float(node_counts.mean()),
                  "mean_leaf_tiles": float(leaf_counts.mean()),
                  "max_leaf_tiles": int(leaf_counts.max()),
                  "cap": cap},
    }
    _stage("prep.upload", _t0); _t0 = _time.perf_counter()
    dummy_node = len(nmass) - 1
    # near width classes / group-union classes / group tiles are built
    # LAZILY on first use (_ensure_near_classes/_ensure_gnear): they only
    # serve the non-default scattered engines and cost ~50 s of 10M prep
    # pre-gather node payload per class on the host when it fits HBM
    # (order 0: 16 B/entry; moments push it over budget at large N)
    order = tree.multipole_order
    # COMPACT payload columns: the monopole M_000 duplicates mass and the
    # COM dipoles are identically zero (csrc/octree.cpp build_payloads),
    # so only |n| ≥ 2 moments ship — canonical index p lives at row p.
    mom_cols = moments[:, 4:] if order >= 2 else None
    pcols = 4 + (mom_cols.shape[1] if mom_cols is not None else 0)
    far_slots = _padded_slots(node_counts) + (
        _padded_slots(gl["gnode_counts"]) if gl is not None else 0)
    far_pre = far_slots * pcols * 4 <= _FAR_PREGATHER_BUDGET
    # compact (n_nodes+1, P) node-major payload is built EITHER WAY (it is
    # ~MBs): pre-gathered into padded class matrices when within budget,
    # else kept device-resident for in-jit per-chunk row gathers (the old
    # over-budget path fed (C, TB, 3) positions to 3-D-broadcast gather
    # evaluators whose (tb, w, 3) intermediates XLA left unfused at
    # order ≥ 1 — 12.9 GB workspaces / ResourceExhausted at 10M order 3)
    payload_np = np.concatenate(
        [com, nmass[:, None]]
        + ([mom_cols] if mom_cols is not None else []),
        axis=1).astype(np.float32)  # (n, P) node-major: 4P B row gathers
    payload_np = np.ascontiguousarray(payload_np)
    _stage("prep.payload", _t0); _t0 = _time.perf_counter()
    prep["far_pre"] = far_pre
    # row-batched pallas far kernel (any order: the batched kernel carries
    # the |n| ≥ 2 moment contraction): amortizes the ~3 µs per-step fixed
    # cost the one-row-per-step schedules pay
    prep["far_pallas"] = far_pre
    prep["_dummy_node"] = dummy_node
    # raw far lists + payload stay in prep (host, compact) so cached preps
    # can rebuild the device class structures without the octree
    prep["_far_lists"] = (np.asarray(node_counts, np.int64),
                          np.asarray(node_ids, np.int32))
    prep["_payload_np"] = payload_np
    if gl is not None:
        prep["_gfar_lists"] = (np.asarray(gl["gnode_counts"], np.int64),
                               np.asarray(gl["gnode_ids"], np.int32))
        prep["gnear_offsets"] = np.concatenate(
            [[0], np.cumsum(gl["gnear_counts"])[:-1]]).astype(np.int32)
        prep["gnear_counts"] = np.asarray(gl["gnear_counts"], np.int32)
        prep["gnear_flat"] = np.asarray(gl["gnear_seqs"], np.int32)
        prep["gnear_bits_flat"] = np.asarray(gl["gnear_bits"], np.int32)
        prep["n_groups"] = gl["n_groups"]
        prep["stats"]["mean_gnodes"] = float(gl["gnode_counts"].mean())
        prep["stats"]["gather_rows"] = float(
            gl["gnode_counts"].sum() + node_counts.sum())
    if background_classes:
        ex2 = ThreadPoolExecutor(max_workers=1)
        prep["_warm_future"] = ex2.submit(_build_classes_bg, prep)
        ex2.shutdown(wait=False)
    else:
        _ensure_far_classes(prep)
    _stage("prep.far_classes", _t0)
    return prep


def _build_classes_bg(prep) -> None:
    """Background far-class build for the cold prep path (same contract
    as :func:`warm_prep_structures`: failures drop partial state and the
    solver's lazy build retries on the main thread).  Builds against a
    snapshot dict and publishes with ONE C-level ``update`` so main-
    thread readers (``dict(prep)``, ``_persistable``) never observe a
    half-inserted key set."""
    try:
        stage = dict(prep)  # C-level copy: atomic under the GIL
        _ensure_far_classes(stage, _wait_warm=False)
        prep.update({k: stage[k] for k in
                     ("far_classes", "gfar_classes", "_payload_dev")
                     if k in stage})
    except Exception as e:  # pragma: no cover - defensive
        logger.warning("background far-class build failed (%s); will "
                       "rebuild lazily", e)


def warm_prep_structures(prep) -> None:
    """Rebuild the lazily-built engine structures of a cache-loaded prep:
    far classes, packed tiles, diag band device tables (when their host
    mirrors were persisted), and the combine index vectors.

    ``load_tree_prep`` runs this in a BACKGROUND thread so the class host
    gathers and device uploads overlap the loader's tile-table upload —
    the round-4 warm first solve serialized ~19 s of exactly this work
    after the load returned (VERDICT r4 item 3).  Failures are logged and
    partial structures dropped; the solver's own lazy build then retries
    on the main thread."""
    try:
        _ensure_far_classes(prep, _wait_warm=False)
        ev = prep.get("_tiles_ready")
        if ev is not None:  # tile builders below need the device table
            ev.wait()
        if prep["n_blocks"] >= 65536:  # diag is the auto engine there
            for key in [k for k in list(prep.keys())
                        if isinstance(k, tuple) and k
                        and k[0] == "diag_np"]:
                _build_diag_band(prep, *key[1:])
            _ensure_combine_idx(prep)
    except Exception as e:  # pragma: no cover - defensive
        logger.warning("background prep warm failed (%s); engine "
                       "structures will rebuild lazily", e)
        prep.pop("far_classes", None)
        prep.pop("gfar_classes", None)


def _ensure_far_classes(prep, _wait_warm: bool = True) -> None:
    """Build (or rebuild, for cache-loaded preps) the device far-field
    class structures from the compact host ingredients in ``prep``.

    Solvers call this first; when a background warm thread is in flight
    (``load_tree_prep``), wait for it — it builds these same structures
    plus the near-band tables, so everything after this call is
    race-free single-writer state."""
    if _wait_warm:
        fut = prep.pop("_warm_future", None)
        if fut is not None:
            fut.result()
    if "far_classes" in prep:
        return
    import time as _time
    from .tree import _stage
    _t0 = _time.perf_counter()
    n_leaves, cap, G = prep["n_blocks"], prep["cap"], prep["G"]
    dummy_node = prep["_dummy_node"]
    far_pre = prep["far_pre"]
    payload_np = prep["_payload_np"]
    node_counts, node_ids = prep["_far_lists"]

    def _tiles_dev():
        # the loader's background warm starts class builds BEFORE the
        # tile-table upload completes; block on it only here (the class
        # gather/upload loop never touches the tiles)
        ev = prep.get("_tiles_ready")
        if ev is not None:
            ev.wait()
        return prep["tiles"]

    prep["far_classes"] = _build_classes(
        node_counts, node_ids, 128, dummy_node,
        lambda: _tiles_dev()[:n_leaves],
        payload=payload_np if far_pre else None)
    if not far_pre and "_payload_dev" not in prep:
        # over-budget configs gather payload rows ON DEVICE per chunk
        # (in-jit, fused with the component kernels — _far_gather_pre);
        # cache-loaded preps hold payload_np as a sidecar mmap — stage it
        prep["_payload_dev"] = jnp.asarray(thp_stage(payload_np))
    _stage("prep.far_classes.leaf", _t0); _t0 = _time.perf_counter()
    if "_gfar_lists" in prep:
        ng = prep["n_groups"]

        def _g_targets():
            # device reshape of the resident tile table (no host copy)
            tiles_j = _tiles_dev()
            nl_pad = -(-n_leaves // G) * G
            pad_rows = nl_pad - n_leaves
            tj = tiles_j[:n_leaves]
            if pad_rows:
                tj = jnp.concatenate(
                    [tj, jnp.broadcast_to(tiles_j[-1],
                                          (pad_rows, 8, cap))])
            return (tj.reshape(ng, G, 8, cap).transpose(0, 2, 1, 3)
                    .reshape(ng, 8, G * cap))

        gn_counts, gn_ids = prep["_gfar_lists"]
        prep["gfar_classes"] = _build_classes(
            gn_counts, gn_ids, 128, dummy_node, _g_targets,
            payload=payload_np if far_pre else None)
        _stage("prep.far_classes.group", _t0)


def _build_part_matrix(pos, pmass, psoft, orig, sentinel) -> np.ndarray:
    """(n+1, 6) f32 tree-order particle matrix [x, y, z, m, h, orig] with
    a trailing sentinel row [sx, sy, sz, 0, 0, -2] — the compact upload
    the device-side tile builders gather from."""
    n = len(pmass)
    pm = thp_empty((n + 1, 6), np.float32)
    pm[:n, 0:3] = pos
    pm[:n, 3] = pmass
    pm[:n, 4] = psoft
    pm[:n, 5] = orig
    pm[n, 0:3] = np.asarray(sentinel, np.float64)
    pm[n, 3:5] = 0.0
    pm[n, 5] = -2.0
    return pm


def _part_matrix(prep) -> np.ndarray:
    """The (n+1, 6) particle matrix, rebuilt on demand after
    ``release_host_buffers`` (cheap column casts from the tree order)."""
    if prep.get("_part_mat") is None:
        pos, pmass, psoft, orig = _host_particles(prep)
        prep["_part_mat"] = _build_part_matrix(pos, pmass, psoft, orig,
                                               prep["_sentinel"])
    return prep["_part_mat"]


@partial(jax.jit, static_argnames=("cap",))
def _leaf_tiles_device(pm, lstarts, lcounts, n_leaves, cap: int):
    """(nt, 8, cap) leaf tile table gathered ON DEVICE from the particle
    matrix (row layout of :func:`tree_pallas.pack_leaf_tiles` /
    ``csrc/octree.cpp pnx_tree_pack_leaf_tiles``, bit-identical — see
    test_leaf_tiles_device_build_matches_native).  ``lstarts``/``lcounts``
    cover ALL nt rows (dummy + pad rows have count 0 → every lane gathers
    the sentinel row)."""
    nt = lstarts.shape[0]
    n = pm.shape[0] - 1
    k = jnp.arange(cap, dtype=jnp.int32)[None, :]
    idx = jnp.where(k < lcounts[:, None], lstarts[:, None] + k, n)
    g = jnp.take(pm, idx.reshape(-1), axis=0).reshape(nt, cap, 6)
    g = g.transpose(0, 2, 1)
    real = (jnp.arange(nt) < n_leaves).astype(jnp.float32)[:, None, None]
    row6 = jnp.broadcast_to(real, (nt, 1, cap))
    row7 = jnp.zeros((nt, 1, cap), jnp.float32)
    return jnp.concatenate([g, row6, row7], axis=1)


def _leaf_tiles_on_device(pm, lstarts, lcounts, n_leaves: int, pad32: int,
                          cap: int):
    lsp = np.concatenate([np.asarray(lstarts, np.int64),
                          np.full(1 + pad32, len(pm) - 1,
                                  np.int64)]).astype(np.int32)
    lcp = np.concatenate([np.asarray(lcounts, np.int64),
                          np.zeros(1 + pad32, np.int64)]).astype(np.int32)
    return _leaf_tiles_device(jnp.asarray(pm), jnp.asarray(lsp),
                              jnp.asarray(lcp), n_leaves, cap)


def _host_particles(prep):
    """Tree-order particle arrays (host), rebuilt from the tree on demand
    after ``release_host_buffers``."""
    if prep.get("_particles") is None:
        tree = prep.get("_tree")
        if tree is None:
            raise RuntimeError(
                "prep holds neither host particle arrays nor a tree handle "
                "(released cache-loaded prep?) — cannot rebuild host tables")
        pos, pmass, psoft, orig = tree.particles_tree_order()
        prep["_particles"] = (pos, pmass, psoft, orig)
    return prep["_particles"]


def _host_tiles(prep):
    """Host copy of the (padded) leaf tile table, rebuilt on demand."""
    if prep.get("_tiles_np") is None:
        tree = prep.get("_tree")
        if tree is not None:
            tiles = tree.pack_leaf_tiles(prep["lstarts"], prep["lcounts"],
                                         prep["_sentinel"], prep["cap"])
        else:
            from .tree_pallas import pack_leaf_tiles
            pos, pmass, psoft, orig = _host_particles(prep)
            tiles = pack_leaf_tiles(pos, pmass, psoft, orig,
                                    prep["lstarts"], prep["lcounts"],
                                    prep["_sentinel"], prep["cap"])
        pad32 = (-len(tiles)) % 32
        if pad32:
            tiles = np.concatenate(
                [tiles, np.repeat(tiles[-1:], pad32, axis=0)])
        prep["_tiles_np"] = tiles
    return prep["_tiles_np"]


def release_host_buffers(prep) -> None:
    """Drop the large host-side copies pinned by prep (~1.3 GB at 10M:
    tree-order particles + the tile table + derived group tiles).  The
    engines that need them (packed/classes/group) rebuild lazily from the
    retained tree handle — call this once the engine structures you use
    are built (first eval) to halve steady-state host RSS."""
    prep["_particles"] = None
    prep["_tiles_np"] = None
    prep["_part_mat"] = None
    prep.pop("_gtt_np", None)


def _gtt_np(prep):
    """(ng, 8, G·cap) group target tile matrix (host, cached)."""
    if "_gtt_np" not in prep:
        tiles = _host_tiles(prep)
        G, cap = prep["G"], prep["cap"]
        n_leaves = prep["n_blocks"]
        ng = -(-n_leaves // G)
        pad_rows = ng * G - n_leaves
        tiles_pad = tiles[:n_leaves]
        if pad_rows:
            tiles_pad = np.concatenate(
                [tiles_pad,
                 np.broadcast_to(tiles[-1], (pad_rows, 8, cap))], axis=0)
        prep["_gtt_np"] = (tiles_pad.reshape(ng, G, 8, cap)
                           .transpose(0, 2, 1, 3).reshape(ng, 8, G * cap))
    return prep["_gtt_np"]


def _ensure_near_classes(prep):
    """Lazy width classes for the per-leaf scattered near engine."""
    if "near_classes" not in prep:
        prep["near_classes"] = _build_classes(
            prep["near_counts"], prep["near_flat"], 64, prep["n_blocks"],
            _host_tiles(prep)[:prep["n_blocks"]])
    return prep["near_classes"]


def _ensure_gnear(prep):
    """Lazy group-union classes + device group tiles (group/gdma engines)."""
    if "gnear_classes" not in prep:
        gtt_np = _gtt_np(prep)
        counts = prep["gnear_counts"].astype(np.int64)
        classes, gtt_dev = _build_classes(
            counts, prep["gnear_flat"], 64, prep["n_blocks"], gtt_np,
            flat_aux=prep["gnear_bits_flat"])
        prep["gnear_classes"] = (classes, gtt_dev)
        prep["gtt_tiles"] = gtt_dev
    return prep["gnear_classes"]


def _compose_scatter(prep, starts, counts, cap, cache_key):
    """Cached (valid, final) scatter index pair: valid lanes of the
    (nblocks, cap) layout mapped STRAIGHT to original particle order
    (one fancy-index scatter instead of two chained ones — the two-hop
    f64 version cost ~5-10 s per 10M accel eval on the one-core host)."""
    cached = prep.get(cache_key)
    if cached is None:
        n = prep["n"]
        idx = _range_index_matrix(starts, counts, cap, fill=n).reshape(-1)
        valid = idx < n
        final = prep["orig_index"][idx[valid]]
        cached = prep[cache_key] = (valid, final)
    return cached


def _scatter_leaf_blocks(prep, block_vals: np.ndarray, ncols: int):
    n = prep["n"]
    nb = prep["n_blocks"]
    cap = prep["cap"]
    valid, final = _compose_scatter(prep, prep["lstarts"],
                                    prep["lcounts"], cap, "_scat_leaf")
    flat = np.asarray(block_vals).reshape(nb * cap, -1)
    out = thp_zeros((n, flat.shape[1]), np.float32)
    out[final] = flat[valid]
    return out[:, 0] if ncols == 1 else out


def _pad_rows(x, rows: int):
    pad = rows - x.shape[0]
    if pad <= 0:
        return x
    return jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)])


@partial(jax.jit, static_argnames=("rows",))
def _take_rows(x, start, last, rows: int):
    """``rows``-row chunk ``x[start : start+rows]`` with rows past ``last``
    clamped to ``last`` (repeat-last-valid padding, same semantics as
    ``_pad_rows``).  ``start``/``last`` are traced, so XLA compiles ONE
    gather per (x shape, rows) — a Python-slice chunk loop compiled a
    fresh trivial computation per (lo, hi) through the remote relay
    (~1.5-3 s each, hundreds of chunks on a 10M first solve)."""
    idx = jnp.minimum(start + jnp.arange(rows, dtype=jnp.int32), last)
    return jnp.take(x, idx, axis=0)


@partial(jax.jit, static_argnames=("rows",))
def _take_sel_rows(tgt, sel_dev, start, last, rows: int):
    """Chunk rows ``sel_dev[start : start+rows]`` of the leg-shared target
    array (see :func:`_build_classes`): one compile per (tgt shape, rows)."""
    idx = jnp.minimum(start + jnp.arange(rows, dtype=jnp.int32), last)
    return jnp.take(tgt, jnp.take(sel_dev, idx, axis=0), axis=0)


def _near_dma(prep, kern, interpret, accel, nbuf: int = 8,
              nb_chunk: int = 2048, flat_cap: int = 196_608):
    """Near field via the manual-DMA ragged kernel (zero list padding).

    Chunks are bounded by the SMEM budget for the flat list slice
    (~0.75 MB) and padded to fixed shapes (one compile total)."""
    from .tree_pallas import near_field_eval_dma
    nb = prep["n_blocks"]
    tb = prep["tgt_tiles"].shape[2]
    offs = prep["near_offsets"]
    cnts = prep["near_counts"].astype(np.int32)
    flat = prep["near_flat"]
    out = thp_zeros((nb, 8, tb), np.float32)
    pending = []
    start = 0
    while start < nb:
        end, tot = start, 0
        while (end < nb and end - start < nb_chunk
               and tot + cnts[end] <= flat_cap):
            tot += int(cnts[end])
            end += 1
        rows = end - start
        off_local = np.zeros(nb_chunk, np.int32)
        cnt_local = np.zeros(nb_chunk, np.int32)
        off_local[:rows] = offs[start:end] - offs[start]
        cnt_local[:rows] = cnts[start:end]
        flat_local = np.zeros(flat_cap, np.int32)
        flat_local[:tot] = flat[offs[start]:offs[start] + tot]
        tt = _take_rows(prep["tgt_tiles"], np.int32(start),
                        np.int32(end - 1), nb_chunk)
        res = near_field_eval_dma(jnp.asarray(off_local),
                                  jnp.asarray(cnt_local),
                                  jnp.asarray(flat_local), tt,
                                  prep["tiles"], kernel=kern, accel=accel,
                                  interpret=interpret, nbuf=nbuf)
        pending.append((start, end, res))
        start = end
    for s, e, res in pending:
        out[s:e] = np.asarray(res)[:e - s]
    if accel:
        return np.moveaxis(out[:, 0:3, :], 1, 2)
    return out[:, 0, :]


def _near_group(prep, kern, interpret, accel, k: int = 4):
    """Union near field over leaf groups (see near_field_group_eval):
    ~G/2× fewer tile fetches than per-leaf lists — the near wall is the
    per-fetch DMA cost (measured invariant to fan-in and manual
    pipelining)."""
    from .tree_pallas import near_field_group_eval
    nb, cap, G = prep["n_blocks"], prep["cap"], prep["G"]
    ng = prep["n_groups"]
    tb = G * cap
    out_g = thp_zeros((ng, 8, tb), np.float32)
    budget = 50_000  # two SMEM-prefetched arrays share the ~0.4 MB budget
    pending = []
    classes, gtt_dev = _ensure_gnear(prep)
    for w, sel, li_dev, sel_dev, bits_dev in classes:
        for lo, hi, rows in _class_chunks(w, len(sel), budget):
            lo32, la32 = np.int32(lo), np.int32(hi - 1)
            res = near_field_group_eval(_take_rows(li_dev, lo32, la32, rows),
                                        _take_rows(bits_dev, lo32, la32,
                                                   rows),
                                        _take_sel_rows(gtt_dev, sel_dev,
                                                       lo32, la32, rows),
                                        prep["tiles"], kernel=kern,
                                        accel=accel, interpret=interpret,
                                        k=min(k, w), G=G)
            pending.append((sel[lo:hi], hi - lo, res))
    for s_idx, cnt, res in pending:
        out_g[s_idx] = np.asarray(res)[:cnt]
    out = (out_g.reshape(ng, 8, G, cap).transpose(0, 2, 1, 3)
           .reshape(ng * G, 8, cap)[:nb])
    if accel:
        return np.moveaxis(out[:, 0:3, :], 1, 2)
    return out[:, 0, :]


def _near_gdma(prep, kern, interpret, accel, nbuf: int = 8,
               ng_chunk: int = 1024, flat_cap: int = 98_304):
    """Group-union near field via the register-accumulating manual-DMA
    kernel (zero padding; one grid step per group)."""
    from .tree_pallas import near_field_group_dma
    nb, cap, G = prep["n_blocks"], prep["cap"], prep["G"]
    ng = prep["n_groups"]
    _ensure_gnear(prep)  # device group tiles
    tb = G * cap
    offs = prep["gnear_offsets"]
    cnts = prep["gnear_counts"]
    flat = prep["gnear_flat"]
    bits = prep["gnear_bits_flat"]
    out_g = thp_zeros((ng, 8, tb), np.float32)
    pending = []
    start = 0
    while start < ng:
        end, tot = start, 0
        while (end < ng and end - start < ng_chunk
               and tot + cnts[end] <= flat_cap):
            tot += int(cnts[end])
            end += 1
        rows = end - start
        off_l = np.zeros(ng_chunk, np.int32)
        cnt_l = np.zeros(ng_chunk, np.int32)
        off_l[:rows] = offs[start:end] - offs[start]
        cnt_l[:rows] = cnts[start:end]
        flat_l = np.zeros(flat_cap, np.int32)
        bits_l = np.zeros(flat_cap, np.int32)
        flat_l[:tot] = flat[offs[start]:offs[start] + tot]
        bits_l[:tot] = bits[offs[start]:offs[start] + tot]
        tt = _take_rows(prep["gtt_tiles"], np.int32(start),
                        np.int32(end - 1), ng_chunk)
        res = near_field_group_dma(jnp.asarray(off_l), jnp.asarray(cnt_l),
                                   jnp.asarray(flat_l), jnp.asarray(bits_l),
                                   tt, prep["tiles"], kernel=kern,
                                   accel=accel, interpret=interpret,
                                   nbuf=nbuf)
        pending.append((start, end, res))
        start = end
    for s, e, res in pending:
        out_g[s:e] = np.asarray(res)[:e - s]
    out = (out_g.reshape(ng, 8, G, cap).transpose(0, 2, 1, 3)
           .reshape(ng * G, 8, cap)[:nb])
    if accel:
        return np.moveaxis(out[:, 0:3, :], 1, 2)
    return out[:, 0, :]


def _near_chunked(prep, kern, interpret, accel, k: int = 4):
    """Chunked near field over the prebuilt width classes.

    Class data (trimmed lists + target tiles) is device-resident from prep;
    per-chunk slicing is an on-device slice.  Chunk row counts are a
    deterministic function of the width so XLA compiles one kernel per
    class, not per chunk.  SMEM budget: rows·width·4 B ≤ ~0.4 MB."""
    from .tree_pallas import near_field_eval
    nb = prep["n_blocks"]
    tb = prep["tgt_tiles"].shape[2]
    out = thp_zeros((nb, 8, tb), np.float32)
    budget = 100_000  # SMEM words for the prefetched list slice
    pending = []
    classes, tt_all = _ensure_near_classes(prep)
    for w, sel, li_dev, sel_dev in classes:
        for lo, hi, rows in _class_chunks(w, len(sel), budget):
            lo32, la32 = np.int32(lo), np.int32(hi - 1)
            res = near_field_eval(_take_rows(li_dev, lo32, la32, rows),
                                  _take_sel_rows(tt_all, sel_dev,
                                                 lo32, la32, rows),
                                  prep["tiles"], kernel=kern, accel=accel,
                                  interpret=interpret, k=min(k, w))
            pending.append((sel[lo:hi], hi - lo, res))  # async dispatch
    for s_idx, cnt, res in pending:
        out[s_idx] = np.asarray(res)[:cnt]
    if accel:
        return np.moveaxis(out[:, 0:3, :], 1, 2)  # (nb, TB, 3)
    return out[:, 0, :]


def _build_banded_windows(prep, R: int, Gn: int):
    """Aligned R-tile windows covering each Gn-leaf group's union near set.

    Built straight from the PER-LEAF lists, so the near-field group size
    ``Gn`` is decoupled from the far-field group size ``prep['G']`` —
    smaller Gn trades masked-compute waste (each window slot evaluates
    against all Gn·cap targets) against fetch count.  Each window is one
    sequential (R·8, cap) DMA; slots inside a window but outside the
    union get bits=0 (masked off in-kernel), so exactness never needs
    far-list changes.  Returns (grp (nw,), blk (nw,), bits (nw·R,),
    windows-per-group (ngn,)), sorted by (grp, blk)."""
    key = ("banded", R, Gn)
    if key in prep:
        return prep[key]
    if Gn > 32:
        raise ValueError(f"banded near engine packs leaf membership into an "
                         f"int32 bitmask: Gn must be <= 32, got {Gn}")
    nb = prep["n_blocks"]
    counts = prep["near_counts"].astype(np.int64)
    seqs = prep["near_flat"].astype(np.int64)
    ngn = -(-nb // Gn)
    nwb = prep["tiles"].shape[0] // R
    leaf = np.repeat(np.arange(nb, dtype=np.int64), counts)
    grp = leaf // Gn
    member_bit = np.int32(1) << (leaf % Gn).astype(np.int32)
    k = grp * nwb + seqs // R
    uk = np.unique(k)                     # sorted → grp-major, blk ascending
    win = np.searchsorted(uk, k)          # window index per entry
    nw = len(uk)
    wgrp = (uk // nwb).astype(np.int32)
    wblk = (uk % nwb).astype(np.int32)
    bits = np.zeros(nw * R, np.int32)
    np.bitwise_or.at(bits, win * R + (seqs % R).astype(np.int64), member_bit)
    wcounts = np.bincount(wgrp, minlength=ngn).astype(np.int64)
    # upload once, padded by the max chunk width (device-side slicing;
    # per-chunk host shipping measured ~50 ms/chunk through the relay).
    # pad group id = ngn → clamps into the spill segment, never collected.
    # pad ≥ the largest possible chunk: _clamp_w_budget bounds w_budget by
    # the R-dependent SMEM cap (and rejects wcounts.max() above it), so a
    # pad of that cap guarantees every dynamic_slice stays in bounds.
    pad = max(98_304 // (R + 2), int(wcounts.max()) if len(wcounts) else 0)
    gf_dev = jnp.asarray(np.concatenate([wgrp, np.full(pad, ngn, np.int32)]))
    blk_dev = jnp.asarray(np.concatenate([wblk, np.zeros(pad, np.int32)]))
    bits_dev = jnp.asarray(np.concatenate([bits,
                                           np.zeros(pad * R, np.int32)]))
    prep[key] = (gf_dev, blk_dev, bits_dev, wcounts)
    return prep[key]


def _tiles_blocked(prep, R: int):
    """(n_tiles/R, 8, R·cap) blocked source windows (device reshape,
    cached per R): window w holds leaves [wR, wR+R) with attribute rows
    concatenated along lanes — one CONTIGUOUS block per fetch."""
    key = ("tiles_blk", R)
    if key not in prep:
        t = prep["tiles"]  # (ntiles, 8, cap); ntiles % 32 == 0
        nt, _, cap = t.shape
        prep[key] = (t.reshape(nt // R, R, 8, cap).transpose(0, 2, 1, 3)
                     .reshape(nt // R, 8, R * cap))
    return prep[key]


def _tgt_blocked(prep, Gn: int):
    """(ngb, 8, Gn·cap) blocked target tiles (Gn=1: the tile table)."""
    if Gn == 1:
        return prep["tiles"]
    key = ("tgt_blk", Gn)
    if key not in prep:
        t = prep["tiles"]
        nt, _, cap = t.shape
        ngb = nt // Gn
        prep[key] = (t[:ngb * Gn].reshape(ngb, Gn, 8, cap)
                     .transpose(0, 2, 1, 3).reshape(ngb, 8, Gn * cap))
    return prep[key]


def _pack_dense_tiles(prep, K: int):
    """Greedily pack CONSECUTIVE leaves into dense cap-lane tiles.

    Leaf tiles are only ~30–40 % occupied (octant splitting leaves leaves
    far below capacity), so every engine computes ~3× padding.  Packing
    up to ``K`` consecutive leaves per tile (particles stay one contiguous
    tree-order run) restores ~90 % occupancy; tile row 7 carries each
    lane's sub-leaf index so the kernel can mask leaf-pair membership
    (near sets are leaf-granular).  K² must fit an int32 bitmask (K ≤ 5).
    Returns dict with pstarts/pcounts (particle ranges), tile_of/sub_of
    (leaf → packed slot), ptiles_dev, n_ptiles."""
    key = ("packed", K)
    if key in prep:
        pk = prep[key]
        if "ptiles" not in pk:  # cache-loaded: device table not persisted
            pk["ptiles"] = _ptiles_on_device(prep, pk["pstarts"],
                                             pk["pcounts"], pk["tile_of"],
                                             pk["sub_of"])
        return pk
    if K * K > 32:
        raise ValueError("packed tiles need K*K <= 32")
    cap = prep["cap"]
    lstarts = np.asarray(prep["lstarts"], np.int64)
    lcounts = np.asarray(prep["lcounts"], np.int64)
    nb = prep["n_blocks"]
    # plain-list greedy walk (numpy scalar indexing in a 264k-iteration
    # loop measured ~79 s on the single host core; lists: <0.2 s)
    ls_l = lstarts.tolist()
    lc_l = lcounts.tolist()
    tile_of_l = [0] * nb
    sub_of_l = [0] * nb
    pstarts, pcounts = [], []
    cur_start = ls_l[0] if nb else 0
    cur_count, cur_k = 0, 0
    for i in range(nb):
        c = lc_l[i]
        if cur_k and (cur_count + c > cap or cur_k >= K):
            pstarts.append(cur_start)
            pcounts.append(cur_count)
            cur_start, cur_count, cur_k = ls_l[i], 0, 0
        tile_of_l[i] = len(pstarts)
        sub_of_l[i] = cur_k
        cur_count += c
        cur_k += 1
    if cur_k:
        pstarts.append(cur_start)
        pcounts.append(cur_count)
    tile_of = np.asarray(tile_of_l, np.int32)
    sub_of = np.asarray(sub_of_l, np.int32)
    pstarts = np.asarray(pstarts, np.int64)
    pcounts = np.asarray(pcounts, np.int64)
    npt = len(pstarts)
    out = {"pstarts": pstarts, "pcounts": pcounts, "tile_of": tile_of,
           "sub_of": sub_of, "n_ptiles": npt,
           "ptiles": _ptiles_on_device(prep, pstarts, pcounts, tile_of,
                                       sub_of)}
    prep[key] = out
    return out


def _ptile_lane_maps(prep, pstarts, pcounts, tile_of, sub_of):
    """Host lane maps for the DEVICE packed-table build: for every packed
    tile lane, the flat (leaf·cap + lane) index into the resident leaf
    tile table (invalid lanes → the dummy leaf's sentinel lane), plus the
    per-lane sub-leaf id.  ~66 MB of int32/int8 at 10M vs the 324 MB
    host-assembled table it replaces (the upload wire measured 20–70 MB/s
    through the relay — the table upload was the bulk of the warm first
    solve), and no particle-array reads at all."""
    cap = prep["cap"]
    nb = prep["n_blocks"]
    lstarts = np.asarray(prep["lstarts"], np.int64)
    lcounts = np.asarray(prep["lcounts"], np.int64)
    pstarts = np.asarray(pstarts, np.int64)
    tile_of = np.asarray(tile_of, np.int64)
    sub_of = np.asarray(sub_of, np.int8)
    npt = len(pstarts)
    npt_pad = npt + (-npt) % 32
    dummy_flat = np.int32(nb * cap)  # dummy leaf tile, lane 0
    lane_map = thp_empty((npt_pad, cap), np.int32)
    lane_map[:] = dummy_flat
    sub_map = np.zeros((npt_pad, cap), np.int8)
    k = np.arange(cap, dtype=np.int64)[None, :]
    valid = k < lcounts[:, None]                      # (nb, cap)
    toff = lstarts - pstarts[tile_of]                 # leaf's lane offset
    dst = (tile_of[:, None] * cap + toff[:, None] + k)[valid]
    src = (np.arange(nb, dtype=np.int64)[:, None] * cap + k)[valid]
    lane_map.reshape(-1)[dst] = src.astype(np.int32)
    sub_map.reshape(-1)[dst] = np.broadcast_to(sub_of[:, None],
                                               (nb, cap))[valid]
    return lane_map, sub_map


@jax.jit
def _ptiles_device_build(tiles, lane_map, sub_map, npt_real):
    """(npt_pad, 8, cap) packed tile table gathered ON DEVICE from the
    resident leaf tile table (row gathers of contiguous 32 B rows run at
    ~1.5-2 s per 10M lanes — well under the replaced table upload).
    Row 6 is 1 on real tiles / 0 on the 32-row pad (dummy) tiles; row 7
    carries the sub-leaf ids.  Matches :func:`_assemble_packed_table`
    bit-for-bit (same f32 source values)."""
    ntl, _, cap = tiles.shape
    src = tiles.transpose(0, 2, 1).reshape(ntl * cap, 8)
    npt_pad = lane_map.shape[0]
    g = jnp.take(src, lane_map.reshape(-1), axis=0)
    g = g.reshape(npt_pad, cap, 8).transpose(0, 2, 1)
    real = (jnp.arange(npt_pad) < npt_real).astype(jnp.float32)[:, None]
    g = g.at[:, 6, :].set(jnp.broadcast_to(real, (npt_pad, cap)))
    g = g.at[:, 7, :].set(sub_map.astype(jnp.float32))
    return g


def _ptiles_on_device(prep, pstarts, pcounts, tile_of, sub_of):
    lane_map, sub_map = _ptile_lane_maps(prep, pstarts, pcounts, tile_of,
                                         sub_of)
    return _ptiles_device_build(prep["tiles"], jnp.asarray(lane_map),
                                jnp.asarray(sub_map), len(pstarts))


def _assemble_packed_table(prep, pstarts, pcounts, sub_of) -> np.ndarray:
    """(npt+pad, 8, cap) packed tile table from particle ranges (host):
    rows x, y, z, mass, soft, orig, 1, subleaf."""
    cap = prep["cap"]
    n = prep["n"]
    npt = len(pstarts)
    lstarts = np.asarray(prep["lstarts"], np.int64)
    k = np.arange(cap)[None, :]
    idx = pstarts[:, None] + k
    valid = k < pcounts[:, None]
    idx = np.where(valid, idx, n)
    # per-particle sub-leaf index (particle → leaf → sub slot)
    leaf_of_p = np.searchsorted(lstarts, np.arange(n), side="right") - 1
    sub_p = np.concatenate([sub_of[leaf_of_p], [0]])
    pos, pmass, psoft, orig = _host_particles(prep)
    sentinel = prep["_sentinel"]
    pos_pad = np.vstack([pos, sentinel[None, :]])
    m_pad = np.concatenate([pmass, [0.0]])
    h_pad = np.concatenate([psoft, [0.0]])
    o_pad = np.concatenate([orig, [-2]])
    pt = thp_zeros((npt, 8, cap), np.float32)
    pt[:, 0] = pos_pad[idx, 0]
    pt[:, 1] = pos_pad[idx, 1]
    pt[:, 2] = pos_pad[idx, 2]
    pt[:, 3] = m_pad[idx]
    pt[:, 4] = h_pad[idx]
    pt[:, 5] = o_pad[idx]
    pt[:, 6] = 1.0
    pt[:, 7] = sub_p[idx]
    pad32 = (-npt) % 32
    if pad32:
        dummy = np.zeros((1, 8, cap), np.float32)
        dummy[0, 0:3] = sentinel[:, None]
        dummy[0, 5] = -2.0
        pt = np.concatenate([pt, np.repeat(dummy, pad32, axis=0)])
    return pt


def _packed_pairs(prep, K: int):
    """Near-list leaf pairs mapped to packed tiles: (T, u, St, v) int64
    rows — target ptile, target sub-leaf, source ptile, source sub-leaf."""
    pk = _pack_dense_tiles(prep, K)
    nb = prep["n_blocks"]
    counts = prep["near_counts"].astype(np.int64)
    seqs = prep["near_flat"].astype(np.int64)
    t_leaf = np.repeat(np.arange(nb, dtype=np.int64), counts)
    T = pk["tile_of"][t_leaf].astype(np.int64)
    u = pk["sub_of"][t_leaf].astype(np.int64)
    St = pk["tile_of"][seqs].astype(np.int64)
    v = pk["sub_of"][seqs].astype(np.int64)
    return T, u, St, v


def _windows_host(T, u, St, v, ntp: int, npt: int, R: int, K: int):
    """Host half of the window build: aligned R-tile windows + per-slot
    K×K adjacency bits from packed near pairs (shared by the packed and
    diag-band builders).  ``ntp``: padded ptile-table rows (window block
    ids index it); ``npt``: real ptile count (group ids).  Returns plain
    numpy ``(wgrp, wblk, bits, wcounts)`` — persistable in the prep
    cache, so a warm process skips the ~30M-pair scatter math."""
    nwb = ntp // R
    kkey = T * nwb + St // R
    uk = np.unique(kkey)
    win = np.searchsorted(uk, kkey)
    nw = len(uk)
    wgrp = (uk // nwb).astype(np.int32)
    wblk = (uk % nwb).astype(np.int32)
    bits = np.zeros(nw * R, np.int32)
    np.bitwise_or.at(bits, win * R + St % R,
                     (np.int32(1) << (u * K + v)).astype(np.int32))
    wcounts = np.bincount(wgrp, minlength=npt).astype(np.int64)
    return wgrp, wblk, bits, wcounts


def _windows_upload(host, npt: int, R: int):
    """Device half: pad + upload a :func:`_windows_host` tuple."""
    wgrp, wblk, bits, wcounts = (np.asarray(x) for x in host)
    # pad ≥ any chunk budget _clamp_w_budget can allow (see banded builder)
    pad = max(98_304 // (R + 2), int(wcounts.max()) if len(wcounts) else 0)
    gf_dev = jnp.asarray(np.concatenate([wgrp, np.full(pad, npt, np.int32)]))
    blk_dev = jnp.asarray(np.concatenate([wblk, np.zeros(pad, np.int32)]))
    bits_dev = jnp.asarray(np.concatenate([bits,
                                           np.zeros(pad * R, np.int32)]))
    return gf_dev, blk_dev, bits_dev, wcounts.astype(np.int64)


def _windows_from_pairs(T, u, St, v, ntp: int, npt: int, R: int, K: int):
    """Windows straight from pairs (fresh build: host half + upload)."""
    return _windows_upload(_windows_host(T, u, St, v, ntp, npt, R, K),
                           npt, R)


def _build_packed_windows(prep, R: int, K: int):
    """Aligned R-tile windows over DENSE packed tiles with K×K leaf-pair
    adjacency bits per slot (see _pack_dense_tiles)."""
    key = ("pwin", R, K)
    if key in prep:
        return prep[key]
    pk = _pack_dense_tiles(prep, K)
    T, u, St, v = _packed_pairs(prep, K)
    prep[key] = _windows_from_pairs(T, u, St, v, pk["ptiles"].shape[0],
                                    pk["n_ptiles"], R, K)
    return prep[key]


def _ptiles_blocked(prep, R: int, K: int):
    key = ("ptiles_blk", R, K)
    if key not in prep:
        t = _pack_dense_tiles(prep, K)["ptiles"]
        nt, _, cap = t.shape
        prep[key] = (t.reshape(nt // R, R, 8, cap).transpose(0, 2, 1, 3)
                     .reshape(nt // R, 8, R * cap))
    return prep[key]


def _read_back(dev, threads: int = 4, min_bytes: int = 16 << 20):
    """Host readback of a large device array through the relay with
    ``threads`` concurrent row-slice transfers.  The relay moves ONE
    stream at ~13-27 MB/s but parallel streams scale: same-process r5
    A/B on 126 MB — single 12.9 MB/s, 4 threads 29.6, 16 threads 26.4
    (f16-cast halves the bytes but reads back SLOWER per byte and drifts
    3e-2 — rejected).  Each slice is a device op: equal-size chunks keep
    it to two compiled shapes per (array shape, threads)."""
    nbytes = int(np.prod(dev.shape)) * dev.dtype.itemsize
    n = dev.shape[0]
    if threads <= 1 or n < threads or nbytes < min_bytes:
        return np.asarray(dev)
    step = n // threads
    bounds = [i * step for i in range(threads)] + [n]
    out = thp_empty(dev.shape, dev.dtype)

    def pull(i):
        out[bounds[i]:bounds[i + 1]] = \
            np.asarray(dev[bounds[i]:bounds[i + 1]])

    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=threads) as ex:
        list(ex.map(pull, range(threads)))
    return out


@partial(jax.jit, donate_argnums=(0,))
def _duset(buf, res, start):
    """buf[start:start+len(res)] = res with a TRACED offset (one compile
    per res shape; donation makes it an in-place row write — the staging
    buffer for chunked device results)."""
    return jax.lax.dynamic_update_slice(buf, res, (start[0], 0, 0))


@partial(jax.jit, donate_argnums=(0,))
def _duadd(buf, res, start, nvalid):
    """buf[start:start+nvalid] += res[:nvalid] with traced offset/count
    (rows ≥ nvalid of a banded chunk hold the NEXT chunk's window sums —
    the fixed W-window fetch pads past the chunk's group range — and must
    not be accumulated)."""
    m = (jax.lax.broadcasted_iota(jnp.int32, (res.shape[0], 1, 1), 0)
         < nvalid[0])
    res = jnp.where(m, res, 0.0)
    cur = jax.lax.dynamic_slice(buf, (start[0], 0, 0), res.shape)
    return jax.lax.dynamic_update_slice(buf, cur + res, (start[0], 0, 0))


#: packed-tile fan-in shared by the diag/packed engines and the combine
#: index builder (K consecutive leaves per dense cap-lane tile).
_PACK_K = 5


def _ensure_combine_idx(prep):
    """Device index vectors for the ON-DEVICE leg combine (original-order
    particle → flat packed-tile lane / flat leaf-space lane).  Built once
    per prep on the host (cheap: two scatters) and uploaded (~80 MB at
    10M); they let the whole eval read back ONE (n, rows) array instead
    of ~3× per-chunk partials + host scatters — the measured wall (relay
    readback ran at ~10–20 MB/s while band+remainder compute was ~3 s)."""
    if "_combine_idx" in prep:
        return prep["_combine_idx"]
    n, cap, nb = prep["n"], prep["cap"], prep["n_blocks"]
    pk = _pack_dense_tiles(prep, _PACK_K)
    idx = _range_index_matrix(pk["pstarts"], pk["pcounts"], cap,
                              fill=n).reshape(-1)
    valid = idx < n
    ppos = np.empty(n, np.int32)
    ppos[prep["orig_index"][idx[valid]]] = \
        np.nonzero(valid)[0].astype(np.int32)
    lstarts, lcounts = prep["lstarts"], prep["lcounts"]
    leafof = np.repeat(np.arange(nb, dtype=np.int64), lcounts)
    lane = np.arange(n, dtype=np.int64) - np.repeat(lstarts, lcounts)
    flidx = np.empty(n, np.int32)
    flidx[prep["orig_index"]] = (leafof * cap + lane).astype(np.int32)
    prep["_combine_idx"] = (jnp.asarray(ppos), jnp.asarray(flidx))
    return prep["_combine_idx"]


@partial(jax.jit, static_argnames=("rows", "nb"))
def _combine_device(nearbuf, farleaf_cat, fl_inv, fargrp_cat, fg_inv,
                    ppos, flidx, rows: int, nb: int):
    """Fuse the three legs ON DEVICE and gather to original particle
    order: the caller reads back one (n, rows) array.

    nearbuf: (npt_pad, rows, cap) packed-tile partials (band + remainder
    already summed); farleaf_cat/fargrp_cat: class-chunk concatenations
    in dispatch order with fl_inv/fg_inv the inverse row permutations
    (leaf/group id → cat row); ppos/flidx: per-particle flat lane indices
    from :func:`_ensure_combine_idx`."""
    cap = nearbuf.shape[2]
    nearT = jnp.moveaxis(nearbuf, 1, 2).reshape(-1, rows)
    out = jnp.take(nearT, ppos, axis=0)
    fl = jnp.take(farleaf_cat, fl_inv, axis=0)  # (nb, cap[, 3]) rows
    far = fl.reshape(nb * cap, rows)
    if fargrp_cat is not None:
        fg = jnp.take(fargrp_cat, fg_inv, axis=0)
        far = far + fg.reshape(-1, rows)[:nb * cap]
    out = out + jnp.take(far, flidx, axis=0)
    return out


def _scatter_packed(prep, pk, out_packed, accel: bool):
    """(npt, rows, cap) packed-tile results → per-particle original order."""
    n = prep["n"]
    cap = prep["cap"]
    rows = 3 if accel else 1
    if "_scat" not in pk:
        idx = _range_index_matrix(pk["pstarts"], pk["pcounts"], cap,
                                  fill=n).reshape(-1)
        valid = idx < n
        pk["_scat"] = (valid, prep["orig_index"][idx[valid]])
    valid, final = pk["_scat"]
    flat = (np.moveaxis(np.asarray(out_packed), 1, 2)
            .reshape(-1, rows))
    out = thp_zeros((n, rows), np.float32)
    out[final] = flat[valid]
    return out[:, 0] if rows == 1 else out


def _clamp_w_budget(w_budget: int, wcounts, R: int) -> int:
    """Chunk window budget: ≤ the SMEM cap for the prefetched scalars
    (gf+blk+bits: (R+2) int32 words per window in a ~0.4 MB budget), ≥ the
    largest single group (every chunk must advance ≥ 1 group)."""
    smem_cap = 98_304 // (R + 2)
    wmax = int(wcounts.max()) if len(wcounts) else 0
    if wmax > smem_cap:
        raise ValueError(
            f"a single target group spans {wmax} near-field windows, above "
            f"the SMEM-safe chunk budget {smem_cap} (R={R}); reduce Gn or "
            f"rebuild the tree with a larger leaf_capacity")
    w_budget = min(w_budget, smem_cap)
    return max(min(w_budget, int(wcounts.sum())), wmax, 1)


def _near_packed(prep, kern, interpret, accel, R: int = 4, K: int = 5,
                 w_budget: int = 16384, gcap: int = 4096, mesh=None,
                 accel_form: str = "diff"):
    """Banded near field over DENSE packed tiles (K consecutive leaves per
    cap-lane tile, K×K adjacency bits): ~3× fewer windows than per-leaf
    banded at the same exactness.  Returns PARTICLE-space results
    (original order)."""
    cap = prep["cap"]
    pk = _pack_dense_tiles(prep, K)
    npt = pk["n_ptiles"]
    gf, wblk, bits, wcounts = _build_packed_windows(prep, R, K)
    tgt_blk = pk["ptiles"]
    src_blk = _ptiles_blocked(prep, R, K)
    gcap = min(gcap, npt)
    w_budget = _clamp_w_budget(w_budget, wcounts, R)
    woffs = np.concatenate([[0], np.cumsum(wcounts)]).astype(np.int64)
    ranges = _banded_ranges(woffs, npt, gcap, w_budget)
    pending = _dispatch_banded(ranges, woffs, gf, wblk, bits, tgt_blk,
                               src_blk, kern, accel, interpret, R, 1, gcap,
                               cap, w_budget, K, mesh,
                               accel_form=accel_form)
    rows = 3 if accel else 1
    out_p = thp_zeros((npt, rows, cap), np.float32)
    for s, e, res in pending:
        out_p[s:e] = np.asarray(res)[:e - s]
    return _scatter_packed(prep, pk, out_p, accel)


def _near_pdma(prep, kern, interpret, accel, R: int = 4, K: int = 5,
               w_budget: int = 16384, gcap: int = 4096, nbuf: int = 8,
               mesh=None):
    """Packed near field with a per-tile DMA window pipeline: the grid is
    the packed-TILE axis (one step per dense tile, ~24× fewer steps than
    windows at 10M); each step streams its (8, R·cap) windows through an
    ``nbuf``-deep manual DMA pipeline and accumulates in registers —
    no per-window output buffer, no segment-sum pass, fetches overlap
    compute.  Exactness matches near_engine='packed' (same window lists
    and K×K adjacency bits).  Single-device (mesh ignored)."""
    from .tree_pallas import near_field_pdma_chunk
    cap = prep["cap"]
    pk = _pack_dense_tiles(prep, K)
    npt = pk["n_ptiles"]
    _, wblk_dev, bits_dev, wcounts = _build_packed_windows(prep, R, K)
    woffs = np.concatenate([[0], np.cumsum(wcounts)]).astype(np.int64)
    gcap = min(gcap, npt)
    w_budget = _clamp_w_budget(w_budget, wcounts, R)
    key = ("pdma", R, K, gcap)
    if key not in prep:
        # window offsets and the tile table, padded by one chunk so the
        # device-side dynamic_slice never clamps (a clamped start would
        # misalign tiles against their window offsets)
        w32 = woffs.astype(np.int32)
        woffs_dev = jnp.asarray(
            np.concatenate([w32, np.full(gcap, w32[-1], np.int32)]))
        tgt_all = jnp.concatenate(
            [pk["ptiles"],
             jnp.zeros((gcap, 8, cap), jnp.float32)], axis=0)
        prep[key] = (woffs_dev, tgt_all)
    woffs_dev, tgt_all = prep[key]
    src_blk = _ptiles_blocked(prep, R, K)
    ranges = _banded_ranges(woffs, npt, gcap, w_budget)
    call = partial(near_field_pdma_chunk, kernel=kern, accel=accel,
                   interpret=interpret, R=R, cap=cap, gcap=gcap,
                   W=w_budget, packed_K=K, nbuf=nbuf)
    pending = []
    for gs, ge in ranges:
        res = call(woffs_dev, wblk_dev, bits_dev,
                   jnp.asarray([int(woffs[gs])], np.int32),
                   jnp.asarray([gs, ge - gs], np.int32), tgt_all, src_blk)
        pending.append((gs, ge, res))
    rows = 3 if accel else 1
    out_p = thp_zeros((npt, rows, cap), np.float32)
    for s, e, res in pending:
        out_p[s:e] = np.asarray(res)[:e - s]
    return _scatter_packed(prep, pk, out_p, accel)


def _build_diag_band(prep, K: int, SB: int, nb2: int, R: int,
                     ndev: int = 1):
    """Split packed near pairs into a diagonal band (|source block −
    target block| ≤ nb2 over SB-ptile blocks) + an out-of-band window
    remainder, and build the device tables for the diag engine:

    * ``bits``: flat (npt_pad·NO·SB,) int32 K×K adjacency masks, NO =
      2·nb2+1 offset blocks per target tile;
    * ``tgt``: (npt_pad, 8, cap) packed tiles padded with sentinel tiles
      to a multiple of the chunk size G (full-G device slices never
      clamp);
    * ``src``: (npt_pad//SB + NO−1, 8, SB·cap) blocked tiles with nb2
      sentinel blocks on each side so band fetches never clamp;
    * ``rem``: packed-window arrays for the out-of-band pairs (None when
      everything is in band).

    ``ndev`` > 1 additionally pads npt_pad to a multiple of ndev·G so the
    target tiles / bits shard evenly over a mesh (zero bits rows and
    sentinel tiles contribute exactly nothing); the host mirror stays at
    the ndev-independent base padding so a persisted prep cache serves
    any mesh size.
    """
    key = ("diag", K, SB, nb2, R, ndev)
    if key in prep:
        return prep[key]
    cap = prep["cap"]
    pk = _pack_dense_tiles(prep, K)
    npt = pk["n_ptiles"]
    NO = 2 * nb2 + 1
    # chunk size: the bits chunk must fit the SMEM prefetch budget
    G = max(SB, (98_304 // (NO * SB)) // SB * SB)
    G = min(G, -(-npt // SB) * SB)
    npt_pad0 = -(-npt // G) * G      # host-mirror (single-device) padding
    npt_pad = -(-npt_pad0 // (ndev * G)) * (ndev * G)
    # host-side band structures are mirrored under a PERSISTABLE key so a
    # cache-loaded prep skips the pair-scatter math (~30M-pair repeat /
    # fancy-index / bitwise_or.at on the single host core — the bulk of
    # the round-4 53 s first warm solve); mmap-backed mirrors upload
    # through a THP staging copy
    np_key = ("diag_np", K, SB, nb2, R)
    mirror = prep.get(np_key)
    if mirror is not None:
        bits = mirror["bits"]
        band_frac = float(mirror["band_frac"])
        rem = (None if mirror["rem"] is None
               else _windows_upload(mirror["rem"], npt, R))
    else:
        T, u, St, v = _packed_pairs(prep, K)
        dblk = St // SB - T // SB
        inb = np.abs(dblk) <= nb2
        o_idx = (dblk[inb] + nb2) * SB + St[inb] % SB
        bits = np.zeros(npt_pad0 * NO * SB, np.int32)
        np.bitwise_or.at(
            bits, T[inb] * (NO * SB) + o_idx,
            (np.int32(1) << (u[inb] * K + v[inb])).astype(np.int32))
        band_frac = float(inb.mean()) if len(inb) else 1.0
        rem_host = None
        if not inb.all():
            r = ~inb
            rem_host = _windows_host(T[r], u[r], St[r], v[r],
                                     pk["ptiles"].shape[0], npt, R, K)
        prep[np_key] = {"bits": bits, "rem": rem_host,
                        "band_frac": band_frac}
        rem = (None if rem_host is None
               else _windows_upload(rem_host, npt, R))
    # sentinel-padded target and blocked-source tables (device, one-time)
    sent = np.zeros((1, 8, cap), np.float32)
    sent[0, 0:3] = prep["_sentinel"][:, None]
    sent[0, 5] = -2.0
    sent_dev = jnp.asarray(sent)
    ntp = pk["ptiles"].shape[0]
    tgt_all = pk["ptiles"]
    if npt_pad > ntp:
        tgt_all = jnp.concatenate(
            [tgt_all, jnp.tile(sent_dev, (npt_pad - ntp, 1, 1))], axis=0)
    else:
        tgt_all = tgt_all[:npt_pad]
    blocked = (tgt_all.reshape(npt_pad // SB, SB, 8, cap)
               .transpose(0, 2, 1, 3).reshape(npt_pad // SB, 8, SB * cap))
    spad = (jnp.tile(sent_dev, (nb2 * SB, 1, 1))
            .reshape(nb2, SB, 8, cap).transpose(0, 2, 1, 3)
            .reshape(nb2, 8, SB * cap))
    src_pad = jnp.concatenate([spad, blocked, spad], axis=0)
    bits_dev = jnp.asarray(thp_stage(bits))
    need = npt_pad * NO * SB
    if bits_dev.shape[0] < need:  # mesh padding beyond the host mirror
        bits_dev = jnp.concatenate(
            [bits_dev,
             jnp.zeros(need - bits_dev.shape[0], jnp.int32)])
    out = {"bits": bits_dev, "tgt": tgt_all,
           "src": src_pad, "G": G, "NO": NO, "npt_pad": npt_pad,
           "rem": rem, "band_frac": band_frac}
    prep[key] = out
    return out


def _diag_band_mesh(d, call, mesh, rows: int):
    """Run the diag band sharded over a 1-D mesh: packed target tiles
    (and their bits rows) split contiguously per chip, the blocked source
    table replicated (band fetches reach ±nb2 blocks across shard
    boundaries — a halo exchange saves HBM, not time, at these sizes).
    Each chip unrolls its local G-chunks inside one shard_map body;
    returns the (npt_pad, rows, cap) band partials sharded over tiles.
    Reference parity: the Rust tree's near leg runs on every core
    (``tree.rs:1443-1547``)."""
    G, npt_pad = d["G"], d["npt_pad"]
    fn = _mesh_band_fn(mesh, npt_pad // mesh.devices.size, G,
                       call.keywords["kernel"], call.keywords["accel"],
                       call.keywords["interpret"], call.keywords["K"],
                       call.keywords["SB"], call.keywords["NO"],
                       call.keywords["cap"], call.keywords["accel_form"])
    return fn(d["bits"], d["tgt"], d["src"])


@_lru_cache(maxsize=32)
def _mesh_band_fn(mesh, npt_loc: int, G: int, kernel, accel, interpret,
                  K, SB, NO, cap, accel_form):
    """Cached shard_map-wrapped band body per (mesh, static config) —
    a fresh closure per eval would retrace the whole unrolled chunk
    chain every solve."""
    from jax.sharding import PartitionSpec as P

    from .tree_pallas import near_field_diag_chunk
    ax = mesh.axis_names[0]
    call = partial(near_field_diag_chunk, kernel=kernel, accel=accel,
                   interpret=interpret, K=K, SB=SB, NO=NO, G=G, cap=cap,
                   accel_form=accel_form)

    def body(bits_l, tgt_l, src_full):
        dev = jax.lax.axis_index(ax).astype(jnp.int32)
        outs = []
        for gl in range(0, npt_loc, G):
            gsl = jnp.full((1,), gl, jnp.int32)
            gsg = jnp.reshape(dev * npt_loc + gl, (1,))
            outs.append(call(bits_l, gsl, tgt_l, src_full, gsrc=gsg))
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, 0)

    try:
        from jax import shard_map
        kw = {"check_vma": False}
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
        kw = {"check_rep": False}
    return jax.jit(shard_map(body, mesh=mesh,
                             in_specs=(P(ax), P(ax), P(None)),
                             out_specs=P(ax), **kw))


@jax.jit
def _add_band_prefix(buf, rem_cat):
    """buf[:len(rem_cat)] += rem_cat (static shapes — GSPMD keeps the
    band buffer's tile sharding and reshards the remainder rows to it)."""
    pad = buf.shape[0] - rem_cat.shape[0]
    return buf + jnp.pad(rem_cat, ((0, pad), (0, 0), (0, 0)))


def _near_diag(prep, kern, interpret, accel, K: int = _PACK_K, SB: int = 8,
               nb2: int = 1, R: int = 4, w_budget: int = 16384,
               gcap: int = 4096, mesh=None, accel_form: str = "diff",
               device_out: bool = False):
    """Diagonal-band near field over DENSE packed tiles: the in-band
    pairs run through a FULLY grid-indexed kernel (no per-window
    scalar-prefetch fetch stall — see _near_diag_kernel); out-of-band
    pairs keep the packed-window path.  Exactness matches
    near_engine='packed' (same pair set, split two ways).

    ``nb2`` default from the round-5 same-process 10M sweep (near leg,
    seconds): 13→4.0, 9→3.15, 7→2.73, 5→2.31, 3→1.96, 2→1.75, 1→1.63,
    0→1.62 — band slots are mostly empty compute and the device-resident
    window remainder absorbs the displaced pairs more cheaply; nb2=1
    sits at the flat minimum while keeping self+neighbor blocks (41% of
    pairs) on the stall-free grid-indexed path.

    ``device_out``: return the (≥npt, rows, cap) packed-tile partials as
    a DEVICE array (band chunks staged via :func:`_duset`, remainder
    chunks accumulated via :func:`_duadd`) for the on-device combine —
    per-chunk host readback measured ~10–20 MB/s through the relay,
    ~17 s of a 20 s 10M near leg.

    ``mesh``: shard the band over the mesh's first axis (see
    :func:`_diag_band_mesh`); the window remainder round-robins chunks
    over chips through :func:`_dispatch_banded`."""
    from .tree_pallas import near_field_diag_chunk
    cap = prep["cap"]
    pk = _pack_dense_tiles(prep, K)
    npt = pk["n_ptiles"]
    ndev = mesh.devices.size if mesh is not None else 1
    d = _build_diag_band(prep, K, SB, nb2, R, ndev=ndev)
    G, NO, npt_pad = d["G"], d["NO"], d["npt_pad"]
    call = partial(near_field_diag_chunk, kernel=kern, accel=accel,
                   interpret=interpret, K=K, SB=SB, NO=NO, G=G, cap=cap,
                   accel_form=accel_form)
    rows = 3 if accel else 1
    rem_info = None
    if d["rem"] is not None:
        gf, wblk, bits, wcounts = d["rem"]
        w_budget = _clamp_w_budget(w_budget, wcounts, R)
        woffs = np.concatenate([[0], np.cumsum(wcounts)]).astype(np.int64)
        gcap_r = min(gcap, npt)
        ranges = _banded_ranges(woffs, npt, gcap_r, w_budget)
        rem_info = (gf, wblk, bits, wcounts, woffs, gcap_r, ranges)

    def rem_dispatch(gcap_r, ranges):
        rpend = _dispatch_banded(ranges, rem_info[4], rem_info[0],
                                 rem_info[1], rem_info[2], pk["ptiles"],
                                 _ptiles_blocked(prep, R, K), kern, accel,
                                 interpret, R, 1, gcap_r, cap, w_budget, K,
                                 mesh, accel_form=accel_form)
        _PH["near.rem_chunks"] = len(rpend)
        _PH["near.rem_windows"] = int(rem_info[3].sum())
        return rpend

    if ndev > 1:
        # mesh band: one sharded buffer straight from shard_map; the
        # remainder chunks (already per-chip under _dispatch_banded)
        # concatenate to tile order and add as a static-shape prefix
        t0 = _time.perf_counter()
        buf = _diag_band_mesh(d, call, mesh, rows)
        _PH["near.band_chunks"] = npt_pad // G
        t0 = _ph("near.band_dispatch_s", t0)
        if rem_info is not None:
            rpend = rem_dispatch(rem_info[5], rem_info[6])
            rem_cat = (jnp.concatenate([r for _, _, r in rpend], axis=0)
                       if len(rpend) > 1 else rpend[0][2])
            buf = _add_band_prefix(buf, rem_cat)
            _ph("near.rem_dispatch_s", t0)
        if device_out:
            return buf
        t0 = _time.perf_counter()
        out_p = _read_back(buf)[:npt]
        t0 = _ph("near.band_readback_s", t0)
        out = _scatter_packed(prep, pk, out_p, accel)
        _ph("near.scatter_s", t0)
        return out

    if device_out:
        size = npt_pad
        if rem_info is not None:
            size = max(size, max(gs for gs, _ in rem_info[6])
                       + rem_info[5])
        t0 = _time.perf_counter()
        buf = jnp.zeros((size, rows, cap), jnp.float32)
        for gs in range(0, npt_pad, G):
            gs32 = jnp.asarray([gs], np.int32)
            buf = _duset(buf, call(d["bits"], gs32, d["tgt"], d["src"]),
                         gs32)
        _PH["near.band_chunks"] = npt_pad // G
        t0 = _ph("near.band_dispatch_s", t0)
        if rem_info is not None:
            for s, e, res in rem_dispatch(rem_info[5], rem_info[6]):
                buf = _duadd(buf, res, jnp.asarray([s], np.int32),
                             jnp.asarray([e - s], np.int32))
            _ph("near.rem_dispatch_s", t0)
        return buf

    t0 = _time.perf_counter()
    pending = []
    for gs in range(0, npt_pad, G):
        res = call(d["bits"], jnp.asarray([gs], np.int32), d["tgt"],
                   d["src"])
        pending.append((gs, res))
    _PH["near.band_chunks"] = len(pending)
    t0 = _ph("near.band_dispatch_s", t0)
    _sync_tail(pending[-1][1])
    t0 = _ph("near.band_compute_s", t0)
    out_p = thp_zeros((npt, rows, cap), np.float32)
    for gs, res in pending:
        ge = min(gs + G, npt)
        if ge > gs:
            out_p[gs:ge] = np.asarray(res)[:ge - gs]
    t0 = _ph("near.band_readback_s", t0)
    if rem_info is not None:
        rpend = rem_dispatch(rem_info[5], rem_info[6])
        t0 = _ph("near.rem_dispatch_s", t0)
        _sync_tail(rpend[-1][2])
        t0 = _ph("near.rem_compute_s", t0)
        for s, e, res in rpend:
            out_p[s:e] += np.asarray(res)[:e - s]
        t0 = _ph("near.rem_readback_s", t0)
    out = _scatter_packed(prep, pk, out_p, accel)
    _ph("near.scatter_s", t0)
    return out


def _near_banded(prep, kern, interpret, accel, R: int = 4, Gn: int = 1,
                 w_budget: int = 16384, gcap: int = 4096, mesh=None):
    """Banded union near field (see _build_banded_windows): one grid step
    per aligned R-tile window, evaluated at dense-kernel lane widths
    (S = R·cap source lanes) against one Gn-leaf target group."""
    nb, cap = prep["n_blocks"], prep["cap"]
    ngn = -(-nb // Gn)
    tb = Gn * cap
    gf, wblk, bits, wcounts = _build_banded_windows(prep, R, Gn)
    tgt_blk = _tgt_blocked(prep, Gn)
    src_blk = _tiles_blocked(prep, R)
    # adapt chunk shapes to the problem (padding a toy problem to a 16k-
    # step grid is pure waste, fatal in interpret mode); shapes stay
    # uniform across chunks → one compile per (wb, gcap) pair.  SMEM holds
    # gf+blk (2·wb) and bits (wb·R) int32 words per chunk: ≤ ~0.4 MB.
    gcap = min(gcap, ngn)
    w_budget = _clamp_w_budget(w_budget, wcounts, R)
    woffs = np.concatenate([[0], np.cumsum(wcounts)]).astype(np.int64)
    ranges = _banded_ranges(woffs, ngn, gcap, w_budget)
    pending = _dispatch_banded(ranges, woffs, gf, wblk, bits, tgt_blk,
                               src_blk, kern, accel, interpret, R, Gn, gcap,
                               cap, w_budget, 0, mesh)
    rows = 3 if accel else 1
    out_g = thp_zeros((ngn, rows, tb), np.float32)
    for s, e, res in pending:
        out_g[s:e] = np.asarray(res)[:e - s]
    # (ngn, rows, Gn·cap) → per-leaf-block (nb, rows, cap)
    out = (out_g.reshape(ngn, rows, Gn, cap).transpose(0, 2, 1, 3)
           .reshape(ngn * Gn, rows, cap)[:nb])
    if accel:
        return np.moveaxis(out, 1, 2)  # (nb, cap, 3)
    return out[:, 0, :]


def _build_classes(counts, flat_ids, min_width: int, fill: int, targets,
                   flat_aux=None, payload=None):
    """Partition blocks into power-of-two width classes by list length and
    upload each class's padded list matrix to the device ONCE — built
    straight from the ragged (counts, flat ids) data, never materializing
    a global pad-to-max matrix (at 10M that matrix and its per-class row
    copies dominated prep: ~60 s of _pad_lists alone).

    Eliminates (a) pad-to-global-max compute waste (up to ~9× on the group
    residual lists), (b) per-chunk host→device list shipping — fatal under
    the remote relay — and (c) per-chunk device gathers of target rows.
    ``payload`` (n_items, P) f32 NODE-MAJOR: each class's dense
    (rows, P, w) payload matrix is built by a HOST row gather (contiguous
    16 B rows stream at memcpy speed; measured alternatives: device
    element gathers of the (P, n) transposed payload ran at scattered-4 B
    speed — ~200 s/leg at 10M — and per-class device transposes each paid
    a remote XLA compile).  Per-eval row gathers stay pre-gathered — those
    were the measured eval wall (~0.23 GB/s).

    Round-3 measured prep rules baked in here:
    * the padded list matrix is a contiguous-run GATHER + where (each
      block's list is contiguous in ``flat_ids``) — the old 2-index fancy
      SCATTER ran 54 s on the 10M group lists, this form is seconds;
    * targets are kept as ONE shared device array; each class stores its
      row-selection ``sel`` on device and eval chunks gather rows via the
      jitted :func:`_take_sel_rows` — per-class device takes paid a
      ~2.7 s remote XLA compile EACH (52 s of 10M prep).

    Returns ``(entries, targets_dev)`` with entries
    ``[(width, sel_np, lists_or_payload_dev, sel_dev[, aux_dev]), …]``.

    ``targets`` may be a zero-arg CALLABLE resolved after the class
    gather/upload loop — the background warm thread starts class builds
    before the loader's tile-table upload has produced the target array
    (the callable blocks on it only at the very end)."""
    from concurrent.futures import Future, ThreadPoolExecutor
    counts = np.asarray(counts, np.int64)
    flat_ids = np.asarray(flat_ids, np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    widths = _class_widths(counts, min_width)  # shared with _padded_slots
    out = []
    targets_dev = (targets if callable(targets)
                   or isinstance(targets, jnp.ndarray)
                   else jnp.asarray(np.ascontiguousarray(targets)))
    if len(flat_ids) == 0:  # all-empty lists: gather source = one sentinel
        flat_ids = np.asarray([fill], np.int32)
        flat_aux = None if flat_aux is None else np.zeros(1, np.int32)
    nflat = len(flat_ids)
    flat_aux_np = (None if flat_aux is None
                   else np.asarray(flat_aux, np.int32))
    from . import _native
    native = _native if _native.lib is not None else None
    if payload is not None and (payload.dtype != np.float32
                                or not payload.flags.c_contiguous):
        native = None
    from .tree import _stage

    def _pad_mat(flat, st, ct, w, fillv):
        # padded (ns, w) int32 run matrix: native memcpy rows when
        # available — the numpy lane/idx/where form pays int64 index
        # matrices in freshly-faulted pages (~50 s on 10M group lists)
        ns = len(st)
        if native is not None:
            import ctypes
            i32p = ctypes.POINTER(ctypes.c_int32)
            i64p = ctypes.POINTER(ctypes.c_int64)
            st = np.ascontiguousarray(st)
            ct = np.ascontiguousarray(ct)
            mat = thp_empty((ns, int(w)), np.int32)
            native.lib.pnx_pad_lists_i32(
                flat.ctypes.data_as(i32p), st.ctypes.data_as(i64p),
                ct.ctypes.data_as(i64p), ns, int(w), np.int32(fillv),
                mat.ctypes.data_as(i32p))
            return mat
        lane = np.arange(int(w), dtype=np.int64)
        idx = st[:, None] + lane[None, :]
        valid = lane[None, :] < ct[:, None]
        np.minimum(idx, len(flat) - 1, out=idx)
        return np.where(valid, flat[idx], np.int32(fillv))
    # ONE background upload thread pipelines the relay wire against the
    # host build: the host has a single core, so CPU↔CPU overlap gains
    # nothing, but `jnp.asarray` of a class matrix blocks on the relay
    # transfer (classes.upload measured 10–33 s serialized at 10M) while
    # the next class's native pad/gather sits idle.  Both sides release
    # the GIL (ctypes call / C++ transfer).  Futures resolve at return so
    # the entries keep their documented (…, dev_array, …) shape.
    ex = ThreadPoolExecutor(max_workers=1)
    _upl = ex.submit  # each submit keeps its host buffer alive via args
    try:
        out, targets_dev = _build_classes_inner(
            counts, flat_ids, fill, targets_dev, flat_aux_np, payload,
            widths, starts, native, nflat, _pad_mat, _upl, out, _stage)
    finally:
        # a failed gather/pad or a re-raised upload error must not leave
        # queued futures pinning their large host buffers (ADVICE r4)
        ex.shutdown(wait=True)
    return out, targets_dev


def _build_classes_inner(counts, flat_ids, fill, targets_dev, flat_aux_np,
                         payload, widths, starts, native, nflat, _pad_mat,
                         _upl, out, _stage):
    from concurrent.futures import Future
    for w in np.unique(widths):
        _tw = _time.perf_counter()
        sel = np.nonzero(widths == w)[0]
        c = counts[sel]
        if payload is not None:
            # (ns, P, w): node lanes last — feeds both the pallas far
            # kernel ((1, 4, ts) blocks) and the XLA pre evaluators
            if native is not None:
                import ctypes
                ns, P = len(sel), payload.shape[1]
                st = np.ascontiguousarray(starts[sel])
                ct = np.ascontiguousarray(c)
                tr = thp_empty((ns, P, int(w)), np.float32)
                fp = ctypes.POINTER(ctypes.c_float)
                i64 = ctypes.POINTER(ctypes.c_int64)
                native.lib.pnx_gather_payload_t(
                    payload.ctypes.data_as(fp),
                    flat_ids.ctypes.data_as(
                        ctypes.POINTER(ctypes.c_int32)),
                    st.ctypes.data_as(i64), ct.ctypes.data_as(i64),
                    ns, int(w), P, int(fill),
                    tr.ctypes.data_as(fp))
            else:
                lane = np.arange(int(w), dtype=np.int64)
                idx = starts[sel][:, None] + lane[None, :]
                valid = lane[None, :] < c[:, None]
                np.minimum(idx, nflat - 1, out=idx)
                mat = np.where(valid, flat_ids[idx], np.int32(fill))
                gat = payload[mat]  # (ns, w, P) contiguous row gather
                tr = np.ascontiguousarray(np.moveaxis(gat, 2, 1))
            _stage("classes.gather" if native is not None
                   else "classes.gather_numpy", _tw)
            _tw = _time.perf_counter()
            entry = [int(w), sel, _upl(jnp.asarray, tr),
                     _upl(jnp.asarray, sel.astype(np.int32))]
            _stage("classes.upload_issue", _tw)
        else:
            mat = _pad_mat(flat_ids, starts[sel], c, w, fill)
            _stage("classes.lists", _tw)
            _tw = _time.perf_counter()
            entry = [int(w), sel, _upl(jnp.asarray, mat),
                     _upl(jnp.asarray, sel.astype(np.int32))]
            _stage("classes.upload_issue", _tw)
        if flat_aux_np is not None:
            entry.append(_upl(jnp.asarray,
                              _pad_mat(flat_aux_np, starts[sel], c, w, 0)))
        out.append(entry)
    _tw = _time.perf_counter()
    out = [tuple(x.result() if isinstance(x, Future) else x for x in e)
           for e in out]
    _stage("classes.upload_wait", _tw)
    if callable(targets_dev):  # lazy targets: resolve after the uploads
        targets_dev = targets_dev()
    return out, targets_dev


def _class_chunks(width: int, n_in_class: int, rows_budget: int,
                  multiple: int = 1):
    """Deterministic chunk row count per width → one compiled shape/class.
    ``multiple``: round the chunk row count up to this (batched kernels)."""
    rows = max(1, rows_budget // width)
    # never pad a chunk beyond the class size (budget-width chunks padded
    # a 7.3k-row class to 65k rows — 9× wasted compute).  Callers cap
    # ``multiple`` at the class size, so the post-clamp round-up adds at
    # most multiple-1 < n_in_class rows (a batched-kernel shape need).
    rows = min(rows, n_in_class)
    rows = -(-rows // multiple) * multiple
    for i in range(0, n_in_class, rows):
        yield i, min(n_in_class, i + rows), rows


def _dispatch_banded(ranges, woffs, gf, wblk, bits, tgt_blk, src_blk, kern,
                     accel, interpret, R, Gn, gcap, cap, W, packed_K, mesh,
                     accel_form="diff"):
    """Dispatch banded near-field chunks — single device, or round-robin
    over a mesh via shard_map (chip d takes the d-th chunk of each group
    of ``n_devices``: targets are tree-order contiguous, so chunk→chip
    assignment is a static slice; windows stay chip-local and the window
    arrays/source tiles are replicated).  Returns [(gs, ge, res), …]."""
    from .tree_pallas import near_field_banded_chunk
    call = partial(near_field_banded_chunk, kernel=kern, accel=accel,
                   interpret=interpret, R=R, Gn=Gn, ng_out=gcap, cap=cap,
                   W=W, packed_K=packed_K, accel_form=accel_form)
    pending = []
    if mesh is None or mesh.devices.size == 1:
        for gs, ge in ranges:
            res = call(gf, wblk, bits,
                       jnp.asarray([int(woffs[gs])], np.int32),
                       jnp.asarray([gs], np.int32), tgt_blk, src_blk)
            pending.append((gs, ge, res))
        return pending
    ndev = mesh.devices.size
    fn = _mesh_banded_fn(mesh, kern, accel, interpret, R, Gn, gcap, cap,
                         W, packed_K, accel_form)
    for i in range(0, len(ranges), ndev):
        grp = ranges[i:i + ndev]
        padg = grp + [grp[-1]] * (ndev - len(grp))
        ws = jnp.asarray([int(woffs[gs]) for gs, _ in padg], np.int32)
        gst = jnp.asarray([gs for gs, _ in padg], np.int32)
        res = fn(ws, gst, gf, wblk, bits, tgt_blk, src_blk)
        for d, (gs, ge) in enumerate(grp):
            pending.append((gs, ge, res[d * gcap:d * gcap + (ge - gs)]))
    return pending


@_lru_cache(maxsize=64)
def _mesh_banded_fn(mesh, kernel, accel, interpret, R, Gn, gcap, cap, W,
                    packed_K, accel_form):
    """Cached shard_map-wrapped banded-chunk body per (mesh, static
    config) — a fresh closure per chunk group would retrace every
    dispatch (see :func:`_mesh_band_fn`)."""
    from jax.sharding import PartitionSpec as P

    from .tree_pallas import near_field_banded_chunk
    ax = mesh.axis_names[0]
    call = partial(near_field_banded_chunk, kernel=kernel, accel=accel,
                   interpret=interpret, R=R, Gn=Gn, ng_out=gcap, cap=cap,
                   W=W, packed_K=packed_K, accel_form=accel_form)

    def body(ws, gst, gf_, blk_, bits_, tb_, sb_):
        return call(gf_, blk_, bits_, ws, gst, tb_, sb_)

    try:
        from jax import shard_map
        kw = {"check_vma": False}
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
        kw = {"check_rep": False}
    return jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(ax), P(ax), P(None), P(None), P(None), P(None),
                  P(None)),
        out_specs=P(ax), **kw))


def _banded_ranges(woffs, n_groups: int, gcap: int, w_budget: int):
    """Greedy (gs, ge) group ranges bounded by gcap groups / w_budget
    windows per chunk."""
    ranges = []
    gs = 0
    while gs < n_groups:
        ge = gs
        while (ge < n_groups and ge - gs < gcap
               and woffs[ge + 1] - woffs[gs] <= w_budget):
            ge += 1
        ranges.append((gs, ge))
        gs = ge
    return ranges


def _far_batch_B(tb: int, w: int, n_in_class: int = 1 << 30,
                 order: int = 0) -> int:
    """Rows per grid step for the batched far kernel: aim ≥~0.5 Mpairs of
    compute per step, power of two, ≤16 — and never above the class size
    (chunk rows are rounded up to a multiple of B; a B above the class
    size would pad tiny classes with dead rows).  Order ≥ 2 kernels do
    ~10-30× the per-pair flops and hold more live (tb, ts) intermediates:
    cap the unrolled row batch at 4."""
    ts = min(w, 2048)
    b = max(1, min(16, 524288 // max(tb * ts, 1), max(n_in_class, 1)))
    if order >= 2:
        b = min(b, 4)
    return 1 << (b.bit_length() - 1)


def _far_call(prep, accel, interpret, pallas_far, pre, order, B, tp, li,
              mesh, mxu=False):
    """One far-field chunk evaluation (pallas / XLA-pre / XLA-gather) —
    row-sharded over the mesh when given (node payload replicated)."""
    kind = "pallas" if pallas_far else ("pre" if pre else "gather")
    extra = () if kind != "gather" else (prep["_payload_dev"],)
    if mesh is None or mesh.devices.size == 1:
        raw = _far_fn(kind, accel, interpret, B, mxu, order)(tp, li,
                                                            *extra)
    else:
        raw = _mesh_far_fn(mesh, kind, accel, interpret, B, mxu,
                           order)(tp, li, *extra)
    if pallas_far:
        return jnp.moveaxis(raw, 1, 2) if accel else raw[:, 0, :]
    return raw


def _far_fn(kind: str, accel, interpret, B, mxu, order):
    if kind == "pallas":
        from .tree_pallas import far_payload_batch_eval
        return partial(far_payload_batch_eval, accel=accel,
                       interpret=interpret, B=B, mxu=mxu, order=order)
    if kind == "pre":
        fn = _far_accelerations_pre if accel else _far_potentials_pre
        return partial(fn, order=order)
    return partial(_far_gather_pre, order=order, accel=accel)


@_lru_cache(maxsize=64)
def _mesh_far_fn(mesh, kind: str, accel, interpret, B, mxu, order):
    """Cached shard_map wrapper per (mesh, far config) — see
    :func:`_mesh_band_fn` for why (per-chunk closures retrace)."""
    from jax.sharding import PartitionSpec as P
    ax = mesh.axis_names[0]
    call = _far_fn(kind, accel, interpret, B, mxu, order)
    especs = (P(None),) if kind == "gather" else ()
    try:
        from jax import shard_map
        kw = {"check_vma": False}
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
        kw = {"check_rep": False}
    return jax.jit(shard_map(call, mesh=mesh,
                             in_specs=(P(ax), P(ax), *especs),
                             out_specs=P(ax), **kw))


def _cat_pending(pending, n_rows: int, key, prep):
    """Concatenate far class-chunk results on DEVICE and return the
    inverse row permutation (id → cat row, device int32, cached on the
    prep): the device-combine path's replacement for per-chunk host
    readback + fancy scatter."""
    cat = (jnp.concatenate([r for _, _, r in pending], axis=0)
           if len(pending) > 1 else pending[0][2])
    if key not in prep:
        inv = np.empty(n_rows, np.int32)
        base = 0
        for s_idx, cnt, r in pending:
            inv[s_idx] = base + np.arange(cnt, dtype=np.int32)
            base += r.shape[0]
        prep[key] = jnp.asarray(inv)
    return cat, prep[key]


def _far_eval(prep, accel: bool, interpret: bool, far_chunk: int = 8192,
              row_slice=slice(0, 1), far_engine: str = "auto", mesh=None,
              device_out: bool = False):
    """Chunked far field over the prebuilt width classes.

    ``far_engine``: "auto" uses the row-batched Pallas kernel when the
    pre-gathered monopole payload exists (within noise of XLA at 10M but
    better on width-2048-heavy class mixes); "xla" forces the fused XLA
    pre/gather path; "pallas" requires the payload and raises without it."""
    nb = prep["n_blocks"]
    order = prep["order"]
    tb = prep["cap"]
    pre = prep.get("far_pre", False)
    # interpret-mode pallas pays per-grid-step python cost — tests use XLA
    # interpret-mode pallas pays per-grid-step python cost — auto mode
    # stays on XLA there, but an explicit pallas/mxu request is honored
    pallas_far = (prep.get("far_pallas", False) and far_engine != "xla"
                  and (not interpret
                       or far_engine in ("pallas", "mxu", "mxu_t")))
    # the recentred-matmul r² form is a monopole trick; order ≥ 2 runs the
    # component kernel (the moment polynomials need dx/dy/dz anyway)
    mxu = (far_engine if far_engine in ("mxu", "mxu_t") and order < 2
           else False)
    if far_engine == "pallas" and not pallas_far:
        raise ValueError("far_engine='pallas' needs the pre-gathered "
                         "node payload (within budget) and a compiled "
                         "(non-interpret) backend")
    ndev = mesh.devices.size if mesh is not None else 1
    budget = far_chunk * 1024
    if not pre:
        # gathered (rows, P, w) chunk payload: keep its bytes at the
        # order-0 pre-path level (P/4× more columns → P/4× fewer slots)
        budget = budget * 4 // prep["_payload_np"].shape[1]
    t0 = _time.perf_counter()
    pending = []
    classes, tgt_all = prep["far_classes"]
    for w, sel, li_dev, sel_dev in classes:
        B = _far_batch_B(tb, int(w), len(sel), order)
        for lo, hi, rows in _class_chunks(w, len(sel), budget,
                                          multiple=B * ndev):
            lo32, la32 = np.int32(lo), np.int32(hi - 1)
            res = _far_call(prep, accel, interpret, pallas_far, pre, order,
                            B, _take_sel_rows(tgt_all, sel_dev,
                                              lo32, la32, rows),
                            _take_rows(li_dev, lo32, la32, rows),
                            mesh, mxu=mxu)
            pending.append((sel[lo:hi], hi - lo, res))
    _PH["fleaf.chunks"] = len(pending)
    t0 = _ph("fleaf.dispatch_s", t0)
    if device_out:
        return _cat_pending(pending, nb, ("farinv", far_chunk, ndev), prep)
    if pending:
        _sync_tail(pending[-1][2])
    t0 = _ph("fleaf.compute_s", t0)
    out = thp_zeros((nb, tb, 3) if accel else (nb, tb), np.float32)
    for s_idx, cnt, res in pending:
        out[s_idx] = np.asarray(res)[:cnt]
    _ph("fleaf.readback_s", t0)
    return out


def _group_far_eval(prep, accel: bool, group_chunk: int = 1024,
                    interpret: bool = False,
                    far_engine: str = "auto", mesh=None,
                    device_out: bool = False):
    """Group-level far field → per-leaf-block (nb, cap[, 3]) array.

    Each group's shared node list is gathered once and evaluated against
    G·cap targets — ~G× less node-payload gather volume than per-leaf
    lists (the measured round-1 wall)."""
    ng = prep["n_groups"]
    order = prep["order"]
    G, cap, nb = prep["G"], prep["cap"], prep["n_blocks"]
    pre = prep.get("far_pre", False)
    # interpret-mode pallas pays per-grid-step python cost — auto mode
    # stays on XLA there, but an explicit pallas/mxu request is honored
    pallas_far = (prep.get("far_pallas", False) and far_engine != "xla"
                  and (not interpret
                       or far_engine in ("pallas", "mxu", "mxu_t")))
    mxu = (far_engine if far_engine in ("mxu", "mxu_t") and order < 2
           else False)
    budget = group_chunk * 1024 * 8 // G
    if not pre:
        budget = budget * 4 // prep["_payload_np"].shape[1]
    ndev = mesh.devices.size if mesh is not None else 1
    t0 = _time.perf_counter()
    pending = []
    classes, tgt_all = prep["gfar_classes"]
    for w, sel, li_dev, sel_dev in classes:
        B = _far_batch_B(G * cap, int(w), len(sel), order)
        for lo, hi, rows in _class_chunks(w, len(sel), budget,
                                          multiple=B * ndev):
            lo32, la32 = np.int32(lo), np.int32(hi - 1)
            out = _far_call(prep, accel, interpret, pallas_far, pre, order,
                            B, _take_sel_rows(tgt_all, sel_dev,
                                              lo32, la32, rows),
                            _take_rows(li_dev, lo32, la32, rows),
                            mesh, mxu=mxu)
            pending.append((sel[lo:hi], hi - lo, out))
    _PH["fgrp.chunks"] = len(pending)
    t0 = _ph("fgrp.dispatch_s", t0)
    if device_out:
        return _cat_pending(pending, ng, ("gfarinv", group_chunk, ndev),
                            prep)
    if pending:
        _sync_tail(pending[-1][2])
    t0 = _ph("fgrp.compute_s", t0)
    res = thp_zeros((ng, G * cap, 3) if accel else (ng, G * cap),
                    np.float32)
    for s_idx, cnt, out in pending:
        res[s_idx] = np.asarray(out)[:cnt]
    _ph("fgrp.readback_s", t0)
    res = res.reshape(ng * G, cap, -1)[:nb]
    return res[..., 0] if not accel else res


def _resolve_near_engine(prep, near_engine: str, mesh) -> str:
    """Resolve/validate the near-engine choice (shared by pot/accel).

    auto: the diag band + device-resident combine wins at EVERY measured
    scale on v5e (round-5 same-run, nb2=1, pot/accel seconds — diag vs
    packed: 100k 0.16/0.20 vs 0.46/2.06; 300k 0.21/0.38 vs 1.78/3.74;
    1M 0.57/0.80 vs 2.5/10.9; 10M 3.8/6.5 vs 22/31 r3-era): the packed
    path's per-chunk host readbacks dominate it at every size once the
    single-readback combine exists.  The old ≥65k-leaf threshold
    predates the nb2=1 band and the combine.  Mesh execution shards
    diag (band tiles per chip) / banded / packed (window chunks
    round-robin)."""
    if near_engine == "auto":
        return "diag"
    if near_engine not in ("classes", "dma", "group", "gdma", "banded",
                           "packed", "pdma", "diag"):
        raise ValueError(f"near_engine must be 'classes', 'dma', 'group', "
                         f"'gdma', 'banded', 'packed', 'pdma' or 'diag', "
                         f"got {near_engine!r}")
    if mesh is not None and near_engine not in ("banded", "packed", "diag"):
        raise ValueError("mesh execution supports near_engine 'banded', "
                         f"'packed' or 'diag', got {near_engine!r}")
    if near_engine in ("group", "gdma") and "gnear_counts" not in prep:
        return "classes"  # group lists absent (G=1 prep)
    return near_engine


def _eval_tree_legs(prep, kern, interpret, accel, far_chunk, far_engine,
                    near_engine, mesh, device_out: bool = False):
    """Run the far (leaf + group) and near legs + output scatter, timing
    each leg into :data:`EVAL_INFO` (engine labels + per-leg seconds).

    ``device_out``: return the combined (n[, 3]) result as a DEVICE
    array in original particle order (diag engine only) — TPU-resident
    consumers skip the result readback, the single biggest leg of a 10M
    solve through the relay (pot 1.8–2.6 s, accel 4.5 s of 8.1)."""
    ncols = 3 if accel else 1
    if device_out and near_engine != "diag":
        raise ValueError("device output needs the on-device leg combine "
                         f"(near_engine='diag'), got {near_engine!r}")
    info = {"near_engine": near_engine, "far_engine": far_engine,
            "accel": accel}
    _PH.clear()
    if near_engine == "diag":
        # diag path: all legs stay ON DEVICE and fuse in
        # _combine_device — ONE (n, ncols) readback instead of ~3× the
        # volume in per-chunk partials + host scatters (the relay reads
        # back at ~10–20 MB/s; this was ~17 s of a 20 s 10M near leg).
        # Under a mesh the band shards over packed tiles and the far
        # chunks shard over class rows, so every chip runs the flagship
        # engine (reference parity: all-cores tree, tree.rs:1443-1547).
        t0 = _time.perf_counter()
        fl_cat, fl_inv = _far_eval(prep, accel=accel, interpret=interpret,
                                   far_chunk=far_chunk,
                                   far_engine=far_engine, mesh=mesh,
                                   device_out=True)
        t0 = _ph_leg(info, "t_far_leaf_s", t0)
        fg_cat = fg_inv = None
        if "gfar_classes" in prep:
            fg_cat, fg_inv = _group_far_eval(prep, accel=accel,
                                             interpret=interpret,
                                             far_engine=far_engine,
                                             mesh=mesh, device_out=True)
        t0 = _ph_leg(info, "t_far_group_s", t0)
        nearbuf = _near_diag(prep, kern, interpret, accel=accel,
                             mesh=mesh, device_out=True)
        t0 = _ph_leg(info, "t_near_s", t0)
        ppos, flidx = _ensure_combine_idx(prep)
        dev = _combine_device(nearbuf, fl_cat, fl_inv, fg_cat, fg_inv,
                              ppos, flidx, rows=ncols,
                              nb=prep["n_blocks"])
        t0 = _ph("combine.dispatch_s", t0)
        if device_out:
            info["t_scatter_s"] = round(_PH.get("combine.dispatch_s",
                                                0.0), 3)
            info["phases"] = dict(_PH)
            EVAL_INFO.clear()
            EVAL_INFO.update(info)
            return dev[:, 0] if ncols == 1 else dev
        out = _read_back(dev)  # 4 parallel relay streams ≈ 2.4× one
        _ph("combine.readback_s", t0)
        info["t_scatter_s"] = round(_PH.get("combine.dispatch_s", 0.0)
                                    + _PH.get("combine.readback_s", 0.0), 3)
        info["phases"] = dict(_PH)
        EVAL_INFO.clear()
        EVAL_INFO.update(info)
        return out[:, 0] if ncols == 1 else out
    t0 = _time.perf_counter()
    far_all = _far_eval(prep, accel=accel, interpret=interpret,
                        far_chunk=far_chunk, row_slice=slice(0, ncols),
                        far_engine=far_engine, mesh=mesh)
    info["t_far_leaf_s"] = round(_time.perf_counter() - t0, 3)
    t0 = _time.perf_counter()
    if "gfar_classes" in prep:
        far_all = far_all + _group_far_eval(prep, accel=accel,
                                            interpret=interpret,
                                            far_engine=far_engine,
                                            mesh=mesh)
    info["t_far_group_s"] = round(_time.perf_counter() - t0, 3)
    t0 = _time.perf_counter()
    if near_engine in ("packed", "pdma", "diag"):
        # packed-family near returns particle-space results directly
        fn = {"pdma": _near_pdma, "packed": _near_packed,
              "diag": _near_diag}[near_engine]
        near_p = fn(prep, kern, interpret, accel=accel, mesh=mesh)
        info["t_near_s"] = round(_time.perf_counter() - t0, 3)
        t0 = _time.perf_counter()
        out = near_p + _scatter_leaf_blocks(prep, far_all, ncols)
    else:
        near_fn = {"classes": _near_chunked, "dma": _near_dma,
                   "group": _near_group, "gdma": _near_gdma,
                   "banded": _near_banded}[near_engine]
        kw = {"mesh": mesh} if near_engine == "banded" else {}
        near = near_fn(prep, kern, interpret, accel=accel, **kw)
        info["t_near_s"] = round(_time.perf_counter() - t0, 3)
        t0 = _time.perf_counter()
        total = np.asarray(near) + far_all
        out = _scatter_leaf_blocks(prep, total, ncols)
    info["t_scatter_s"] = round(_time.perf_counter() - t0, 3)
    info["phases"] = dict(_PH)
    EVAL_INFO.clear()
    EVAL_INFO.update(info)
    return out


def tree_potentials_device_pallas(tree: Octree, theta: float = 0.7,
                                  prep=None, interpret: bool = False,
                                  far_chunk: int = 8192,
                                  far_engine: str = "auto",
                                  group_leaves: int = 8,
                                  near_engine: str = "auto",
                                  mesh=None,
                                  out: str = "host") -> np.ndarray:
    """Device tree with the Pallas near-field engine (original order).

    ``near_engine``:
    * "banded" (default) — aligned R-tile windows over the union near
      lists, evaluated at dense-kernel lane widths with grid-indexed
      per-window outputs + sorted segment_sum (v5e: 3.7 s at 1M, 32 s at
      10M with R=4);
    * "classes" (scalar-prefetch width classes — 2.7–3.5 s at 1M but
      73 s at 10M);
    * "dma" / "group" / "gdma" — scattered-fetch variants, 3.1–4.5 s at
      1M (kept for cross-validation; see CLAUDE.md kernel economics).

    ``mesh``: a 1-D :class:`jax.sharding.Mesh` data-parallelizes the
    solve over its devices (targets/windows chip-local, sources
    replicated; reference parity: the Rust tree runs rayon-parallel over
    all cores, ``tree.rs:1443-1547``).  Supported with the diag/banded/
    packed near engines.

    ``out='device'`` returns the (n,) result as a DEVICE array in
    original particle order (diag engine only): TPU-resident consumers
    skip the relay readback — the largest leg of a 10M solve."""
    if out not in ("host", "device"):
        raise ValueError(f"out must be 'host' or 'device', got {out!r}")
    if not interpret and mesh is None and jax.devices()[0].platform == "cpu":
        interpret = True  # pallas kernels need interpret mode off-TPU
    if prep is None:
        prep = prepare_tree_pallas(tree, theta=theta,
                                   group_leaves=group_leaves)
    kern = prep["kernel"] or KERNEL_NONE
    near_engine = _resolve_near_engine(prep, near_engine, mesh)
    _ensure_far_classes(prep)  # rebuilds on cache-loaded preps
    return _eval_tree_legs(prep, kern, interpret, accel=False,
                           far_chunk=far_chunk, far_engine=far_engine,
                           near_engine=near_engine, mesh=mesh,
                           device_out=out == "device")


def tree_accelerations_device_pallas(tree: Octree, theta: float = 0.7,
                                     prep=None, interpret: bool = False,
                                     far_chunk: int = 8192,
                                     far_engine: str = "auto",
                                     group_leaves: int = 8,
                                     near_engine: str = "auto",
                                     mesh=None,
                                     out: str = "host") -> np.ndarray:
    """See :func:`tree_potentials_device_pallas` (``out='device'``
    returns the (n, 3) device array — the accel readback is 3× the pot
    bytes and was 4.5 s of an 8.1 s 10M solve through the relay)."""
    if out not in ("host", "device"):
        raise ValueError(f"out must be 'host' or 'device', got {out!r}")
    if not interpret and mesh is None and jax.devices()[0].platform == "cpu":
        interpret = True  # pallas kernels need interpret mode off-TPU
    if prep is None:
        prep = prepare_tree_pallas(tree, theta=theta,
                                   group_leaves=group_leaves)
    kern = prep["kernel"] or KERNEL_NONE
    near_engine = _resolve_near_engine(prep, near_engine, mesh)
    _ensure_far_classes(prep)  # rebuilds on cache-loaded preps
    if (far_engine == "auto" and not interpret
            and prep.get("far_pallas", False)):
        # transposed-contraction MXU accel bundles: same-run 10M medians
        # leaf 11.9 (mxu) / 10.1 (mxu_t) / 10.3 (pallas diff), group
        # 14.0 / 10.2 / 11.7 — the (3,ts)@(ts,tb) form keeps the result
        # lane dim full.  Potentials stay on the elementwise kernel.
        far_engine = "mxu_t"
    return _eval_tree_legs(prep, kern, interpret, accel=True,
                           far_chunk=far_chunk, far_engine=far_engine,
                           near_engine=near_engine, mesh=mesh,
                           device_out=out == "device")


# ---------------------------------------------------------------------------
# Device-evaluated tree at arbitrary query points (reference capability:
# per-point traversal, tree.rs:1284 / potentials_at_points gravity.rs:447).
# Query points anchor to their nearest leaf (C++ descent); each point tile
# reuses that leaf's near list and its (residual + group) far list.
# ---------------------------------------------------------------------------

def _runs_gather(flat, offs, cnts):
    """Concatenate ``flat[offs[i]:offs[i]+cnts[i]]`` runs, vectorized
    (a per-run Python slice loop cost seconds at 100k query tiles)."""
    cnts = np.asarray(cnts, np.int64)
    total = int(cnts.sum())
    if total == 0:
        return np.zeros(0, flat.dtype)
    base = np.repeat(np.asarray(offs, np.int64), cnts)
    within = (np.arange(total, dtype=np.int64)
              - np.repeat(np.cumsum(cnts) - cnts, cnts))
    return flat[base + within]


def _prepare_at_points(tree: Octree, prep, targets, target_soft=None):
    """Anchor query points to leaves and build their near/far class
    structures.  Round-5 rework: everything comes from the PREP's stored
    lists and vectorized numpy — the first version re-ran
    ``tree.group_lists`` (the 12-25 s host list build!) and 100k-
    iteration Python tile loops on EVERY call (10M sources / 100k
    queries measured 84 s per call, almost all of it here)."""
    cap = prep["cap"]
    G = prep["G"]
    pts = np.ascontiguousarray(np.asarray(targets, np.float64))
    m = pts.shape[0]
    seq = tree.assign_leaves(pts)
    order = np.argsort(seq, kind="stable")
    seq_s = seq[order]
    pts_s = pts[order]
    hs = (np.zeros(m) if target_soft is None
          else np.broadcast_to(np.asarray(target_soft, np.float64),
                               (m,))[order])
    # runs of same leaf → tiles of ≤cap points (vectorized split)
    change = np.nonzero(np.diff(seq_s))[0] + 1
    run_starts = np.concatenate([[0], change]).astype(np.int64)
    run_ends = np.concatenate([change, [m]]).astype(np.int64)
    run_len = run_ends - run_starts
    ntile_per_run = -(-run_len // cap)
    nt = int(ntile_per_run.sum())
    tile_run = np.repeat(np.arange(len(run_starts)), ntile_per_run)
    within = (np.arange(nt, dtype=np.int64)
              - np.repeat(np.cumsum(ntile_per_run) - ntile_per_run,
                          ntile_per_run))
    starts_t = run_starts[tile_run] + within * cap
    ends_t = np.minimum(run_ends[tile_run], starts_t + cap)
    tile_leaf = seq_s[run_starts][tile_run].astype(np.int64)
    sentinel = prep["_sentinel"]
    lane_m = np.arange(cap, dtype=np.int64)[None, :]
    idx = starts_t[:, None] + lane_m
    valid = idx < ends_t[:, None]
    idxc = np.minimum(idx, max(m - 1, 0))
    tiles = thp_zeros((nt, 8, cap), np.float32)
    sf = np.asarray(sentinel, np.float64)
    for c in range(3):
        tiles[:, c, :] = np.where(valid, pts_s[idxc, c], sf[c])
    tiles[:, 4, :] = np.where(valid, hs[idxc], 0.0)
    tiles[:, 5, :] = -5.0  # orig never matches a source → no self-excl
    tidx = np.repeat(np.arange(nt, dtype=np.int64), ends_t - starts_t)
    lane = np.arange(m, dtype=np.int64) - np.repeat(starts_t,
                                                    ends_t - starts_t)
    # near lists: the anchor leaf's list per tile (from the prep)
    near_counts = prep["near_counts"][tile_leaf]
    near_flat = _runs_gather(prep["near_flat"],
                             prep["near_offsets"][tile_leaf], near_counts)
    # far lists: leaf residual + group-shared lists (exact partition),
    # straight from the prep's persisted compact lists — NO tree walk
    ln_c, ln_i = prep["_far_lists"]
    lt_c = ln_c[tile_leaf]
    ln_off = np.concatenate([[0], np.cumsum(ln_c)[:-1]])
    if "_gfar_lists" in prep:
        gn_c, gn_i = prep["_gfar_lists"]
        gn_off = np.concatenate([[0], np.cumsum(gn_c)[:-1]])
        grp = tile_leaf // G
        gt_c = gn_c[grp]
    else:  # G=1 preps carry the full lists in _far_lists
        gn_i = np.zeros(0, np.int32)
        gn_off = gt_c = np.zeros(len(tile_leaf), np.int64)
        grp = tile_leaf
    far_counts = lt_c + gt_c
    f_off = np.concatenate([[0], np.cumsum(far_counts)[:-1]]).astype(
        np.int64)
    far_flat = np.empty(int(far_counts.sum()), np.int32)
    nA = int(lt_c.sum())
    posA = (np.repeat(f_off, lt_c)
            + (np.arange(nA, dtype=np.int64)
               - np.repeat(np.cumsum(lt_c) - lt_c, lt_c)))
    far_flat[posA] = _runs_gather(ln_i, ln_off[tile_leaf], lt_c)
    nB = int(gt_c.sum())
    if nB:
        posB = (np.repeat(f_off + lt_c, gt_c)
                + (np.arange(nB, dtype=np.int64)
                   - np.repeat(np.cumsum(gt_c) - gt_c, gt_c)))
        far_flat[posB] = _runs_gather(gn_i, gn_off[grp], gt_c)
    tiles_dev = jnp.asarray(tiles)
    # far payload (com rows + mass [+ moments], dummy node last) — small
    # host rebuild from the device-resident node tables.  The far field
    # runs the GATHER path (_far_gather_pre: the (n_nodes+1, P) payload
    # stays device-resident, each chunk row-gathers it in-jit): every
    # query tile repeats its anchor GROUP's shared far list, so the
    # pre-gather materialized ~2 GB of duplicated payload rows per call
    # at 10M/100k queries — prepare measured 105 s, almost all of it
    # that gather + upload (round-5).
    com = np.asarray(prep["node_com"], np.float64)
    nmass = np.asarray(prep["node_mass"], np.float64)
    parts = [com, nmass[:, None]]
    if prep["order"] >= 2:
        # COMPACT moment columns (|n| ≥ 2 only) — the payload evaluators
        # read canonical moment index p at row p (M_000 == mass, COM
        # dipoles identically zero; see _far_potentials_pre)
        parts.append(np.asarray(prep["node_moments"], np.float64)[:, 4:])
    payload = np.concatenate(parts, axis=1).astype(np.float32)
    far_classes = _build_classes(far_counts.astype(np.int64), far_flat, 128,
                                 len(nmass) - 1, tiles_dev)
    near_classes = _build_classes(near_counts.astype(np.int64),
                                  near_flat.astype(np.int32), 64,
                                  prep["n_blocks"], tiles_dev)
    mini = {
        "n_blocks": nt, "order": prep["order"], "kernel": prep["kernel"],
        "cap": cap,
        "far_pre": False, "far_pallas": False,
        "_payload_np": payload,
        "_payload_dev": jnp.asarray(payload),
        "far_classes": far_classes,
        "node_com": prep["node_com"], "node_mass": prep["node_mass"],
        "node_moments": prep["node_moments"],
    }
    return {"mini": mini, "near_classes": near_classes, "nt": nt,
            "cap": cap, "order_idx": order, "tidx": tidx, "lane": lane,
            "m": m}


def _near_at_points(ap, prep, kern, interpret, accel, mesh=None):
    from .tree_pallas import near_field_eval
    nt, cap = ap["nt"], ap["cap"]
    rows_used = 3 if accel else 1
    out = thp_zeros((nt, rows_used, cap), np.float32)
    budget = 100_000
    ndev = mesh.devices.size if mesh is not None else 1
    pending = []
    classes, tt_all = ap["near_classes"]
    for w, sel, li_dev, sel_dev in classes:
        call = partial(near_field_eval, kernel=kern, accel=accel,
                       interpret=interpret, k=min(4, w))
        for lo, hi, rows in _class_chunks(w, len(sel), budget,
                                          multiple=ndev):
            lo32, la32 = np.int32(lo), np.int32(hi - 1)
            li = _take_rows(li_dev, lo32, la32, rows)
            tp = _take_sel_rows(tt_all, sel_dev, lo32, la32, rows)
            if ndev == 1:
                res = call(li, tp, prep["tiles"])
            else:
                # query tiles + their lists row-shard over the mesh,
                # source leaf tiles replicated (reference parity: the
                # at-points traversal runs on every core — tree.rs:1284,
                # gravity.rs:447)
                res = _mesh_at_points_fn(mesh, kern, accel, interpret,
                                         min(4, w))(li, tp, prep["tiles"])
            # read back ONLY the used rows: the kernel emits (rows, 8,
            # cap) but pot needs row 0 / accel rows 0:3 — the full-tile
            # readback was 8×/2.7× the wire (10M-source at-points
            # measured 84 s per 100k queries, mostly this)
            pending.append((sel[lo:hi], hi - lo,
                            res[:, :rows_used, :]))
    for s_idx, cnt, res in pending:
        out[s_idx] = np.asarray(res)[:cnt]
    if accel:
        return np.moveaxis(out, 1, 2)
    return out[:, 0, :]


@_lru_cache(maxsize=64)
def _mesh_at_points_fn(mesh, kernel, accel, interpret, k):
    """Cached shard_map wrapper for the at-points near chunks (see
    :func:`_mesh_band_fn` — per-chunk closures retrace)."""
    from jax.sharding import PartitionSpec as P

    from .tree_pallas import near_field_eval
    ax = mesh.axis_names[0]
    call = partial(near_field_eval, kernel=kernel, accel=accel,
                   interpret=interpret, k=k)
    try:
        from jax import shard_map
        kw = {"check_vma": False}
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
        kw = {"check_rep": False}
    return jax.jit(shard_map(call, mesh=mesh,
                             in_specs=(P(ax), P(ax), P(None)),
                             out_specs=P(ax), **kw))


def _at_points_eval(tree: Octree, targets, prep=None, theta: float = 0.7,
                    target_soft=None, interpret: bool = False,
                    accel: bool = False, group_leaves: int = 8,
                    mesh=None):
    if not interpret and mesh is None and jax.devices()[0].platform == "cpu":
        interpret = True  # pallas kernels need interpret mode off-TPU
    if prep is None:
        prep = prepare_tree_pallas(tree, theta=theta,
                                   group_leaves=group_leaves)
    kern = prep["kernel"] or KERNEL_NONE
    ap = _prepare_at_points(tree, prep, targets, target_soft=target_soft)
    mini = dict(ap["mini"])
    if interpret:
        mini["far_pallas"] = False
    far = _far_eval(mini, accel=accel, interpret=interpret, mesh=mesh)
    near = _near_at_points(ap, prep, kern, interpret, accel, mesh=mesh)
    tot = near + far
    out_sorted = tot[ap["tidx"], ap["lane"]]
    out = thp_zeros(out_sorted.shape, out_sorted.dtype)
    out[ap["order_idx"]] = out_sorted
    return out


def tree_potentials_at_points_device(tree: Octree, targets, prep=None,
                                     theta: float = 0.7, target_soft=None,
                                     interpret: bool = False,
                                     group_leaves: int = 8,
                                     mesh=None) -> np.ndarray:
    """BH potentials at arbitrary query points on the device engines.

    ``mesh``: a 1-D :class:`jax.sharding.Mesh` shards the anchored query
    tiles (near lists + far class rows) over its devices — the same
    decomposition as the self-set path (reference: parallel at-points
    traversal, ``tree.rs:1284`` / ``gravity.rs:447``)."""
    return _at_points_eval(tree, targets, prep=prep, theta=theta,
                           target_soft=target_soft, interpret=interpret,
                           accel=False, group_leaves=group_leaves,
                           mesh=mesh)


def tree_accelerations_at_points_device(tree: Octree, targets, prep=None,
                                        theta: float = 0.7,
                                        target_soft=None,
                                        interpret: bool = False,
                                        group_leaves: int = 8,
                                        mesh=None) -> np.ndarray:
    """BH accelerations at arbitrary query points on the device engines.
    ``mesh``: see :func:`tree_potentials_at_points_device`."""
    return _at_points_eval(tree, targets, prep=prep, theta=theta,
                           target_soft=target_soft, interpret=interpret,
                           accel=True, group_leaves=group_leaves,
                           mesh=mesh)


def tree_accelerations_device(tree: Octree, theta: float = 0.7,
                              block_size: int = 0, prep=None,
                              dtype=jnp.float32,
                              chunk_blocks: int = 2048) -> np.ndarray:
    """Barnes–Hut accelerations on the device (multipoles per tree order)."""
    if prep is None:
        prep = prepare_tree_device(tree, theta=theta,
                                   block_size=block_size, dtype=dtype)
    kern = prep["kernel"] if prep["kernel"] is not None else KERNEL_NONE
    order = prep["order"]

    def eval_fn(tp, ts, to, ni, li):
        return _eval_accelerations(tp, ts, to, ni, li, prep["node_com"],
                                   prep["node_mass"], prep["node_moments"],
                                   prep["leaf_pos"], prep["leaf_mass"],
                                   prep["leaf_soft"], prep["leaf_orig"],
                                   kernel=(kern or KERNEL_NONE), order=order)

    acc_blocks = _chunked_eval(prep, eval_fn, chunk_blocks, ())
    return _scatter_out(prep, acc_blocks, 3)
