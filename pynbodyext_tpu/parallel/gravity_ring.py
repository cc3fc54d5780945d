"""Ring-scheduled multi-chip direct-sum gravity.

The O(N²) all-pairs interaction is structurally identical to unmasked
attention (every target attends to every source with weight m/r), so the
multi-chip schedule is exactly ring attention (SURVEY.md §2.7/§5): target
particles are sharded across the mesh; each step every chip runs the Pallas
tile kernel (:mod:`..gravity.pallas_direct`) for its resident targets
against the currently-held source block, then rotates the block to its ring
neighbour with ``lax.ppermute`` over ICI.  After ``n_devices`` steps every
target has accumulated every source.

Communication: one (8 × N/D) f32 block per step — bandwidth N·32 B per chip
per full solve, fully overlapped by XLA with the O(N²/D) compute.

Self-interaction stays index-exact: the Pallas kernel receives the global
offsets of both tiles (SMEM scalars), so the diagonal is excluded only on
the step where a chip holds its own block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..gravity.kernels import KERNEL_NONE
from ..gravity.pallas_direct import _direct_call, pack_particles
from .mesh import PARTICLE_AXIS

__all__ = ["ring_direct_potentials", "ring_direct_accelerations"]


def _ring(pos, masses, softenings, mesh: Mesh, kernel: str, accel: bool,
          tm: int, ts: int, interpret: bool, axis_name: str,
          targets=None):
    n_dev = mesh.shape[axis_name]
    pos = jnp.asarray(pos, jnp.float32)
    n = pos.shape[0]
    m_arr = (jnp.ones(n, jnp.float32) if masses is None
             else jnp.asarray(masses, jnp.float32))
    h_arr = (jnp.zeros(n, jnp.float32) if softenings is None
             else jnp.broadcast_to(jnp.asarray(softenings, jnp.float32),
                                   (n,)))
    # pad so every shard holds the same count L (padded mass 0 ⇒ inert)
    L = -(-n // n_dev)
    n_pad = L * n_dev
    if n_pad != n:
        pos = jnp.pad(pos, ((0, n_pad - n), (0, 0)), constant_values=1e15)
        m_arr = jnp.pad(m_arr, (0, n_pad - n))
        h_arr = jnp.pad(h_arr, (0, n_pad - n))

    self_set = targets is None
    if self_set:
        tgt, mt, Lt = pos, n, L
    else:
        tgt = jnp.asarray(targets, jnp.float32)
        mt = tgt.shape[0]
        Lt = -(-mt // n_dev)
        if Lt * n_dev != mt:
            tgt = jnp.pad(tgt, ((0, Lt * n_dev - mt), (0, 0)),
                          constant_values=1e15)

    tm_eff = min(tm, Lt) if Lt >= 8 else Lt
    ts_eff = min(ts, L) if L >= 8 else L
    out_rows = 8 if accel else 1

    def local_fn(tgt_l, pos_l, m_l, h_l):
        my = jax.lax.axis_index(axis_name)
        tgt_pack, _ = pack_particles(
            tgt_l, m_l if self_set else None,
            h_l if self_set else None, tile=tm_eff)
        blk0, _ = pack_particles(pos_l, m_l, h_l, tile=ts_eff)
        m_pad = tgt_pack.shape[1]
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

        def step(s, carry):
            blk, acc = carry
            owner = (my - s) % n_dev
            partial = _direct_call(blk, tgt_pack, kernel, self_set,
                                   tm_eff, ts_eff, accel=accel,
                                   interpret=interpret,
                                   tgt_offset=my * Lt, src_offset=owner * L)
            acc = acc + partial
            blk = jax.lax.cond(
                s < n_dev - 1,
                lambda b: jax.lax.ppermute(b, axis_name, perm),
                lambda b: b,
                blk)
            return blk, acc

        _, acc = jax.lax.fori_loop(
            0, n_dev, step,
            (blk0, jnp.zeros((out_rows, m_pad), jnp.float32)))
        if accel:
            return acc[0:3, :Lt].T  # (Lt, 3)
        return acc[0, :Lt]

    out_spec = P(axis_name, None) if accel else P(axis_name)
    in_specs = (P(axis_name, None), P(axis_name, None), P(axis_name),
                P(axis_name))
    try:
        fn = shard_map(local_fn, mesh=mesh, in_specs=in_specs,
                       out_specs=out_spec, check_vma=False)
    except TypeError:  # older jax: check_rep instead of check_vma
        fn = shard_map(local_fn, mesh=mesh, in_specs=in_specs,
                       out_specs=out_spec, check_rep=False)
    out = fn(tgt, pos, m_arr, h_arr)
    return out[:mt]


def ring_direct_potentials(pos, masses=None, softenings=None, *,
                           mesh: Mesh, kernel: str = KERNEL_NONE,
                           targets=None, tm: int = 256, ts: int = 1024,
                           interpret: bool = False,
                           axis_name: str = PARTICLE_AXIS):
    """Gravitational potentials, sharded over the mesh ring.

    ``targets=None`` → self-set (diagonal excluded, pair softening
    h = max(hᵢ, hⱼ)); otherwise arbitrary target points sharded over the
    mesh with sources rotating (source softening only — matching the
    single-chip at-points convention and the reference
    ``direct.rs:443,526,587``)."""
    return _ring(pos, masses, softenings, mesh, kernel, accel=False,
                 tm=tm, ts=ts, interpret=interpret, axis_name=axis_name,
                 targets=targets)


def ring_direct_accelerations(pos, masses=None, softenings=None, *,
                              mesh: Mesh, kernel: str = KERNEL_NONE,
                              targets=None, tm: int = 256, ts: int = 1024,
                              interpret: bool = False,
                              axis_name: str = PARTICLE_AXIS):
    """Gravitational accelerations, sharded over the mesh ring
    (``targets`` as in :func:`ring_direct_potentials`)."""
    return _ring(pos, masses, softenings, mesh, kernel, accel=True,
                 tm=tm, ts=ts, interpret=interpret, axis_name=axis_name,
                 targets=targets)
