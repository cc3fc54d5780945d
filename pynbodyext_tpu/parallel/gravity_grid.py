"""2-D mesh force decomposition for the direct sum.

Complements the ring schedule (:mod:`.gravity_ring`) with the classic 2-D
block decomposition: on a (Dp × Dq) mesh, targets are sharded over the
``p`` axis and sources over the ``q`` axis, so device (i, j) computes the
(target-block i) × (source-block j) tile with the Pallas kernel and partial
results are ``psum``-reduced over the ``q`` axis.

Trade-offs vs the ring:

* no sequential ring steps — one kernel launch + one reduction, better for
  small N per chip where ring-step latency dominates;
* each chip holds 1/Dq of the sources instead of streaming all of them,
  so per-chip working memory drops by Dq;
* communication = one psum of the target shard over q (vs Dp−1 ppermutes
  of source blocks); on a 2-D torus both ride ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..gravity.kernels import KERNEL_NONE
from ..gravity.pallas_direct import _direct_call, pack_particles

__all__ = ["make_mesh_2d", "grid_direct_potentials",
           "grid_direct_accelerations"]


def make_mesh_2d(dp: int, dq: int, axis_names=("p", "q")) -> Mesh:
    devs = jax.devices()
    if dp * dq > len(devs):
        raise ValueError(f"need {dp * dq} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:dp * dq]).reshape(dp, dq), axis_names)


def _shard_map_compat(fn, mesh, in_specs, out_specs):
    try:
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except TypeError:
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def _grid(pos, masses, softenings, mesh: Mesh, kernel: str, accel: bool,
          tm: int, ts: int, interpret: bool):
    ax_p, ax_q = mesh.axis_names
    dp = mesh.shape[ax_p]
    dq = mesh.shape[ax_q]
    pos = jnp.asarray(pos, jnp.float32)
    n = pos.shape[0]
    m_arr = (jnp.ones(n, jnp.float32) if masses is None
             else jnp.asarray(masses, jnp.float32))
    h_arr = (jnp.zeros(n, jnp.float32) if softenings is None
             else jnp.broadcast_to(jnp.asarray(softenings, jnp.float32),
                                   (n,)))
    # pad to a common multiple so both shardings are even
    lcm = int(np.lcm(dp, dq))
    n_pad = -(-n // lcm) * lcm
    if n_pad != n:
        pos = jnp.pad(pos, ((0, n_pad - n), (0, 0)), constant_values=1e15)
        m_arr = jnp.pad(m_arr, (0, n_pad - n))
        h_arr = jnp.pad(h_arr, (0, n_pad - n))
    Lp = n_pad // dp   # targets per row-group
    Lq = n_pad // dq   # sources per col-group
    tm_eff = min(tm, Lp) if Lp >= 8 else Lp
    ts_eff = min(ts, Lq) if Lq >= 8 else Lq
    out_rows = 8 if accel else 1

    def local_fn(tgt_pos, tgt_m, tgt_h, src_pos, src_m, src_h):
        i = jax.lax.axis_index(ax_p)
        j = jax.lax.axis_index(ax_q)
        tgt_pack, _ = pack_particles(tgt_pos, tgt_m, tgt_h, tile=tm_eff)
        src_pack, _ = pack_particles(src_pos, src_m, src_h, tile=ts_eff)
        partial = _direct_call(src_pack, tgt_pack, kernel, True,
                               tm_eff, ts_eff, accel=accel,
                               interpret=interpret,
                               tgt_offset=i * Lp, src_offset=j * Lq)
        total = jax.lax.psum(partial, ax_q)
        if accel:
            return total[0:3, :Lp].T
        return total[0, :Lp]

    out_spec = P(ax_p, None) if accel else P(ax_p)
    fn = _shard_map_compat(
        local_fn, mesh,
        in_specs=(P(ax_p, None), P(ax_p), P(ax_p),
                  P(ax_q, None), P(ax_q), P(ax_q)),
        out_specs=out_spec)
    out = fn(pos, m_arr, h_arr, pos, m_arr, h_arr)
    return out[:n]


def grid_direct_potentials(pos, masses=None, softenings=None, *,
                           mesh: Mesh, kernel: str = KERNEL_NONE,
                           tm: int = 256, ts: int = 1024,
                           interpret: bool = False):
    """Self-set potentials via the 2-D block decomposition + psum."""
    return _grid(pos, masses, softenings, mesh, kernel, accel=False,
                 tm=tm, ts=ts, interpret=interpret)


def grid_direct_accelerations(pos, masses=None, softenings=None, *,
                              mesh: Mesh, kernel: str = KERNEL_NONE,
                              tm: int = 256, ts: int = 1024,
                              interpret: bool = False):
    """Self-set accelerations via the 2-D block decomposition + psum."""
    return _grid(pos, masses, softenings, mesh, kernel, accel=True,
                 tm=tm, ts=ts, interpret=interpret)
