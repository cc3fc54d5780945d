"""Pure-jnp blocked O(N²) direct sums — the cross-validation reference.

Mirrors the role of the Rust ``direct.rs`` entry points (8 of them:
potentials/accelerations × self-set/at-points × bare/softened,
``direct.rs:115-658``) with the reference's conventions:

* self-set: pair softening h = max(hᵢ, hⱼ), self-interaction excluded by
  index (``direct.rs:402,426``);
* at arbitrary target points: h = hⱼ (source softening, ``direct.rs:560``);
* a⃗ᵢ = Σⱼ mⱼ (r⃗ⱼ − r⃗ᵢ) g(r;h).

Blocked over targets with ``lax.map`` so memory stays at
``block × N`` instead of ``N²``.  Used to validate the Pallas kernels
(tree(θ=0)-vs-direct discipline of ``gravity_tests.rs``), and as the
fallback path on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .kernels import (KERNEL_NONE, kernel_accel_factor,
                      kernel_potential_per_unit_mass)

__all__ = ["direct_potentials_ref", "direct_accelerations_ref"]

_TINY2 = 1e-38


def _pad_to(x, n, fill=0.0):
    pad = n - x.shape[0]
    if pad == 0:
        return x
    width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, width, constant_values=fill)


def _block_map(fn, n_targets: int, block: int):
    """Apply fn(start_index) over target blocks, concatenating results."""
    nb = -(-n_targets // block)
    idx = jnp.arange(nb) * block
    out = jax.lax.map(fn, idx)
    return out


@partial(jax.jit, static_argnames=("kernel", "self_set", "block"))
def _potentials_impl(pos, mass, soft, targets, t_soft, kernel: str,
                     self_set: bool, block: int):
    n = pos.shape[0]
    m_tot = targets.shape[0]
    nb = -(-m_tot // block)
    m_pad = nb * block
    targets_p = _pad_to(targets, m_pad, fill=jnp.inf)
    t_soft_p = _pad_to(t_soft, m_pad)
    t_idx_p = jnp.arange(m_pad)

    def one_block(start):
        tgt = jax.lax.dynamic_slice(targets_p, (start, 0), (block, 3))
        th = jax.lax.dynamic_slice(t_soft_p, (start,), (block,))
        ti = jax.lax.dynamic_slice(t_idx_p, (start,), (block,))
        d = pos[None, :, :] - tgt[:, None, :]          # (B, N, 3)
        r = jnp.sqrt(jnp.sum(d * d, axis=-1) + _TINY2)  # (B, N)
        if self_set:
            h = jnp.maximum(th[:, None], soft[None, :])
        else:
            h = jnp.broadcast_to(soft[None, :], r.shape)
        phi = kernel_potential_per_unit_mass(kernel, r, h)
        if self_set:
            same = ti[:, None] == jnp.arange(n)[None, :]
            phi = jnp.where(same, 0.0, phi)
        return jnp.sum(phi * mass[None, :], axis=-1)

    out = _block_map(one_block, m_tot, block).reshape(m_pad)
    return out[:m_tot]


@partial(jax.jit, static_argnames=("kernel", "self_set", "block"))
def _accelerations_impl(pos, mass, soft, targets, t_soft, kernel: str,
                        self_set: bool, block: int):
    n = pos.shape[0]
    m_tot = targets.shape[0]
    nb = -(-m_tot // block)
    m_pad = nb * block
    targets_p = _pad_to(targets, m_pad, fill=jnp.inf)
    t_soft_p = _pad_to(t_soft, m_pad)
    t_idx_p = jnp.arange(m_pad)

    def one_block(start):
        tgt = jax.lax.dynamic_slice(targets_p, (start, 0), (block, 3))
        th = jax.lax.dynamic_slice(t_soft_p, (start,), (block,))
        ti = jax.lax.dynamic_slice(t_idx_p, (start,), (block,))
        d = pos[None, :, :] - tgt[:, None, :]          # source − target
        r = jnp.sqrt(jnp.sum(d * d, axis=-1) + _TINY2)
        if self_set:
            h = jnp.maximum(th[:, None], soft[None, :])
        else:
            h = jnp.broadcast_to(soft[None, :], r.shape)
        g = kernel_accel_factor(kernel, r, h)
        if self_set:
            same = ti[:, None] == jnp.arange(n)[None, :]
            g = jnp.where(same, 0.0, g)
        w = g * mass[None, :]
        return jnp.sum(d * w[:, :, None], axis=1)      # (B, 3)

    out = _block_map(one_block, m_tot, block).reshape(m_pad, 3)
    return out[:m_tot]


def _prep(pos, masses, softenings, targets, target_softenings):
    pos = jnp.asarray(pos)
    n = pos.shape[0]
    dtype = pos.dtype
    mass = (jnp.ones(n, dtype) if masses is None
            else jnp.asarray(masses, dtype))
    soft = (jnp.zeros(n, dtype) if softenings is None
            else jnp.broadcast_to(jnp.asarray(softenings, dtype), (n,)))
    if targets is None:
        tgt, t_soft, self_set = pos, soft, True
    else:
        tgt = jnp.asarray(targets, dtype)
        t_soft = (jnp.zeros(tgt.shape[0], dtype) if target_softenings is None
                  else jnp.broadcast_to(
                      jnp.asarray(target_softenings, dtype),
                      (tgt.shape[0],)))
        self_set = False
    return pos, mass, soft, tgt, t_soft, self_set


def direct_potentials_ref(pos, masses=None, softenings=None, targets=None,
                          target_softenings=None, kernel: str = KERNEL_NONE,
                          block: int = 1024):
    """O(N·M) potentials; self-set when ``targets`` is None."""
    pos, mass, soft, tgt, t_soft, self_set = _prep(
        pos, masses, softenings, targets, target_softenings)
    return _potentials_impl(pos, mass, soft, tgt, t_soft, kernel,
                            self_set, min(block, tgt.shape[0]))


def direct_accelerations_ref(pos, masses=None, softenings=None, targets=None,
                             target_softenings=None,
                             kernel: str = KERNEL_NONE, block: int = 1024):
    """O(N·M) accelerations; self-set when ``targets`` is None."""
    pos, mass, soft, tgt, t_soft, self_set = _prep(
        pos, masses, softenings, targets, target_softenings)
    return _accelerations_impl(pos, mass, soft, tgt, t_soft, kernel,
                               self_set, min(block, tgt.shape[0]))
