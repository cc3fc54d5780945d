"""Centering primitives: center-of-mass, shrinking-sphere, potential minimum.

The reference outsources these to ``pynbody.analysis.halo``
(``shrink_sphere_center``/``hybrid_center``, used by ``CenPos`` at
``properties/generic.py:49-57``).  Here they are implemented natively as
bounded ``lax.while_loop`` masked reductions (SURVEY.md §7 "Hard parts:
shrinking-sphere center").

Numerical note: sums run in the input dtype; to keep f32 COM accurate over
~1e7 particles at large coordinate offsets, reductions are performed on
positions relative to the running center (conditioning trick), which keeps
the summands small.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["center_of_mass", "shrink_sphere_center", "potential_center",
           "hybrid_center"]


@jax.jit
def center_of_mass(pos, weights=None, mask=None, ref=None):
    """Weighted mean position.  ``ref`` recenters summands for conditioning."""
    n = pos.shape[0]
    w = jnp.ones(n, dtype=pos.dtype) if weights is None else weights
    if mask is not None:
        w = jnp.where(mask, w, 0.0)
    if ref is None:
        ref = jnp.zeros(pos.shape[-1], dtype=pos.dtype)
    wsum = jnp.sum(w)
    rel = pos - ref
    com_rel = jnp.sum(rel * w[:, None], axis=0) / jnp.where(wsum == 0, 1.0, wsum)
    return ref + com_rel


def _block_subsample(x, s: int, block: int = 8192):
    """~1/s of the rows as contiguous runs of ``block//s`` every ``block``.

    Row-strided slicing (``x[::8]``) measured ~5× slower than a full pass
    on the v5e (small-stride DMA); contiguous runs stream at full bandwidth
    while still sampling the whole array.
    """
    n = x.shape[0]
    nb = n // block
    if nb < 8:
        return x[::s]
    keep = max(1, block // s)
    q = x[:nb * block].reshape((nb, block) + x.shape[1:])[:, :keep]
    return q.reshape((nb * keep,) + x.shape[1:])


def _ssc_loop_t(pos3, w, center0, r0, shrink_factor: float,
                min_particles: int, max_iter: int):
    """Shrinking loop over TRANSPOSED (3, n) positions.

    (n, 3) bodies run ~2.2 ms/iteration at 10M on the v5e — every
    elementwise op works on 3-lane arrays (3/128 lane utilization);
    lane-major (3, n) ops bring a full pass to ~0.3 ms.  (A pallas pass
    kernel measured WORSE inside the loop: pallas dispatch under
    lax.while_loop costs ~1.3 ms/iteration on this runtime, and the
    loop itself has a ~0.27 ms/iteration floor regardless of body.)"""
    active = w > 0

    def cond(state):
        center, r, n_in, it = state
        return jnp.logical_and(n_in > min_particles, it < max_iter)

    def body(state):
        center, r, n_in, it = state
        rel = pos3 - center[:, None]
        d2 = jnp.sum(rel * rel, axis=0)
        inside = jnp.logical_and(active, d2 < r * r)
        w_in = jnp.where(inside, w, 0.0)
        wsum = jnp.sum(w_in)
        com = center + jnp.sum(rel * w_in[None, :], axis=1) \
            / jnp.where(wsum == 0, 1.0, wsum)
        n_new = jnp.sum(inside)
        ok = n_new > min_particles
        new_center = jnp.where(ok, com, center)
        return (new_center, r * shrink_factor, n_new, it + 1)

    n_init = jnp.sum(active)
    center, r, n_in, _ = jax.lax.while_loop(
        cond, body, (center0, r0, n_init, jnp.int32(0)))
    return center, r


@partial(jax.jit, static_argnames=("min_particles", "max_iter",
                                   "coarse_stride", "coarse_backoff"))
def shrink_sphere_center(pos, weights=None, mask=None,
                         shrink_factor: float = 0.7,
                         min_particles: int = 100,
                         max_iter: int = 200,
                         coarse_stride: int = 1,
                         coarse_backoff: int = 5):
    """Shrinking-sphere center (Power et al. 2003), pynbody-compatible loop.

    Start from the (masked) COM with the bounding-sphere radius, then
    repeatedly: recenter on the COM of particles inside the sphere, shrink
    the radius by ``shrink_factor``, stop when fewer than ``min_particles``
    remain inside.

    Performance: each ``while_loop`` iteration is ONE fused pass over the
    positions — the inside-mask, its count, and the masked COM come out of
    the same read.  The loop is HBM-bandwidth bound, so at 10⁷ particles one
    pass per iteration (vs a naive two) halves the runtime.

    ``coarse_stride > 1`` enables the coarse-to-fine stride ladder: the
    loop first converges on every ``coarse_stride``-th particle, then
    repeatedly drops the stride 8× and re-converges from the previous
    stage's radius backed off ``coarse_backoff`` shrink steps, ending with
    a full-resolution polish.  Because every stage starts from the same
    full-resolution ``r0`` and only ever multiplies by ``shrink_factor``,
    all radii lie on the exact loop's geometric grid ``r0·f^k`` — the
    final stage re-runs the exact loop's own last iterations, so only a
    handful of full passes over N remain.  (An explicit compaction stage
    was measured SLOWER on the v5e: cumsum/scatter/gather at 10M each cost
    ~37 ms — more than the full passes they would save.)

    ``coarse_backoff`` default 5: on the adversarial clumpy fixture
    (satellite + subclumps, ``make_adversarial_galaxy``) backoff 3 with
    stride 8 converged 0.012 kpc (2e-5·r0) off the exact loop; backoff 5
    is bit-exact there at the cost of ~2 extra full passes (~0.6 ms at
    10M) per stage (``tests/test_golden_adversarial.py``).

    Validated against the exact loop on seeded galaxies
    (``tests/test_center_modes.py``).
    """
    n = pos.shape[0]
    w = jnp.ones(n, dtype=pos.dtype) if weights is None else weights
    if mask is not None:
        w = jnp.where(mask, w, 0.0)
    active = w > 0

    com0 = center_of_mass(pos, w)
    d2 = jnp.sum((pos - com0) ** 2, axis=-1)
    r0 = jnp.sqrt(jnp.max(jnp.where(active, d2, 0.0)))

    pos3 = pos.T  # lane-major: every loop pass runs at full lane width

    def sub3(x3, s):
        return _block_subsample(x3.T, s).T if x3.ndim == 2 \
            else _block_subsample(x3, s)

    if coarse_stride > 1 and n > coarse_stride * min_particles * 4:
        strides = []
        s = coarse_stride
        while s > 1:
            strides.append(s)
            s = max(1, s // 8)
        center, r = com0, r0
        for s in strides:
            center, r = _ssc_loop_t(sub3(pos3, s), _block_subsample(w, s),
                                    center, r, shrink_factor,
                                    min_particles, max_iter)
            r = r / shrink_factor ** coarse_backoff
        center, _ = _ssc_loop_t(pos3, w, center, r, shrink_factor,
                                min_particles, max_iter)
        return center

    center, _ = _ssc_loop_t(pos3, w, com0, r0, shrink_factor,
                            min_particles, max_iter)
    return center


@jax.jit
def potential_center(pos, phi, mask=None):
    """Position of the (masked) potential minimum (CenPos mode 'pot')."""
    if mask is not None:
        phi = jnp.where(mask, phi, jnp.inf)
    i = jnp.argmin(phi)
    return pos[i]


@partial(jax.jit, static_argnames=("min_particles", "max_iter"))
def hybrid_center(pos, phi, weights=None, mask=None, r: float = 5.0,
                  shrink_factor: float = 0.7, min_particles: int = 100,
                  max_iter: int = 200):
    """Potential-minimum seed + shrinking sphere restricted to radius ``r``.

    Mirrors ``pynbody.analysis.halo.hybrid_center(sim, r="5 kpc")`` used by
    CenPos mode 'hyb' (`properties/generic.py:57`).  ``r`` must already be in
    position units.
    """
    seed = potential_center(pos, phi, mask)
    d2 = jnp.sum((pos - seed) ** 2, axis=-1)
    near = d2 < (r * r)
    m = near if mask is None else jnp.logical_and(mask, near)
    return shrink_sphere_center(pos, weights=weights, mask=m,
                                shrink_factor=shrink_factor,
                                min_particles=min_particles,
                                max_iter=max_iter)
