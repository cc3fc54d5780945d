"""Rotation utilities: face-on alignment matrices.

Reference counterpart: pynbody ``calc_faceon_matrix`` as used by ``AlignVec``
(`transforms/rotate.py:57-98`), including the safe-up fallback when the
requested up vector is (nearly) parallel to the alignment vector.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["faceon_matrix", "apply_rotation"]

_PARALLEL_TOL = 1e-6


@jax.jit
def faceon_matrix(vec, up=None):
    """Rotation matrix R such that ``pos @ R.T`` puts ``vec`` along +z.

    Rows of R are the new basis vectors (x', y', z'=vec/|vec|).  If ``up`` is
    parallel to ``vec``, an alternate axis is selected branch-free.
    """
    vec = jnp.asarray(vec, dtype=jnp.result_type(vec, jnp.float32))
    z = vec / jnp.linalg.norm(vec)
    if up is None:
        up = jnp.array([0.0, 1.0, 0.0], dtype=z.dtype)
    else:
        up = jnp.asarray(up, dtype=z.dtype)
        up = up / jnp.linalg.norm(up)
    x = jnp.cross(up, z)
    nx = jnp.linalg.norm(x)
    # fallback axis: whichever of e1/e2 is less aligned with z
    alt = jnp.where(jnp.abs(z[0]) < 0.9,
                    jnp.array([1.0, 0.0, 0.0], dtype=z.dtype),
                    jnp.array([0.0, 1.0, 0.0], dtype=z.dtype))
    x_alt = jnp.cross(alt, z)
    x = jnp.where(nx > _PARALLEL_TOL, x, x_alt)
    x = x / jnp.linalg.norm(x)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=0)


@jax.jit
def apply_rotation(arr, matrix):
    """Rotate (N, 3) vectors: ``arr @ R.T`` (one MXU-friendly matmul)."""
    return arr @ matrix.T
