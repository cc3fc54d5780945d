"""Masked reductions and weighted quantiles.

These are the TPU-native forms of the reference's numpy hot loops:

* ``ParamSum`` field sums (`properties/base.py:106`) → :func:`msum`;
* ``ParamContain`` containment radii via argsort+cumsum+interp
  (`properties/base.py:60-103`) → :func:`containment_radius`;
* percentile statistics with weighted CDF (`profiles/proarray.py:689-740`)
  → :func:`weighted_quantile`.

All functions accept an optional boolean ``mask`` (full-length) instead of a
gathered subset: masked-out entries contribute zero weight / ±inf padding, so
shapes stay static under jit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["msum", "mmean", "mmin", "mmax", "mcount",
           "weighted_quantile", "containment_radius"]


def _bmask(mask, x):
    """Broadcast a (N,) mask against x of shape (N, ...)."""
    if mask is None:
        return None
    extra = x.ndim - mask.ndim
    return mask.reshape(mask.shape + (1,) * extra) if extra > 0 else mask


def msum(x, mask=None, weights=None, axis=0):
    if weights is not None:
        x = x * _none_bcast(weights, x)
    if mask is not None:
        x = jnp.where(_bmask(mask, x), x, jnp.zeros((), x.dtype))
    return jnp.sum(x, axis=axis)


def _none_bcast(w, x):
    extra = x.ndim - w.ndim
    return w.reshape(w.shape + (1,) * extra) if extra > 0 else w


def mcount(mask, n: Optional[int] = None):
    if mask is None:
        return n
    return jnp.sum(mask)


def mmean(x, mask=None, weights=None, axis=0):
    if weights is None:
        if mask is None:
            return jnp.mean(x, axis=axis)
        m = _bmask(mask, x)
        tot = jnp.sum(jnp.where(m, x, 0.0), axis=axis)
        cnt = jnp.sum(mask, dtype=x.dtype)
        return tot / jnp.maximum(cnt, 1)
    w = _none_bcast(weights, x)
    if mask is not None:
        w = jnp.where(_bmask(mask, x), w, 0.0)
    num = jnp.sum(x * w, axis=axis)
    den = jnp.sum(w, axis=axis)
    return num / jnp.where(den == 0, 1.0, den)


def mmin(x, mask=None, axis=0):
    if mask is not None:
        x = jnp.where(_bmask(mask, x), x, jnp.inf)
    return jnp.min(x, axis=axis)


def mmax(x, mask=None, axis=0):
    if mask is not None:
        x = jnp.where(_bmask(mask, x), x, -jnp.inf)
    return jnp.max(x, axis=axis)


def weighted_quantile(values, fracs, weights=None, mask=None):
    """Weighted quantile(s) via the reference's cumulative-fraction interp.

    Semantics match ``ParamContain`` (`properties/base.py:83-103`) and the
    profile ``Percentile`` statistic (`proarray.py:689-740`): sort by value,
    normalized inclusive cumsum of weights, ``interp(frac, cum, sorted_vals)``.

    ``fracs`` may be a scalar or a vector; masked-out entries get +inf value
    and zero weight so they land at the tail without affecting the CDF.
    """
    values = jnp.asarray(values)
    n = values.shape[0]
    if weights is None:
        weights = jnp.ones(n, dtype=values.dtype)
    if mask is not None:
        values = jnp.where(mask, values, jnp.inf)
        weights = jnp.where(mask, weights, 0.0)
    order = jnp.argsort(values)
    v_sorted = values[order]
    w_sorted = weights[order]
    cum = jnp.cumsum(w_sorted)
    total = cum[-1]
    cum = cum / jnp.where(total == 0, 1.0, total)
    # replace +inf padding values so interp stays finite at frac→1 within mask
    v_last = jnp.max(jnp.where(jnp.isfinite(v_sorted), v_sorted, -jnp.inf))
    v_sorted = jnp.where(jnp.isfinite(v_sorted), v_sorted, v_last)
    return jnp.interp(jnp.asarray(fracs), cum, v_sorted)


def containment_radius(key, fracs, weights, mask=None):
    """Radius (value of ``key``) enclosing given cumulative weight fraction(s).

    Exactly the reference ``ParamContain`` algorithm: argsort ``key``
    ascending, cumulative ``weights`` normalized by the (masked) total,
    linear interpolation of ``fracs`` on that CDF.
    """
    return weighted_quantile(key, fracs, weights=weights, mask=mask)
