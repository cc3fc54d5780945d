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

from functools import partial
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


@partial(jax.jit, static_argnames=("axis",))
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


@partial(jax.jit, static_argnames=("axis",))
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


@partial(jax.jit, static_argnames=("axis",))
def mmin(x, mask=None, axis=0):
    if mask is not None:
        x = jnp.where(_bmask(mask, x), x, jnp.inf)
    return jnp.min(x, axis=axis)


@partial(jax.jit, static_argnames=("axis",))
def mmax(x, mask=None, axis=0):
    if mask is not None:
        x = jnp.where(_bmask(mask, x), x, -jnp.inf)
    return jnp.max(x, axis=axis)


@partial(jax.jit, static_argnames=("shift_first",))
def weighted_quantile(values, fracs, weights=None, mask=None,
                      shift_first: bool = False):
    """Weighted quantile(s) via the reference's cumulative-fraction interp.

    Semantics match ``ParamContain`` (`properties/base.py:83-103`) and the
    profile ``Percentile`` statistic (`proarray.py:689-740`): sort by value,
    cumsum of weights, ``interp(frac, cum, sorted_vals)``.

    ``shift_first=True`` uses the ParamContain normalization
    ``(cum − cum[0]) / (cum[-1] − cum[0])`` (first sorted particle sits at
    fraction 0); ``False`` uses the plain inclusive ``cum / total``.

    ``fracs`` may be a scalar or a vector; masked-out entries get +inf value
    and zero weight so they land at the tail without affecting the CDF.
    """
    values = jnp.asarray(values)
    n = values.shape[0]
    if weights is None:
        weights = jnp.ones(n, dtype=values.dtype)
    weights = jnp.asarray(weights, dtype=values.dtype)
    if mask is not None:
        values = jnp.where(mask, values, jnp.inf)
        weights = jnp.where(mask, weights, 0.0)
    order = jnp.argsort(values)
    v_sorted = values[order]
    w_sorted = weights[order]
    cum = jnp.cumsum(w_sorted)
    total = cum[-1]
    if shift_first:
        c0 = cum[0]
        denom = cum[-1] - c0
        cum = (cum - c0) / jnp.where(denom == 0, 1.0, denom)
    else:
        cum = cum / jnp.where(total == 0, 1.0, total)
    # replace +inf padding values so interp stays finite at frac→1 within mask
    v_last = jnp.max(jnp.where(jnp.isfinite(v_sorted), v_sorted, -jnp.inf))
    v_sorted = jnp.where(jnp.isfinite(v_sorted), v_sorted, v_last)
    out = jnp.interp(jnp.asarray(fracs), cum, v_sorted)
    # empty selection / zero total weight → NaN, not ±inf garbage
    return jnp.where(total > 0, out, jnp.nan)


def containment_radius(key, fracs, weights, mask=None):
    """Radius (value of ``key``) enclosing given cumulative weight fraction(s).

    Exactly the reference ``ParamContain`` algorithm
    (`properties/base.py:83-103`): argsort ``key`` ascending, cumulative
    ``weights`` normalized as ``(cum − cum[0])/(cum[-1] − cum[0])``, linear
    interpolation of ``fracs`` on that CDF.
    """
    return weighted_quantile(key, fracs, weights=weights, mask=mask,
                             shift_first=True)


def radius_at_surface_density(r, m, target, mask=None, eps: float = 0.01,
                              mode: str = "shell", ngrid: int = 256,
                              iters: int = 80):
    """Solve Σ(r) = target by bracketing on a grid + bisection, on-device.

    Reference: ``RadiusAtSurfaceDensity`` (`properties/base.py:172-284`).
    ``mode='shell'``: Σ measured in [r−eps/2, r+eps/2]; ``mode='total'``:
    Σ(<r) = M(<r)/(π r²).  Fully vectorized: the 256-point grid evaluates in
    one pass; bisection is a ``fori_loop`` over scalars.
    Raises ValueError (host-side) when the target cannot be bracketed.
    """
    r = jnp.asarray(r)
    m = jnp.asarray(m, dtype=r.dtype)
    if mask is not None:
        r = jnp.where(mask, r, jnp.inf)
        m = jnp.where(mask, m, 0.0)
    order = jnp.argsort(r)
    r_sorted = r[order]
    m_cum = jnp.cumsum(m[order])
    r_min = r_sorted[0]
    finite = jnp.isfinite(r_sorted)
    r_max = jnp.max(jnp.where(finite, r_sorted, -jnp.inf))

    def sigma_at(rv):
        # rv may be an array (grid) or scalar (bisection)
        rv = jnp.asarray(rv)
        if mode == "total":
            hi = jnp.searchsorted(r_sorted, rv, side="right")
            m_in = jnp.where(hi > 0, m_cum[jnp.maximum(hi - 1, 0)], 0.0)
            area = jnp.pi * rv * rv
            return jnp.where((rv > 0) & (area > 0), m_in / jnp.maximum(area, 1e-30), 0.0)
        rin = jnp.maximum(rv - 0.5 * eps, 0.0)
        rout = rv + 0.5 * eps
        lo = jnp.searchsorted(r_sorted, rin, side="left")
        hi = jnp.searchsorted(r_sorted, rout, side="right")
        m_hi = jnp.where(hi > 0, m_cum[jnp.maximum(hi - 1, 0)], 0.0)
        m_lo = jnp.where(lo > 0, m_cum[jnp.maximum(lo - 1, 0)], 0.0)
        area = jnp.pi * (rout * rout - rin * rin)
        ok = (rv > 0) & (hi > 0) & (hi > lo) & (area > 0)
        return jnp.where(ok, (m_hi - m_lo) / jnp.maximum(area, 1e-30), 0.0)

    grid = jnp.linspace(jnp.maximum(r_min, eps), r_max, ngrid)
    sig = sigma_at(grid)
    diff = sig - target
    crossing = jnp.signbit(diff[:-1]) != jnp.signbit(diff[1:])
    has_crossing = jnp.any(crossing)
    first = jnp.argmax(crossing)  # first True (0 if none — guarded below)
    left0, right0 = grid[first], grid[first + 1]

    def body(_, lr):
        left, right = lr
        mid = 0.5 * (left + right)
        s_mid = sigma_at(mid) - target
        s_left = sigma_at(left) - target
        go_left = s_left * s_mid <= 0
        return (jnp.where(go_left, left, mid),
                jnp.where(go_left, mid, right))

    left, right = jax.lax.fori_loop(0, iters, body, (left0, right0))
    root = 0.5 * (left + right)
    if not bool(has_crossing):
        raise ValueError("Could not bracket target surface density")
    return root


def virial_radius(r, m, rho_target, mask=None):
    """Radius where mean enclosed density crosses ``rho_target``.

    Device-side replacement for pynbody ``virial_radius`` (used by the
    reference ``VirialRadius``, `properties/generic.py:133`): sort radii,
    cumulative mass, find the outermost crossing of
    M(<r) / (4/3 π r³) = rho_target by linear interpolation.
    """
    r = jnp.asarray(r)
    m = jnp.asarray(m, dtype=r.dtype)
    if mask is not None:
        r = jnp.where(mask, r, jnp.inf)
        m = jnp.where(mask, m, 0.0)
    order = jnp.argsort(r)
    r_s = r[order]
    m_cum = jnp.cumsum(m[order])
    vol = (4.0 / 3.0) * jnp.pi * jnp.maximum(r_s, 1e-30) ** 3
    rho = m_cum / vol
    finite = jnp.isfinite(r_s)
    above = jnp.where(finite, rho >= rho_target, False)
    # outermost index still above the threshold
    idx_arr = jnp.arange(r_s.shape[0])
    last_above = jnp.max(jnp.where(above, idx_arr, -1))
    i = jnp.clip(last_above, 0, r_s.shape[0] - 2)
    # interpolate in log rho between i and i+1
    r1, r2 = r_s[i], r_s[i + 1]
    rho1, rho2 = rho[i], rho[i + 1]
    t = (rho_target - rho1) / jnp.where(rho2 == rho1, 1.0, rho2 - rho1)
    t = jnp.clip(t, 0.0, 1.0)
    out = r1 + t * (r2 - r1)
    return jnp.where(last_above < 0, r_s[0], out)
