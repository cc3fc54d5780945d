"""Segment (per-bin) reductions: the TPU-native profile statistic engine.

The reference computes per-bin statistics with a Python loop over bins, each
calling a numpy statistic on a gathered index list
(``profiles/proarray.py:272-334``, assignment at ``profiles/bins.py:346-395``).
Here binning is ``searchsorted`` + ``jax.ops.segment_sum`` and percentiles are
one global (bin-major, value-minor) sort plus a vectorized per-segment
weighted-CDF interpolation — no per-bin host loop, fully jittable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["assign_bins", "segment_stat", "segment_weighted_quantile",
           "segment_sum", "segment_counts"]


def assign_bins(x, edges, clamp_extrema: bool = True):
    """Bin index per particle + in-range validity mask.

    Matches the reference's ``np.digitize`` + extrema clamp
    (``bins.py:346-395``): values exactly at the outer edges are kept in the
    first/last bin; values strictly outside are flagged invalid.
    """
    nbins = edges.shape[0] - 1
    idx = jnp.searchsorted(edges, x, side="right") - 1
    idx = jnp.clip(idx, 0, nbins - 1)
    if clamp_extrema:
        valid = jnp.logical_and(x >= edges[0], x <= edges[-1])
    else:
        valid = jnp.logical_and(x >= edges[0], x < edges[-1])
    return idx, valid


def segment_sum(values, seg_ids, num_segments: int, mask=None):
    if mask is not None:
        z = jnp.zeros((), dtype=values.dtype)
        values = jnp.where(_bcast(mask, values), values, z)
    return jax.ops.segment_sum(values, seg_ids, num_segments=num_segments)


def segment_counts(seg_ids, num_segments: int, mask=None, dtype=jnp.int32):
    ones = jnp.ones(seg_ids.shape[0], dtype=dtype)
    return segment_sum(ones, seg_ids, num_segments, mask)


def _bcast(m, x):
    extra = x.ndim - m.ndim
    return m.reshape(m.shape + (1,) * extra) if extra else m


def segment_stat(values, seg_ids, num_segments: int, stat: str = "mean",
                 weights=None, mask=None):
    """Per-segment reduction: mean/sum/sum_w/rms/disp/min/max.

    ``weights`` gives weighted means exactly as the reference ``Mean``
    statistic (``proarray.py:632``); ``disp`` is the clamped
    sqrt(E[x²]−E[x]²) of ``proarray.py:827``.
    """
    n = values.shape[0]
    w = jnp.ones(n, dtype=values.dtype) if weights is None else weights
    if mask is not None:
        w = jnp.where(mask, w, 0.0)

    def wmean(v):
        num = jax.ops.segment_sum(v * _bcast(w, v), seg_ids,
                                  num_segments=num_segments)
        den = jax.ops.segment_sum(w, seg_ids, num_segments=num_segments)
        return num / _bcast(jnp.where(den == 0, 1.0, den), num)

    if stat == "sum":
        return segment_sum(values, seg_ids, num_segments, mask)
    if stat == "sum_w":  # weighted sum Σ v·w
        return segment_sum(values * _bcast(w, values), seg_ids, num_segments)
    if stat == "mean":
        return wmean(values)
    if stat == "rms":
        return jnp.sqrt(wmean(values * values))
    if stat == "disp":
        m1 = wmean(values)
        m2 = wmean(values * values)
        return jnp.sqrt(jnp.maximum(m2 - m1 * m1, 0.0))
    if stat == "min":
        big = jnp.full(values.shape, jnp.inf, dtype=values.dtype)
        v = jnp.where(_bcast(w > 0, values), values, big)
        return jax.ops.segment_min(v, seg_ids, num_segments=num_segments)
    if stat == "max":
        small = jnp.full(values.shape, -jnp.inf, dtype=values.dtype)
        v = jnp.where(_bcast(w > 0, values), values, small)
        return jax.ops.segment_max(v, seg_ids, num_segments=num_segments)
    raise ValueError(f"unknown segment stat {stat!r}")


@partial(jax.jit, static_argnames=("num_segments", "shift_first"))
def segment_weighted_quantile(values, seg_ids, num_segments: int, fracs,
                              weights=None, mask=None,
                              shift_first: bool = False):
    """Weighted quantile(s) per segment — one sort, no per-bin loop.

    Semantics per segment match :func:`..masked.weighted_quantile` (and thus
    the reference ``Percentile`` statistic, ``proarray.py:689-740``):
    cumulative weights as x-coordinates, linear interp.  ``shift_first=True``
    uses the reference's ``(cum − cum[0])/(cum[-1] − cum[0])`` normalization
    (per segment); ``False`` uses the plain inclusive ``cum/total``.

    Returns shape ``(num_segments,)`` for scalar ``fracs`` else
    ``(len(fracs), num_segments)``.
    """
    n = values.shape[0]
    w = jnp.ones(n, dtype=values.dtype) if weights is None else weights
    if mask is not None:
        w = jnp.where(mask, w, 0.0)
        values = jnp.where(mask, values, jnp.inf)
        seg_ids = jnp.where(mask, seg_ids, num_segments - 1)

    # bin-major, value-minor ordering via two stable argsorts
    order1 = jnp.argsort(values, stable=True)
    order = order1[jnp.argsort(seg_ids[order1], stable=True)]
    v_s = values[order]
    w_s = w[order]
    g_s = seg_ids[order]

    totals = jax.ops.segment_sum(w, seg_ids, num_segments=num_segments)
    safe_tot = jnp.where(totals == 0, 1.0, totals)
    offsets = jnp.concatenate([jnp.zeros(1, dtype=totals.dtype),
                               jnp.cumsum(totals)[:-1]])
    counts = jax.ops.segment_sum(jnp.ones_like(w), seg_ids,
                                 num_segments=num_segments)
    start_idx = jnp.concatenate([jnp.zeros(1, dtype=jnp.int32),
                                 jnp.cumsum(counts.astype(jnp.int32))[:-1]])
    end_idx = start_idx + counts.astype(jnp.int32)
    # ``counts`` is positional (masked entries were rerouted into the last
    # segment, inflating it); the NaN guard must use UNMASKED counts so a
    # fully-masked segment yields NaN, not the -inf padding value.
    if mask is None:
        nvalid = counts
    else:
        nvalid = jax.ops.segment_sum(mask.astype(w.dtype), seg_ids,
                                     num_segments=num_segments)

    c = jnp.cumsum(w_s)  # global inclusive cumsum; within-seg = c - offsets[g]
    fr = jnp.atleast_1d(jnp.asarray(fracs, dtype=values.dtype))

    # guard +inf padding so interp endpoints stay finite
    finite = jnp.isfinite(v_s)
    v_max_per_seg = jax.ops.segment_max(
        jnp.where(finite, v_s, -jnp.inf), g_s, num_segments=num_segments)
    v_s = jnp.where(finite, v_s, v_max_per_seg[g_s])

    if shift_first:
        # per-segment first/last inclusive cumulative values
        c_first = c[start_idx]
        c_last = c[jnp.maximum(end_idx - 1, start_idx)]
        span = jnp.where(c_last == c_first, 1.0, c_last - c_first)

    def one_frac(f):
        # target global cumulative weight per segment
        if shift_first:
            t = c_first + f * span
        else:
            t = offsets + f * totals
        i = jnp.searchsorted(c, t, side="left")
        i = jnp.clip(i, start_idx, jnp.maximum(end_idx - 1, start_idx))
        i_prev = jnp.maximum(i - 1, start_idx)
        c_i = c[i]
        c_prev = jnp.where(i == start_idx, offsets, c[i_prev])
        v_i = v_s[i]
        v_prev = jnp.where(i == start_idx, v_i, v_s[i_prev])
        denom = c_i - c_prev
        frac_between = jnp.where(denom > 0, (t - c_prev) / denom, 0.0)
        frac_between = jnp.clip(frac_between, 0.0, 1.0)
        out = v_prev + (v_i - v_prev) * frac_between
        # np.interp clamps below the first sample and above the last
        out = jnp.where(t <= c[start_idx], v_s[start_idx], out)
        last = jnp.maximum(end_idx - 1, start_idx)
        out = jnp.where(t >= c[last], v_s[last], out)
        return jnp.where(nvalid > 0, out, jnp.nan)

    result = jax.vmap(one_frac)(fr)
    if jnp.ndim(fracs) == 0:
        return result[0]
    return result
