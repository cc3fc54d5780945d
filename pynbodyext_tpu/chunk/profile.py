"""Streaming radial profiles over chunked snapshots.

The reference's profiles accept dask-lazy ``ChunkSimSnap`` views (inputs
are ``.compute()``-ed per bin, ``proarray.py:316``); here the per-bin
statistics are computed as *streaming segment reductions* — one chunk
resident at a time, no snapshot-scale materialization:

* pass 1 (only when ``bin_min``/``bin_max`` are absent): masked min/max of
  the bin coordinate;
* pass 2: per-chunk ``assign_bins`` + masked ``segment_sum`` accumulating
  per-bin counts and weight sums;
* per-field passes (lazy, cached): weighted moments Σw, Σw·v, Σw·v² per
  bin — which serve ``mean``/``sum``/``sum_w``/``rms``/``disp``;
* rank statistics (``pXX``/``med``) via streamed histogram bisection:
  per-bin brackets are narrowed by B-bucket weighted histograms (one
  pass per round, all chunks), then the few elements left inside the
  final brackets are collected and resolved exactly with the same
  shifted-weighted-CDF interpolation as the in-HBM path
  (:func:`..ops.segment.segment_weighted_quantile`) — the reference
  instead materializes the dask array per profile
  (``proarray.py:316-334``).  Memory stays O(nbins·B) per pass
  regardless of snapshot size;
* ``bins_type='equaln'`` edges via the same streamed histogram
  bisection over the bin coordinate (``_equaln_edges``), and callable
  ``bins_by`` evaluated per chunk view (``BinsSet._resolve_x`` parity).
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import ops
from ..quantity import QArray
from ..units import dimensionless
from .stream import ChunkedSnapshot

__all__ = ["StreamingProfile", "StreamingProfileArray",
           "make_streaming_profile"]

_MOMENT_STATS = ("mean", "sum", "sum_w", "rms", "disp")
_RANK_RE = re.compile(r"^p(\d{1,3})$")


class StreamingProfileArray:
    """Per-bin statistics of one field (moment-based; QArray results).

    Indexing mirrors :class:`~..profiles.proarray.ProfileArray`:
    the object itself behaves as the default statistic (weighted mean);
    ``arr["sum"] / arr["rms"] / arr["disp"] / arr["sum_w"]`` select others.
    """

    def __init__(self, profile: "StreamingProfile", field: str):
        self._p = profile
        self._field = field

    def _moments(self):
        return self._p._field_moments(self._field)

    @property
    def units(self):
        return self._p._field_units(self._field)

    def _stat(self, name: str) -> QArray:
        w, wv, wv2, s = self._moments()
        u = self.units
        if name == "sum":        # unweighted Σ v (ProfileArray parity)
            return QArray(s, u)
        if name == "sum_w":      # Σ v·w
            return QArray(wv, u * self._p._weight_units)
        if name == "mean":
            return QArray(wv / jnp.maximum(w, 1e-30), u)
        if name == "rms":
            return QArray(jnp.sqrt(wv2 / jnp.maximum(w, 1e-30)), u)
        if name == "disp":
            m1 = wv / jnp.maximum(w, 1e-30)
            var = jnp.maximum(wv2 / jnp.maximum(w, 1e-30) - m1 * m1, 0.0)
            return QArray(jnp.sqrt(var), u)
        key = name.lower()
        if key in ("med", "median"):
            return QArray(self._p._field_quantile(self._field, 0.5), u)
        m = _RANK_RE.match(key)
        if m and 0 <= int(m.group(1)) <= 100:
            return QArray(
                self._p._field_quantile(self._field,
                                        int(m.group(1)) / 100.0), u)
        raise NotImplementedError(
            f"statistic {name!r} is not available on streaming profiles "
            f"(supported: {_MOMENT_STATS} + 'pXX'/'med')")

    def __getitem__(self, stat: str) -> QArray:
        return self._stat(stat)

    @property
    def value(self):
        return self._stat("mean").value

    def __array__(self, dtype=None):
        return np.asarray(self.value, dtype=dtype)


class StreamingProfile:
    """Radial profile over a :class:`ChunkedSnapshot` view."""

    def __init__(self, sim: ChunkedSnapshot, *,
                 bins_by: Union[str, Callable] = "r",
                 bins_type: str = "lin", nbins: int = 100,
                 bin_min: Optional[float] = None,
                 bin_max: Optional[float] = None,
                 bins_area: str = "spherical_shell",
                 weight: Union[str, None] = "mass",
                 source_cls: Optional[type] = None):
        from ..profiles.bins import _BINS_AREA
        if callable(bins_type):
            raise NotImplementedError(
                "streaming profiles take a registered string bins_type "
                "('lin'/'log'/'equaln') — a callable needs the "
                "materialized bin coordinate")
        if bins_type not in ("lin", "log", "equaln"):
            raise NotImplementedError(
                f"streaming profiles support lin/log/equaln edges, got "
                f"{bins_type!r}")
        self.sim = sim
        self.bins_by = bins_by
        self.nbins = int(nbins)
        self._weight_name = weight
        self._source_cls = source_cls
        self._moment_cache: Dict[str, Tuple] = {}

        # units come from the first chunk's materialized coordinate —
        # callable bins_by (BinsSet parity, bins.py _resolve_x) has no
        # snapshot-level array to ask
        self._x_units = (self._x_of(sim.chunk_view(0)).units
                         if sim.n_chunks else dimensionless)
        if bins_type == "equaln":
            edges = jnp.asarray(self._equaln_edges(bin_min, bin_max))
        else:
            if bin_min is None or bin_max is None:
                lo, hi = self._stream_minmax(positive=bins_type == "log")
                if bin_min is None:
                    bin_min = lo
                if bin_max is None:
                    bin_max = hi
            if bins_type == "log":
                edges = jnp.logspace(
                    jnp.log10(jnp.maximum(bin_min, 1e-30)),
                    jnp.log10(bin_max), nbins + 1)
            else:
                edges = jnp.linspace(bin_min, bin_max, nbins + 1)
        self.edges = edges.astype(jnp.float32)
        self.binsize = _BINS_AREA[bins_area](self.edges, self._x_units)

        if weight is None:
            self._weight_units = dimensionless
        else:
            self._weight_units = sim[weight].units
        counts, wsums = self._base_pass()
        self._counts = counts
        self._weight_sums = wsums

    # -- streaming passes ------------------------------------------------------
    def _x_of(self, view):
        """Materialize the bin coordinate on one chunk view: callable →
        registered name → plain/derived field (``BinsSet._resolve_x``
        parity; reference bins.py:521-685)."""
        by = self.bins_by
        if callable(by):
            out = by(view)
        else:
            from ..profiles.bins import _BINS_BY
            if by in _BINS_BY:
                out = _BINS_BY[by](view)
            else:
                return view[by]
        return out if isinstance(out, QArray) else QArray(out)

    def _stream_minmax(self, positive: bool = False):
        """Masked (min, max) of the bin coordinate, one chunk resident at
        a time (``positive`` restricts to x > 0 for log edges)."""
        lo, hi = np.inf, -np.inf
        for i in range(self.sim.n_chunks):
            x = self._x_of(self.sim.chunk_view(i)).value
            sel = self.sim.chunk_selection(i)
            m = jnp.ones(x.shape, bool) if sel is None else sel
            if positive:
                m = jnp.logical_and(m, x > 0)
            lo = min(lo, float(jnp.min(jnp.where(m, x, jnp.inf))))
            hi = max(hi, float(jnp.max(jnp.where(m, x, -jnp.inf))))
        if not np.isfinite(lo):
            lo, hi = 0.0, 1.0
        return lo, hi

    def _equaln_edges(self, bin_min, bin_max, *, B: int = 128,
                      max_rounds: int = 4, cap: int = 8192) -> np.ndarray:
        """Equal-count bin edges without materializing the coordinate.

        The interior edges are the k/nbins COUNT quantiles of the bin
        coordinate under the in-HBM interpolation (``bins.py``
        ``_edges_equaln`` → :func:`..ops.masked.weighted_quantile` with
        unit weights: sorted values at cumulative fractions
        ``(i+1)/N``); the ends are the exact masked extrema (or the
        given ``bin_min``/``bin_max``).  The reference materializes the
        dask array to sort it (``proarray.py:316-334``,
        ``bins.py:720-746``); here the edges come from streamed
        histogram bisection — every edge keeps a [lo, hi) bracket that a
        per-round (U, B) count histogram narrows by ~B×, then one
        collection pass resolves the crossing elements exactly.  Memory
        stays O(nbins·B) per pass.  Brackets still holding more than
        ``cap`` elements after ``max_rounds`` (massive value ties) fall
        back to the bracket midpoint — within ``span/B**rounds`` of the
        exact answer (documented tolerance).
        """
        nb = self.nbins
        sim = self.sim

        def _stream(fn):
            for i in range(sim.n_chunks):
                v = self._x_of(sim.chunk_view(i)).value
                sel = sim.chunk_selection(i)
                m = jnp.ones(v.shape, bool) if sel is None else sel
                if bin_min is not None:
                    m = jnp.logical_and(m, v >= bin_min)
                if bin_max is not None:
                    m = jnp.logical_and(m, v <= bin_max)
                fn(v, m)

        # pass 1: masked extrema + total count
        st = {"lo": np.inf, "hi": -np.inf, "n": 0}

        def _mm(v, m):
            st["lo"] = min(st["lo"],
                           float(jnp.min(jnp.where(m, v, jnp.inf))))
            st["hi"] = max(st["hi"],
                           float(jnp.max(jnp.where(m, v, -jnp.inf))))
            st["n"] += int(jnp.sum(m))

        _stream(_mm)
        N, vmin, vmax = st["n"], st["lo"], st["hi"]
        if N == 0 or not np.isfinite(vmin):
            lo0 = 0.0 if bin_min is None else float(bin_min)
            hi0 = 1.0 if bin_max is None else float(bin_max)
            return np.linspace(lo0, hi0, nb + 1)
        e0 = vmin if bin_min is None else float(bin_min)
        e1 = vmax if bin_max is None else float(bin_max)
        if nb == 1:
            return np.asarray([e0, e1])
        # interior targets in absolute cumulative-count units: the in-HBM
        # interp's CDF knots are (i+1)/N at sorted value v_i, so edge k
        # needs the elements with cum = ceil(t)−1 and ceil(t)
        t = np.arange(1, nb) / nb * N
        nE = nb - 1
        lo = np.full(nE, vmin, np.float64)
        hi = np.full(nE, np.nextafter(np.float64(vmax), np.inf))
        counts_in = np.full(nE, N, np.int64)
        ti = np.maximum(np.ceil(t - 1e-9), 1.0).astype(np.int64)
        width = np.maximum(hi - lo, 1e-300)
        for _ in range(max_rounds):
            if (counts_in <= cap).all():
                break
            ulo, inv = np.unique(lo, return_inverse=True)
            U = len(ulo)
            uhi = np.zeros(U)
            uhi[inv] = hi  # identical lo ⇒ identical hi (same bucket)
            ulo_j = jnp.asarray(ulo, jnp.float32)
            uhi_j = jnp.asarray(uhi, jnp.float32)
            span_j = jnp.asarray(np.maximum(uhi - ulo, 1e-300),
                                 jnp.float32)
            hist = jnp.zeros(U * B, jnp.int32)
            # int32 on device (x64 is off; counts < 2^31 by the gravity
            # N < 2^24 packing bound), widened on the host
            hp = jnp.zeros(U + 1, jnp.int32)

            def _h(v, m):
                nonlocal hist, hp
                p = jnp.searchsorted(ulo_j, v, side="right")
                j = jnp.clip(p - 1, 0, U - 1)
                inb = m & (p >= 1) & (v < uhi_j[j])
                b = jnp.clip(((v - ulo_j[j]) / span_j[j]
                              * B).astype(jnp.int32), 0, B - 1)
                hist = hist + jax.ops.segment_sum(
                    inb.astype(jnp.int32), j * B + b, num_segments=U * B)
                # element v is strictly below bracket u iff u ≥ p:
                # suffix counts come from one histogram of p
                hp = hp + jax.ops.segment_sum(
                    m.astype(jnp.int32), jnp.clip(p, 0, U),
                    num_segments=U + 1)

            _stream(_h)
            below_u = np.cumsum(np.asarray(hp), dtype=np.int64)[:U]
            hg = np.asarray(hist, np.int64).reshape(U, B)
            cumg = below_u[:, None] + np.cumsum(hg, axis=1)
            width = np.maximum(uhi - ulo, 1e-300)[inv] / B
            for k in range(nE):
                u = inv[k]
                crossed = cumg[u] >= ti[k]
                b = int(crossed.argmax()) if crossed.any() else B - 1
                lo[k] = ulo[u] + b * (width[k])
                hi[k] = lo[k] + width[k]
                counts_in[k] = hg[u, b]
        # collection pass: overlapping slacked brackets merge to disjoint
        # intervals; each edge resolves from its interval's sorted values
        lo_c = lo - width
        hi_c = hi + width
        order = np.argsort(lo_c)
        ivs: list = []
        for k in order:
            if ivs and lo_c[k] <= ivs[-1][1]:
                ivs[-1][1] = max(ivs[-1][1], hi_c[k])
            else:
                ivs.append([lo_c[k], hi_c[k]])
        ia = np.asarray([a for a, _ in ivs])
        ib = np.asarray([b for _, b in ivs])
        U = len(ivs)
        ia_j = jnp.asarray(ia, jnp.float32)
        ib_j = jnp.asarray(ib, jnp.float32)
        below_iv = np.zeros(U, np.int64)
        vbelow_iv = np.full(U, -np.inf)
        coll_j: list = []
        coll_v: list = []

        def _c(v, m):
            nonlocal below_iv, vbelow_iv
            p = jnp.searchsorted(ia_j, v, side="right")
            j = jnp.clip(p - 1, 0, U - 1)
            inc = m & (p >= 1) & (v <= ib_j[j])
            hp = jax.ops.segment_sum(m.astype(jnp.int32),
                                     jnp.clip(p, 0, U), num_segments=U + 1)
            below_iv += np.cumsum(np.asarray(hp), dtype=np.int64)[:U]
            sm = jax.ops.segment_max(jnp.where(m, v, -jnp.inf),
                                     jnp.clip(p, 0, U), num_segments=U + 1)
            vbelow_iv = np.maximum(
                vbelow_iv, np.maximum.accumulate(np.asarray(sm))[:U])
            mm = np.asarray(inc)
            idx = np.nonzero(mm)[0]
            if len(idx):
                coll_j.append(np.asarray(j)[idx])
                coll_v.append(np.asarray(v)[idx].astype(np.float64))

        _stream(_c)
        if coll_j:
            cj = np.concatenate(coll_j)
            cv = np.concatenate(coll_v)
            srt = np.lexsort((cv, cj))
            cj, cv = cj[srt], cv[srt]
            starts = np.searchsorted(cj, np.arange(U))
            ends = np.searchsorted(cj, np.arange(U), side="right")
        else:
            cv = np.zeros(0)
            starts = ends = np.zeros(U, np.int64)
        interior = np.empty(nE)
        for k in range(nE):
            u = int(np.searchsorted(ia, lo_c[k], side="right") - 1)
            s, e = int(starts[u]), int(ends[u])
            if counts_in[k] > cap or s == e:
                interior[k] = 0.5 * (lo[k] + hi[k])  # documented fallback
                continue
            pos = int(ti[k] - below_iv[u])  # 1-based within the interval
            if pos < 1 or pos > e - s:
                interior[k] = 0.5 * (lo[k] + hi[k])
                continue
            v_i = cv[s + pos - 1]
            if ti[k] <= 1:
                interior[k] = v_i  # interp clamps left of the first knot
                continue
            if pos >= 2:
                v_prev = cv[s + pos - 2]
            elif np.isfinite(vbelow_iv[u]):
                v_prev = vbelow_iv[u]
            else:
                interior[k] = 0.5 * (lo[k] + hi[k])
                continue
            frac = float(t[k]) - (int(ti[k]) - 1)
            interior[k] = v_prev + (v_i - v_prev) * min(max(frac, 0.0), 1.0)
        edges = np.concatenate([[e0], interior, [e1]])
        return np.maximum.accumulate(edges)  # guard f32 monotonicity

    def _chunk_seg(self, i: int):
        """(seg_ids, valid, weight) for chunk i."""
        view = self.sim.chunk_view(i)
        x = self._x_of(view).value
        seg, in_range = ops.assign_bins(x, self.edges)
        selection = self.sim.chunk_selection(i)
        valid = in_range if selection is None \
            else jnp.logical_and(in_range, selection)
        if self._weight_name is None:
            w = jnp.ones_like(x, jnp.float32)
        else:
            w = view[self._weight_name].value
        return view, seg.astype(jnp.int32), valid, w

    def _base_pass(self):
        counts = jnp.zeros(self.nbins, jnp.int32)
        wsums = jnp.zeros(self.nbins, jnp.float32)
        for i in range(self.sim.n_chunks):
            _, seg, valid, w = self._chunk_seg(i)
            counts = counts + jax.ops.segment_sum(
                valid.astype(jnp.int32), seg, num_segments=self.nbins)
            wsums = wsums + jax.ops.segment_sum(
                jnp.where(valid, w, 0.0), seg, num_segments=self.nbins)
        return counts, wsums

    def _field_units(self, field: str):
        return self.sim[field].units

    def _field_moments(self, field: str):
        got = self._moment_cache.get(field)
        if got is not None:
            return got
        w0 = jnp.zeros(self.nbins, jnp.float32)
        w1 = jnp.zeros(self.nbins, jnp.float32)
        w2 = jnp.zeros(self.nbins, jnp.float32)
        s1 = jnp.zeros(self.nbins, jnp.float32)
        for i in range(self.sim.n_chunks):
            view, seg, valid, w = self._chunk_seg(i)
            v = view[field].value
            if v.ndim != 1:
                raise NotImplementedError(
                    "streaming profile statistics take scalar fields")
            ww = jnp.where(valid, w, 0.0)
            w0 = w0 + jax.ops.segment_sum(ww, seg, num_segments=self.nbins)
            w1 = w1 + jax.ops.segment_sum(ww * v, seg,
                                          num_segments=self.nbins)
            w2 = w2 + jax.ops.segment_sum(ww * v * v, seg,
                                          num_segments=self.nbins)
            s1 = s1 + jax.ops.segment_sum(jnp.where(valid, v, 0.0), seg,
                                          num_segments=self.nbins)
        out = (w0, w1, w2, s1)
        self._moment_cache[field] = out
        return out

    # -- streaming rank statistics ----------------------------------------
    def _field_quantile(self, field: str, frac: float, *, B: int = 128,
                        max_rounds: int = 6,
                        cap_per_bin: int = 16384) -> np.ndarray:
        """Per-bin weighted quantile of ``field`` without materializing.

        Semantics match the in-HBM
        :func:`..ops.segment.segment_weighted_quantile` with
        ``shift_first=True`` (the reference ``Percentile`` statistic,
        ``proarray.py:689-740``): target mass t = c₀ + frac·(c_N − c₀)
        over the per-bin weighted CDF, linear interpolation between the
        bracketing elements.

        Algorithm (bounded memory, VERDICT r3 §next-5):
        1. one streamed pass for per-bin min/max;
        2. ≤``max_rounds`` streamed histogram-bisection rounds: each pass
           builds a (nbins, B) weighted histogram over the current
           per-bin bracket plus the exact below-bracket mass, then
           narrows every bracket to the bucket where the CDF crosses t;
        3. one streamed collection pass gathers the few in-bracket
           elements (plus the adjacent value below) and resolves the
           crossing exactly on the host.

        Exact vs the in-HBM result up to f32 accumulation-order noise,
        with one documented tie caveat: when several elements share the
        bin's minimum value, c₀ uses the smallest weight among them
        (array order is not observable across chunks); untied data
        matches exactly.  Bins whose bracket still holds more than
        ``cap_per_bin`` elements after ``max_rounds`` (massive value
        ties) fall back to the bracket midpoint — within one bucket
        width (span/B^rounds) of the exact answer.
        """
        nb = self.nbins
        n_chunks = self.sim.n_chunks

        def _stream(fn):
            for i in range(n_chunks):
                view, seg, valid, w = self._chunk_seg(i)
                v = view[field].value
                if v.ndim != 1:
                    raise NotImplementedError(
                        "streaming profile statistics take scalar fields")
                fn(i, v, seg, valid, w)

        # pass 1: per-bin min/max ------------------------------------------
        vmin = np.full(nb, np.inf)
        vmax = np.full(nb, -np.inf)

        def _minmax(i, v, seg, valid, w):
            lo_c = jax.ops.segment_min(jnp.where(valid, v, jnp.inf), seg,
                                       num_segments=nb)
            hi_c = jax.ops.segment_max(jnp.where(valid, v, -jnp.inf), seg,
                                       num_segments=nb)
            np.minimum(vmin, np.asarray(lo_c), out=vmin)
            np.maximum(vmax, np.asarray(hi_c), out=vmax)

        _stream(_minmax)
        W = np.asarray(self._weight_sums, np.float64)
        nvalid = np.asarray(self._counts, np.int64)
        empty = nvalid == 0
        vmin = np.where(empty, 0.0, vmin)
        vmax = np.where(empty, 0.0, vmax)

        # passes 2..: histogram bisection ----------------------------------
        lo = vmin.astype(np.float64)
        hi = np.nextafter(vmax, np.inf).astype(np.float64)
        w_first = np.full(nb, np.inf)
        counts_in = nvalid.astype(np.int64)
        t = None
        width = np.maximum(hi - lo, 1e-300)
        for r in range(max_rounds):
            if t is not None and (counts_in <= cap_per_bin).all():
                break
            lo_j = jnp.asarray(lo, jnp.float32)
            span = jnp.asarray(np.maximum(hi - lo, 1e-300), jnp.float32)
            hi_j = jnp.asarray(hi, jnp.float32)
            hist_w = jnp.zeros(nb * B, jnp.float32)
            hist_c = jnp.zeros(nb * B, jnp.int32)
            wb = jnp.zeros(nb, jnp.float32)
            track_first = r == 0

            def _hist(i, v, seg, valid, w):
                nonlocal hist_w, hist_c, wb, w_first
                in_br = (valid & (v >= lo_j[seg]) & (v < hi_j[seg]))
                b_idx = jnp.clip(
                    ((v - lo_j[seg]) / span[seg] * B).astype(jnp.int32),
                    0, B - 1)
                cell = seg * B + b_idx
                hist_w = hist_w + jax.ops.segment_sum(
                    jnp.where(in_br, w, 0.0), cell, num_segments=nb * B)
                hist_c = hist_c + jax.ops.segment_sum(
                    in_br.astype(jnp.int32), cell, num_segments=nb * B)
                wb = wb + jax.ops.segment_sum(
                    jnp.where(valid & (v < lo_j[seg]), w, 0.0), seg,
                    num_segments=nb)
                if track_first:
                    wf = jax.ops.segment_min(
                        jnp.where(valid & (v == lo_j[seg]), w, jnp.inf),
                        seg, num_segments=nb)
                    np.minimum(w_first, np.asarray(wf), out=w_first)

            _stream(_hist)
            if t is None:
                wf = np.where(np.isfinite(w_first), w_first, 0.0)
                t = wf + frac * (W - wf)
            hw = np.asarray(hist_w, np.float64).reshape(nb, B)
            hc = np.asarray(hist_c, np.int64).reshape(nb, B)
            Wb = np.asarray(wb, np.float64)
            cum = Wb[:, None] + np.cumsum(hw, axis=1)
            crossed = cum >= t[:, None]
            b = np.where(crossed.any(axis=1), crossed.argmax(axis=1), B - 1)
            width = np.maximum(hi - lo, 1e-300) / B
            counts_in = hc[np.arange(nb), b]
            lo = lo + b * width
            hi = lo + width

        # collection pass: exact local resolve ------------------------------
        lo_c = lo - width  # one bucket of slack each side: float-edge
        hi_c = hi + width  # rounding may shift elements by one bucket
        lo_cj = jnp.asarray(lo_c, jnp.float32)
        hi_cj = jnp.asarray(hi_c, jnp.float32)
        vs, ws, gs, order_key = [], [], [], []
        wb_c = jnp.zeros(nb, jnp.float32)
        v_below = np.full(nb, -np.inf)
        offset = 0

        def _collect(i, v, seg, valid, w):
            nonlocal wb_c, v_below, offset
            in_c = valid & (v >= lo_cj[seg]) & (v <= hi_cj[seg])
            wb_c = wb_c + jax.ops.segment_sum(
                jnp.where(valid & (v < lo_cj[seg]), w, 0.0), seg,
                num_segments=nb)
            vb = jax.ops.segment_max(
                jnp.where(valid & (v < lo_cj[seg]), v, -jnp.inf), seg,
                num_segments=nb)
            np.maximum(v_below, np.asarray(vb), out=v_below)
            m = np.asarray(in_c)
            idx = np.nonzero(m)[0]
            if len(idx):
                vs.append(np.asarray(v)[idx])
                ws.append(np.asarray(w)[idx])
                gs.append(np.asarray(seg)[idx])
                order_key.append(offset + idx)
            offset += int(m.shape[0])

        _stream(_collect)
        Wb_c = np.asarray(wb_c, np.float64)
        if vs:
            cv = np.concatenate(vs).astype(np.float64)
            cw = np.concatenate(ws).astype(np.float64)
            cg = np.concatenate(gs)
            ck = np.concatenate(order_key)
            srt = np.lexsort((ck, cv, cg))  # bin-major, value, array order
            cv, cw, cg = cv[srt], cw[srt], cg[srt]
            starts = np.searchsorted(cg, np.arange(nb))
            ends = np.searchsorted(cg, np.arange(nb), side="right")
        else:
            cv = cw = np.zeros(0)
            starts = ends = np.zeros(nb, np.int64)

        wf = np.where(np.isfinite(w_first), w_first, 0.0)
        if t is None:
            t = wf + frac * (W - wf)
        out = np.full(nb, np.nan)
        for k in range(nb):
            if empty[k]:
                continue
            if W[k] <= 0 or t[k] <= wf[k]:
                out[k] = vmin[k]
                continue
            if t[k] >= W[k]:
                out[k] = vmax[k]
                continue
            s, e = starts[k], ends[k]
            if counts_in[k] > cap_per_bin or s == e:
                out[k] = 0.5 * (lo[k] + hi[k])  # tie fallback (documented)
                continue
            cum = Wb_c[k] + np.cumsum(cw[s:e])
            i = int(np.searchsorted(cum, t[k], side="left"))
            if i >= e - s:  # crossing escaped the bracket: midpoint
                out[k] = 0.5 * (lo[k] + hi[k])
                continue
            c_i = cum[i]
            v_i = cv[s + i]
            if i > 0:
                c_prev, v_prev = cum[i - 1], cv[s + i - 1]
            elif np.isfinite(v_below[k]):
                c_prev, v_prev = Wb_c[k], v_below[k]
            else:
                c_prev, v_prev = Wb_c[k], v_i  # bin's first element
            denom = c_i - c_prev
            fb = 0.0 if denom <= 0 else min(max(
                (t[k] - c_prev) / denom, 0.0), 1.0)
            out[k] = v_prev + (v_i - v_prev) * fb
        return out

    # -- bin metadata (ProfileBase parity) -------------------------------------
    @property
    def rbins(self) -> QArray:
        return QArray(0.5 * (self.edges[1:] + self.edges[:-1]),
                      self._x_units)

    @property
    def bin_edges(self) -> QArray:
        return QArray(self.edges, self._x_units)

    @property
    def dr(self) -> QArray:
        centers = 0.5 * (self.edges[1:] + self.edges[:-1])
        return QArray(jnp.gradient(centers) * 0.5, self._x_units)

    @property
    def npart_bins(self) -> np.ndarray:
        return np.asarray(self._counts)

    # -- field / property access ----------------------------------------------
    def _lookup_profile_property(self, name: str) -> Optional[Callable]:
        cls = self._source_cls
        if cls is None:
            return None
        for klass in cls.__mro__:
            reg = klass.__dict__.get("_pp_registry")
            if reg and name in reg:
                return reg[name]
        return None

    def keys(self):
        return sorted(self.sim.store.field_names)

    def __getitem__(self, key: str):
        fn = self._lookup_profile_property(key)
        if fn is not None:
            return fn(self)
        return StreamingProfileArray(self, key)

    # -- family subprofiles ----------------------------------------------------
    def families(self, name: str) -> "StreamingProfile":
        sub = StreamingProfile.__new__(StreamingProfile)
        sub.__dict__.update(self.__dict__)
        sub.sim = self.sim.families(name)
        sub._moment_cache = {}
        sub._counts, sub._weight_sums = sub._base_pass()
        return sub

    @property
    def s(self):
        return self.families("star")

    @property
    def g(self):
        return self.families("gas")

    @property
    def dm(self):
        return self.families("dm")

    def __repr__(self):
        return (f"<StreamingProfile nbins={self.nbins} by={self.bins_by!r} "
                f"chunks={self.sim.n_chunks}>")


def make_streaming_profile(cls, sim, *, ndim: Optional[int] = None,
                           weight: Union[str, None] = None,
                           bins_by="r", bins_type="lin", nbins: int = 100,
                           bin_min=None, bin_max=None,
                           bins_area="spherical_shell", bins_set=None,
                           **kwargs) -> StreamingProfile:
    """Dispatch target for ``Profile``-family constructors on chunked
    snapshots (mirrors ``RadialProfile``'s ndim mapping)."""
    if bins_set is not None:
        bins_by = bins_set.bins_by
        bins_type = bins_set.bins_type
        nbins = bins_set.nbins
        bin_min = bins_set.bin_min
        bin_max = bins_set.bin_max
        bins_area = bins_set.bins_area
    if ndim is not None:
        if ndim == 2:
            bins_by, bins_area = "rxy", "annulus"
        elif ndim == 3:
            bins_by, bins_area = "r", "spherical_shell"
        else:
            raise ValueError("ndim must be 2 or 3")
    return StreamingProfile(sim, bins_by=bins_by, bins_type=bins_type,
                            nbins=nbins, bin_min=bin_min, bin_max=bin_max,
                            bins_area=bins_area, weight=weight,
                            source_cls=cls)
