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
  bin — which serve ``mean``/``sum``/``sum_w``/``rms``/``disp``.

Rank statistics (percentiles/median) need a global per-bin sort and are
deliberately not offered on the streaming path — request them on an
in-HBM (sub)snapshot instead.
"""

from __future__ import annotations

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
        raise NotImplementedError(
            f"statistic {name!r} is not available on streaming profiles "
            f"(supported: {_MOMENT_STATS}); rank statistics need an "
            "in-HBM view")

    def __getitem__(self, stat: str) -> QArray:
        return self._stat(stat)

    @property
    def value(self):
        return self._stat("mean").value

    def __array__(self, dtype=None):
        return np.asarray(self.value, dtype=dtype)


class StreamingProfile:
    """Radial profile over a :class:`ChunkedSnapshot` view."""

    def __init__(self, sim: ChunkedSnapshot, *, bins_by: str = "r",
                 bins_type: str = "lin", nbins: int = 100,
                 bin_min: Optional[float] = None,
                 bin_max: Optional[float] = None,
                 bins_area: str = "spherical_shell",
                 weight: Union[str, None] = "mass",
                 source_cls: Optional[type] = None):
        from ..profiles.bins import _BINS_AREA
        if callable(bins_by) or callable(bins_type):
            raise NotImplementedError(
                "streaming profiles take registered string bins_by/"
                "bins_type")
        if bins_type not in ("lin", "log"):
            raise NotImplementedError(
                f"streaming profiles support lin/log edges, got "
                f"{bins_type!r} (equaln needs a global sort)")
        self.sim = sim
        self.bins_by = bins_by
        self.nbins = int(nbins)
        self._weight_name = weight
        self._source_cls = source_cls
        self._moment_cache: Dict[str, Tuple] = {}

        x = sim[bins_by]
        self._x_units = x.units
        if bin_min is None:
            bin_min = float(x.min().value)
        if bin_max is None:
            bin_max = float(x.max().value)
        if bins_type == "log":
            edges = jnp.logspace(jnp.log10(jnp.maximum(bin_min, 1e-30)),
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
    def _chunk_seg(self, i: int):
        """(seg_ids, valid, weight) for chunk i."""
        view = self.sim.chunk_view(i)
        x = view[self.bins_by].value
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
