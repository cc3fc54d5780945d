"""Profile objects: bin-property passthrough, field/statistic resolution,
sub-profiles, profile-property registry.

Reference counterpart: ``pynbodyext/profiles/profile.py``.  Kept API:
``pr.rbins / pr.dr / pr.binsize / pr.npart_bins``; ``pr["field"]`` →
:class:`~.proarray.ProfileArray`; ``pr["field_p16"]`` statistic-suffix
fallback; ``pr[filter]`` → :class:`SubProfile` sharing edges;
``pr.s / pr.g / pr.dm`` family sub-profiles; class-hierarchy
``profile_property`` registry; ``particles_at_bin[...]``; ``.plot()``.

TPU-native divergence: a sub-profile is the same full-length arrays with an
AND-ed mask and re-used edges — nothing is gathered; ``particles_at_bin``
returns boolean masks (views), not copies.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Union

import jax.numpy as jnp
import numpy as np

from ..quantity import QArray
from .bins import BinsSet, MaterializedBins
from .proarray import ProfileArray, get_statistic

__all__ = ["ProfileBase", "Profile", "SubProfile"]


class _ProfileParticle:
    """Indexer: ``pr.particles_at_bin[i]`` → masked view of the source
    (reference ``profile.py:63-97``)."""

    def __init__(self, profile: "ProfileBase"):
        self._profile = profile

    def __getitem__(self, index):
        mask = self._profile.bins.bin_mask(index)
        return self._profile.sim.base[mask]


class ProfileBase:
    """Shared behaviour of :class:`Profile` and :class:`SubProfile`."""

    # class-hierarchy profile-property registry (reference ``profile.py:121``):
    # each class owns its dict; lookup walks the MRO so properties registered
    # on a base after subclass creation are still visible.
    @classmethod
    def profile_property(cls, fn: Callable) -> Callable:
        """Register ``fn(profile) -> array`` as a named profile property
        (reference ``profile.py:497-522``)."""
        if "_pp_registry" not in cls.__dict__:
            cls._pp_registry = {}
        cls.__dict__["_pp_registry"][fn.__name__] = fn
        return fn

    def _property_owner_type(self) -> type:
        return type(self)

    def _lookup_profile_property(self, name: str) -> Optional[Callable]:
        for klass in self._property_owner_type().__mro__:
            reg = klass.__dict__.get("_pp_registry")
            if reg and name in reg:
                return reg[name]
        return None

    @classmethod
    def registered_profile_properties(cls) -> Dict[str, Callable]:
        out: Dict[str, Callable] = {}
        for klass in reversed(cls.__mro__):
            reg = klass.__dict__.get("_pp_registry")
            if reg:
                out.update(reg)
        return out

    # -- construction -------------------------------------------------------
    def _init_common(self, sim, bins: MaterializedBins,
                     weight: Union[str, None, Any]):
        self.sim = sim
        self.bins = bins
        self._weight_spec = weight
        if weight is None:
            self._weight_values = None
            self._weight_units = None
        elif isinstance(weight, str):
            q = sim[weight]
            self._weight_values = q.value
            self._weight_units = q.units
        elif callable(weight):
            q = weight(sim)
            q = q if isinstance(q, QArray) else QArray(q)
            self._weight_values = q.value
            self._weight_units = q.units
        else:
            q = weight if isinstance(weight, QArray) else QArray(weight)
            self._weight_values = jnp.asarray(q.value)
            self._weight_units = q.units
        self._stats_cache: Dict[str, Dict[str, QArray]] = {}
        self._data_cache: Dict[str, Any] = {}
        self._subprofiles: Dict[Any, "SubProfile"] = {}

    # -- bin-property passthrough (reference ``profile.py:205-228``) ----------
    @property
    def rbins(self) -> QArray:
        return self.bins.rbins

    @property
    def bin_edges(self) -> QArray:
        return self.bins.bin_edges

    @property
    def dr(self) -> QArray:
        return self.bins.dr

    @property
    def binsize(self) -> QArray:
        return self.bins.binsize

    @property
    def npart_bins(self) -> np.ndarray:
        return self.bins.npart_bins

    @property
    def nbins(self) -> int:
        return self.bins.nbins

    @property
    def particles_at_bin(self) -> _ProfileParticle:
        return _ProfileParticle(self)

    def keys(self):
        props = self._property_owner_type().registered_profile_properties()
        return sorted(props) + ["binsize", "rbins", "dr"]

    # -- field resolution (reference ``profile.py:334-373,414-468``) -----------
    def _resolve_field(self, key: str) -> Union[ProfileArray, QArray]:
        if key in self._data_cache:
            return self._data_cache[key]
        if key == "binsize":
            return self.binsize
        if key == "rbins":
            return self.rbins
        if key == "dr":
            return self.dr
        prop = self._lookup_profile_property(key)
        if prop is not None:
            out = prop(self)
            self._data_cache[key] = out
            return out
        # snapshot field (incl. derived)
        try:
            q = self.sim[key]
        except KeyError:
            # statistic-suffix fallback: "mass_p16" → self["mass"]["p16"]
            parts = key.rsplit("_", 1)
            if len(parts) == 2 and get_statistic(parts[1]) is not None \
                    and self.sim.has_field(parts[0]):
                return self._resolve_field(parts[0])[parts[1]]
            if "_" in key:
                head, tail = key.split("_", 1)
                if get_statistic(tail) is not None and self.sim.has_field(head):
                    return self._resolve_field(head)[tail]
            raise KeyError(
                f"cannot resolve profile field {key!r}: not a snapshot "
                f"field, profile property, or <field>_<stat> pattern")
        from ..chunk.stream import is_streaming_array
        if is_streaming_array(q):
            # reference parity: dask inputs are computed before per-bin
            # statistics (``proarray.py:316``)
            q = q.compute()
        pa = ProfileArray(self, key, q.value, q.units)
        self._data_cache[key] = pa
        return pa

    def __getitem__(self, key):
        if isinstance(key, str):
            return self._resolve_field(key)
        return self.get_subprofile(key)

    # -- family attribute mirror (reference ``profile.py:476``) -----------------
    @property
    def s(self) -> "SubProfile":
        return self.get_subprofile("star")

    @property
    def g(self) -> "SubProfile":
        return self.get_subprofile("gas")

    @property
    def dm(self) -> "SubProfile":
        return self.get_subprofile("dm")

    # -- sub-profiles -----------------------------------------------------------
    def _subprofile_key(self, spec):
        if isinstance(spec, str):
            return ("family", spec)
        if hasattr(spec, "signature"):
            try:
                return ("filt", spec.signature())
            except Exception:
                pass
        return ("id", id(spec))

    def get_subprofile(self, spec) -> "SubProfile":
        key = self._subprofile_key(spec)
        sub = self._subprofiles.get(key)
        if sub is None:
            if isinstance(spec, str):
                view = self.sim.families(spec)
            elif hasattr(spec, "where"):
                view = self.sim[spec.where(self.sim)]
            else:
                view = self.sim[spec]  # boolean mask
            sub = SubProfile(self, view)
            self._subprofiles[key] = sub
        return sub

    # -- plotting (reference ``profile.py:375``) ----------------------------------
    def plot(self, field: str, stat: Optional[str] = None, ax=None,
             logx: bool = False, logy: bool = False, **kwargs):
        import matplotlib.pyplot as plt
        if ax is None:
            from pathlib import Path
            style = Path(__file__).parent.parent / "util" / "default.mplstyle"
            with plt.style.context(str(style)):
                _, ax = plt.subplots()
        y = self[field]
        if stat is not None and isinstance(y, ProfileArray):
            y = y[stat]
        x = np.asarray(self.rbins)
        ax.plot(x, np.asarray(y), **kwargs)
        if logx:
            ax.set_xscale("log")
        if logy:
            ax.set_yscale("log")
        ax.set_xlabel(f"r [{self.bins.x_units}]")
        label = field if stat is None else f"{field} ({stat})"
        ax.set_ylabel(label)
        return ax

    def __repr__(self):
        return (f"<{type(self).__name__} nbins={self.bins.nbins} "
                f"by={self.bins.bins_by!r} N={len(self.sim)}>")


class Profile(ProfileBase):
    """Root profile: builds bins over the given view
    (reference ``profile.py:528``)."""

    def __new__(cls, sim=None, **kwargs):
        if sim is not None and hasattr(sim, "chunk_view"):
            # chunked snapshot → streaming profile (per-bin segment sums,
            # one chunk resident at a time); the returned object is not an
            # instance of ``cls`` so ``__init__`` is skipped
            from ..chunk.profile import make_streaming_profile
            return make_streaming_profile(cls, sim, **kwargs)
        return super().__new__(cls)

    def __init__(self, sim, *, weight: Union[str, None, Any] = None,
                 bins_by="r", bins_type="lin", nbins: int = 100,
                 bin_min=None, bin_max=None, bins_area="spherical_shell",
                 bins_set: Optional[BinsSet] = None, **kwargs):
        self.bins_set = bins_set or BinsSet(
            bins_by=bins_by, bins_type=bins_type, nbins=nbins,
            bin_min=bin_min, bin_max=bin_max, bins_area=bins_area)
        self._init_common(sim, self.bins_set(sim), weight)


class SubProfile(ProfileBase):
    """Shares the parent's edges, reassigns its masked view
    (reference ``profile.py:612``)."""

    def __init__(self, parent: ProfileBase, view):
        self.parent = parent
        bins = _root(parent).bins_set.spawn_with_same_edges(view, parent.bins)
        self._init_common(view, bins, parent._weight_spec)

    def _property_owner_type(self) -> type:
        # forward to the root profile's (possibly subclass-specific) registry
        # — reference SubProfile forwards parent keys (profile.py:612-630)
        return type(_root(self.parent))


def _root(p: ProfileBase) -> Profile:
    while isinstance(p, SubProfile):
        p = p.parent
    return p  # type: ignore[return-value]
