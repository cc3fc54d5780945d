"""User-facing gravity API with unit handling.

Reference counterparts:

* ``Gravity`` class — ``pynbodyext/gravity/base.py:132`` (validates shapes,
  broadcasts scalar softening, lazily builds the tree, per-call
  kernel/threads overrides);
* ``KernelKind`` — ``gravity/base.py:71`` (No/Plummer/Spline, codes matching
  the PyO3 binding 0=Plummer 1=Spline);
* ``calculate_potential`` / ``calculate_acceleration`` — snapshot-level
  helpers with unit coercion (``gravity/pyn_gravity.py:31,125``), returning
  km² s⁻² / km s⁻² quantities.

The ``threads`` knob of the reference maps to nothing on TPU (jit dispatch
is async; multi-chip scaling is a mesh axis, see :mod:`..parallel`) — it is
accepted and ignored for API compatibility.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import jax
import jax.numpy as jnp

from ..quantity import QArray, strip_units
from ..units import G as G_UNIT
from ..units import parse_unit
from .kernels import KERNEL_NONE, KERNEL_PLUMMER, KERNEL_SPLINE
from . import pallas_direct, reference

__all__ = ["KernelKind", "TreeOptions", "Gravity", "calculate_potential",
           "calculate_acceleration", "DENSE_TREE_CROSSOVER_TPU",
           "DENSE_TREE_CROSSOVER_CPU"]

#: measured dense/tree crossover on a single v5e chip: the dense Pallas
#: pipe runs 262k in ~0.65 s; the round-5 device tree (diag band nb2=1 +
#: device-resident combine) solves 100k in 0.16 s / 300k in 0.21 s — the
#: curves now cross near 10⁵ particles (dense 100k ≈ 0.12 s at the
#: measured 85-106 Gpairs/s).  ``method="auto"`` picks dense at or below
#: this.  (Reference idiom: the serial/parallel work threshold in
#: direct.rs:115-187.)
DENSE_TREE_CROSSOVER_TPU = 131_072

#: host fallback crossover: the native direct sum sustains ~1.2e8 pairs/s
#: on this one-core host (BASELINE_HOST.json) while the native BH tree
#: solve is ~O(N log N) — direct wins only for small N.
DENSE_TREE_CROSSOVER_CPU = 32_768


class KernelKind(enum.Enum):
    """Softening kernel selector (reference ``gravity/base.py:71``)."""
    No = None
    Plummer = 0
    Spline = 1

    @property
    def key(self) -> str:
        return {KernelKind.No: KERNEL_NONE,
                KernelKind.Plummer: KERNEL_PLUMMER,
                KernelKind.Spline: KERNEL_SPLINE}[self]

    @classmethod
    def coerce(cls, value) -> "KernelKind":
        if isinstance(value, cls):
            return value
        if value is None:
            return cls.No
        if isinstance(value, str):
            m = {"none": cls.No, "no": cls.No,
                 "plummer": cls.Plummer, "spline": cls.Spline,
                 "cubicsplinew2": cls.Spline}
            try:
                return m[value.lower()]
            except KeyError:
                raise ValueError(f"unknown kernel {value!r}") from None
        return cls(value)


@dataclasses.dataclass
class TreeOptions:
    """Barnes–Hut tree options (reference ``gravity/base.py:82``)."""
    leaf_capacity: int = 8
    multipole_order: int = 3
    kernel: Optional[KernelKind] = None


def _tpu_available() -> bool:
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


class Gravity:
    """Direct-sum / tree gravity solver over raw arrays.

    Parameters mirror the reference (``gravity/base.py:174-238``): positions
    (N,3), masses (N,) (default 1), softening scalar-or-(N,), kernel kind.
    Computation runs in f32 on the Pallas path (TPU) and falls back to the
    blocked jnp reference path on CPU; pass ``force_reference=True`` to pin
    the fallback.
    """

    def __init__(self, pos, mass=None, softening=None,
                 kernel: Optional[KernelKind] = None,
                 tree_options: Optional[TreeOptions] = None,
                 force_reference: Optional[bool] = None):
        pos = jnp.asarray(strip_units(pos))
        if pos.ndim != 2 or pos.shape[1] != 3:
            raise ValueError(f"positions must be (N, 3), got {pos.shape}")
        n = pos.shape[0]
        self.pos = pos.astype(jnp.float32)
        if mass is not None:
            mass = jnp.asarray(strip_units(mass), jnp.float32)
            if mass.shape not in ((), (n,)):
                raise ValueError(f"masses must be scalar or (N,), got "
                                 f"{mass.shape}")
            mass = jnp.broadcast_to(mass, (n,))
        self.mass = mass
        if softening is not None:
            softening = jnp.asarray(strip_units(softening), jnp.float32)
            # keep scalars 0-d: the Pallas path has a uniform-softening fast
            # path; solvers broadcast internally where needed
            if softening.ndim != 0 and softening.shape != (n,):
                raise ValueError("softening must be scalar or (N,)")
        self.softening = softening
        self.kernel = KernelKind.coerce(kernel)
        self.tree_options = tree_options or TreeOptions()
        if force_reference is None:
            force_reference = not _tpu_available()
        self.force_reference = force_reference
        self._tree = None
        self._pallas_preps = {}

    # -- kernel resolution -------------------------------------------------
    def _kernel_key(self, kernel=None) -> str:
        kind = self.kernel if kernel is None else KernelKind.coerce(kernel)
        if self.softening is None:
            return KERNEL_NONE
        if kind == KernelKind.No:
            # softening present but no explicit kernel → Plummer, matching
            # the binding's parse_kernel_opt default (gravity.rs:77-82)
            return KERNEL_PLUMMER
        return kind.key

    def _soft(self):
        return self.softening

    # -- direct sums -----------------------------------------------------------
    def direct_potentials(self, targets=None, threads: int = 0,
                          kernel=None):
        k = self._kernel_key(kernel)
        if self.force_reference:
            return reference.direct_potentials_ref(
                self.pos, self.mass, self._soft(), targets=targets,
                kernel=k)
        return pallas_direct.direct_potentials(
            self.pos, self.mass, self._soft(), targets=targets, kernel=k)

    def direct_accelerations(self, targets=None, threads: int = 0,
                             kernel=None):
        k = self._kernel_key(kernel)
        if self.force_reference:
            return reference.direct_accelerations_ref(
                self.pos, self.mass, self._soft(), targets=targets,
                kernel=k)
        return pallas_direct.direct_accelerations(
            self.pos, self.mass, self._soft(), targets=targets, kernel=k)

    # -- tree (Barnes–Hut) --------------------------------------------------------
    def get_tree(self, rebuild: bool = False):
        if self._tree is None or rebuild:
            from .tree import Octree
            self._tree = Octree(
                self.pos, self.mass,
                leaf_capacity=self.tree_options.leaf_capacity,
                multipole_order=self.tree_options.multipole_order,
                softenings=self.softening,
                kernel=self._kernel_key(self.tree_options.kernel))
        return self._tree

    def _pallas_prep(self, theta: float):
        """Per-instance cache of the production device-tree prep (the
        expensive host phase: lists, classes, payload gathers)."""
        key = float(theta)
        if key not in self._pallas_preps:
            from .tree_tpu import prepare_tree_pallas
            self._pallas_preps[key] = prepare_tree_pallas(self.get_tree(),
                                                          theta=theta)
        return self._pallas_preps[key]

    def tree_potentials(self, targets=None, theta: float = 0.7,
                        threads: int = 0, kernel=None,
                        device: bool = False, mesh=None):
        """Barnes–Hut potentials.  ``device=True`` evaluates the traversal's
        interaction lists on the accelerator (tree_tpu), for the self set
        and at arbitrary query points.  On TPU the self set runs the
        production Pallas engines (packed near field + batched far field);
        on CPU it falls back to the XLA-gather engine (the Pallas path
        needs interpret mode there — hours at scale).

        ``mesh``: a 1-D :class:`jax.sharding.Mesh` runs the device paths
        data-parallel over its chips (reference parity: the Rust tree
        solves on every core through the pool knob,
        ``pynbodyext-rust/src/gravity.rs:87-103``)."""
        interp = mesh is not None and not _tpu_available()
        if device:
            if targets is None:
                if _tpu_available() or mesh is not None:
                    from .tree_tpu import tree_potentials_device_pallas
                    return tree_potentials_device_pallas(
                        self.get_tree(), theta=theta, interpret=interp,
                        prep=self._pallas_prep(theta), mesh=mesh)
                from .tree_tpu import tree_potentials_device
                return tree_potentials_device(self.get_tree(), theta=theta)
            from .tree_tpu import tree_potentials_at_points_device
            return tree_potentials_at_points_device(
                self.get_tree(), targets, theta=theta, interpret=interp,
                mesh=mesh)
        return self.get_tree().compute_potentials(theta=theta,
                                                  targets=targets,
                                                  threads=threads)

    def tree_accelerations(self, targets=None, theta: float = 0.7,
                           threads: int = 0, kernel=None,
                           device: bool = False, mesh=None):
        """See :meth:`tree_potentials` (``mesh`` shards the device
        paths over its chips)."""
        interp = mesh is not None and not _tpu_available()
        if device:
            if targets is None:
                if _tpu_available() or mesh is not None:
                    from .tree_tpu import tree_accelerations_device_pallas
                    return tree_accelerations_device_pallas(
                        self.get_tree(), theta=theta, interpret=interp,
                        prep=self._pallas_prep(theta), mesh=mesh)
                from .tree_tpu import tree_accelerations_device
                return tree_accelerations_device(self.get_tree(), theta=theta)
            from .tree_tpu import tree_accelerations_at_points_device
            return tree_accelerations_at_points_device(
                self.get_tree(), targets, theta=theta, interpret=interp,
                mesh=mesh)
        return self.get_tree().compute_accelerations(theta=theta,
                                                     targets=targets,
                                                     threads=threads)

    # -- auto method selection ----------------------------------------------
    def auto_method(self) -> str:
        """Pick the fastest solver for this problem size on the attached
        backend: dense direct sum at or below the measured crossover
        (:data:`DENSE_TREE_CROSSOVER_TPU` / ``_CPU``), tree above it."""
        n = self.pos.shape[0]
        if self.force_reference:
            return ("direct" if n <= DENSE_TREE_CROSSOVER_CPU else "tree")
        return ("direct" if n <= DENSE_TREE_CROSSOVER_TPU
                else "tree-device")

    def potentials(self, targets=None, theta: float = 0.7,
                   threads: int = 0, method: str = "auto"):
        """Potentials via ``method``: 'auto' (size-based dense/tree pick),
        'direct', 'tree' (native host BH) or 'tree-device'."""
        if method == "auto":
            method = self.auto_method()
        if method == "direct":
            return self.direct_potentials(targets=targets, threads=threads)
        if method == "tree":
            return self.tree_potentials(targets=targets, theta=theta,
                                        threads=threads)
        if method == "tree-device":
            return self.tree_potentials(targets=targets, theta=theta,
                                        device=True)
        raise ValueError(f"unknown method {method!r}; use 'auto', "
                         "'direct', 'tree' or 'tree-device'")

    def accelerations(self, targets=None, theta: float = 0.7,
                      threads: int = 0, method: str = "auto"):
        """Accelerations via ``method`` (see :meth:`potentials`)."""
        if method == "auto":
            method = self.auto_method()
        if method == "direct":
            return self.direct_accelerations(targets=targets,
                                             threads=threads)
        if method == "tree":
            return self.tree_accelerations(targets=targets, theta=theta,
                                           threads=threads)
        if method == "tree-device":
            return self.tree_accelerations(targets=targets, theta=theta,
                                           device=True)
        raise ValueError(f"unknown method {method!r}; use 'auto', "
                         "'direct', 'tree' or 'tree-device'")


# ---------------------------------------------------------------------------
# Snapshot-level helpers (reference ``pyn_gravity.py``)
# ---------------------------------------------------------------------------

def _coerce_softening(sim, softening):
    """Softening → raw values in pos units (reference ``pyn_gravity.py:14``)."""
    if softening is None:
        return None
    pos_units = sim["pos"].units
    ctx = sim.units_context()
    if isinstance(softening, str):
        return parse_unit(softening).ratio(pos_units, **ctx)
    if isinstance(softening, QArray):
        return softening.to_value(pos_units, **ctx)
    return strip_units(softening)


def _gravity_for(sim, softening, kernel, method_needs=None):
    base = sim.base if hasattr(sim, "base") else sim
    mask = getattr(sim, "mask", None)
    pos = sim["pos"].value
    mass = sim["mass"].value
    if mask is not None:
        # gravity needs the actual subset: gather once (documented exception
        # to the no-gather rule — O(N²) work dwarfs one gather)
        idx = jnp.nonzero(mask)[0]
        pos = pos[idx]
        mass = mass[idx]
        soft = _coerce_softening(sim, softening)
        if soft is not None and jnp.ndim(soft) == 1:
            soft = jnp.asarray(soft)[idx]
    else:
        soft = _coerce_softening(sim, softening)
    return Gravity(pos, mass, soft, kernel=kernel)


def calculate_potential(sim, softening=None, kernel=None,
                        method: str = "direct", theta: float = 0.7,
                        threads: int = 0) -> QArray:
    """Gravitational potential per particle in km² s⁻²
    (reference ``pyn_gravity.py:31-123``)."""
    g = _gravity_for(sim, softening, kernel)
    pot = g.potentials(theta=theta, threads=threads, method=method)
    units = G_UNIT * sim["mass"].units / sim["pos"].units
    q = QArray(pot * units.ratio("km**2 s**-2", **sim.units_context()),
               "km**2 s**-2")
    return q


def calculate_acceleration(sim, softening=None, kernel=None,
                           method: str = "direct", theta: float = 0.7,
                           threads: int = 0) -> QArray:
    """Gravitational acceleration per particle in km s⁻²
    (reference ``pyn_gravity.py:125-216``)."""
    g = _gravity_for(sim, softening, kernel)
    acc = g.accelerations(theta=theta, threads=threads, method=method)
    units = G_UNIT * sim["mass"].units / sim["pos"].units ** 2
    return QArray(acc * units.ratio("km s**-2", **sim.units_context()),
                  "km s**-2")
