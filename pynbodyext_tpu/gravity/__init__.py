"""Gravity solvers: tiled O(N²) direct summation (Pallas) + softening kernels.

Reference counterpart: the Rust crates ``crates/gravity`` +
``crates/pynbodyext-rust`` (SURVEY.md §2.5).  The rayon-parallel native path
becomes one Pallas kernel per quantity; multi-chip scaling lives in
:mod:`..parallel`.
"""

from .api import Gravity, KernelKind, TreeOptions, calculate_acceleration, calculate_potential
from .kernels import kernel_accel_factor, kernel_potential_per_unit_mass
from .reference import (direct_accelerations_ref, direct_potentials_ref)
from .pallas_direct import direct_accelerations, direct_potentials
from .prep_cache import cached_prepare_tree_pallas, refresh_tree_prep_cache

__all__ = [
    "cached_prepare_tree_pallas", "refresh_tree_prep_cache",
    "Gravity", "KernelKind", "TreeOptions",
    "calculate_potential", "calculate_acceleration",
    "direct_potentials", "direct_accelerations",
    "direct_potentials_ref", "direct_accelerations_ref",
    "kernel_potential_per_unit_mass", "kernel_accel_factor",
]
