"""Device-side compute primitives (raw jnp/lax — the jit boundary).

Everything here takes and returns plain jax arrays; masks replace the
reference's gathered sub-snapshots (SURVEY.md §7 "Hard parts: dynamic
shapes" — reductions take (values, mask, weights) and never materialize
subsets).
"""

from .masked import (
    mcount,
    mmax,
    mmean,
    mmin,
    msum,
    containment_radius,
    radius_at_surface_density,
    virial_radius,
    weighted_quantile,
)
from .center import (center_of_mass, hybrid_center, potential_center,
                     shrink_sphere_center)
from .geometry import faceon_matrix, apply_rotation
from .segment import (assign_bins, segment_counts, segment_stat, segment_sum,
                      segment_weighted_quantile)

__all__ = [
    "msum", "mmean", "mmin", "mmax", "mcount",
    "weighted_quantile", "containment_radius",
    "radius_at_surface_density", "virial_radius",
    "center_of_mass", "shrink_sphere_center", "potential_center",
    "hybrid_center",
    "faceon_matrix", "apply_rotation",
    "assign_bins", "segment_stat", "segment_sum", "segment_counts",
    "segment_weighted_quantile",
]
