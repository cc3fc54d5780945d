"""2D galaxy/halo images as device-side histograms.

The reference declares this module as intent only (``plot/image.py`` is a
docstring stub).  TPU-native implementation: a masked 2-D binning is two
``searchsorted``s + one ``segment_sum`` over the flattened pixel grid — the
same machinery as profiles, fully jittable; optional Gaussian smoothing is a
separable convolution.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..quantity import QArray, strip_units

__all__ = ["particle_image", "render_image"]

_AXES = {"x": 0, "y": 1, "z": 2}


@partial(jax.jit, static_argnames=("resolution",))
def _histogram2d(u, v, w, mask, half_width, resolution: int):
    edges = jnp.linspace(-half_width, half_width, resolution + 1)
    iu = jnp.clip(jnp.searchsorted(edges, u, side="right") - 1,
                  0, resolution - 1)
    iv = jnp.clip(jnp.searchsorted(edges, v, side="right") - 1,
                  0, resolution - 1)
    inside = ((u >= -half_width) & (u <= half_width)
              & (v >= -half_width) & (v <= half_width))
    if mask is not None:
        inside = jnp.logical_and(inside, mask)
    wm = jnp.where(inside, w, 0.0)
    flat = iv * resolution + iu
    img = jax.ops.segment_sum(wm, flat, num_segments=resolution * resolution)
    return img.reshape(resolution, resolution)


def _blur(img, sigma: float):
    radius = max(1, int(3 * sigma))
    x = jnp.arange(-radius, radius + 1, dtype=img.dtype)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)

    def conv1d(a):
        return jnp.convolve(a, k, mode="same")

    img = jax.vmap(conv1d)(img)        # along rows
    img = jax.vmap(conv1d)(img.T).T    # along cols
    return img


def particle_image(sim, qty: Optional[str] = None, width="20 kpc",
                   resolution: int = 256, axes: str = "xy",
                   average: bool = False, smooth: float = 0.0):
    """Project particles onto a 2-D pixel grid.

    Parameters
    ----------
    sim : Snapshot or ParticleView
        Source view; masks fuse into the binning.
    qty : field name or None
        Quantity to accumulate; ``None`` → mass surface density per pixel.
    width : float or unit string
        Full image width in position units.
    axes : two of "xyz"
        Projection plane (third axis integrated out).
    average : bool
        If True, mass-weighted average of ``qty`` per pixel instead of sum.
    smooth : float
        Gaussian smoothing length in pixels (0 disables).

    Returns
    -------
    (image QArray of shape (resolution, resolution), extent tuple)
    """
    pos = sim["pos"]
    if isinstance(width, str):
        from ..units import parse_unit
        width_val = parse_unit(width).ratio(pos.units, **sim.units_context())
    else:
        width_val = float(strip_units(width))
    half = width_val / 2.0
    ax_u, ax_v = _AXES[axes[0]], _AXES[axes[1]]
    u = pos.value[:, ax_u]
    v = pos.value[:, ax_v]
    mass = sim["mass"]
    mask = sim.mask

    pixel_area = (width_val / resolution) ** 2
    if qty is None:
        img = _histogram2d(u, v, mass.value, mask,
                           jnp.asarray(half, pos.value.dtype), resolution)
        out = QArray(img / pixel_area, mass.units / pos.units ** 2)
    else:
        q = sim[qty]
        wq = _histogram2d(u, v, mass.value * q.value, mask,
                          jnp.asarray(half, pos.value.dtype), resolution)
        if average:
            wm = _histogram2d(u, v, mass.value, mask,
                              jnp.asarray(half, pos.value.dtype), resolution)
            out = QArray(wq / jnp.where(wm == 0, 1.0, wm), q.units)
        else:
            out = QArray(wq / pixel_area,
                         mass.units * q.units / pos.units ** 2)
    if smooth > 0:
        out = QArray(_blur(out.value, smooth), out.units)
    extent = (-half, half, -half, half)
    return out, extent


def render_image(sim, qty: Optional[str] = None, width="20 kpc",
                 resolution: int = 256, axes: str = "xy",
                 average: bool = False, smooth: float = 1.0,
                 log: bool = True, ax=None, cmap="inferno", **imshow_kw):
    """Matplotlib rendering of :func:`particle_image`."""
    import matplotlib.pyplot as plt
    img, extent = particle_image(sim, qty=qty, width=width,
                                 resolution=resolution, axes=axes,
                                 average=average, smooth=smooth)
    data = np.asarray(img)
    if log:
        floor = data[data > 0].min() if (data > 0).any() else 1.0
        data = np.log10(np.maximum(data, floor * 1e-3))
    if ax is None:
        _, ax = plt.subplots()
    im = ax.imshow(data, origin="lower", extent=extent, cmap=cmap,
                   **imshow_kw)
    ax.set_xlabel(f"{axes[0]} [{sim['pos'].units}]")
    ax.set_ylabel(f"{axes[1]} [{sim['pos'].units}]")
    plt.colorbar(im, ax=ax)
    return ax
