"""Plotting helpers.

Reference counterpart: ``pynbodyext/plot`` — a 10-line docstring stub
declaring "2D galaxy/halo image calculators" as intent (``plot/image.py``).
Here the intent is implemented: device-side 2D particle images
(:func:`~.image.particle_image`, :func:`~.image.render_image`).
Profile line plots live on :meth:`~..profiles.ProfileBase.plot`.
"""

from .image import particle_image, render_image

__all__ = ["particle_image", "render_image"]
