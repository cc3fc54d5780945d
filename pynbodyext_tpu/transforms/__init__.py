"""Frame transforms (pure, functional).

Reference counterpart: ``pynbodyext/transforms`` (shift / rotate / wrap),
re-designed as snapshot→snapshot pure functions (no revert handles).
"""

from .rotate import AlignAngMomVec, AlignVec
from .shift import ShiftPosTo, ShiftVelTo
from .wrap import WrapBox

__all__ = ["ShiftPosTo", "ShiftVelTo", "AlignVec", "AlignAngMomVec",
           "WrapBox"]
