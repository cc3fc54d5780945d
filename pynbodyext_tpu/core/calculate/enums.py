"""Engine enums and policies.

Reference counterpart: ``pynbodyext/core/calculate/enums.py`` (NodeStatus,
RecordPolicy, EffectPolicy, CachePolicy, ErrorPolicy, RevertPolicy,
BuiltinKinds).  Same vocabulary, re-stated for the functional TPU engine:
``EffectPolicy.MUTATING`` no longer exists because transforms are pure
frame→frame functions here; ``RevertPolicy`` survives as a no-op compat knob.
"""

from __future__ import annotations

import re
from enum import Enum

__all__ = ["NodeStatus", "RecordPolicy", "EffectPolicy", "CachePolicy",
           "ErrorPolicy", "RevertPolicy", "BuiltinKinds", "validate_kind"]


class NodeStatus(str, Enum):
    PENDING = "pending"
    RUNNING = "running"
    DONE = "done"
    CACHED = "cached"
    ERROR = "error"


class RecordPolicy(str, Enum):
    """How much of a node's value the Result retains."""
    NONE = "none"
    SUMMARY = "summary"
    FULL = "full"
    ERROR_ONLY = "error_only"


class EffectPolicy(str, Enum):
    """Node effect class.  All nodes are pure in the functional engine;
    CONTEXTUAL marks nodes whose value depends on the evaluation scope
    (transforms/filters) beyond their own params."""
    PURE = "pure"
    CONTEXTUAL = "contextual"


class CachePolicy(str, Enum):
    AUTO = "auto"          # size-based admission
    FULL = "full"          # always cache
    NONE = "none"          # never cache
    SMALL_ONLY = "small_only"


class ErrorPolicy(str, Enum):
    RAISE = "raise"
    COLLECT = "collect"
    COLLECT_PARTIAL = "collect_partial"


class RevertPolicy(str, Enum):
    """Compat shim: frames are immutable, nothing is ever physically
    reverted.  ALWAYS keeps the reference semantics (scope ends → outer
    nodes see the untransformed frame); NEVER would leak the transform
    outward, which the functional engine intentionally does not support."""
    ALWAYS = "always"
    NEVER = "never"


class BuiltinKinds:
    PROPERTY = "property"
    FILTER = "filter"
    TRANSFORM = "transform"
    BOUND = "bound"
    COMBINED = "combined"
    PIPELINE = "pipeline"
    EXPR = "expr"
    CONSTANT = "constant"
    LAMBDA = "lambda"
    PROFILE = "profile"

    ALL = (PROPERTY, FILTER, TRANSFORM, BOUND, COMBINED, PIPELINE, EXPR,
           CONSTANT, LAMBDA, PROFILE)


_KIND_RE = re.compile(r"^[a-z][a-z0-9_\-]*$")


def validate_kind(kind: str) -> str:
    if not _KIND_RE.match(kind):
        raise ValueError(f"invalid node kind {kind!r}")
    return kind
