"""Repr / formatting helpers (reference: ``core/calculate/display.py``)."""

from __future__ import annotations

from typing import Any

import numpy as np

__all__ = ["compact_repr", "format_time", "format_mem", "html_pre",
           "summarize_value"]


def compact_repr(value: Any, maxlen: int = 60) -> str:
    """Short single-line repr for node params and values."""
    try:
        if hasattr(value, "shape"):
            # repr of a DEVICE array (any ndim, incl. 0-d scalars) forces a
            # host readback — ~29 ms per node through the TPU relay.  Only
            # host numpy 0-d scalars are cheap enough to show by value.
            if isinstance(value, (np.ndarray, np.generic)) \
                    and getattr(value, "ndim", 1) == 0:
                s = repr(value)
            else:
                kind = type(value).__name__
                if hasattr(value, "units"):
                    return (f"<{kind} {tuple(value.shape)} "
                            f"{getattr(value, 'dtype', '?')} '{value.units}'>")
                return (f"<{kind} {tuple(value.shape)} "
                        f"{getattr(value, 'dtype', '?')}>")
        else:
            s = repr(value)
    except Exception:
        s = f"<{type(value).__name__}>"
    if len(s) > maxlen:
        s = s[:maxlen - 1] + "…"
    return s


def format_time(seconds: float) -> str:
    if seconds < 1e-3:
        return f"{seconds * 1e6:.0f}µs"
    if seconds < 1.0:
        return f"{seconds * 1e3:.1f}ms"
    if seconds < 60:
        return f"{seconds:.2f}s"
    return f"{int(seconds // 60)}m{seconds % 60:.0f}s"


def format_mem(nbytes: float) -> str:
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if abs(nbytes) < 1024:
            return f"{nbytes:.1f}{unit}"
        nbytes /= 1024
    return f"{nbytes:.1f}PB"


def html_pre(text: str) -> str:
    import html
    return f"<pre style='font-size:11px;line-height:1.3'>{html.escape(text)}</pre>"


def html_card(title: str, body_html: str) -> str:
    """Bordered card wrapper (reference ``display.py:78-160``)."""
    return ("<div style='border:1px solid #ccc;border-radius:6px;"
            "padding:8px 12px;margin:4px 0;font-family:monospace'>"
            f"<b>{title}</b><div>{body_html}</div></div>")


def html_table(rows, header=None) -> str:
    """Minimal HTML table from row tuples."""
    import html as _h
    out = ["<table style='font-size:11px;border-collapse:collapse'>"]
    if header:
        out.append("<tr>" + "".join(
            f"<th style='text-align:left;padding:1px 8px'>{_h.escape(str(c))}</th>"
            for c in header) + "</tr>")
    for row in rows:
        out.append("<tr>" + "".join(
            f"<td style='padding:1px 8px'>{_h.escape(str(c))}</td>"
            for c in row) + "</tr>")
    out.append("</table>")
    return "".join(out)


def mimebundle(text: str, html_str: str) -> dict:
    """text/plain + text/html bundle for ``_repr_mimebundle_`` hooks."""
    return {"text/plain": text, "text/html": html_str}


def estimate_bytes(value: Any) -> int:
    """Rough device/host memory footprint of a value (for cache admission)."""
    seen: set = set()

    def walk(v) -> int:
        if id(v) in seen:
            return 0
        seen.add(id(v))
        if hasattr(v, "nbytes"):
            return int(v.nbytes)
        if hasattr(v, "value") and hasattr(v.value, "nbytes"):  # QArray
            return int(v.value.nbytes)
        if hasattr(v, "shape") and hasattr(v, "dtype"):
            try:
                return int(np.prod(v.shape)) * np.dtype(v.dtype).itemsize
            except Exception:
                return 256
        if isinstance(v, (list, tuple, set)):
            return sum(walk(x) for x in v)
        if isinstance(v, dict):
            return sum(walk(x) for x in v.values())
        if isinstance(v, (int, float, complex, bool)):
            return 16
        if isinstance(v, str):
            return len(v)
        return 64
    try:
        return walk(value)
    except Exception:
        return 1 << 30  # unknown → treat as big, don't cache


def summarize_value(value: Any) -> dict:
    """Machine-readable value summary (reference ``engine.py:604``)."""
    info: dict = {"type": type(value).__name__}
    if hasattr(value, "shape"):
        info["shape"] = tuple(getattr(value, "shape", ()))
        info["dtype"] = str(getattr(value, "dtype", ""))
    if hasattr(value, "units"):
        info["units"] = str(value.units)
    if isinstance(value, (int, float, complex, bool)):
        info["value"] = value
    info["bytes"] = estimate_bytes(value)
    info["repr"] = compact_repr(value)
    return info
