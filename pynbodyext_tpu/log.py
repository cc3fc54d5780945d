"""Package logger: duplicate-suppressing, optionally ANSI-colored.

Reference counterpart: ``/root/reference/pynbodyext/log.py`` (``pynext``
logger with dedup filter + color formatter + format presets).
"""

from __future__ import annotations

import logging
import sys

__all__ = ["logger", "setlevel", "set_color", "set_format"]

_COLORS = {
    logging.DEBUG: "\x1b[2m",      # dim
    logging.INFO: "\x1b[36m",      # cyan
    logging.WARNING: "\x1b[33m",   # yellow
    logging.ERROR: "\x1b[31m",     # red
    logging.CRITICAL: "\x1b[41m",  # red bg
}
_RESET = "\x1b[0m"

_FORMATS = {
    "compact": "%(message)s",
    "level": "[%(levelname)s] %(message)s",
    "time": "%(asctime)s [%(levelname)s] %(message)s",
}


class _DedupFilter(logging.Filter):
    """Suppress consecutive duplicate messages (reference ``log.py:13``)."""

    def __init__(self):
        super().__init__()
        self._seen: set = set()
        self.enabled = True

    def filter(self, record: logging.LogRecord) -> bool:
        if not self.enabled:
            return True
        key = (record.levelno, record.getMessage())
        if key in self._seen:
            return False
        self._seen.add(key)
        if len(self._seen) > 4096:
            self._seen.clear()
        return True

    def reset(self):
        self._seen.clear()


class _ColorFormatter(logging.Formatter):
    def __init__(self, fmt: str, color: bool):
        super().__init__(fmt)
        self.color = color

    def format(self, record):
        out = super().format(record)
        if self.color:
            out = _COLORS.get(record.levelno, "") + out + _RESET
        return out


logger = logging.getLogger("pnxtpu")
_dedup = _DedupFilter()


def _tty() -> bool:
    try:
        return sys.stderr.isatty()
    except Exception:
        return False


def _init():
    if logger.handlers:
        return
    h = logging.StreamHandler()
    h.setFormatter(_ColorFormatter(_FORMATS["level"], _tty()))
    h.addFilter(_dedup)
    logger.addHandler(h)
    logger.setLevel(logging.WARNING)


def setlevel(level) -> None:
    _init()
    logger.setLevel(level)


def set_color(enable: bool) -> None:
    _init()
    for h in logger.handlers:
        if isinstance(h.formatter, _ColorFormatter):
            h.formatter.color = enable


def set_format(preset: str = "level") -> None:
    _init()
    fmt = _FORMATS.get(preset, preset)
    for h in logger.handlers:
        color = isinstance(h.formatter, _ColorFormatter) and h.formatter.color
        h.setFormatter(_ColorFormatter(fmt, color))


def set_dedup(enable: bool) -> None:
    _dedup.enabled = enable
    if not enable:
        _dedup.reset()


_init()
