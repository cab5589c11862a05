"""Leveled logging setup (cpp/include/logging.h role) — rank-0 gating included."""

from __future__ import annotations

import logging
import sys

_LEVELS = {
    "error": logging.ERROR,
    "warning": logging.WARNING,
    "info": logging.INFO,
    "debug": logging.DEBUG,
}


def set_level(level: str = "info", rank0_only: bool = True) -> logging.Logger:
    """Configure the upsp_tpu logger; non-zero processes log warnings+ only.

    Mirrors the reference's rank-gated LogSetLevel (psp_process.cpp:1338).
    """
    logger = logging.getLogger("upsp_tpu")
    lvl = _LEVELS.get(level.lower(), logging.INFO)
    if rank0_only:
        try:
            import jax

            if jax.process_index() != 0:
                lvl = max(lvl, logging.WARNING)
        except Exception:
            pass
    logger.setLevel(lvl)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
        )
        logger.addHandler(h)
    return logger
