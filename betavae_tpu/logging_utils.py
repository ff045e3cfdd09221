"""Structured logging: the ``CONFIG {json}`` / ``METRICS {json}`` protocol.

Byte-compatible with the reference log-line protocol
(``src/utils/brain_tumor_utils/logger.py:10-43``): every metrics record is a
single line ``<ts> | <LEVEL> | METRICS {"phase": ..., "step": ..., ...}`` so
the downstream plot/repair scripts (``scripts/plot_phase_losses.py:26-41``,
``scripts/plot_logs.py``, ``scripts/fix_steps.py:13-38``) can parse our logs
and the reference's interchangeably.
"""

from __future__ import annotations

import json
import logging
import math
import os
import sys

from .config import get_config

_logger = None


def _json_safe(v):
    """JSON-encode NaN/inf the way the reference does (json allows NaN)."""
    if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
        return v
    return v


# every record renders as "<ts> | <LEVEL> | <msg>" — the line shape the
# downstream plot/repair scripts key their regexes on
_LINE_FORMAT = "%(asctime)s | %(levelname)s | %(message)s"


def _build_handlers(cfg) -> list:
    """stdout always; plus the per-run log file when ``log_to_file`` is on."""
    handlers = [logging.StreamHandler(sys.stdout)]
    if cfg.logging.log_to_file:
        log_dir = os.path.join(cfg.paths.outputs_dir, "logs")
        os.makedirs(log_dir, exist_ok=True)
        handlers.append(logging.FileHandler(
            os.path.join(log_dir, f"{cfg.paths.run_id}.log")))
    fmt = logging.Formatter(_LINE_FORMAT)
    for h in handlers:
        h.setFormatter(fmt)
    return handlers


def init_logger(name: str = "beta_vae_se") -> logging.Logger:
    """Process-wide singleton emitting the protocol line shape
    (capability parity: reference ``logger.py:10-32``)."""
    global _logger
    if _logger is None:
        cfg = get_config()
        logger = logging.getLogger(name)
        logger.setLevel(getattr(logging, str(cfg.logging.log_level).upper(),
                                logging.INFO))
        logger.propagate = False
        if not logger.handlers:  # idempotent across re-inits in one process
            for h in _build_handlers(cfg):
                logger.addHandler(h)
        _logger = logger
    return _logger


def reset_logger() -> None:
    """Drop the logger singleton and close its handlers (tests)."""
    global _logger
    if _logger is not None:
        for h in list(_logger.handlers):
            h.close()
            _logger.removeHandler(h)
    _logger = None


def log_config(extras: dict | None = None) -> None:
    """``CONFIG {json}`` line (reference ``logger.py:34-37``).

    ``extras`` adds run-resolution facts the YAML alone doesn't show (e.g.
    the LPIPS weight source); additive keys keep parser compatibility.
    """
    logger = init_logger()
    cfg = get_config().to_dict()
    if extras:
        cfg.update(extras)
    logger.info("CONFIG " + json.dumps(cfg))


def log_metrics(metrics: dict, step=None, phase: str = "train") -> None:
    """``METRICS {json}`` line with phase/step first (reference ``logger.py:39-43``)."""
    logger = init_logger()
    payload = {"phase": phase, "step": step}
    payload.update({k: _json_safe(v) for k, v in metrics.items()})
    logger.info("METRICS " + json.dumps(payload))
