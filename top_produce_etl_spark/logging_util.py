"""Idempotent stdlib logging setup (behavioral parity with the
reference's ``src/utils/logger.py:3-16``)."""

from __future__ import annotations

import logging
import sys


def setup_logging(name: str = "top_produce_etl_spark", level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
        )
        logger.addHandler(handler)
    logger.setLevel(level)
    return logger
