"""Logging setup (reference: maskrcnn_benchmark/utils/logger.py:7-28)."""

from __future__ import annotations

import logging
import os
import sys


def setup_logger(name: str, save_dir: str | None = None, filename: str = "log.txt") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False  # root logger would double-print each line
    if not any(isinstance(h, logging.StreamHandler) and not isinstance(h, logging.FileHandler) for h in logger.handlers):
        fmt = logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")
        ch = logging.StreamHandler(stream=sys.stdout)
        ch.setLevel(logging.DEBUG)
        ch.setFormatter(fmt)
        logger.addHandler(ch)
    if save_dir:
        path = os.path.abspath(os.path.join(save_dir, filename))
        have = any(
            isinstance(h, logging.FileHandler) and getattr(h, "baseFilename", None) == path
            for h in logger.handlers
        )
        if not have:
            # a second run dir in the same process (e.g. two experiment
            # arms) must not keep appending to the first dir's log
            for h in [h for h in logger.handlers if isinstance(h, logging.FileHandler)]:
                logger.removeHandler(h)
                h.close()
            os.makedirs(save_dir, exist_ok=True)
            fh = logging.FileHandler(path)
            fh.setLevel(logging.DEBUG)
            fh.setFormatter(logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s"))
            logger.addHandler(fh)
    return logger
