"""setup_logger handler hygiene: one stream handler per logger, and a
second run directory in the same process moves the file handler instead
of appending to the first directory's log (two experiment arms sharing
a process must produce disjoint log.txt files)."""

import logging
import os

from mmt_psm_tpu.utils.logger import setup_logger


def test_no_duplicate_stream_handlers():
    lg = setup_logger("t_logger_a")
    n0 = len(lg.handlers)
    lg2 = setup_logger("t_logger_a")
    assert lg2 is lg and len(lg.handlers) == n0
    assert not lg.propagate


def test_file_handler_moves_between_run_dirs(tmp_path):
    d1, d2 = str(tmp_path / "run1"), str(tmp_path / "run2")
    lg = setup_logger("t_logger_b", d1)
    lg.info("first-arm line")
    lg = setup_logger("t_logger_b", d2)
    lg.info("second-arm line")
    for h in lg.handlers:
        h.flush()
    log1 = open(os.path.join(d1, "log.txt")).read()
    log2 = open(os.path.join(d2, "log.txt")).read()
    assert "first-arm line" in log1 and "second-arm line" not in log1
    assert "second-arm line" in log2 and "first-arm line" not in log2
    # exactly one file handler survives
    assert sum(isinstance(h, logging.FileHandler) for h in lg.handlers) == 1
