"""Logging for facenet_tpu.

Replaces the reference's loguru file sink (/root/reference/facenet/logging.py:7-12)
with a stdlib-logging logger that mimics the loguru surface used by the
reference code (`logger.info(...)` with lazy file sinks added per run).
"""

from __future__ import annotations

import logging as _logging
import sys
from pathlib import Path

_FORMAT = '%(asctime)s | %(levelname)-7s | %(name)s - %(message)s'

logger = _logging.getLogger('facenet_tpu')
logger.setLevel(_logging.INFO)

if not logger.handlers:  # console sink once
    _console = _logging.StreamHandler(sys.stderr)
    _console.setFormatter(_logging.Formatter(_FORMAT))
    logger.addHandler(_console)


def add_file_sink(file):
    """Add a file sink to the global logger; returns the handler."""
    file = Path(file).expanduser()
    file.parent.mkdir(parents=True, exist_ok=True)
    handler = _logging.FileHandler(str(file))
    handler.setFormatter(_logging.Formatter(_FORMAT))
    logger.addHandler(handler)
    return handler


def configure_logging(cfg):
    """Configure the application logging.

    Same contract as the reference configure_logging (logging.py:7-12):
    cfg has `.dir` and `.file`; the sink file is dir/file.
    """
    file = Path(str(cfg.dir)) / str(cfg.file)
    return add_file_sink(file)
