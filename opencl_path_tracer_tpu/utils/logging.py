"""Logging: a thin stdlib wrapper with one shared formatter.

The reference logs with bare printf (device dump main.cpp:389-455,
material dump :573-580, kd sizes :629, perf meter :1236); here the
equivalents go through a named logger so library users can silence or
redirect them.
"""

from __future__ import annotations

import logging
import os
import sys

_CONFIGURED = False


def get_logger(name: str = "ptx") -> logging.Logger:
    global _CONFIGURED
    logger = logging.getLogger(name)
    if not _CONFIGURED:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter("[%(name)s %(levelname).1s] %(message)s")
        )
        root = logging.getLogger("ptx")
        root.addHandler(handler)
        root.setLevel(os.environ.get("PTX_LOG", "INFO").upper())
        root.propagate = False
        _CONFIGURED = True
    return logger
