"""NGSD — the diagnostics database layer.

Behavioral reference: ngs-bits cppNGSD (NGSD.h/NGSD.cpp, MySQL). This build
runs the same schema on SQLite: the shipped MySQL DDL/DML is translated on
the fly (ngsd/sqlconvert.py), and the NGSD class (ngsd/db.py) exposes the
query API slices the NGSD* tools need.
"""

from .db import NGSD, NgsdError

__all__ = ["NGSD", "NgsdError"]
