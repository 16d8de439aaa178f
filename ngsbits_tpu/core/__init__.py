from . import basicstats, histogram, qcml  # noqa: F401
