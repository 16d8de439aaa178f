"""NgsBitsInfo tool.

Behavioral reference: ngs-bits NgsBitsInfo/main.cpp:24-38 — prints version,
date, OS, architecture and library version info to STDOUT.
"""

from __future__ import annotations

import platform
import sys

from .toolbase import ToolBase


class NgsBitsInfoTool(ToolBase):
    name = "NgsBitsInfo"
    description = "Writes general information about ngs-bits to STDOUT."
    changelog = [(2026, 6, 18, "Initial version.")]

    def setup(self):
        pass

    def main(self):
        from .. import __version__
        print(f"ngs-bits version: {__version__}")
        print("ngs-bits date: 2026-06")
        print(f"operating system: {platform.system()} {platform.release()}")
        print(f"architecture: {platform.machine()}")
        print(f"Python version: {platform.python_version()}")
        try:
            import jax
            print(f"jax version: {jax.__version__}")
        except Exception:
            print("jax version: unavailable")
        from ..io import native
        print(f"native decoder: {'available' if native.available() else 'unavailable'}")
        print()


TOOLS = {"NgsBitsInfo": NgsBitsInfoTool}
