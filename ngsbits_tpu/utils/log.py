"""Logging (file + stdout).

Behavioral reference: ngs-bits cppCORE ``Log`` — static logger with optional
log file (Log::setFileName), CMD enable/disable (Log::setCMDEnabled),
levels info/warn/error, and app startup info (Log::appInfo; used at
GSvarServer/main.cpp:34-36, FastaFileIndex.cpp:92).
"""

from __future__ import annotations

import datetime
import sys
import threading

_lock = threading.Lock()
_file_name: str | None = None
_cmd_enabled = True
_file_enabled = True


def set_file_name(path: str):
    global _file_name
    _file_name = path


def set_cmd_enabled(enabled: bool):
    global _cmd_enabled
    _cmd_enabled = enabled


def set_file_enabled(enabled: bool):
    global _file_enabled
    _file_enabled = enabled


def _write(level: str, message: str):
    stamp = datetime.datetime.now().strftime("%Y-%m-%dT%H:%M:%S")
    line = f"{stamp}\t{level}\t{message}"
    with _lock:
        if _cmd_enabled:
            stream = sys.stderr if level == "ERROR" else sys.stdout
            print(line, file=stream)
        if _file_enabled and _file_name:
            try:
                with open(_file_name, "a") as fh:
                    fh.write(line + "\n")
            except OSError:
                pass


def info(message: str):
    _write("INFO", message)


def warn(message: str):
    _write("WARNING", message)


def error(message: str):
    _write("ERROR", message)


def perf(message: str, start: float):
    """Log::perf — message + elapsed seconds since 'start'."""
    import time
    _write("INFO", f"{message} {time.perf_counter() - start:.4f} s")


def app_info():
    """Log::appInfo — name/version/args at startup."""
    from .. import __version__
    _write("INFO", f"ngsbits-tpu {__version__} — {' '.join(sys.argv)}")
