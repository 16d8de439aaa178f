"""Machine configuration (settings.ini).

Behavioral reference: ngs-bits cppCORE ``Settings`` (ini key/value machine
config; see bin/settings.ini.example — reference_genome, NGSD credentials,
projects_folder_*, server config; consumed e.g. at MappingQC/main.cpp:61,
GSvarServer ServerHelper). Resolution order for each key:

1. environment variable ``NGSBITS_<KEY>`` (upper-cased key)
2. the ini file named by ``$NGSBITS_SETTINGS``
3. ``settings.ini`` in the current working directory
4. ``settings.ini`` next to the package

Unlike the reference (Qt QSettings), the ini format here is plain
``key = value`` lines with ``#``/``;`` comments and optional ``[sections]``
(section names are ignored — keys are global, like the reference's usage).
"""

from __future__ import annotations

import os
import threading

_lock = threading.Lock()
_cache: dict[str, dict[str, str]] = {}


def _parse_ini(path: str) -> dict[str, str]:
    values: dict[str, str] = {}
    with open(path, "r", encoding="utf-8", errors="replace") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith(("#", ";", "[")):
                continue
            if "=" not in line:
                continue
            key, _, val = line.partition("=")
            values[key.strip()] = val.strip().strip('"')
    return values


def settings_path() -> str | None:
    """The ini file that would be used, or None."""
    env = os.environ.get("NGSBITS_SETTINGS")
    if env and os.path.isfile(env):
        return env
    cwd_ini = os.path.join(os.getcwd(), "settings.ini")
    if os.path.isfile(cwd_ini):
        return cwd_ini
    pkg_ini = os.path.join(os.path.dirname(os.path.dirname(__file__)), "settings.ini")
    if os.path.isfile(pkg_ini):
        return pkg_ini
    return None


def _values() -> dict[str, str]:
    path = settings_path()
    if path is None:
        return {}
    with _lock:
        cached = _cache.get(path)
        if cached is None:
            cached = _cache[path] = _parse_ini(path)
        return cached


def clear_cache():
    with _lock:
        _cache.clear()


def contains(key: str) -> bool:
    if os.environ.get("NGSBITS_" + key.upper()):
        return True
    return key in _values()


def string(key: str, optional: bool = False) -> str:
    """Settings::string — raises if missing and not optional."""
    env = os.environ.get("NGSBITS_" + key.upper())
    if env:
        return env
    vals = _values()
    if key in vals:
        return vals[key]
    if optional:
        return ""
    raise KeyError(f"Settings key '{key}' not found in settings.ini!")


def integer(key: str) -> int:
    return int(string(key))


def boolean(key: str, optional: bool = False) -> bool:
    val = string(key, optional).lower()
    return val in ("1", "true", "yes", "on")


def reference_genome(build: str = "hg38") -> str:
    """reference_genome / reference_genome_hg19 lookup (Settings usage in
    MappingQC/main.cpp:61)."""
    key = "reference_genome" if build in ("hg38", "GRCh38") else "reference_genome_hg19"
    return string(key, optional=True)
