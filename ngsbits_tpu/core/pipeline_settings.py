"""megSAP pipeline settings (settings.ini of the analysis pipeline).

Behavioral reference: ngs-bits cppNGS/PipelineSettings.cpp:9-170 — singleton
loaded from an ini file; PHP-style array keys (``project_folder['diagnostic']``),
``[path]`` placeholder substitution, comma-split queue lists.
"""

from __future__ import annotations

import os


class PipelineSettings:
    _root_dir = ""
    _data_folder = ""
    _queuing_engine = ""
    _queues_default: list[str] = []
    _queues_research: list[str] = []
    _queues_high_priority: list[str] = []
    _queues_high_mem: list[str] = []
    _queues_dragen: list[str] = []
    _projects_folder: dict[str, str] = {}

    @classmethod
    def load_settings(cls, ini_file: str):
        cls._root_dir = os.path.dirname(os.path.realpath(ini_file)) + "/"
        cls._projects_folder = {}
        with open(ini_file, encoding="utf-8", errors="replace") as fh:
            for raw in fh:
                line = raw.strip()
                if (not line or line.startswith(";") or line.startswith("#")
                        or (line.startswith("[") and line.endswith("]"))):
                    continue
                if "=" not in line:
                    continue
                key, _, value = line.partition("=")
                key = key.strip()
                value = value.strip()
                if value.startswith('"') and value.endswith('"'):
                    value = value[1:-1].strip()
                if value.startswith("[path]"):
                    value = value.replace("[path]", cls._root_dir)

                array_key = ""
                if key.endswith("]"):
                    pos = key.find("[")
                    if pos > -1:
                        array_key = (key[pos + 1:-1].replace('"', "")
                                     .replace("'", "").strip())
                        key = key[:pos]

                if not array_key:
                    if key == "data_folder":
                        cls._data_folder = value
                    elif key == "queuing_engine":
                        cls._queuing_engine = value
                    elif key == "queues_default":
                        cls._queues_default = [v.strip() for v in value.split(",")]
                    elif key == "queues_research":
                        cls._queues_research = [v.strip() for v in value.split(",")]
                    elif key == "queues_high_priority":
                        cls._queues_high_priority = [v.strip() for v in value.split(",")]
                    elif key == "queues_high_mem":
                        cls._queues_high_mem = [v.strip() for v in value.split(",")]
                    elif key == "queues_dragen":
                        cls._queues_dragen = [v.strip() for v in value.split(",")]
                elif key == "project_folder":
                    if not value.endswith("/"):
                        value += "/"
                    cls._projects_folder[array_key] = value

    @classmethod
    def is_initialized(cls) -> bool:
        return cls._root_dir != ""

    @classmethod
    def root_dir(cls) -> str:
        return cls._root_dir

    @classmethod
    def project_folder(cls, type_: str) -> str:
        return cls._projects_folder.get(type_, "")

    @classmethod
    def data_folder(cls) -> str:
        return cls._data_folder

    @classmethod
    def queuing_engine(cls) -> str:
        return cls._queuing_engine

    @classmethod
    def queues_default(cls) -> list[str]:
        return cls._queues_default

    @classmethod
    def queues_research(cls) -> list[str]:
        return cls._queues_research

    @classmethod
    def queues_high_priority(cls) -> list[str]:
        return cls._queues_high_priority

    @classmethod
    def queues_high_memory(cls) -> list[str]:
        return cls._queues_high_mem

    @classmethod
    def queues_dragen(cls) -> list[str]:
        return cls._queues_dragen
