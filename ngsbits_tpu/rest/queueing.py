"""Analysis-job queueing engine controllers (SGE / Slurm / generic).

Behavioral reference: ngs-bits src/GSvarServer/QueuingEngineController*.{h,cpp}
— submitJob builds the qsub/sbatch invocation (argument layout mirrored from
QueuingEngineControllerSge.cpp:14-77 and QueuingEngineControllerSlurm.cpp:14-98),
parses the engine's job id from its stdout, and records started/error history
entries; cancel/status wrap qdel/squeue-style commands.

Command construction is separated from execution so tests can pin the exact
argument vectors without a live cluster.
"""

from __future__ import annotations

import os
import re
import subprocess
from dataclasses import dataclass, field


@dataclass
class SubmitResult:
    ok: bool
    engine_job_id: str = ""
    details: list = field(default_factory=list)


class QueuingEngineController:
    """Base class (QueuingEngineController.{h,cpp})."""

    def __init__(self, data_folder: str = "", pipeline_root: str = "",
                 debug: bool = False, runner=None):
        self.data_folder = data_folder
        self.pipeline_root = pipeline_root
        self.debug = debug
        # runner(cmd: list[str]) -> (exit_code, output_str); injectable for tests
        self._runner = runner or self._run

    @staticmethod
    def _run(cmd):
        proc = subprocess.run(cmd, capture_output=True, text=True)
        return proc.returncode, proc.stdout + proc.stderr

    def engine_name(self) -> str:
        raise NotImplementedError

    def submit_command(self, threads: int, queues: list, pipeline_args: list,
                       working_directory: str, script: str, job_id: int) -> list:
        raise NotImplementedError

    def parse_job_id(self, output: str) -> str:
        raise NotImplementedError

    def _log_base(self, job_id: int) -> str:
        return os.path.join(self.data_folder, "analysis_jobs_logs", str(job_id))

    def submit_job(self, threads: int, queues: list, pipeline_args: list,
                   working_directory: str, script: str, job_id: int) -> SubmitResult:
        cmd = self.submit_command(threads, queues, pipeline_args,
                                  working_directory, script, job_id)
        exit_code, output = self._runner(cmd)
        if exit_code != 0:
            return SubmitResult(False, details=[
                f"{self.engine_name()} job submission failed: returned exit code {exit_code}!",
                "Command:", " ".join(cmd), "Output:", output])
        engine_id = self.parse_job_id(output)
        if engine_id.isdigit() and int(engine_id) > 0:
            return SubmitResult(True, engine_job_id=engine_id)
        return SubmitResult(False, details=[
            f"{self.engine_name()} job submission failed - could not determine "
            "queuing engine job number!",
            "Command:", " ".join(cmd), "Output:", output])


class QueuingEngineControllerSge(QueuingEngineController):
    """SGE qsub (QueuingEngineControllerSge.cpp:14-77)."""

    def engine_name(self) -> str:
        return "SGE"

    def submit_command(self, threads, queues, pipeline_args,
                       working_directory, script, job_id):
        out_base = self._log_base(job_id)
        args = ["qsub", "-V"]
        smp = "1" if script == "analyze_dragen.php" else str(threads)
        args += ["-pe", "smp", smp]
        args += ["-b", "y", "-wd", working_directory, "-m", "n"]
        args += ["-e", out_base + ".err", "-o", out_base + ".out"]
        args += ["-q", ",".join(queues)]
        args += ["php", os.path.join(self.pipeline_root, "src", "Pipelines", script)]
        args += list(pipeline_args)
        return args

    def parse_job_id(self, output: str) -> str:
        # 'Your job 17 ("php") has been submitted'
        parts = output.split()
        return parts[2] if len(parts) > 2 else ""

    def cancel_command(self, engine_job_id: str) -> list:
        return ["qdel", engine_job_id]

    def status_command(self, engine_job_id: str) -> list:
        return ["qstat", "-j", engine_job_id]


class QueuingEngineControllerSlurm(QueuingEngineController):
    """Slurm sbatch (QueuingEngineControllerSlurm.cpp:14-98).

    The reference wraps the php command in a generated shell script; the
    script path is returned as part of the command and written by
    write_wrapper_script().
    """

    def engine_name(self) -> str:
        return "SLURM"

    def wrapper_script_path(self, job_id: int) -> str:
        return self._log_base(job_id) + "_cmd.sh"

    def write_wrapper_script(self, pipeline_args, script, job_id) -> str:
        path = self.wrapper_script_path(job_id)
        command = ("php " + os.path.join(self.pipeline_root, "src", "Pipelines", script)
                   + " " + " ".join(pipeline_args))
        with open(path, "w") as fh:
            fh.write("#!/bin/sh\n" + command + "\n")
        os.chmod(path, 0o754)
        return path

    def submit_command(self, threads, queues, pipeline_args,
                       working_directory, script, job_id):
        out_base = self._log_base(job_id)
        args = ["sbatch"]
        cpus = "1" if script == "analyze_dragen.php" else str(threads)
        args += [f"--cpus-per-task={cpus}", "-D", working_directory,
                 "--mail-type=NONE",
                 "-e", out_base + ".err", "-o", out_base + ".out"]
        queues = [q for q in queues if q]
        if queues:
            args += ["-p", ",".join(queues)]
        args.append(self.wrapper_script_path(job_id))
        return args

    def parse_job_id(self, output: str) -> str:
        # 'Submitted batch job 17'
        parts = output.split()
        return parts[3] if len(parts) > 3 else ""

    def cancel_command(self, engine_job_id: str) -> list:
        return ["scancel", engine_job_id]

    def status_command(self, engine_job_id: str) -> list:
        return ["squeue", "-j", engine_job_id, "-h", "-o", "%T"]


class QueuingEngineControllerGeneric(QueuingEngineController):
    """Config-driven engine (QueuingEngineControllerGeneric.cpp): command
    templates with {threads}/{queues}/{out_base}/{wd}/{script}/{args}."""

    def __init__(self, submit_template: list, name: str = "GENERIC", **kwargs):
        super().__init__(**kwargs)
        self.submit_template = submit_template
        self._name = name

    def engine_name(self) -> str:
        return self._name

    def submit_command(self, threads, queues, pipeline_args,
                       working_directory, script, job_id):
        mapping = {
            "{threads}": str(threads),
            "{queues}": ",".join(queues),
            "{out_base}": self._log_base(job_id),
            "{wd}": working_directory,
            "{script}": os.path.join(self.pipeline_root, "src", "Pipelines", script),
            "{args}": " ".join(pipeline_args),
        }
        out = []
        for part in self.submit_template:
            for key, val in mapping.items():
                part = part.replace(key, val)
            out.append(part)
        return out

    def parse_job_id(self, output: str) -> str:
        match = re.search(r"\b(\d+)\b", output)
        return match.group(1) if match else ""
