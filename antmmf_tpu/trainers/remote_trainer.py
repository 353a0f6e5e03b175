"""RemoteTrainer: submit the training job to an external cluster scheduler.

Reference parity: ``/root/reference/antmmf/trainers/remote_trainer.py:20`` and
``antmmf/run.py:66-198`` (``alps_run`` — Ant's internal k8s/aistudio
submission). The internal launcher libraries are proprietary; here remote
submission is a configurable command template so any scheduler (GKE, xmanager,
slurm, ray) can be wired from YAML::

    training_parameters:
      trainer: remote_trainer
      remote:
        submit_command: "kubectl apply -f {job_spec}"
        job_spec_template: deploy/tpu_job.yaml.tmpl
        env: {TPU_TOPOLOGY: 4x4}
"""

from __future__ import annotations

import os
import shlex
import subprocess
import tempfile
from typing import Mapping

from antmmf_tpu.common.configuration import convert_to_config
from antmmf_tpu.common.registry import registry


@registry.register_trainer("remote_trainer")
class RemoteTrainer:
    def __init__(self, config: Mapping):
        self.config = convert_to_config(config)
        self.tp = self.config.get("training_parameters", {})
        self.remote = self.tp.get("remote", {})

    def load(self) -> None:
        if not self.remote or "submit_command" not in self.remote:
            raise ValueError(
                "remote_trainer needs training_parameters.remote.submit_command "
                "(a shell template; {job_spec} and {config} are substituted)")

    def _render_job_spec(self) -> str:
        template_path = self.remote.get("job_spec_template")
        cfg_path = os.path.join(tempfile.mkdtemp(prefix="antmmf_tpu_"),
                                "config.yaml")
        self.config.save(cfg_path)
        if not template_path:
            return cfg_path
        with open(template_path, encoding="utf-8") as f:
            text = f.read()
        env = dict(self.remote.get("env", {}))
        env["CONFIG_PATH"] = cfg_path
        for key, val in env.items():
            text = text.replace("${" + key + "}", str(val))
        spec_path = cfg_path.replace("config.yaml", "job.yaml")
        with open(spec_path, "w", encoding="utf-8") as f:
            f.write(text)
        return spec_path

    def train(self) -> int:
        spec = self._render_job_spec()
        cmd = self.remote["submit_command"].format(
            job_spec=spec, config=spec)
        proc = subprocess.run(shlex.split(cmd), capture_output=True, text=True)
        if proc.returncode != 0:
            raise RuntimeError(f"Remote submission failed: {proc.stderr[-2000:]}")
        print(proc.stdout)
        return proc.returncode
