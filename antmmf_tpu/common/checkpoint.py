"""Checkpointing: Orbax-backed save/resume with the reference's tolerant-load UX.

Reference parity (``/root/reference/antmmf/common/checkpoint.py:80-369``):
  * periodic ``models/model_<iter>`` + ``best`` (chosen by EarlyStopping) +
    ``max_ckpt_num`` GC (:310-356) + final weights (:368);
  * resume / resume_file / restart(weights-only) flags (:141-162);
  * tolerant partial load: shape-mismatch and missing-key skip with warnings
    (:200-219), ``pretrained_mapping`` prefix remaps for finetuning (:221-244);
  * provenance: config dump + git branch/commit captured (:133-139, :282-308).

TPU mapping: Orbax writes sharded arrays asynchronously from every host; the
tolerant-merge logic operates on flattened path→leaf dicts, which also absorbs
cross-framework renames.
"""

from __future__ import annotations

import os
import subprocess
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from antmmf_tpu.common.configuration import Configuration, convert_to_config
from antmmf_tpu.parallel import collectives as coll


def _flatten(tree: Any, prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = tree
    return out


def _unflatten(flat: Mapping[str, Any]) -> Dict[str, Any]:
    root: Dict[str, Any] = {}
    for path, leaf in flat.items():
        node = root
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return root


def merge_params_tolerant(
    target: Mapping[str, Any],
    loaded: Mapping[str, Any],
    pretrained_mapping: Optional[Mapping[str, str]] = None,
    logger: Optional[Any] = None,
) -> Tuple[Dict[str, Any], Dict[str, list]]:
    """Copy loaded leaves onto target where paths+shapes agree.

    Returns (merged, report) where report lists loaded / missing / skipped
    (shape-mismatch) / unexpected paths — the reference's warning surface.
    """
    tflat = _flatten(dict(target))
    lflat = _flatten(dict(loaded))
    if pretrained_mapping:
        remapped = {}
        for path, leaf in lflat.items():
            for src, dst in dict(pretrained_mapping).items():
                if path.startswith(src):
                    path = dst + path[len(src):]
                    break
            remapped[path] = leaf
        lflat = remapped

    report = {"loaded": [], "missing": [], "shape_mismatch": [], "unexpected": []}
    merged = dict(tflat)
    for path, tleaf in tflat.items():
        if path not in lflat:
            report["missing"].append(path)
            continue
        lleaf = lflat[path]
        if hasattr(tleaf, "shape") and tuple(np.shape(lleaf)) != tuple(tleaf.shape):
            report["shape_mismatch"].append(
                f"{path}: ckpt{tuple(np.shape(lleaf))} vs model{tuple(tleaf.shape)}"
            )
            continue
        merged[path] = (
            np.asarray(lleaf).astype(tleaf.dtype)
            if hasattr(tleaf, "dtype") else lleaf
        )
        report["loaded"].append(path)
    for path in lflat:
        if path not in tflat:
            report["unexpected"].append(path)
    if logger is not None:
        for kind in ("missing", "shape_mismatch", "unexpected"):
            for item in report[kind][:20]:
                logger.write(f"checkpoint partial-load {kind}: {item}", level="warning")
    return _unflatten(merged), report


def _git_provenance(repo_dir: str) -> Dict[str, str]:
    def run(*args: str) -> str:
        try:
            return subprocess.run(
                ["git", *args], cwd=repo_dir, capture_output=True, text=True,
                timeout=10,
            ).stdout.strip()
        except Exception:
            return ""

    return {
        "branch": run("rev-parse", "--abbrev-ref", "HEAD"),
        "commit": run("rev-parse", "HEAD"),
        "status": run("status", "--short")[:4000],
    }


class Checkpoint:
    def __init__(self, config: Mapping, logger: Optional[Any] = None,
                 load_only: bool = False):
        self.config = convert_to_config(config)
        tp = self.config.get("training_parameters", {})
        self.logger = logger
        self.save_dir = os.path.abspath(tp.get("save_dir", "./save"))
        self.models_dir = os.path.join(self.save_dir, "models")
        self.max_to_keep = tp.get("max_ckpt_num", None)
        self._ckpt = ocp.StandardCheckpointer()
        if not load_only and coll.is_main_process():
            os.makedirs(self.models_dir, exist_ok=True)
            try:
                Configuration(self.config.to_dict()).save(
                    os.path.join(self.save_dir, "config.yaml"))
                import json

                with open(os.path.join(self.save_dir, "git_info.json"), "w") as f:
                    json.dump(_git_provenance(os.getcwd()), f, indent=2)
            except Exception:
                pass

    # ------------------------------------------------------------------- save
    def _state_tree(self, state) -> Dict[str, Any]:
        return {
            "step": state.step,
            "variables": state.variables,
            "opt_state": state.opt_state,
            "rng": state.rng,
        }

    def save(self, state, iteration: Optional[int] = None, tag: Optional[str] = None,
             block: bool = False) -> str:
        """Async by default: Orbax writes in the background; the next save (or
        ``finalize_writes``) joins the previous one, so snapshots never stall
        the train loop."""
        iteration = int(iteration if iteration is not None else state.step)
        name = tag or f"model_{iteration}"
        path = os.path.join(self.models_dir, name)
        self._ckpt.wait_until_finished()  # join any in-flight save
        self._ckpt.save(path, self._state_tree(state), force=True)
        if block:
            self._ckpt.wait_until_finished()
        if tag is None:
            self._gc()
        return path

    def finalize_writes(self) -> None:
        self._ckpt.wait_until_finished()

    def save_best(self, state) -> str:
        return self.save(state, tag="best")

    def save_final_weights(self, state, model_name: str = "model") -> str:
        path = os.path.join(self.save_dir, f"{model_name}_final")
        self._ckpt.save(path, {"variables": state.variables}, force=True)
        self._ckpt.wait_until_finished()
        return path

    def _gc(self) -> None:
        if not self.max_to_keep or not coll.is_main_process():
            return
        import re
        import shutil

        # in-flight async saves appear as model_<n>.orbax-checkpoint-tmp* —
        # count them toward the keep budget but never delete tmp dirs
        nums: Dict[int, list] = {}
        for d in os.listdir(self.models_dir):
            m = re.match(r"model_(\d+)", d)
            if m:
                nums.setdefault(int(m.group(1)), []).append(d)
        keep = set(sorted(nums)[-int(self.max_to_keep):])
        for n, dirs in nums.items():
            if n in keep:
                continue
            for d in dirs:
                if ".orbax-checkpoint-tmp" in d:
                    continue
                shutil.rmtree(os.path.join(self.models_dir, d),
                              ignore_errors=True)

    # ---------------------------------------------------------------- restore
    def latest_path(self) -> Optional[str]:
        import re

        if not os.path.isdir(self.models_dir):
            return None
        best = None
        for d in os.listdir(self.models_dir):
            m = re.fullmatch(r"model_(\d+)", d)
            if m and (best is None or int(m.group(1)) > best[0]):
                best = (int(m.group(1)), d)
        return os.path.join(self.models_dir, best[1]) if best else None

    def restore_state(self, state, path: Optional[str] = None):
        """Full resume: params+optimizer+step+rng with matching structure."""
        self._ckpt.wait_until_finished()  # join in-flight async saves
        path = path or self.latest_path()
        if path is None:
            return state, False
        tree = self._ckpt.restore(path, self._state_tree(state))
        state = state.replace(
            step=tree["step"], variables=tree["variables"],
            opt_state=tree["opt_state"], rng=tree["rng"],
        )
        return state, True

    def load_model_weights(
        self, state, path: str, pretrained_mapping: Optional[Mapping[str, str]] = None,
    ):
        """Weights-only tolerant load (restart / finetune path)."""
        with ocp.PyTreeCheckpointer() as ck:
            raw = ck.restore(path)
        loaded_vars = raw.get("variables", raw)
        merged, report = merge_params_tolerant(
            state.variables, loaded_vars, pretrained_mapping, self.logger
        )
        # preserve leaf dtypes AND shardings of the target: a plain asarray
        # would hand back replicated host arrays, silently dropping FSDP/TP
        # layouts after a weights-only restore (unlike restore_state, which
        # restores into the sharded target structure directly)
        def _place(t, m):
            arr = jax.numpy.asarray(m, dtype=getattr(t, "dtype", None))
            sharding = getattr(t, "sharding", None)
            if sharding is not None:
                arr = jax.device_put(arr, sharding)
            return arr

        merged = jax.tree_util.tree_map(_place, state.variables, merged)
        return state.replace(variables=merged), report

    def resume(self, state, tp: Optional[Mapping] = None):
        """Apply resume / resume_file / restart flags (reference :141-162)."""
        tp = convert_to_config(
            tp if tp is not None else self.config.get("training_parameters", {}))
        resume_file = tp.get("resume_file")
        if resume_file:
            if bool(tp.get("restart", False)):
                state, report = self.load_model_weights(
                    state, resume_file, tp.get("pretrained_mapping") or None)
                return state, {"mode": "restart", **{k: len(v) for k, v in report.items()}}
            state, ok = self.restore_state(state, resume_file)
            return state, {"mode": "resume_file", "ok": ok}
        if bool(tp.get("resume", False)):
            state, ok = self.restore_state(state)
            return state, {"mode": "resume", "ok": ok}
        return state, {"mode": "none"}
