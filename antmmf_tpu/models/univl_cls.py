"""UniVL classification finetune: label head over the fused video-text pair.

Reference parity: the cls builder/finetune path of ``/root/reference/prj/
base_vtp`` (univl classification task). Uses the shared towers; fused feature =
[text_pooled ; video_pooled ; |t-v| ; t*v] (standard pair features) → MLP.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.models.base_model import BaseModel
from antmmf_tpu.models.univl import UnivlForVideoTextRetrieval
from antmmf_tpu.modules.classifier import ClassifierLayer


@registry.register_model("univl_classification")
class UnivlForClassification(UnivlForVideoTextRetrieval):
    num_labels: int = 2

    def setup(self) -> None:
        super().setup()
        self.cls_head = ClassifierLayer(
            "mlp", self.num_labels, num_layers=2,
            dtype=jnp.dtype(self.dtype_str))

    def __call__(self, batch: Mapping[str, Any], deterministic: bool = True) -> Dict:
        text = self.encode_text(batch, deterministic)
        video = self.encode_video(batch, deterministic)
        t = text["text_embed"]
        v = video["clip_embed"].mean(axis=1)
        fused = jnp.concatenate([t, v, jnp.abs(t - v), t * v], axis=-1)
        logits = self.cls_head(fused, deterministic=deterministic
                               ).astype(jnp.float32)
        out: Dict[str, Any] = {"logits": logits, "text_embed": t,
                               "visual_embed": v}
        if "targets" in batch:
            logp = jax.nn.log_softmax(logits, -1)
            nll = -jnp.take_along_axis(logp, batch["targets"][:, None], -1)
            out["losses"] = {"cls_loss": nll.mean()}
            out["metrics"] = {
                "cls_acc": (jnp.argmax(logits, -1) == batch["targets"]).mean()}
        return out
