"""UniVL multi-choice video QA: score the video against each answer option.

Reference parity: the mcqa finetuning head of ``/root/reference/prj/base_vtp``
(UniVL towers reused; option with max similarity wins). Options fold into the
batch dim for the text tower (one MXU stream), then similarities per option
become the classification logits.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.models.base_model import BaseModel
from antmmf_tpu.models.univl import UnivlForVideoTextRetrieval


@registry.register_model("univl_mcqa")
class UnivlForMultiChoiceQA(UnivlForVideoTextRetrieval):
    def __call__(self, batch: Mapping[str, Any], deterministic: bool = True) -> Dict:
        video = self.encode_video(batch, deterministic)
        clip_embed = video["clip_embed"]  # [B, n_clips, D]

        opt_ids = batch["options_input_ids"]  # [B, O, L]
        opt_mask = batch["options_input_mask"]
        B, O, L = opt_ids.shape
        text = self.base.forward_text_encoder(
            opt_ids.reshape(B * O, L), opt_mask.reshape(B * O, L),
            deterministic=deterministic)
        opt_embed = text["text_embed"].reshape(B, O, -1)  # [B, O, D]

        scale = jnp.exp(jnp.clip(self.logit_scale, 0.0, jnp.log(100.0)))
        sims = jnp.einsum("bod,bcd->boc", opt_embed.astype(jnp.float32),
                          clip_embed.astype(jnp.float32))
        logits = jax.nn.logsumexp(sims * scale, axis=-1) - jnp.log(
            float(sims.shape[-1]))  # [B, O]

        out: Dict[str, Any] = {"logits": logits}
        if "targets" in batch:
            logp = jax.nn.log_softmax(logits, -1)
            nll = -jnp.take_along_axis(logp, batch["targets"][:, None], -1)
            out["losses"] = {"mcqa_loss": nll.mean()}
            out["metrics"] = {
                "mcqa_acc": (jnp.argmax(logits, -1) == batch["targets"]).mean()}
        return out
