"""RetrievalTrainer: two-stage corpus retrieval evaluation.

Reference parity: ``/root/reference/antmmf/trainers/retrieval_trainer.py:49`` —
stage 1 encodes every text and video once (cached embeddings); stage 2 re-scores
candidate pairs through the cross-encoder over the N×M pair grid (:23-46,
:86-110). The reference offloads the sim matrix to CPU and loops pairs; here
stage 1 runs as jitted encoder passes and stage 2 is a **chunked jitted
cross-scorer over the top-K candidates only** (quadratic → N·K), entirely
on-device — rankings are identical to full re-scoring because re-ranking only
permutes within the retrieved candidate set.

Config: ``training_parameters.stage2_topk`` (0 = L1-only eval) and
``stage2_chunk`` (pair-chunk size for the jitted scorer).
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
        module = shell.module

        def encode_step(state, batch):
            out = module.apply(state.variables, batch, deterministic=True)
            keep = {
                "text_embed": out["text_embed"],
                "visual_embed": out["visual_embed"],
            }
            for extra in ("text_seq", "visual_tokens",
                          "wti_text_tokens", "wti_text_weights",
                          "wti_video_tokens", "wti_video_weights",
                          "wti_text_mask", "wti_video_mask"):
                if extra in out:
                    keep[extra] = out[extra]
            return keep

        self._encode_step = jax.jit(encode_step)
        self._rescore_step = None
        if getattr(module, "with_cross_encoder", False):
            def rescore_step(state, tseq, tmask, vseq, vmask):
                return module.apply(
                    state.variables, tseq, tmask, vseq, vmask,
                    method=lambda m, *a: m.base.cross_pair_scores(*a))

            self._rescore_step = jax.jit(rescore_step)

    # ------------------------------------------------------------------- eval
    def evaluate_set(self, dataset_type: str = "val") -> Dict[str, float]:
        loaders = self.task_loader.get_loaders(dataset_type)
        if not loaders:
            return {}
        texts: List[np.ndarray] = []
        videos: List[np.ndarray] = []
        vids: List[np.ndarray] = []
        text_seqs: List[np.ndarray] = []
        text_masks: List[np.ndarray] = []
        vis_tokens: List[np.ndarray] = []
        wti: Dict[str, List[np.ndarray]] = {}
        for batch in itertools.chain(*loaders):
            if batch.get_batch_size() == 0:
                continue
            out = self._encode_step(self.state, self._shard_batch(batch))
            host = jax.device_get(out)
            texts.append(np.asarray(host["text_embed"], np.float32))
            videos.append(np.asarray(host["visual_embed"], np.float32))
            if "image_vid" in batch:
                vids.append(np.asarray(batch["image_vid"]).reshape(-1))
            if self._rescore_step is not None and "text_seq" in host:
                text_seqs.append(np.asarray(host["text_seq"]))
                text_masks.append(np.asarray(batch["caption_input_mask"]))
                vis_tokens.append(np.asarray(host["visual_tokens"]))
            for key in ("wti_text_tokens", "wti_text_weights",
                        "wti_video_tokens", "wti_video_weights",
                        "wti_text_mask", "wti_video_mask"):
                if key in host:
                    wti.setdefault(key, []).append(
                        np.asarray(host[key], np.float32))
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
            video_rows = first_idx
        else:
            n = min(len(t), len(v))
            t2v_gt = [[i] for i in range(n)]
            v2t_gt = [[i] for i in range(n)]
            video_rows = np.arange(len(v))
        sim = t @ v.T
        metrics = recall_metrics(_ranks_with_multi_gt(sim, t2v_gt), "l1_simi_t2v-")
        metrics.update(recall_metrics(_ranks_with_multi_gt(sim.T, v2t_gt),
                                      "l1_simi_v2t-"))
        metrics["mean_recall"] = float(np.mean([
            metrics["l1_simi_t2v-r@1"], metrics["l1_simi_t2v-r@5"],
            metrics["l1_simi_t2v-r@10"], metrics["l1_simi_v2t-r@1"],
            metrics["l1_simi_v2t-r@5"], metrics["l1_simi_v2t-r@10"]]))

        topk = int(self.tp.get("stage2_topk", 0) or 0)
        if topk and self._rescore_step is not None and text_seqs:
            l2 = self._stage2_rescore(
                np.concatenate(text_seqs), np.concatenate(text_masks),
                np.concatenate(vis_tokens)[video_rows], sim, topk)
            metrics.update(recall_metrics(
                _ranks_with_multi_gt(l2, t2v_gt), "l2_simi_t2v-"))
            metrics.update(recall_metrics(
                _ranks_with_multi_gt(l2.T, v2t_gt), "l2_simi_v2t-"))

        if wti:  # dmae L3: corpus-level WTI grid (monitored metric family)
            l3 = self._wti_grid(
                {k: np.concatenate(v) for k, v in wti.items()}, video_rows)
            metrics.update(recall_metrics(
                _ranks_with_multi_gt(l3, t2v_gt), "l3_simi_t2v-"))
            metrics.update(recall_metrics(
                _ranks_with_multi_gt(l3.T, v2t_gt), "l3_simi_v2t-"))
            metrics["l3_simi_t2v-mean_recall"] = float(np.mean([
                metrics["l3_simi_t2v-r@1"], metrics["l3_simi_t2v-r@5"],
                metrics["l3_simi_t2v-r@10"]]))
        return metrics

    @staticmethod
    def _wti_grid(w: Dict[str, np.ndarray], video_rows: np.ndarray,
                  chunk: int = 256) -> np.ndarray:
        """Full-corpus WTI sim grid, text-chunked on host (the reference's
        CPU-offloaded chunked eval, retrieval_trainer.py:37-46)."""
        tt, tw = w["wti_text_tokens"], w["wti_text_weights"]
        tm = w["wti_text_mask"]
        vt = w["wti_video_tokens"][video_rows]
        vw = w["wti_video_weights"][video_rows]
        vm = w["wti_video_mask"][video_rows]
        N = tt.shape[0]
        rows = []
        for s in range(0, N, chunk):
            sl = slice(s, min(s + chunk, N))
            # zero-mask-then-max, matching models/dmae.wti_similarity (the
            # reference's exact masking, dmae_utils.py:92-96)
            c = np.einsum("tld,vmd->tvlm", tt[sl], vt)
            c = c * tm[sl][:, None, :, None]
            c = c * vm[None, :, None, :]
            s_t2v = np.einsum("tvl,tl->tv", c.max(-1), tw[sl])
            s_v2t = np.einsum("tvm,vm->tv", c.max(-2), vw)
            rows.append(0.5 * (s_t2v + s_v2t))
        return np.concatenate(rows, axis=0)

    def _stage2_rescore(
        self,
        text_seq: np.ndarray,  # [N, Lt, C]
        text_mask: np.ndarray,  # [N, Lt]
        vis_tokens: np.ndarray,  # [M, F, Lv, C]
        l1_sim: np.ndarray,  # [N, M]
        topk: int,
    ) -> np.ndarray:
        """Cross-encode each text against its top-K L1 candidates (chunked,
        jitted); non-candidates keep -inf so re-ranking happens within the
        retrieved set (reference ranking semantics)."""
        N, M = l1_sim.shape
        topk = min(topk, M)
        chunk = int(self.tp.get("stage2_chunk", 32))
        Mv, F_, Lv, C = vis_tokens.shape
        vis_seq = vis_tokens.reshape(Mv, F_ * Lv, C)
        vis_mask = np.ones((Mv, F_ * Lv), np.int64)

        cand = np.argsort(-l1_sim, axis=1)[:, :topk]  # [N, topk]
        pair_t = np.repeat(np.arange(N), topk)
        pair_v = cand.reshape(-1)
        scores = np.full((N, M), -1e30, np.float32)

        P = len(pair_t)
        for start in range(0, P, chunk):
            sl = slice(start, min(start + chunk, P))
            ti, vi = pair_t[sl], pair_v[sl]
            pad = chunk - len(ti)
            if pad:  # static-shape jit: pad the tail chunk
                ti = np.concatenate([ti, np.zeros(pad, ti.dtype)])
                vi = np.concatenate([vi, np.zeros(pad, vi.dtype)])
            s = self._rescore_step(
                self.state,
                jnp.asarray(text_seq[ti]), jnp.asarray(text_mask[ti]),
                jnp.asarray(vis_seq[vi]), jnp.asarray(vis_mask[vi]))
            s = np.asarray(jax.device_get(s))[: sl.stop - sl.start]
            scores[pair_t[sl], pair_v[sl]] = s
        return scores
