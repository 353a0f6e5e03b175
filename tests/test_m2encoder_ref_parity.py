"""Full VLMo/M2-Encoder model parity: the REAL torchscale BEiT3 stack
(reference vlmo/torchscale/model/BEiT3.py + architecture/encoder.py, run
in-process) vs our faithful eval twin ``models/m2_encoder_ref.M2EncoderRef``.

Covers what the round-2 block-stack test did not: patch embed + CLS, fairseq
positions-from-2 via the multiway A/B tables, subln inner/ffn layer norms,
key-padding masking, the vl-FFN second stack, ITC head projections with L2
normalization (vlmo_module.py infer_text/infer_image :325-400), pooler, and
the ``m2_encoder`` converter arch's importer
(``m2_encoder_beit3_state_dict_to_params``) with leaf coverage.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from reference_compat import load_vlmo_beit3, reference_available  # noqa: E402

from antmmf_tpu.models.m2_encoder_ref import M2EncoderRef  # noqa: E402
from antmmf_tpu.utils.torch_import import (  # noqa: E402
    m2_encoder_beit3_state_dict_to_params)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")

VOCAB, IMG, PATCH, DIM, HEADS, LAYERS, VL, OUT = 100, 32, 16, 32, 2, 2, 1, 16


@pytest.fixture(scope="module")
def ref_and_ours():
    beit3_mod, enc_mod, heads_mod, cfg_mod = load_vlmo_beit3()
    import copy

    import torch.nn as tnn

    args = cfg_mod.EncoderConfig(
        img_size=IMG, patch_size=PATCH, vocab_size=VOCAB, multiway=True,
        layernorm_embedding=False, normalize_output=True, no_output_layer=True,
        encoder_embed_dim=DIM, encoder_attention_heads=HEADS,
        encoder_layers=LAYERS, encoder_ffn_embed_dim=DIM * 2, max_text_len=8)

    class TorchVLMoEval(tnn.Module):
        """The VLMo module's inference surface with its exact state-dict key
        layout (vlmo_module.py:130-200 init; :325-400 infer paths)."""

        def __init__(self):
            super().__init__()
            torch.manual_seed(0)
            self.backbone = beit3_mod.BEiT3(args)
            vl_args = copy.deepcopy(args)
            vl_args.encoder_layers = VL
            self.backbone_vl = enc_mod.Encoder(vl_args)
            self.pooler = heads_mod.Pooler(DIM)
            self.itc_text_proj = heads_mod.ITCHead(DIM, OUT)
            self.itc_image_proj = heads_mod.ITCHead(DIM, OUT)
            self.itc_vl_text_proj = heads_mod.ITCHead(DIM, OUT)
            self.itc_vl_image_proj = heads_mod.ITCHead(DIM, OUT)
            self.logit_scale = tnn.Parameter(
                torch.ones([]) * np.log(1 / 0.07))
            # random (non-default) norms/embeddings so parity is meaningful
            for p in self.parameters():
                if p.dim() >= 2 and p.abs().sum() == 0:
                    tnn.init.normal_(p, std=0.02)
            tnn.init.normal_(self.backbone.vision_embed.cls_token, std=0.02)

        def infer_text(self, ids, masks):
            pad = 1 - masks
            lffn = self.backbone(textual_tokens=ids,
                                 text_padding_position=pad)["encoder_out"]
            vlffn = self.backbone_vl(
                src_tokens=None, token_embeddings=lffn,
                encoder_padding_mask=pad,
                multiway_split_position=-1)["encoder_out"]
            cls = self.itc_text_proj(lffn[:, 0])
            cls = cls / cls.norm(dim=-1, keepdim=True)
            vcls = self.itc_vl_text_proj(vlffn[:, 0])
            vcls = vcls / vcls.norm(dim=-1, keepdim=True)
            return lffn, cls, vcls

        def infer_image(self, img):
            vffn = self.backbone(visual_tokens=img)["encoder_out"]
            vlffn = self.backbone_vl(
                src_tokens=None, token_embeddings=vffn,
                multiway_split_position=-1)["encoder_out"]
            cls = self.itc_image_proj(vffn[:, 0])
            cls = cls / cls.norm(dim=-1, keepdim=True)
            vcls = self.itc_vl_image_proj(vlffn[:, 0])
            vcls = vcls / vcls.norm(dim=-1, keepdim=True)
            return vffn, cls, vcls

        def infer_fused(self, ids, masks, img):
            out = self.backbone(textual_tokens=ids, visual_tokens=img,
                                text_padding_position=1 - masks)
            h = out["encoder_out"]
            return h, torch.tanh(self.pooler.dense(h[:, 0]))

    ref = TorchVLMoEval().eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = m2_encoder_beit3_state_dict_to_params(sd)
    ours = M2EncoderRef(vocab_size=VOCAB, image_size=IMG, patch_size=PATCH,
                        embed_dim=DIM, num_layers=LAYERS, num_heads=HEADS,
                        mlp_ratio=2.0, vl_layers=VL, out_dim=OUT,
                        max_text_len=8)
    return ref, ours, params


def test_importer_covers_model_tree(ref_and_ours):
    ref, ours, params = ref_and_ours
    rng = jax.random.PRNGKey(0)
    batch = {"input_ids": jnp.zeros((1, 8), jnp.int32),
             "input_mask": jnp.ones((1, 8), jnp.int32),
             "image": jnp.zeros((1, IMG, IMG, 3))}
    variables = ours.init(rng, batch)
    # fused path params (pooler) initialize too
    variables = ours.init(rng, batch, method=lambda m, b: m.encode_fused(
        b["input_ids"], b["input_mask"], b["image"]))

    def paths(tree, pre=""):
        out = {}
        for k, v in tree.items():
            p = f"{pre}/{k}" if pre else k
            if isinstance(v, dict):
                out.update(paths(v, p))
            else:
                out[p] = tuple(np.shape(v))
        return out

    want = paths(jax.tree_util.tree_map(np.shape, variables["params"]))
    got = paths(jax.tree_util.tree_map(np.shape, params))
    missing = set(want) - set(got)
    # mask_token is eval-time unused; everything else must be covered
    assert not missing, sorted(missing)[:20]
    for k in want:
        assert want[k] == got[k], (k, want[k], got[k])


def test_text_path_parity(ref_and_ours):
    ref, ours, params = ref_and_ours
    rng = np.random.default_rng(0)
    ids = rng.integers(2, VOCAB, (2, 8))
    mask = np.ones((2, 8), np.int64)
    mask[0, 6:] = 0
    with torch.no_grad():
        lffn, cls, vcls = ref.infer_text(torch.tensor(ids),
                                         torch.tensor(mask))
    out = ours.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32),
        method=lambda m, i, k: m.encode_text(i, k))
    np.testing.assert_allclose(np.asarray(out["text_hiddens"], np.float32),
                               lffn.numpy(), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out["cls_feats"], np.float32),
                               cls.numpy(), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out["cls_vlffn_feats"], np.float32),
                               vcls.numpy(), atol=2e-5, rtol=2e-5)


def test_image_path_parity(ref_and_ours):
    ref, ours, params = ref_and_ours
    rng = np.random.default_rng(1)
    img = rng.standard_normal((2, 3, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        vffn, cls, vcls = ref.infer_image(torch.from_numpy(img))
    out = ours.apply(
        {"params": params}, jnp.asarray(img.transpose(0, 2, 3, 1)),
        method=lambda m, x: m.encode_image(x))
    np.testing.assert_allclose(np.asarray(out["image_hiddens"], np.float32),
                               vffn.numpy(), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out["cls_feats"], np.float32),
                               cls.numpy(), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out["cls_vlffn_feats"], np.float32),
                               vcls.numpy(), atol=2e-5, rtol=2e-5)


def test_fused_path_parity(ref_and_ours):
    """Joint vision+text stream with the multiway split at the modality
    boundary (BEiT3.py:69-89) + pooler."""
    ref, ours, params = ref_and_ours
    rng = np.random.default_rng(2)
    ids = rng.integers(2, VOCAB, (2, 8))
    mask = np.ones((2, 8), np.int64)
    mask[1, 5:] = 0
    img = rng.standard_normal((2, 3, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        h, pooled = ref.infer_fused(torch.tensor(ids), torch.tensor(mask),
                                    torch.from_numpy(img))
    out = ours.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32),
        jnp.asarray(img.transpose(0, 2, 3, 1)),
        method=lambda m, i, k, x: m.encode_fused(i, k, x))
    # padded text positions diverge (masked out); compare valid region
    got = np.asarray(out["fused_hiddens"], np.float32)
    want = h.numpy()
    split = out["split"]
    np.testing.assert_allclose(got[0], want[0], atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(got[1, :split + 5], want[1, :split + 5],
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out["pooled"], np.float32),
                               pooled.numpy(), atol=2e-5, rtol=2e-5)
