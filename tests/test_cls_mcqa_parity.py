"""Classification + MCQA parity vs the reference torch models (the remaining
training_head_types of the Univl dispatcher)."""

import os
import sys

import numpy as np
import pytest

from reference_compat import (
    BERT_HEADS,
    BERT_LAYERS,
    HIDDEN,
    MODEL_DIR,
    PVT_PRESET,
    import_reference_model,
    make_parity_batch,
    make_ref_config,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not present")


def _load(module_name):
    import importlib.util

    import_reference_model()
    spec = importlib.util.spec_from_file_location(
        f"refmodel.{module_name}", os.path.join(MODEL_DIR,
                                                f"{module_name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"refmodel.{module_name}"] = mod
    spec.loader.exec_module(mod)
    return mod


def _map_common(sd, extra=()):
    from antmmf_tpu.utils.torch_import import (
        _set,
        univl_ref_state_dict_to_params,
    )

    p = univl_ref_state_dict_to_params(sd, BERT_LAYERS, PVT_PRESET)

    def T(v):
        return np.ascontiguousarray(v.T)

    for src, dst in extra:
        _set(p, dst + "/kernel", T(sd[src + ".weight"]))
        _set(p, dst + "/bias", sd[src + ".bias"])
    return p


def test_classification_parity():
    import torch

    import jax

    from antmmf_tpu.common.checkpoint import merge_params_tolerant
    from antmmf_tpu.models.univl_ref import UnivlRefClassification

    mod = _load("univl_video_cls")
    cfg = dict(make_ref_config(with_cross=True))
    cfg["num_labels"] = 5
    from antmmf.common.configuration import Configuration

    torch.manual_seed(0)
    ref = mod.UnivlForVideoClassification(Configuration(cfg))
    ref.eval()
    img_input, caption_input, ours_batch = make_parity_batch(
        b=3, n_clips=2, num_frames=1, size=64, text_len=12)
    with torch.no_grad():
        ref_out = ref(img_input, caption_input)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    mapped = _map_common(sd, extra=[("clf", "clf")])
    model = UnivlRefClassification(
        bert_num_layers=BERT_LAYERS, bert_num_heads=BERT_HEADS,
        hidden_size=HIDDEN, pvt_preset=PVT_PRESET, n_clips=2,
        num_labels=5, training_stage="stage1+stage2", dtype_str="float32")
    variables = model.init(jax.random.PRNGKey(0), ours_batch,
                           deterministic=True)
    merged, report = merge_params_tolerant(variables["params"], mapped)
    # similarity_dense is unused by the cls model — allow it missing
    missing = [m for m in report["missing"] if "similarity_dense" not in m]
    assert not missing, missing[:10]
    out = model.apply({"params": merged}, ours_batch, deterministic=True)
    delta = np.abs(ref_out["logits"].numpy()
                   - np.asarray(out["logits"], np.float32)).max()
    assert delta < 1e-3, delta
    assert (ref_out["logits"].numpy().argmax(-1)
            == np.asarray(out["logits"]).argmax(-1)).all()


def test_mcqa_parity():
    import torch

    import jax

    from antmmf_tpu.common.checkpoint import merge_params_tolerant
    from antmmf_tpu.models.univl_ref import UnivlRefMCQA

    mod = _load("univl_video_multi_choice_qa")
    from antmmf.common.configuration import Configuration

    torch.manual_seed(0)
    ref = mod.UnivlForVideoMultiChoiceQA(
        Configuration(dict(make_ref_config(with_cross=True))))
    ref.eval()

    B, n_opt, L = 2, 3, 10
    img_input, caption_input, ours_batch = make_parity_batch(
        b=B, n_clips=2, num_frames=1, size=64, text_len=L, pad_text=False)
    g = torch.Generator().manual_seed(7)
    opts = torch.randint(1000, 5000, (B, n_opt, L), generator=g)
    opts[..., 0] = 101
    opts[..., -1] = 102
    opt_mask = torch.ones(B, n_opt, L, dtype=torch.long)

    # reference input format: per-sample lists of option dicts
    raw_caption = {
        "caption_options": [
            [{"caption_input_ids": opts[i], "caption_input_mask": opt_mask[i]}]
            for i in range(B)],
        "caption_length": [n_opt] * B,
    }
    raw_img = {
        "image_data": img_input["image_data"][:, None],   # [B, 1, N, 3, H, W]
        "image_pad_mask": img_input["image_pad_mask"][:, None],
        "image_n_clips": [[2]] * B,
        "image_num_frames": [[1]] * B,
    }
    with torch.no_grad():
        ref_out = ref(raw_img, raw_caption)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    mapped = _map_common(sd)
    model = UnivlRefMCQA(
        bert_num_layers=BERT_LAYERS, bert_num_heads=BERT_HEADS,
        hidden_size=HIDDEN, pvt_preset=PVT_PRESET, n_clips=2,
        training_stage="stage1+stage2", dtype_str="float32")
    ours_batch = dict(ours_batch)
    ours_batch["caption_options_ids"] = opts.numpy()
    ours_batch["caption_options_mask"] = opt_mask.numpy()
    variables = model.init(jax.random.PRNGKey(0), ours_batch,
                           deterministic=True)
    merged, report = merge_params_tolerant(variables["params"], mapped)
    assert not report["missing"], report["missing"][:10]
    out = model.apply({"params": merged}, ours_batch, deterministic=True)
    ref_logits = ref_out["logits"].numpy().reshape(B, n_opt)
    delta = np.abs(ref_logits - np.asarray(out["logits"], np.float32)).max()
    assert delta < 1e-3, delta
