"""Pretraining-model parity: reference torch UnivlForVideoPretraining vs our
UnivlRefPretraining with imported weights — MIL-NCE stages + MLM + ITM
(the BASELINE config-#4 workload class)."""

import numpy as np
import pytest

from reference_compat import (
    BERT_HEADS,
    BERT_LAYERS,
    HIDDEN,
    PVT_PRESET,
    build_ref_pretrain_model,
    make_parity_batch,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not present")


@pytest.fixture(scope="module")
def parity():
    import torch

    import jax

    from antmmf_tpu.common.checkpoint import merge_params_tolerant
    from antmmf_tpu.models.univl_ref import UnivlRefPretraining
    from antmmf_tpu.utils.torch_import import (
        univl_ref_pretrain_state_dict_to_params,
    )

    ref = build_ref_pretrain_model(seed=0)
    img_input, caption_input, ours_batch = make_parity_batch(
        b=3, n_clips=2, num_frames=1, size=64, text_len=12)

    # masked ids + labels + rolled false captions
    rng = np.random.default_rng(3)
    ids = caption_input["caption_input_ids"].clone()
    labels = -torch.ones_like(ids)
    for i in range(ids.shape[0]):
        for p in rng.integers(1, 9, 2):
            labels[i, p] = ids[i, p]
            ids[i, p] = 103
    caption_input["caption_input_ids"] = ids
    caption_input["caption_false_input_ids"] = torch.roll(
        caption_input["caption_raw_input_ids"], 1, 0)
    caption_input["caption_false_input_mask"] = torch.roll(
        caption_input["caption_input_mask"], 1, 0)

    class SL(dict):
        __getattr__ = dict.__getitem__

    with torch.no_grad():
        out_list = ref(img_input, caption_input,
                       sample_list=SL(caption_lm_label_ids=labels))
    ref_out = {}
    for o in out_list:
        for k, v in o.get("losses", {}).items():
            ref_out[k] = float(v)
        for k in ("l1_simi", "l2_simi"):
            if k in o:
                ref_out[k] = o[k].numpy()
        if "logits" in o:
            ref_out["mlm_logits"] = o["logits"].numpy()

    ours_batch["caption_input_ids"] = ids.numpy()
    ours_batch["caption_lm_label_ids"] = labels.numpy()
    ours_batch["caption_false_input_ids"] = \
        caption_input["caption_false_input_ids"].numpy()
    ours_batch["caption_false_input_mask"] = \
        caption_input["caption_false_input_mask"].numpy()

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    mapped = univl_ref_pretrain_state_dict_to_params(
        sd, BERT_LAYERS, PVT_PRESET)
    model = UnivlRefPretraining(
        bert_num_layers=BERT_LAYERS, bert_num_heads=BERT_HEADS,
        hidden_size=HIDDEN, pvt_preset=PVT_PRESET, n_clips=2,
        training_stage="stage1+stage2", dtype_str="float32")
    import jax as _jax

    variables = model.init(_jax.random.PRNGKey(0), ours_batch,
                           deterministic=True)
    merged, report = merge_params_tolerant(variables["params"], mapped)
    assert not report["missing"], report["missing"][:10]
    assert not report["shape_mismatch"], report["shape_mismatch"][:10]
    out = model.apply({"params": merged}, ours_batch, deterministic=True)
    return ref_out, out


def test_pretrain_losses_match(parity):
    ref_out, out = parity
    for key in ("level1_similarity_loss", "level2_similarity_loss",
                "masked_lm_loss", "itm_loss"):
        ours = float(out["losses"][key])
        assert abs(ours - ref_out[key]) < 1e-3, (key, ours, ref_out[key])


def test_pretrain_mlm_logits_match(parity):
    ref_out, out = parity
    delta = np.abs(ref_out["mlm_logits"]
                   - np.asarray(out["mlm_logits"], np.float32)).max()
    assert delta < 5e-3, delta  # vocab-size logits accumulate more error


def test_pretrain_sim_matrices_match(parity):
    ref_out, out = parity
    for key in ("l1_simi", "l2_simi"):
        delta = np.abs(ref_out[key] - np.asarray(out[key], np.float32)).max()
        assert delta < 5e-4, (key, delta)
