"""Full-model numerical parity: reference torch UnivlForVideoTextRetrieval vs
our UnivlRefRetrieval with imported weights, on the same batch.

This is the MSR-VTT R@1 parity harness (BASELINE.json north star): it proves
that the retrieval model we score IS numerically the reference model — same
l1_simi / l2_simi values, identical rankings, identical §8.4 multi-gt recalls.
Reference forward anchors: univl_video_ret.py:357-455, univl_video_base.py:56-316.
"""

import numpy as np
import pytest

from reference_compat import (
    BERT_HEADS,
    BERT_LAYERS,
    HIDDEN,
    PVT_PRESET,
    build_ref_model,
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
    from antmmf_tpu.models.univl_ref import UnivlRefRetrieval
    from antmmf_tpu.utils.torch_import import univl_ref_state_dict_to_params

    ref = build_ref_model(seed=0, with_cross=True)
    img_input, caption_input, ours_batch = make_parity_batch(
        b=3, n_clips=2, num_frames=1, size=64, text_len=12)
    with torch.no_grad():
        ref_out = ref(img_input, caption_input)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    mapped = univl_ref_state_dict_to_params(sd, BERT_LAYERS, PVT_PRESET)

    model = UnivlRefRetrieval(
        bert_num_layers=BERT_LAYERS, bert_num_heads=BERT_HEADS,
        hidden_size=HIDDEN, pvt_preset=PVT_PRESET, n_clips=2,
        training_stage="stage1+stage2", dtype_str="float32")
    variables = model.init(jax.random.PRNGKey(0), ours_batch,
                           deterministic=True)
    merged, report = merge_params_tolerant(variables["params"], mapped)
    assert not report["missing"], f"unmapped params: {report['missing'][:10]}"
    assert not report["shape_mismatch"], report["shape_mismatch"][:10]
    out = model.apply({"params": merged}, ours_batch, deterministic=True)
    return ref_out, out


def test_l1_similarity_values_match(parity):
    ref_out, out = parity
    ref_l1 = ref_out["l1_simi"].numpy()
    our_l1 = np.asarray(out["l1_simi"], np.float32)
    delta = np.abs(ref_l1 - our_l1).max()
    assert delta < 5e-4, f"max |Δl1_simi| = {delta}"


def test_l2_similarity_values_match(parity):
    ref_out, out = parity
    ref_l2 = ref_out["l2_simi"].numpy()
    our_l2 = np.asarray(out["l2_simi"], np.float32)
    delta = np.abs(ref_l2 - our_l2).max()
    assert delta < 5e-4, f"max |Δl2_simi| = {delta}"


def test_rankings_identical(parity):
    ref_out, out = parity
    for key in ("l1_simi", "l2_simi"):
        ref_rank = np.argsort(-ref_out[key].numpy(), axis=-1)
        our_rank = np.argsort(-np.asarray(out[key], np.float32), axis=-1)
        np.testing.assert_array_equal(ref_rank, our_rank, err_msg=key)
        # v2t direction too
        ref_rank = np.argsort(-ref_out[key].numpy().T, axis=-1)
        our_rank = np.argsort(-np.asarray(out[key], np.float32).T, axis=-1)
        np.testing.assert_array_equal(ref_rank, our_rank, err_msg=key + ".T")


def test_losses_match(parity):
    ref_out, out = parity
    for key in ("level1_similarity_loss", "level2_similarity_loss"):
        ref_v = float(ref_out["losses"][key])
        our_v = float(out["losses"][key])
        assert abs(ref_v - our_v) < 5e-4, f"{key}: {ref_v} vs {our_v}"


def test_multi_gt_eval_convention_matches(parity):
    """§8.4: both sim matrices produce identical multi-gt min-rank recalls
    through our corpus evaluator (global_retrieval_recall semantics)."""
    ref_out, out = parity

    def recalls(sim):
        # multi-gt: caption i ↔ video i, plus caption 0 also matches video 1
        t2v = {0: [0, 1], 1: [1], 2: [2]}
        v2t = {0: [0], 1: [0, 1], 2: [2]}
        return _recall_from_sim(sim, t2v), _recall_from_sim(sim.T, v2t)

    def _recall_from_sim(sim, gt):
        out = {}
        order = np.argsort(-sim, axis=-1)
        ranks = []
        for i, gts in gt.items():
            pos = min(int(np.where(order[i] == g)[0][0]) for g in gts)
            ranks.append(pos + 1)
        ranks = np.asarray(ranks)
        return {"r@1": float((ranks <= 1).mean()),
                "median_rank": float(np.median(ranks))}

    ref_t2v, ref_v2t = recalls(ref_out["l1_simi"].numpy())
    our_t2v, our_v2t = recalls(np.asarray(out["l1_simi"], np.float32))
    assert ref_t2v == our_t2v
    assert ref_v2t == our_v2t
