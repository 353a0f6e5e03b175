"""DMAE component parity: WTI similarity + CrossEn/NegNCE losses vs the
reference torch implementations (dmae_utils.py), run in-process."""

import os
import sys
import types

import numpy as np
import pytest

from reference_compat import REFERENCE_ROOT, install_stubs, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not present")

DMAE_DIR = os.path.join(REFERENCE_ROOT,
                        "prj/dmae_vtp/roi_univl/univl/model")


def _import_dmae_utils():
    install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib.util

    pkg = types.ModuleType("refdmae")
    pkg.__path__ = [DMAE_DIR]
    pkg.__package__ = "refdmae"
    sys.modules["refdmae"] = pkg
    spec = importlib.util.spec_from_file_location(
        "refdmae.dmae_utils", os.path.join(DMAE_DIR, "dmae_utils.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refdmae.dmae_utils"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_mod():
    return _import_dmae_utils()


def _random_inputs(Bt=4, Bv=4, Lt=6, Lv=5, D=16, seed=0):
    rng = np.random.default_rng(seed)

    def norm(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    tt = norm(rng.standard_normal((Bt, Lt, D))).astype(np.float32)
    vt = norm(rng.standard_normal((Bv, Lv, D))).astype(np.float32)
    tm = np.ones((Bt, Lt), np.float32)
    tm[:, -2:] = 0  # ragged text
    vm = np.ones((Bv, Lv), np.float32)
    vm[0, -1] = 0
    return tt, vt, tm, vm


def test_wti_similarity_matches_reference(ref_mod):
    import torch

    import jax.numpy as jnp

    from antmmf_tpu.models.dmae import wti_similarity

    class Cfg:
        l3_interaction = "wti"
        l3_with_nfc = False
        l3_wti_arch = 1
        l3_sim_header = "meanP"
        hidden_size = 16

    torch.manual_seed(0)
    du = ref_mod.DmaeUtils(Cfg())
    du.eval()
    tt, vt, tm, vm = _random_inputs()

    with torch.no_grad():
        t_feat = torch.tensor(tt)
        v_feat = torch.tensor(vt)
        t_mask = torch.tensor(tm)
        v_mask = torch.tensor(vm)
        tw = du.text_weight_fc(t_feat).squeeze(2)
        tw = tw.masked_fill(~(t_mask > 0), float("-inf")).softmax(-1)
        vw = du.video_weight_fc(v_feat).squeeze(2)
        vw = vw.masked_fill(~(v_mask > 0), float("-inf")).softmax(-1)
        ref = du._get_wti_similarity(
            t_feat, v_feat, t_mask, v_mask, tw, vw, self_weight=False)

    ours = wti_similarity(
        jnp.asarray(tt), jnp.asarray(tw.numpy()),
        jnp.asarray(vt), jnp.asarray(vw.numpy()),
        jnp.asarray(tm), jnp.asarray(vm))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5)


def test_cross_en_matches_reference(ref_mod):
    import torch

    import jax.numpy as jnp

    from antmmf_tpu.modules.losses.contrastive import symmetric_cross_en

    rng = np.random.default_rng(1)
    sim = rng.standard_normal((6, 6)).astype(np.float32)
    ce = ref_mod.CrossEn()
    with torch.no_grad():
        # reference applies CrossEn to sim and sim.T separately (both
        # directions); scale folded in for comparability
        ref = 0.5 * (ce(torch.tensor(sim), logit_scale=1.0)
                     + ce(torch.tensor(sim).T, logit_scale=1.0))
    ours = symmetric_cross_en(jnp.asarray(sim))
    np.testing.assert_allclose(float(ours), float(ref), atol=1e-5)


def test_neg_nce_matches_reference(ref_mod):
    import torch

    import jax.numpy as jnp

    from antmmf_tpu.modules.losses.contrastive import neg_nce_dmae

    nn_ref = ref_mod.NegNCE()
    for seed in range(3):
        rng = np.random.default_rng(seed)
        sim = (rng.standard_normal((5, 5)) * 0.1).astype(np.float32)
        with torch.no_grad():
            ref = nn_ref(torch.tensor(sim), logit_scale=100.0)
        ours = neg_nce_dmae(jnp.asarray(sim), logit_scale=100.0,
                            c_pos=1.0, c_neg=0.5, margin=0.0)
        np.testing.assert_allclose(float(ours), float(ref), rtol=2e-5,
                                   err_msg=f"seed {seed}")
