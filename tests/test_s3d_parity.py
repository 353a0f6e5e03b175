"""S3D-G parity: the reference torch S3D (s3dg.py, MIL-NCE HowTo100M
tower) matches our S3DRef after weight import — full forward_video on real
shapes (stem stride-2, TF-SAME pools with ceil_mode, 9 Inception blocks
with per-branch gating, fc head)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "tests")
from reference_compat import REFERENCE_ROOT, install_stubs, reference_available

if not reference_available():
    pytest.skip("reference tree unavailable", allow_module_level=True)

from antmmf_tpu.models.s3d_ref import S3DRef
from antmmf_tpu.utils.torch_import import s3d_state_dict_to_params


@pytest.fixture(scope="module")
def pair():
    install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    m = importlib.import_module("antmmf.models.s3dg")
    torch.manual_seed(0)
    ref = m.S3D(num_classes=512, with_text_module=False,
                init="kaiming_normal").eval()
    with torch.no_grad():  # non-trivial BN running stats
        for mod in ref.modules():
            if isinstance(mod, torch.nn.BatchNorm3d):
                mod.running_mean.normal_(0, 0.1)
                mod.running_var.uniform_(0.5, 1.5)
                mod.weight.normal_(1.0, 0.1)
                mod.bias.normal_(0, 0.1)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = s3d_state_dict_to_params(sd)
    return ref, S3DRef(num_classes=512), params


def test_s3d_forward_video_matches(pair):
    ref, ours, params = pair
    rng = np.random.default_rng(0)
    video = rng.standard_normal((1, 3, 10, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want_emb = ref.forward_video(torch.tensor(video)).numpy()
        want_5c = ref.forward_video(torch.tensor(video),
                                    mixed5c=True).numpy()
    nthwc = jnp.asarray(np.transpose(video, (0, 2, 3, 4, 1)))
    got = ours.apply({"params": params}, nthwc)
    np.testing.assert_allclose(np.asarray(got["mixed5c"]), want_5c,
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(got["embedding"]), want_emb,
                               atol=2e-4, rtol=2e-4)


def test_s3d_odd_shapes_ceil_mode(pair):
    """Odd T/H/W exercise the ceil_mode path of the TF pools."""
    ref, ours, params = pair
    video = np.random.default_rng(1).standard_normal(
        (1, 3, 9, 50, 50)).astype(np.float32)
    with torch.no_grad():
        want = ref.forward_video(torch.tensor(video)).numpy()
    nthwc = jnp.asarray(np.transpose(video, (0, 2, 3, 4, 1)))
    got = ours.apply({"params": params}, nthwc)
    np.testing.assert_allclose(np.asarray(got["embedding"]), want,
                               atol=2e-4, rtol=2e-4)


def test_import_covers_all_params(pair):
    _, ours, params = pair
    init = ours.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 4, 32, 32, 3), jnp.float32))["params"]
    flat = lambda t: {"/".join(str(k.key) for k in path) for path, _ in
                      jax.tree_util.tree_flatten_with_path(t)[0]}
    missing = flat(init) - flat(params)
    assert not missing, sorted(missing)[:8]
