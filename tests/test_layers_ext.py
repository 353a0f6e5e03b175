"""Extended layers: CRF (vs brute-force enumeration), non-local block,
consensus, gated tanh, conditional LN (reference antmmf/modules/layers/ +
vision/non_local.py)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from antmmf_tpu.modules.layers_ext import (
    CRF,
    ConditionalLayerNorm,
    ConsensusModule,
    GatedTanh,
    NonLocalBlock,
)


def _brute_force(emissions, start, end, trans, length):
    """All-path scores for one sequence of given valid length."""
    T = emissions.shape[-1]
    scores = {}
    for path in itertools.product(range(T), repeat=length):
        s = start[path[0]] + emissions[0, path[0]]
        for t in range(1, length):
            s += trans[path[t - 1], path[t]] + emissions[t, path[t]]
        s += end[path[-1]]
        scores[path] = float(s)
    return scores


def test_crf_matches_brute_force():
    T, L, B = 3, 4, 2
    rng = np.random.default_rng(0)
    emissions = rng.standard_normal((B, L, T)).astype(np.float32)
    tags = rng.integers(0, T, (B, L)).astype(np.int32)
    crf = CRF(num_tags=T)
    variables = crf.init(jax.random.PRNGKey(0), jnp.asarray(emissions),
                         jnp.asarray(tags))
    p = variables["params"]
    start, end, trans = (np.asarray(p["start_transitions"]),
                         np.asarray(p["end_transitions"]),
                         np.asarray(p["transitions"]))

    llh = crf.apply(variables, jnp.asarray(emissions), jnp.asarray(tags),
                    reduction="none")
    for b in range(B):
        paths = _brute_force(emissions[b], start, end, trans, L)
        logZ = np.log(sum(np.exp(v) for v in paths.values()))
        gold = paths[tuple(tags[b])]
        np.testing.assert_allclose(float(llh[b]), gold - logZ, atol=1e-4)

    # Viterbi == argmax over enumerated paths
    decoded = crf.apply(variables, jnp.asarray(emissions),
                        method="decode")
    for b in range(B):
        paths = _brute_force(emissions[b], start, end, trans, L)
        best = max(paths, key=paths.get)
        assert tuple(np.asarray(decoded[b])) == best


def test_crf_respects_mask():
    T, L = 3, 5
    rng = np.random.default_rng(1)
    emissions = rng.standard_normal((1, L, T)).astype(np.float32)
    tags = rng.integers(0, T, (1, L)).astype(np.int32)
    mask = np.array([[1, 1, 1, 0, 0]], np.float32)  # valid length 3
    crf = CRF(num_tags=T)
    variables = crf.init(jax.random.PRNGKey(0), jnp.asarray(emissions),
                         jnp.asarray(tags))
    p = variables["params"]
    start, end, trans = (np.asarray(p["start_transitions"]),
                         np.asarray(p["end_transitions"]),
                         np.asarray(p["transitions"]))
    llh = float(crf.apply(variables, jnp.asarray(emissions),
                          jnp.asarray(tags), jnp.asarray(mask),
                          reduction="none")[0])
    paths = _brute_force(emissions[0], start, end, trans, 3)
    logZ = np.log(sum(np.exp(v) for v in paths.values()))
    gold = paths[tuple(tags[0, :3])]
    np.testing.assert_allclose(llh, gold - logZ, atol=1e-4)

    decoded = crf.apply(variables, jnp.asarray(emissions), jnp.asarray(mask),
                        method="decode")
    best = max(paths, key=paths.get)
    assert tuple(np.asarray(decoded[0, :3])) == best
    # padded positions repeat the last valid tag
    assert int(decoded[0, 3]) == int(decoded[0, 2])


def test_crf_reductions_and_training():
    T, L, B = 4, 6, 3
    rng = np.random.default_rng(2)
    emissions = jnp.asarray(rng.standard_normal((B, L, T)), jnp.float32)
    tags = jnp.asarray(rng.integers(0, T, (B, L)))
    crf = CRF(num_tags=T)
    v = crf.init(jax.random.PRNGKey(0), emissions, tags)
    none = crf.apply(v, emissions, tags, reduction="none")
    assert none.shape == (B,)
    np.testing.assert_allclose(
        float(crf.apply(v, emissions, tags, reduction="mean")),
        float(none.mean()), atol=1e-5)
    # gradient of -llh flows into transitions
    g = jax.grad(lambda p: -crf.apply({"params": p}, emissions, tags))(
        v["params"])
    assert float(jnp.abs(g["transitions"]).sum()) > 0


def test_non_local_block_zero_init_residual():
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 4, 4, 8)), jnp.float32)
    blk = NonLocalBlock()
    v = blk.init(jax.random.PRNGKey(0), x)
    out = blk.apply(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)
    sub = NonLocalBlock(sub_sample=True)
    vs = sub.init(jax.random.PRNGKey(0), x)
    assert sub.apply(vs, x).shape == x.shape


def test_small_blocks():
    x = jnp.ones((2, 3, 8))
    assert ConsensusModule("avg")(x).shape == (2, 1, 8)
    assert ConsensusModule("identity")(x) is x

    gt = GatedTanh(features=4)
    v = gt.init(jax.random.PRNGKey(0), x)
    assert gt.apply(v, x).shape == (2, 3, 4)

    cln = ConditionalLayerNorm()
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((2, 3, 8)), jnp.float32)
    cond = jnp.zeros((2, 4))
    v = cln.init(jax.random.PRNGKey(0), h, cond)
    out = np.asarray(cln.apply(v, h, cond))
    # zero conditioning → plain LN (zero-init heads, scale 1 bias 0)
    np.testing.assert_allclose(out.mean(-1), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.std(-1), 1.0, atol=1e-2)


def test_fpn_neck():
    """FPN: lateral + top-down merge + smoothing + extra pool level
    (reference vision/necks/BackboneWithFPN.py)."""
    from antmmf_tpu.modules.vision.fpn import (
        BackboneWithFPN,
        FeaturePyramidNetwork,
    )

    maps = [jnp.ones((1, 16, 16, 8)), jnp.ones((1, 8, 8, 16)),
            jnp.ones((1, 4, 4, 32))]
    fpn = FeaturePyramidNetwork(out_channels=12)
    v = fpn.init(jax.random.PRNGKey(0), maps)
    outs = fpn.apply(v, maps)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 12), (1, 8, 8, 12), (1, 4, 4, 12), (1, 2, 2, 12)]

    bb = BackboneWithFPN(preset="resnet_tiny_test", out_channels=8,
                         extra_maxpool=False)
    x = jnp.ones((1, 64, 64, 3))
    v = bb.init(jax.random.PRNGKey(0), x)
    outs = bb.apply(v, x)
    assert all(o.shape[-1] == 8 for o in outs)
    # strictly coarsening pyramid
    hs = [o.shape[1] for o in outs]
    assert hs == sorted(hs, reverse=True)


def test_exu_and_vae():
    """ExU (reference layers/exu.py) + label-conditioned VAE (layers/vae.py)."""
    from antmmf_tpu.modules.layers_ext import ExU, VAE

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, 6)), jnp.float32)
    exu = ExU(out_features=3, n=1.0)
    v = exu.init(jax.random.PRNGKey(0), x)
    out = exu.apply(v, x)
    assert out.shape == (4, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0  # relu-n

    vae = VAE(out_dim=5, class_num=7)
    targets = jnp.eye(7)[jnp.asarray([0, 3, 5, 6])]
    variables = vae.init({"params": jax.random.PRNGKey(0),
                          "sample": jax.random.PRNGKey(1)}, x, targets)
    kl, z = vae.apply(variables, x, targets,
                      rngs={"sample": jax.random.PRNGKey(2)})
    assert z.shape == (4, 5) and np.isfinite(float(kl))
    # inference path: no targets → prior mean, no KL
    kl0, z0 = vae.apply(variables, x)
    assert kl0 is None and z0.shape == (4, 5)
    z0b, _ = None, None
    np.testing.assert_allclose(np.asarray(z0),
                               np.asarray(vae.apply(variables, x)[1]))
