"""Quality-regression anchor: retrieval quality pinned beyond single-batch
overfit (SURVEY §6 north-star proxy — MSR-VTT R@1 within tolerance; this
no-egress rig substitutes a deterministic synthetic corpus).

A seeded corpus of N clips, each with a distinct visual concept (per-clip
spatial frequency/phase grating) and a caption naming it (two unique vocab
ids per clip). The flagship retrieval model trains a few hundred jitted
contrastive steps and must reach an R@1/R@5 band on the FULL corpus — the
tripwire future perf work (ToMe, quant, SP, fused kernels) must keep green.
Tolerance is a band, not an exact value: numeric drift within a few points
passes; a quality regression (wrong loss scaling, broken tower, collapsed
embeddings) fails.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

N_CLIPS = 64
FRAMES = 2
SIZE = 32
TEXT_LEN = 8
BATCH = 16
STEPS = 200


def _corpus(n_clips=N_CLIPS):
    """Deterministic learnable corpus: clip i = oriented grating with
    per-clip frequency/phase; caption i = [CLS] w_2i w_2i+1 [SEP].
    Channel 2 carries the clip id as a binary block pattern (3x3 grid of
    10px blocks = 9 bits, unique up to 512 clips) — crisply separable by
    the patch embed, so the anchor tests retrieval LEARNING rather than
    the tower's ability to resolve near-identical gratings."""
    assert n_clips <= 512
    rng = np.random.default_rng(1234)
    yy, xx = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32) / SIZE
    videos = np.zeros((n_clips, FRAMES, SIZE, SIZE, 3), np.float32)
    for i in range(n_clips):
        theta = 2 * np.pi * i / n_clips
        freq = 2.0 + (i % 8)
        base = np.sin(2 * np.pi * freq *
                      (np.cos(theta) * xx + np.sin(theta) * yy))
        code = np.zeros((SIZE, SIZE), np.float32)
        for b in range(9):
            r0, c0 = (b // 3) * 10, (b % 3) * 10
            code[r0:r0 + 10, c0:c0 + 10] = 1.0 if (i >> b) & 1 else -1.0
        for f in range(FRAMES):
            phase = 0.5 * f
            videos[i, f, :, :, 0] = base
            videos[i, f, :, :, 1] = np.cos(
                2 * np.pi * freq * (xx - yy) + phase)
            videos[i, f, :, :, 2] = code
    videos += rng.normal(0, 0.02, videos.shape).astype(np.float32)
    ids = np.zeros((n_clips, TEXT_LEN), np.int64)
    ids[:, 0] = 101  # [CLS]
    for i in range(n_clips):
        ids[i, 1] = 2000 + 2 * i
        ids[i, 2] = 2001 + 2 * i
        ids[i, 3] = 102  # [SEP]
    mask = (ids > 0).astype(np.int64)
    return videos, ids, mask


def _batch(videos, ids, mask, idx):
    return {
        "image_data": jnp.asarray(videos[idx]),
        "video_mask": jnp.ones((len(idx), FRAMES), jnp.int32),
        "caption_input_ids": jnp.asarray(ids[idx]),
        "caption_input_mask": jnp.asarray(mask[idx]),
        "caption_segment_ids": jnp.zeros((len(idx), TEXT_LEN), jnp.int32),
    }


@pytest.fixture(scope="module")
def trained_retrieval():
    from antmmf_tpu.models.base_model import build_model

    shell = build_model({"model_attributes": {"univl_retrieval": {
        "vit_preset": "vit_tiny_test", "bert_preset": "bert_tiny_test",
        "image_size": SIZE, "embed_dim": 32, "dtype_str": "float32"}}})
    videos, ids, mask = _corpus()
    variables = shell.init(jax.random.PRNGKey(0),
                           _batch(videos, ids, mask, np.arange(2)))
    tx = optax.adamw(2e-3, weight_decay=0.01)
    opt_state = tx.init(variables["params"])

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, key):
        def loss_of(p):
            loss, _ = shell.loss_fn({"params": p}, batch,
                                    rngs={"dropout": key},
                                    deterministic=False)
            return loss

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables["params"]
    order = np.random.default_rng(7)
    losses = []
    for it in range(STEPS):
        idx = order.choice(N_CLIPS, BATCH, replace=False)
        params, opt_state, loss = step(
            params, opt_state, _batch(videos, ids, mask, idx),
            jax.random.PRNGKey(it))
        losses.append(float(loss))
    return shell, {"params": params}, (videos, ids, mask), losses


def _recalls(shell, variables, corpus):
    videos, ids, mask = corpus
    n = videos.shape[0]
    model = shell.module
    t_emb, v_emb = [], []
    for lo in range(0, n, BATCH):
        idx = np.arange(lo, min(lo + BATCH, n))
        b = _batch(videos, ids, mask, idx)
        text = model.apply(variables, b, True,
                           method=lambda m, bb, det: m.encode_text(bb, det))
        video = model.apply(variables, b, True,
                            method=lambda m, bb, det: m.encode_video(bb, det))
        t_emb.append(np.asarray(text["text_embed"], np.float32))
        # clip_embed is [B, n_clips, D]; n_clips=1 here
        v_emb.append(np.asarray(video["clip_embed"], np.float32).mean(1))
    t = np.concatenate(t_emb)
    v = np.concatenate(v_emb)
    t /= np.linalg.norm(t, axis=-1, keepdims=True)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    sims = t @ v.T  # [text, video]
    ranks = (-sims).argsort(axis=1)
    gt = np.arange(n)
    pos = (ranks == gt[:, None]).argmax(axis=1)
    return {"r1": float((pos == 0).mean() * 100),
            "r5": float((pos < 5).mean() * 100),
            "median_rank": float(np.median(pos) + 1)}


def test_loss_trajectory_converges(trained_retrieval):
    _, _, _, losses = trained_retrieval
    assert np.isfinite(losses).all()
    # contrastive loss must collapse well below the random-guess plateau
    # (ln(BATCH) ≈ 2.77 for B=16 symmetric InfoNCE)
    assert np.mean(losses[-10:]) < 0.5 * np.mean(losses[:10]), (
        losses[:10], losses[-10:])


def test_retrieval_quality_band(trained_retrieval):
    """The anchor: R@1/R@5 on the 64-clip corpus after 120 steps. Bands are
    deliberately loose vs the calibrated value so numeric drift passes and
    real regressions (collapsed tower, broken loss, quant/ToMe/SP damage)
    fail."""
    shell, variables, corpus, _ = trained_retrieval
    rec = _recalls(shell, variables, corpus)
    assert rec["r1"] >= 70.0, rec
    assert rec["r5"] >= 90.0, rec
    assert rec["median_rank"] <= 2.0, rec


def test_retrieval_quality_band_corpus_scale():
    """Heavy variant (ANTMMF_HEAVY_CI=1): a 512-clip corpus — the closest
    no-egress proxy to the SURVEY §6 MSR-VTT-scale north-star — trained
    400 steps must clear R@1/R@5 bands. ~10 min on the 1-core box."""
    import os

    if not os.environ.get("ANTMMF_HEAVY_CI"):
        import pytest

        pytest.skip("heavy corpus-scale anchor; set ANTMMF_HEAVY_CI=1")

    import functools

    import optax

    from antmmf_tpu.models.base_model import build_model

    N, B = 512, 64  # contrastive breadth is decisive at this corpus size:
    # B=16 plateaued at r1≈1% after 400 steps; B=64 reached 99.4% by 800
    shell = build_model({"model_attributes": {"univl_retrieval": {
        "vit_preset": "vit_tiny_test", "bert_preset": "bert_tiny_test",
        "image_size": SIZE, "embed_dim": 32, "dtype_str": "float32"}}})
    videos, ids, mask = _corpus(N)
    variables = shell.init(jax.random.PRNGKey(0),
                           _batch(videos, ids, mask, np.arange(2)))
    tx = optax.adamw(2e-3, weight_decay=0.01)
    opt_state = tx.init(variables["params"])

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, key):
        def loss_of(p):
            loss, _ = shell.loss_fn({"params": p}, batch,
                                    rngs={"dropout": key},
                                    deterministic=False)
            return loss

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables["params"]
    order = np.random.default_rng(7)
    for it in range(1000):
        idx = order.choice(N, B, replace=False)
        params, opt_state, loss = step(
            params, opt_state, _batch(videos, ids, mask, idx),
            jax.random.PRNGKey(it))
    rec = _recalls(shell, {"params": params}, (videos, ids, mask))
    # calibrated 99.4-100% at step 800-1200; loose bands for numeric drift
    assert rec["r1"] >= 85.0, rec
    assert rec["r5"] >= 95.0, rec
