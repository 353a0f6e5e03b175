"""Decoders, adversarial transforms, interpreters, reporters."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from antmmf_tpu.common.metrics_reporter import MetricsReporter, flops_of_fn
from antmmf_tpu.common.test_reporter import TestReporter
from antmmf_tpu.models.adversarial import FGM, PGD, EMA, FreeLB, embedding_mask
from antmmf_tpu.modules.interpret.saliency import (
    IntegratedGradientInterpreter,
    SimpleGradientInterpreter,
    build_interpreter,
)
from antmmf_tpu.utils.text_utils import beam_search, nucleus_sampling


# ---------------------------------------------------------------- decoders
def _greedy_logits_fn(transition):
    """Markov next-token scores, position independent (for testing)."""

    def fn(tokens):
        last = tokens[:, -1]  # not meaningful: decoder sees fixed matrix by last token
        return transition[last]

    return fn


def test_beam_search_finds_highest_prob_path():
    # vocabulary {0,1,2=eos}; from any token, token 1 is much likelier
    V = 4
    trans = jnp.log(jnp.array([
        [0.05, 0.9, 0.02, 0.03],
        [0.05, 0.05, 0.85, 0.05],  # after 1, eos=2 likely
        [0.01, 0.01, 0.97, 0.01],
        [0.25, 0.25, 0.25, 0.25],
    ]))

    def logits_fn(tokens):
        # depends on the previous emitted token: use argmax over positions filled
        # simplest contract: last non-eos token is at position count-1; here we
        # let the model see the full prefix and use the token at the last
        # position that isn't eos — approximated by max position index
        last = tokens[:, 0]  # start token drives step 1
        # for this toy test, behavior after step 1 uses previous sampled token:
        filled = jnp.sum(tokens != 2, axis=-1) - 1
        last = jnp.take_along_axis(tokens, filled[:, None], axis=1)[:, 0]
        return trans[last]

    seqs, scores = beam_search(logits_fn, jnp.array([0, 0]), eos_id=2,
                               max_length=4, num_beams=3)
    assert seqs.shape == (2, 4)
    assert seqs[0, 1] == 1  # greedy-best continuation
    assert np.isfinite(np.asarray(scores)).all()


def test_nucleus_sampling_respects_eos_and_shapes():
    V = 5
    logits = jnp.log(jnp.array([0.01, 0.01, 0.95, 0.01, 0.02]))

    def logits_fn(tokens):
        return jnp.tile(logits, (tokens.shape[0], 1))

    seqs = nucleus_sampling(logits_fn, jnp.array([1, 1, 1]),
                            jax.random.PRNGKey(0), eos_id=2, max_length=6,
                            top_p=0.5)
    assert seqs.shape == (3, 6)
    # top_p=0.5 keeps only token 2 (eos) → everything ends immediately
    assert (np.asarray(seqs[:, 1]) == 2).all()


# -------------------------------------------------------------- adversarial
def _quad_loss_fn(params):
    # embedding-named leaf + other leaf
    loss = jnp.sum(params["word_embedding"] ** 2) + jnp.sum(params["kernel"] ** 2)
    return loss, {"total_loss": loss}


def _params():
    return {"word_embedding": jnp.ones((3,)), "kernel": jnp.ones((2,))}


def test_embedding_mask_selects_by_name():
    mask = embedding_mask(_params())
    assert mask["word_embedding"] is True and mask["kernel"] is False


@pytest.mark.parametrize("cls", [FGM, PGD, FreeLB])
def test_adversarial_grads_shape_and_direction(cls):
    adv = cls({"epsilon": 0.1, "alpha": 0.05, "steps": 2})
    loss, grads, scalars = adv.grads(_quad_loss_fn, _params())
    assert np.isfinite(float(loss))
    assert grads["word_embedding"].shape == (3,)
    # adversarial loss should be >= clean loss for convex loss (ascent step)
    assert float(scalars["adv_loss"]) >= float(loss) - 1e-6
    # gradient magnitude on embeddings exceeds clean gradient (extra adv term)
    assert float(jnp.abs(grads["word_embedding"]).sum()) > \
        float(jnp.abs(jax.grad(lambda p: _quad_loss_fn(p)[0])(_params())[
            "word_embedding"]).sum()) * 0.99


def test_ema_update_moves_towards_params():
    ema = EMA({"decay": 0.9})
    shadow = ema.init({"w": jnp.zeros((2,))})
    new = ema.update(shadow, {"w": jnp.ones((2,))})
    np.testing.assert_allclose(np.asarray(new["w"]), 0.1)


# -------------------------------------------------------------- interpreters
def test_simple_gradient_saliency_picks_influential_token():
    emb = jnp.array([[[1.0, 0.0], [0.0, 0.1], [5.0, 5.0]]])  # token 2 dominates

    def embed_fn(batch):
        return emb

    def loss_from_emb(e, batch):
        return jnp.sum(e ** 2)

    interp = SimpleGradientInterpreter()
    sal = interp.interpret(embed_fn, loss_from_emb, {})
    assert sal.shape == (1, 3)
    assert sal[0].argmax() == 2
    np.testing.assert_allclose(sal.sum(), 1.0, rtol=1e-5)


def test_integrated_gradient_close_to_exact_for_quadratic():
    emb = jnp.array([[[2.0, 1.0], [0.5, 0.0]]])

    def loss_from_emb(e, batch):
        return jnp.sum(e ** 2)

    interp = IntegratedGradientInterpreter({"steps": 50})
    sal = interp.interpret(lambda b: emb, loss_from_emb, {})
    # IG for x² from 0 baseline = x² exactly; normalised
    exact = np.array([[5.0, 0.25]])
    np.testing.assert_allclose(sal, exact / exact.sum(), rtol=0.05)


def test_build_interpreter_registry():
    assert build_interpreter("simple-gradient") is not None
    with pytest.raises(KeyError):
        build_interpreter({"type": "nope"})


# ----------------------------------------------------------------- reporters
def test_test_reporter_dumps_split_files(tmp_path):
    rep = TestReporter({"training_parameters": {
        "save_dir": str(tmp_path), "report_format": "jsonl",
        "evalai_max_predictions_per_file": 2}})
    rep.add_batch({"caption_tid": np.arange(5)},
                  {"logits": np.random.rand(5, 3)})
    paths = rep.dump("testset")
    assert len(paths) == 3
    rows = [json.loads(l) for p in paths for l in open(p)]
    assert len(rows) == 5 and "logits" in rows[0]


def test_metrics_reporter_flops_and_sink(tmp_path):
    rep = MetricsReporter({"training_parameters": {"save_dir": str(tmp_path)}})
    f = flops_of_fn(lambda x: x @ x, jnp.ones((8, 8)))
    assert f is None or f > 0
    rep.step_flops = 100.0
    assert rep.train_flops(10, world_size=4) == 4000.0
    rep.report({"flops": 100.0})
    rep.close()
    sink = os.path.join(str(tmp_path), "green_ai.jsonl")
    assert os.path.exists(sink)
