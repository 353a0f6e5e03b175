import numpy as np

from antmmf_tpu.modules.metrics.evaluators import CaptioningEvaluator, build_evaluator


def test_captioning_evaluator_perfect_and_noisy():
    ev = CaptioningEvaluator()
    refs = np.array([[101, 5, 6, 7, 8, 102, 0, 0]])
    ev.collect({"caption_raw_input_ids": refs}, {"generated_ids": refs})
    out = ev.summarize()
    assert out["bleu4"] == 1.0 and out["rouge_l"] == 1.0

    ev.reset()
    gen = np.array([[101, 5, 6, 9, 9, 102, 0, 0]])
    ev.collect({"caption_raw_input_ids": refs}, {"generated_ids": gen})
    out = ev.summarize()
    assert 0.0 <= out["bleu4"] < 1.0
    assert 0.0 < out["rouge_l"] < 1.0


def test_captioning_evaluator_registered():
    assert build_evaluator("captioning") is not None


def test_caption_beam_cached_matches_reencode():
    """KV-cache beam search (cross-kv primed once + per-token self cache)
    must produce the SAME sequences as the full re-encoding beam search
    (both implement the identical batched-beam algorithm), and actually
    runs K>1 beams end-to-end with bleu4/rouge on the result."""
    import jax
    import jax.numpy as jnp

    from antmmf_tpu.models.univl_caption import UnivlForVideoCaptioning

    model = UnivlForVideoCaptioning(
        vit_preset="vit_tiny_test", bert_preset="bert_tiny_test",
        image_size=32, embed_dim=32, decoder_layers=2, decoder_heads=2,
        max_caption_len=8, dtype_str="float32")
    rng = jax.random.PRNGKey(0)
    batch = {
        "image_data": jax.random.normal(rng, (2, 2, 32, 32, 3)),
        "video_mask": jnp.ones((2, 2), jnp.int32),
        "caption_input_ids": jnp.ones((2, 8), jnp.int32),
        "caption_input_mask": jnp.ones((2, 8), jnp.int32),
        "caption_segment_ids": jnp.zeros((2, 8), jnp.int32),
    }
    variables = model.init(rng, batch)

    for k in (1, 3):
        cached, s1 = model.generate(variables, batch, num_beams=k,
                                    max_length=8, use_cache=True)
        full, s2 = model.generate(variables, batch, num_beams=k,
                                  max_length=8, use_cache=False)
        np.testing.assert_array_equal(np.asarray(cached), np.asarray(full))

    # beam-width eval: bleu4/rouge computed on K=3 beam captions
    ev = CaptioningEvaluator()
    ev.collect({"caption_raw_input_ids": np.asarray(cached)},
               {"generated_ids": np.asarray(cached)})
    out = ev.summarize()
    assert out["bleu4"] == 1.0
