"""SNP-S3 pretraining on fixtures: dual-level MLM + significant masking
(reference prj/snps3_vtp; VERDICT round-1 item 7)."""

import os

import numpy as np

from antmmf_tpu.common.build import build_config
from antmmf_tpu.trainers.build import build_trainer

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(ROOT, "projects", "snps3_vtp", "configs",
                   "snps3_pretrain.local.yml")


def test_snps3_trains_with_dual_mlm_and_s3_masking(tmp_path):
    cfg = build_config(CFG, opts=[
        "training_parameters.save_dir", str(tmp_path),
        "training_parameters.seed", "13",
    ])
    # the config enables the S3 masking knobs end-to-end
    text_cfg = cfg["task_attributes"]["univl_task"]["dataset_attributes"][
        "video_text_pretrain"]["text"]
    assert bool(text_cfg["significant_masking"])

    trainer = build_trainer(cfg)
    trainer.load()
    trainer.train()
    scalars = trainer.meter.get_scalar_dict()
    assert any("masked_lm_loss" in k for k in scalars), scalars.keys()
    assert any("vtc_loss" in k for k in scalars)
    assert np.isfinite(trainer.meter.meters["train/total_loss"].get_latest())


def test_s3_masking_prefers_content_words():
    from antmmf_tpu.datasets.processors.text_processors import (
        MaskedTokenProcessor,
    )

    proc = MaskedTokenProcessor({
        "vocab_file": os.path.join(ROOT, "tests", "data", "vocabs",
                                   "bert-base-uncased_30522_vocab.txt"),
        "max_seq_length": 16, "mask_probability": 0.3, "wwm": True,
        "significant_masking": True, "significant_boost": 3.0, "seed": 0})
    text = "the girl is doing gymnastics in the gym"
    content_hits = stop_hits = 0
    for _ in range(200):
        out = proc({"text": text})
        for pos in np.nonzero(out["lm_label_ids"] != -1)[0]:
            # the label id IS the original token id — recover the word
            word = proc.tokenizer.convert_ids_to_tokens(
                [int(out["lm_label_ids"][pos])])[0].replace("##", "")
            if word in ("the", "is", "in"):
                stop_hits += 1
            else:
                content_hits += 1
    assert content_hits > 2 * stop_hits, (content_hits, stop_hits)


def test_attentive_masking_in_pretrain_model():
    """Attentive masking: importance-sampled MLM positions, specials never
    masked, labels consistent (reference univl_video_pretrain.py:187-210)."""
    import jax

    from antmmf_tpu.models.univl_pretrain import UnivlForVideoPretraining

    model = UnivlForVideoPretraining(
        vit_preset="vit_tiny_test", bert_preset="bert_tiny_test",
        image_size=32, embed_dim=32, with_vtc=True, with_vtm=False,
        with_mlm=True, attentive_masking=True, dtype_str="float32")
    rng = np.random.default_rng(0)
    B, L = 4, 12
    raw = rng.integers(1000, 5000, (B, L)).astype(np.int64)
    raw[:, 0] = 101
    raw[:, -1] = 102
    batch = {
        "image_data": rng.standard_normal((B, 2, 32, 32, 3)).astype(np.float32),
        "caption_input_ids": raw.copy(),
        "caption_raw_input_ids": raw.copy(),
        "caption_input_mask": np.ones((B, L), np.int64),
        "caption_lm_label_ids": np.full((B, L), -1, np.int64),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, deterministic=True)

    # find a dropout key under which the attentive branch fires
    masked_any = False
    for seed in range(6):
        out = model.apply(variables, batch, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(seed)})
        assert np.isfinite(float(out["losses"]["masked_lm_loss"]))
        ids, labels = model.apply(
            variables, batch["caption_raw_input_ids"],
            batch["caption_input_mask"], None,
            batch["caption_input_ids"], batch["caption_lm_label_ids"],
            method=UnivlForVideoPretraining._attentive_mask,
            rngs={"dropout": jax.random.PRNGKey(seed)})
        ids, labels = np.asarray(ids), np.asarray(labels)
        if (labels != -1).any():
            masked_any = True
            chosen = labels != -1
            assert (ids[chosen] == 103).all()
            np.testing.assert_array_equal(labels[chosen], raw[chosen])
            # specials never masked
            assert not chosen[:, 0].any() and not chosen[:, -1].any()
            assert chosen.sum(axis=1).max() <= max(1, int(L * 0.15))
    assert masked_any, "attentive branch never fired across 6 seeds"
