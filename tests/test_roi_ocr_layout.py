"""ROI OCR layout: LayoutLM 2D box-position embeddings on the OCR stream.

Reference: prj/base_vtp/roi_univl/roi/model.py:90-98 (ocr_embeddings =
LayoutLMEmbeddings over ocr_bboxes) + roi/dataset.py:111-170 (line boxes
bucketised to [0, 1000], wordpieces inherit the line box, ";" separators).
"""

import os

import numpy as np

import antmmf_tpu.datasets  # noqa: F401 — processor/builder registry effects

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ------------------------------------------------------------ OCR processor
def test_ocr_processor_contract():
    from antmmf_tpu.common.registry import registry

    proc = registry.get_processor_class("ocr_processor")({"max_length": 16})
    out = proc({
        "ocr_text": ["TOTAL DUE", "$50.00"],
        "ocr_box": [[10, 10, 120, 30], [130, 10, 200, 30]],
        "image_height": 330.0, "image_width": 300.0,
    })
    assert out["ocr_input_ids"].shape == (16,)
    assert out["ocr_bboxes"].shape == (16, 4)
    n = int(out["ocr_input_mask"].sum())
    assert n > 4  # wordpieces + 2 line separators
    # bucketisation: x*1000/w, y*1000/h, clipped to [0, 1000]
    np.testing.assert_array_equal(
        out["ocr_bboxes"][0], [10 * 1000 // 300, 10 * 1000 // 330,
                               120 * 1000 // 300, 30 * 1000 // 330])
    # all wordpieces of line 0 share the line box; line 1 box differs
    first_box = out["ocr_bboxes"][0]
    boxes = out["ocr_bboxes"][:n]
    assert (boxes == first_box).all(axis=1).sum() >= 2
    assert not (boxes == first_box).all()
    # ";" separator closes each line
    sep_id = proc.tokenizer.convert_tokens_to_ids([";"])[0]
    assert (out["ocr_input_ids"][:n] == sep_id).sum() == 2
    # padding region zeroed
    assert (out["ocr_input_ids"][n:] == 0).all()
    assert (out["ocr_bboxes"][n:] == 0).all()


# ----------------------------------------------------------- model wiring
def _roi_batch(with_boxes=True, B=2, R=4, Lt=8, Lo=6):
    rng = np.random.default_rng(0)
    batch = {
        "caption_input_ids": rng.integers(0, 30522, (B, Lt)).astype(np.int64),
        "caption_input_mask": np.ones((B, Lt), np.int64),
        "region_feature": rng.standard_normal((B, R, 16)).astype(np.float32),
        "region_boxes": rng.uniform(size=(B, R, 5)).astype(np.float32),
        "region_mask": np.ones((B, R), np.int64),
        "ocr_input_ids": rng.integers(1, 30522, (B, Lo)).astype(np.int64),
        "ocr_input_mask": np.ones((B, Lo), np.int64),
    }
    if with_boxes:
        batch["ocr_bboxes"] = rng.integers(0, 1001, (B, Lo, 4)).astype(
            np.int64)
    return batch


def _roi_model(**kw):
    from antmmf_tpu.models.univl_roi import UnivlRoiModel

    return UnivlRoiModel(
        vit_preset="vit_tiny_test", bert_preset="bert_tiny_test",
        image_size=32, embed_dim=32, cross_layers=1, with_grid_stream=False,
        with_mlm=False, with_itm=True, region_dim=16, dtype_str="float32",
        **kw)


def test_ocr_boxes_change_output():
    """The 2D layout embedding must actually reach the cross-encoder: same
    tokens with different boxes → different pooled output."""
    import jax

    model = _roi_model()
    batch = _roi_batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, deterministic=True)
    assert "ocr_layout_embeddings" in variables["params"]
    out1 = model.apply(variables, batch, deterministic=True)
    moved = dict(batch)
    moved["ocr_bboxes"] = (batch["ocr_bboxes"] + 311) % 1001
    out2 = model.apply(variables, moved, deterministic=True)
    assert not np.allclose(np.asarray(out1["cross_pooled"]),
                           np.asarray(out2["cross_pooled"]))
    # without boxes the model still runs (plain text embeddings fallback)
    out3 = model.apply(variables, _roi_batch(with_boxes=False),
                       deterministic=True)
    assert np.isfinite(np.asarray(out3["cross_pooled"])).all()


def test_ocr_layout_params_receive_grads():
    import jax
    import jax.numpy as jnp

    model = _roi_model()
    batch = _roi_batch()
    batch["itm_labels"] = np.array([0, 1], np.int64)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, deterministic=True)

    def loss(p):
        out = model.apply({"params": p}, batch, deterministic=True)
        return sum(jnp.mean(v) for v in out["losses"].values())

    grads = jax.grad(loss)(variables["params"])
    layout = grads["ocr_layout_embeddings"]
    total = sum(float(np.abs(np.asarray(g)).sum())
                for g in jax.tree_util.tree_leaves(layout))
    assert total > 0.0


# ------------------------------------------------------------------- e2e
def test_roi_e2e_train():
    """roi_dataset builder → trainer → loss decreases on the fixture."""
    from antmmf_tpu.common.build import build_config
    from antmmf_tpu.trainers.build import build_trainer

    cfg_path = os.path.join(ROOT, "projects", "base_vtp", "configs",
                            "roi_pretrain.local.yml")
    import tempfile

    with tempfile.TemporaryDirectory() as save_dir:
        cfg = build_config(cfg_path, opts=[
            "training_parameters.save_dir", save_dir,
            "training_parameters.max_iterations", "10",
            "optimizer_attributes.params.lr", "1e-3",
        ])
        trainer = build_trainer(cfg)
        trainer.load()
        # the dataset feeds OCR boxes through to the model batch
        sample = trainer.task_loader.tasks["train"][0].get_datasets()[0][0]
        assert "ocr_bboxes" in sample and sample["ocr_bboxes"].shape == (24, 4)
        assert int(sample["ocr_input_mask"].sum()) > 0
        trainer.train()
        series = trainer.meter.meters.get("train/total_loss")
        vals = list(series.deque)
        assert np.isfinite(vals).all()
        # masking/ITM-swap randomness makes single steps noisy: compare
        # halves (4 fixture rows memorize quickly at lr 1e-3)
        half = len(vals) // 2
        assert np.mean(vals[half:]) < np.mean(vals[:half]), vals
