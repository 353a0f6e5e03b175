"""Round-2 components: graph DB (+comp_gcn end-to-end), bbox_ap, MMHotFlip,
MRC head — the four absent components named in round 1."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ------------------------------------------------------------------ graph DB
def test_graph_database_loads_triples():
    from antmmf_tpu.datasets.database.graph_database import GraphDatabase

    db = GraphDatabase(os.path.join(DATA, "graph", "triples_train.jsonl"))
    assert len(db) == 48
    assert db.num_entities <= 20 and db.num_relations == 3
    s = db[0]
    assert s["edge_index"].shape[0] == 2
    assert s["edge_mask"].sum() == 48
    assert 0 <= int(s["targets"]) < db.num_entities


def test_graph_database_subgraph_static_shapes():
    from antmmf_tpu.datasets.database.graph_database import GraphDatabase

    db = GraphDatabase(os.path.join(DATA, "graph", "triples_train.jsonl"))
    sg = db.sample_subgraph(0, hops=2, max_nodes=16, max_edges=32)
    assert sg["node_ids"].shape == (16,) and sg["edge_index"].shape == (2, 32)
    assert sg["node_mask"][0] and int(sg["node_ids"][0]) == 0
    # local edge endpoints must index valid nodes
    n_valid = int(sg["node_mask"].sum())
    used = sg["edge_index"][:, sg["edge_mask"]]
    assert used.size == 0 or used.max() < n_valid


def test_comp_gcn_trains_from_graph_db_end_to_end(tmp_path):
    from antmmf_tpu.common.build import build_config
    from antmmf_tpu.trainers.build import build_trainer

    cfg = build_config(
        os.path.join(ROOT, "projects", "graph", "configs",
                     "kg_link_prediction.local.yml"),
        opts=["training_parameters.save_dir", str(tmp_path),
              "training_parameters.seed", "3"])
    trainer = build_trainer(cfg)
    trainer.load()
    trainer.train()
    series = trainer.meter.meters.get("train/total_loss")
    assert series is not None and np.isfinite(series.get_latest())
    assert series.get_latest() < series.deque[0]  # overfits the 48 triples


# ------------------------------------------------------------------- bbox_ap
def test_bbox_ap_perfect_predictions():
    from antmmf_tpu.modules.metrics.detection import DetectionEvaluator

    ev = DetectionEvaluator()
    gt = np.array([[10, 10, 50, 50], [60, 60, 90, 90]], np.float32)
    det = np.concatenate([gt, [[0.9], [0.8]] * np.ones((2, 1), np.float32),
                          [[1], [2]]], axis=1)
    ev.collect({"image_id": [0],
                "gt_boxes": [gt], "gt_classes": [np.array([1, 2])]},
               {"bbox_output": [det]})
    m = ev.summarize()
    assert m["map"] == pytest.approx(1.0, abs=1e-6)
    assert m["map@0.5"] == pytest.approx(1.0, abs=1e-6)


def test_bbox_ap_half_wrong():
    from antmmf_tpu.modules.metrics.detection import DetectionEvaluator

    ev = DetectionEvaluator()
    gt = np.array([[10, 10, 50, 50]], np.float32)
    det = np.array([[100, 100, 140, 140, 0.9, 1],   # miss
                    [10, 10, 50, 50, 0.8, 1]],      # hit (lower score)
                   np.float32)
    ev.collect({"image_id": [0], "gt_boxes": [gt],
                "gt_classes": [np.array([1])]},
               {"bbox_output": [det]})
    m = ev.summarize()
    # precision at the hit is 1/2, AP ≈ 0.5 (101-pt interp)
    assert 0.4 < m["map@0.5"] < 0.6


def test_bbox_ap_registered_and_iou_localization():
    from antmmf_tpu.common.registry import registry
    from antmmf_tpu.modules.metrics.detection import DetectionEvaluator

    assert registry.get_metric_class("bbox_ap") is not None
    ev = DetectionEvaluator()
    gt = np.array([[0, 0, 100, 100]], np.float32)
    # IoU = 0.68: counts at 0.5/0.65 but not at 0.70+
    det = np.array([[0, 0, 100, 68, 0.9, 1]], np.float32)
    ev.collect({"image_id": [0], "gt_boxes": [gt],
                "gt_classes": [np.array([1])]},
               {"bbox_output": [det]})
    m = ev.summarize()
    assert m["map@0.5"] == pytest.approx(1.0, abs=1e-6)
    assert m["map@0.75"] == pytest.approx(0.0, abs=1e-6)
    assert 0.0 < m["map"] < 1.0


# ----------------------------------------------------------------- MMHotFlip
def test_mm_hotflip_flips_hardest_tokens():
    from antmmf_tpu.models.adversarial import MMHotFlip

    V, C, B, L = 50, 8, 2, 6
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((V, C)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, V, (B, L)))
    target = jnp.asarray(rng.standard_normal((C,)), jnp.float32)

    def embed_loss(e):
        # loss grows when embeddings align with `target`
        return jnp.mean(e @ target)

    atk = MMHotFlip({"steps": 3})
    flipped, info = atk.attack(embed_loss, table, ids, jnp.ones((B, L)))
    assert flipped.shape == ids.shape
    assert int(info["n_flipped"]) == B * 3
    n_changed = int((np.asarray(flipped) != np.asarray(ids)).sum())
    assert n_changed == B * 3  # each step flips a fresh position
    # attack increases the loss
    before = float(embed_loss(jnp.take(table, ids, axis=0)))
    after = float(embed_loss(jnp.take(table, flipped, axis=0)))
    assert after > before


def test_mm_hotflip_respects_mask_and_registry():
    from antmmf_tpu.common.registry import registry
    from antmmf_tpu.models.adversarial import MMHotFlip

    assert registry.get_adversarial_class("mm_hotflip") is MMHotFlip
    V, C, B, L = 20, 4, 1, 5
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.standard_normal((V, C)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, V, (B, L)))
    mask = jnp.asarray([[1, 1, 0, 0, 0]])

    atk = MMHotFlip({"steps": 4})
    flipped, info = atk.attack(
        lambda e: jnp.sum(e ** 2), table, ids, mask)
    changed = np.asarray(flipped) != np.asarray(ids)
    assert not changed[0, 2:].any()  # padding never flipped
    assert int(info["n_flipped"]) == 2  # gives up after real tokens exhausted


# ------------------------------------------------------------------ MRC head
def test_mrc_head_loss_and_acc():
    from antmmf_tpu.modules.transformers.heads.mrc import MRCHead

    B, R, C, V = 2, 5, 16, 7
    head = MRCHead(vocab_size=V, hidden_size=C, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    seq = jnp.asarray(rng.standard_normal((B, R, C)), jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), seq)
    logits = head.apply(variables, seq)
    assert logits.shape == (B, R, V)

    dist = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((B, R, V)), jnp.float32), -1)
    to_predict = jnp.asarray(rng.integers(0, 2, (B, R)))
    out = head.apply(variables, logits, to_predict, dist,
                     method=head.loss_metric)
    loss = out["losses"]["masked_region_classification"]
    assert np.isfinite(float(loss)) and float(loss) >= 0.0
    assert 0.0 <= float(out["metrics"]["mrc_acc"]) <= 1.0
    # perfect prediction → KL ≈ 0, acc = 1
    out2 = head.apply(variables, jnp.log(dist), to_predict, dist,
                      method=head.loss_metric)
    assert float(out2["losses"]["masked_region_classification"]) < 1e-5
    assert float(out2["metrics"]["mrc_acc"]) == pytest.approx(1.0)


# ----------------------------------------------------- region pipeline + MRC
def test_region_processor_masks_and_normalizes():
    from antmmf_tpu.common.registry import registry

    proc = registry.get_processor_class("region_processor")(
        {"max_features": 6, "feature_dim": 8, "region_kl_fc_dim": 4,
         "mask_region_prob": 0.9, "seed": 0})
    rng = np.random.default_rng(0)
    item = {
        "features": rng.standard_normal((3, 8)).astype(np.float32) + 5.0,
        "bbox": np.array([[0, 0, 50, 50], [5, 5, 45, 45], [60, 60, 90, 90]],
                         np.float32),
        "cls_prob": rng.uniform(size=(3, 4)).astype(np.float32),
        "image_height": 100, "image_width": 100,
    }
    out = proc(item)
    assert out["region_feature"].shape == (6, 8)
    assert out["region_boxes"].shape == (6, 5)
    assert out["region_mask"].sum() == 3
    np.testing.assert_allclose(out["region_boxes"][0, :4], [0, 0, .5, .5])
    np.testing.assert_allclose(out["region_boxes"][0, 4], 0.25)
    # p=0.9: regions masked; boxes 0/1 overlap > 0.4 so masking one zeroes both
    assert out["region_to_predict"].sum() >= 1
    masked = np.nonzero(out["region_to_predict"][:3])[0]
    assert (np.abs(out["region_feature"][masked]).sum(axis=-1) == 0).any()
    # eval mode: no masking
    out2 = proc(item, mask_regions=False)
    assert out2["region_to_predict"].sum() == 0


def test_univl_roi_with_mrc_head():
    import jax

    from antmmf_tpu.models.univl_roi import UnivlRoiModel

    model = UnivlRoiModel(
        vit_preset="vit_tiny_test", bert_preset="bert_tiny_test",
        image_size=32, embed_dim=32, cross_layers=1, with_grid_stream=False,
        with_mrc=True, region_classes=4, dtype_str="float32")
    rng = np.random.default_rng(0)
    B, R, Lt = 2, 5, 8
    batch = {
        "caption_input_ids": rng.integers(0, 30522, (B, Lt)).astype(np.int64),
        "caption_input_mask": np.ones((B, Lt), np.int64),
        "caption_lm_label_ids": np.full((B, Lt), -1, np.int64),
        "region_feature": rng.standard_normal((B, R, 16)).astype(np.float32),
        "region_boxes": rng.uniform(size=(B, R, 5)).astype(np.float32),
        "region_mask": np.ones((B, R), np.int64),
        "region_to_predict": (rng.uniform(size=(B, R)) < 0.5).astype(np.int64),
        "region_cls_dis": rng.dirichlet(np.ones(4), (B, R)).astype(np.float32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, deterministic=True)
    out = model.apply(variables, batch, deterministic=True)
    assert "masked_region_classification" in out["losses"]
    assert np.isfinite(float(out["losses"]["masked_region_classification"]))
    assert out["mrc_logits"].shape == (B, R, 4)


def test_text_reader_sharding(tmp_path):
    from antmmf_tpu.datasets.readers import ODPSReader, TextReader

    table = tmp_path / "seeds.txt"
    table.write_text("\n".join(f"e{i}\tlikes\te{i+1}" for i in range(10)))
    r0 = TextReader(str(table), field_names=["src", "rel", "dst"],
                    worker_id=0, num_workers=2)
    r1 = TextReader(str(table), field_names=["src", "rel", "dst"],
                    worker_id=1, num_workers=2)
    rows0, rows1 = list(r0), list(r1)
    assert len(rows0) + len(rows1) == 10
    assert len(r0) == len(rows0)
    assert rows0[0] == {"src": "e0", "rel": "likes", "dst": "e1"}
    assert not {r["src"] for r in rows0} & {r["src"] for r in rows1}
    # jsonl rows parse too
    jl = tmp_path / "seeds.jsonl"
    jl.write_text('{"seed": "e3"}\n{"seed": "e4"}\n')
    assert [r["seed"] for r in TextReader(str(jl))] == ["e3", "e4"]
    with pytest.raises(RuntimeError, match="ODPS"):
        ODPSReader("ant_p13n_dev.some_table")


def test_graph_db_seeded_subgraph_stream(tmp_path):
    from antmmf_tpu.datasets.database.graph_database import GraphDatabase
    from antmmf_tpu.datasets.readers import TextReader

    db = GraphDatabase(os.path.join(DATA, "graph", "triples_train.jsonl"))
    name0 = next(iter(db.entity_vocab))
    seeds_file = tmp_path / "seeds.jsonl"
    seeds_file.write_text(
        f'{{"seed": "{name0}"}}\n{{"seed": "not_an_entity"}}\n')
    samples = list(db.iter_subgraphs(TextReader(str(seeds_file)),
                                     hops=1, max_nodes=8, max_edges=16))
    assert len(samples) == 1  # unknown seed skipped
    s = samples[0]
    assert s["seed_name"] == name0
    assert s["edge_index"].shape == (2, 16)
    assert s["node_mask"][0]


def test_text_classification_online_process():
    """Serving-time tokenize+pad (reference datasets/utils.py:12-56)."""
    from antmmf_tpu.datasets.readers import (
        block_read,
        text_classification_online_process,
    )
    from antmmf_tpu.utils.tokenization import BertTokenizer

    tok = BertTokenizer("tests/data/vocabs/bert-base-uncased_30522_vocab.txt")
    out = text_classification_online_process(["a dog runs"], 8, tok)
    assert out["ids"] == out["text"] and len(out["ids"]) == 8
    assert out["ids"][0] == tok.cls_token_id
    assert sum(out["mask"]) == len([i for i in out["ids"]
                                    if i != tok.pad_token_id])
    # sentence pair: two SEPs, segment ids stay 0 (reference semantics)
    pair = text_classification_online_process(["a dog", "runs fast"], 16, tok)
    assert pair["ids"].count(tok.sep_token_id) == 2
    # truncation branch
    long = text_classification_online_process(["a b c d e f g h"], 4, tok)
    assert len(long["ids"]) == 4 and len(long["mask"]) == 4

    import io

    blocks = list(block_read(io.StringIO("x" * 100), size=40))
    assert [len(b) for b in blocks] == [40, 40, 20]
