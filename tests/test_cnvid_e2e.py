"""cnvid_vtp: Chinese video-text pretraining end-to-end on the VATEX_CN fixture
(reference prj/cnvid_vtp local_test pattern; Chinese-BERT vocab)."""

import os

import numpy as np
import pytest

from antmmf_tpu.common.build import build_config
from antmmf_tpu.trainers.build import build_trainer

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(ROOT, "projects", "cnvid_vtp", "configs",
                   "cnvid_pretrain.local.yml")


def test_cnvid_pretrain_trains_on_fixtures(tmp_path):
    cfg = build_config(CFG, opts=[
        "training_parameters.save_dir", str(tmp_path),
        "training_parameters.seed", "11",
    ])
    trainer = build_trainer(cfg)
    trainer.load()
    trainer.train()
    scalars = trainer.meter.get_scalar_dict()
    assert any("vtc_loss" in k for k in scalars)
    assert any("itm_loss" in k for k in scalars)
    assert np.isfinite(trainer.meter.meters["train/total_loss"].get_latest())


def test_chinese_tokenizer_masks_chinese_text():
    from antmmf_tpu.datasets.processors.text_processors import (
        MaskedTokenProcessor,
    )

    proc = MaskedTokenProcessor({
        "vocab_file": os.path.join(
            ROOT, "tests", "data", "vocabs",
            "bert-base-chinese_21128_vocab.txt"),
        "max_seq_length": 24, "mask_probability": 0.9, "seed": 0})
    out = proc({"text": "一个穿着蓝色背心的男人正在做俯卧撑。"})
    # Chinese chars tokenize individually; high prob masks several
    assert int(out["input_mask"].sum()) > 10
    assert (out["lm_label_ids"] != -1).sum() >= 3


def test_loader_pad_last_wraps_final_batch():
    from antmmf_tpu.datasets.loader import DataLoader

    class DS:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            return i

    dl = DataLoader(DS(), batch_size=4, collate_fn=list, pad_last=True)
    batches = list(dl)
    assert [len(b) for b in batches] == [4, 4]
    assert batches[1] == [4, 4, 4, 4]  # remainder repeated to full size
