"""Import the PyTorch reference model for numerical-parity tests.

The reference at /root/reference is pure torch with deps absent from this image
(omegaconf, torchvision, decord, lmdb, timm, ...). For *import-time* needs we
install minimal stub modules — the parity code paths (BERT via transformers,
in-repo PVT, the UniVL retrieval model) never call into the stubs.

Nothing here is copied from the reference; we import and RUN it to produce
ground-truth activations for our JAX reimplementation to match.
"""

from __future__ import annotations

import os
import sys
import types

REFERENCE_ROOT = "/root/reference"
MODEL_DIR = os.path.join(
    REFERENCE_ROOT, "prj/base_vtp/roi_univl/univl/model")


def reference_available() -> bool:
    return os.path.isdir(MODEL_DIR)


def _mod(name, **attrs):
    import importlib.machinery

    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install_stubs() -> None:
    if "omegaconf" in sys.modules and not isinstance(
            sys.modules["omegaconf"], types.ModuleType):
        return
    import yaml

    # modern transformers dropped AdamW from optimization; the reference imports it
    import torch
    import transformers.optimization as _topt

    if not hasattr(_topt, "AdamW"):
        _topt.AdamW = torch.optim.AdamW

    class _ListConfig(list):
        pass

    class _DictConfig(dict):
        pass

    class _OmegaConf:
        @staticmethod
        def load(f):
            with open(f) as fh:
                return yaml.safe_load(fh) or {}

        @staticmethod
        def create(obj=None):
            return obj if obj is not None else {}

        @staticmethod
        def to_container(obj, resolve=True):
            return dict(obj)

    _mod("omegaconf", OmegaConf=_OmegaConf, ListConfig=_ListConfig,
         DictConfig=_DictConfig)

    tv = _mod("torchvision")
    tv.__path__ = []
    _mod("torchvision.transforms", Compose=object, ToTensor=object,
         Normalize=object, Resize=object)
    _mod("torchvision.transforms.functional", pad=object, resize=object,
         crop=object, hflip=object, to_tensor=object, normalize=object,
         InterpolationMode=object)
    _mod("torchvision.models")
    _mod("torchvision.ops")
    _mod("torchvision.ops.misc", FrozenBatchNorm2d=object)
    _mod("torchvision.datasets")
    _mod("torchvision.datasets.folder", default_loader=object,
         IMG_EXTENSIONS=(".jpg",))
    sys.modules["torchvision.datasets"].folder = \
        sys.modules["torchvision.datasets.folder"]
    tv.datasets = sys.modules["torchvision.datasets"]
    tv.transforms = sys.modules["torchvision.transforms"]
    tv.models = sys.modules["torchvision.models"]
    tv.ops = sys.modules["torchvision.ops"]

    _mod("timm")
    _mod("timm.models")
    _mod("timm.models.layers")
    _mod("decord")
    _mod("lmdb")
    _mod("tensorboardX", SummaryWriter=object)
    _mod("jsonlines")
    tt = _mod("torchtext")
    tt.__path__ = []
    _mod("torchtext.vocab", Vectors=object)
    tt.vocab = sys.modules["torchtext.vocab"]

    def _deprecated(*a, **k):
        def deco(f):
            return f

        return deco

    _mod("deprecated", deprecated=_deprecated)
    pct = _mod("pycocotools")
    pct.__path__ = []
    _mod("pycocotools.mask")
    _mod("pycocotools.coco", COCO=object)
    _mod("pycocotools.cocoeval", COCOeval=object)
    _mod("ffmpeg")
    _mod("easydict", EasyDict=dict)
    _mod("interrogate")


_ref_module = None


def import_reference_model():
    """Returns the reference univl_video_ret module (cached)."""
    global _ref_module
    if _ref_module is not None:
        return _ref_module
    install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib.util

    pkg = types.ModuleType("refmodel")
    pkg.__path__ = [MODEL_DIR]
    pkg.__package__ = "refmodel"
    sys.modules["refmodel"] = pkg
    spec = importlib.util.spec_from_file_location(
        "refmodel.univl_video_ret",
        os.path.join(MODEL_DIR, "univl_video_ret.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refmodel.univl_video_ret"] = mod
    spec.loader.exec_module(mod)
    _ref_module = mod
    return mod


# ----------------------------------------------------------------- builders
HIDDEN = 256  # == pvt_v2_b0 out_dim so the reference skips img_proj, matching
# production semantics (DetrImageEncoder sets out_dim = output_channels;
# the PVT variant forgets to — visual_encoder.py:446-450 vs :402-444)
BERT_LAYERS = 2
BERT_HEADS = 4
PVT_PRESET = "pvt_v2_b0"


def make_ref_config(with_cross: bool = True):
    from antmmf.common.configuration import Configuration

    cfg = {
        "training_head_type": "video_text_retrieval",
        "arch_type": "univl",
        "training_stage": "stage1+stage2" if with_cross else "stage1",
        "hidden_size": HIDDEN,
        "with_moco": False,
        "with_text_encoder": True,
        "text_encoder": {
            "type": "PretrainedTransformerEncoder",
            "params": {
                "pretrained": False,
                "model_type": "bert",
                "bert_model_name": "bert-base-uncased",
                "num_hidden_layers": BERT_LAYERS,
                "num_attention_heads": BERT_HEADS,
                "hidden_size": HIDDEN,
                "intermediate_size": HIDDEN * 4,
                "vocab_size": 30522,
                "num_segments": 2,
            },
        },
        "with_image_encoder": True,
        "image_encoder": {
            "type": "DetrBatchPVTImageEncoder",
            "params": {
                "model_path": None,
                "model_name": PVT_PRESET,
                "num_output_features": -1,
                "gradient_checkpointing": [False] * 4,
                "pretrained": False,
                "freeze": False,
                "pool_type": "avg",
                "replace_stride_with_dilation": [False] * 3,
                "output_channels": HIDDEN,
            },
        },
    }
    return Configuration(cfg)


def build_ref_model(seed: int = 0, with_cross: bool = True):
    import torch

    refmod = import_reference_model()
    torch.manual_seed(seed)
    model = refmod.UnivlForVideoTextRetrieval(make_ref_config(with_cross))
    model.eval()
    return model


def make_parity_batch(b: int = 3, n_clips: int = 2, num_frames: int = 1,
                      size: int = 64, text_len: int = 12, seed: int = 1,
                      pad_text: bool = True):
    """Returns (torch img_input, torch caption_input, numpy NHWC batch)."""
    import numpy as np
    import torch

    g = torch.Generator().manual_seed(seed)
    N = n_clips * num_frames
    image = torch.randn(b, N, 3, size, size, generator=g)
    ids = torch.randint(1000, 5000, (b, text_len), generator=g)
    ids[:, 0] = 101
    mask = torch.ones(b, text_len, dtype=torch.long)
    if pad_text:
        # ragged lengths exercise the attention-mask path
        for i in range(b):
            real = text_len - i
            ids[i, real - 1] = 102
            ids[i, real:] = 0
            mask[i, real:] = 0
    else:
        ids[:, -1] = 102
    img_input = {
        "image_data": image,
        "image_pad_mask": torch.zeros(b, N, size, size, dtype=torch.bool),
        "image_n_clips": [n_clips] * b,
        "image_num_frames": [num_frames] * b,
    }
    caption_input = {
        "caption_input_ids": ids,
        "caption_raw_input_ids": ids.clone(),
        "caption_input_mask": mask,
    }
    ours = {
        "image_data": np.ascontiguousarray(
            image.numpy().transpose(0, 1, 3, 4, 2)),  # NCHW → NHWC
        "caption_input_ids": ids.numpy(),
        "caption_raw_input_ids": ids.numpy().copy(),
        "caption_input_mask": mask.numpy(),
    }
    return img_input, caption_input, ours


def make_ref_pretrain_config():
    from antmmf.common.configuration import Configuration

    cfg = dict(make_ref_config(with_cross=True))
    cfg.update({
        "with_temporal_encoder": False,
        "pretraining_heads": {
            "transformer_mlm": {
                "type": "MLM",
                "params": {"vocab_size": 30522, "in_dim": HIDDEN,
                           "hidden_size": HIDDEN,
                           "loss_name": "masked_lm_loss"},
            },
            "text_encoder_mlm": {
                "type": "MLM",
                "params": {"vocab_size": 30522, "in_dim": HIDDEN,
                           "hidden_size": HIDDEN,
                           "loss_name": "text_encoder_mlm_loss"},
            },
            "itm": {"type": "ITM", "params": {"hidden_size": HIDDEN}},
        },
    })
    return Configuration(cfg)


def build_ref_pretrain_model(seed: int = 0):
    import torch

    import importlib.util
    import os
    import types
    import sys

    import_reference_model()  # ensures stubs + refmodel package exist
    spec = importlib.util.spec_from_file_location(
        "refmodel.univl_video_pretrain",
        os.path.join(MODEL_DIR, "univl_video_pretrain.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refmodel.univl_video_pretrain"] = mod
    spec.loader.exec_module(mod)
    torch.manual_seed(seed)
    model = mod.UnivlForVideoPretraining(make_ref_pretrain_config())
    model.eval()
    return model


def load_vlmo_multiway():
    """Import the reference VLMo MultiWayTransformer
    (prj/M2_Encoder/vlmo/modules/multiway_transformer.py) with its three
    absent deps stubbed (timm layers, timm registry, lightning log fn)."""
    import importlib.util

    import torch
    import torch.nn as nn

    class _DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):  # eval-time identity (parity runs eval)
            return x

    def _to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    # install_stubs() may already have placed a BARE timm.models.layers —
    # always (re)install with the symbols the reference files import
    _mod("timm")
    _mod("timm.models")
    _mod("timm.models.layers", DropPath=_DropPath, to_2tuple=_to_2tuple,
         drop_path=lambda x, *a, **k: x,  # eval-time identity
         trunc_normal_=torch.nn.init.trunc_normal_)
    _mod("timm.models.registry", register_model=lambda fn: fn)
    if "pytorch_lightning.utilities.distributed" not in sys.modules:
        _mod("pytorch_lightning")
        _mod("pytorch_lightning.utilities")
        _mod("pytorch_lightning.utilities.distributed",
             rank_zero_info=lambda *a, **k: None)

    path = os.path.join(REFERENCE_ROOT,
                        "prj/M2_Encoder/vlmo/modules/multiway_transformer.py")
    spec = importlib.util.spec_from_file_location("ref_vlmo_multiway", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_vlmo_multiway"] = mod
    spec.loader.exec_module(mod)
    return mod


def load_m2omni_models():
    """Import the reference M2-omni ``models`` package (HF-remote-code style,
    relative imports → loaded as an aliased package)."""
    import importlib
    import importlib.util

    if "ref_m2omni_models" in sys.modules:
        return sys.modules["ref_m2omni_models"]
    d = os.path.join(REFERENCE_ROOT, "prj/M2_omni/models")
    spec = importlib.util.spec_from_file_location(
        "ref_m2omni_models", os.path.join(d, "__init__.py"),
        submodule_search_locations=[d])
    pkg = importlib.util.module_from_spec(spec)
    sys.modules["ref_m2omni_models"] = pkg
    spec.loader.exec_module(pkg)
    return pkg


def load_pink_eva_vit():
    """Import the reference Pink EVA-ViT (pink/model/eva_vit.py) with the
    timm stubs from load_vlmo_multiway (shared)."""
    import importlib.util

    load_vlmo_multiway()  # installs the timm/lightning stubs
    path = os.path.join(REFERENCE_ROOT, "prj/Pink/pink/model/eva_vit.py")
    spec = importlib.util.spec_from_file_location("ref_pink_eva", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_pink_eva"] = mod
    spec.loader.exec_module(mod)
    return mod


def load_vlmo_beit3():
    """Import the REAL M2-Encoder backbone — the torchscale BEiT3 stack
    (vlmo/torchscale/model/BEiT3.py + architecture/encoder.py) — with
    fairscale/apex/timm/lightning stubbed and vlmo.modules' heavy __init__
    bypassed. Returns (BEiT3_module, encoder_module, heads_module,
    config_module)."""
    import importlib
    import importlib.util

    if "vlmo" in sys.modules and hasattr(sys.modules["vlmo"], "_beit3_ready"):
        import vlmo  # noqa

        return (sys.modules["vlmo.torchscale.model.BEiT3"],
                sys.modules["vlmo.torchscale.architecture.encoder"],
                sys.modules["vlmo.modules.heads"],
                sys.modules["vlmo.torchscale.architecture.config"])

    load_vlmo_multiway()  # timm + lightning stubs
    fs = _mod("fairscale")
    fs.__path__ = []
    _mod("fairscale.nn", checkpoint_wrapper=lambda m, *a, **k: m,
         wrap=lambda m, *a, **k: m)
    fs.nn = sys.modules["fairscale.nn"]

    root = os.path.join(REFERENCE_ROOT, "prj/M2_Encoder/vlmo")
    spec = importlib.util.spec_from_file_location(
        "vlmo", os.path.join(root, "__init__.py"),
        submodule_search_locations=[root])
    pkg = importlib.util.module_from_spec(spec)
    sys.modules["vlmo"] = pkg
    spec.loader.exec_module(pkg)
    # bypass vlmo.modules.__init__ (it imports the full lightning module)
    mdir = os.path.join(root, "modules")
    mpkg = types.ModuleType("vlmo.modules")
    mpkg.__path__ = [mdir]
    mpkg.__package__ = "vlmo.modules"
    sys.modules["vlmo.modules"] = mpkg

    beit3 = importlib.import_module("vlmo.torchscale.model.BEiT3")
    enc = importlib.import_module("vlmo.torchscale.architecture.encoder")
    heads = importlib.import_module("vlmo.modules.heads")
    cfg = importlib.import_module("vlmo.torchscale.architecture.config")
    pkg._beit3_ready = True
    return beit3, enc, heads, cfg
