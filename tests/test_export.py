import jax
import jax.numpy as jnp
import numpy as np

from antmmf_tpu.models.base_model import build_model
from antmmf_tpu.predictors.export import export_serving_fn, load_serving_fn


def test_stablehlo_export_roundtrip(tmp_path):
    cfg = {"model_attributes": {"univl_retrieval": {
        "vit_preset": "vit_tiny_test", "bert_preset": "bert_tiny_test",
        "image_size": 32, "embed_dim": 16, "dtype_str": "float32"}}}
    shell = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "image_data": rng.standard_normal((1, 2, 32, 32, 3)).astype(np.float32),
        "video_mask": np.ones((1, 2), np.int64),
        "caption_input_ids": rng.integers(0, 30522, (1, 8)).astype(np.int64),
        "caption_input_mask": np.ones((1, 8), np.int64),
        "caption_segment_ids": np.zeros((1, 8), np.int64),
    }
    variables = shell.init(jax.random.PRNGKey(0), batch)

    def serve(v, b):
        out = shell.apply(v, b, deterministic=True)
        return {"text_embed": out["text_embed"], "sim": out["sim"]}

    path = str(tmp_path / "model.stablehlo")
    exported = export_serving_fn(serve, variables, batch, path)
    direct = serve(variables, {k: jnp.asarray(v) for k, v in batch.items()})

    loaded = load_serving_fn(path)
    roundtrip = loaded({k: jnp.asarray(v) for k, v in batch.items()})
    np.testing.assert_allclose(np.asarray(roundtrip["text_embed"]),
                               np.asarray(direct["text_embed"]), atol=1e-6)
