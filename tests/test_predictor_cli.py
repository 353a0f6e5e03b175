"""Serving CLI: one-shot and batch prediction from config + JSON."""

import json

import numpy as np


def test_cli_single_and_batch(tmp_path, capsys):
    cfg = tmp_path / "serve.yml"
    cfg.write_text(
        "model_attributes:\n"
        "  univl_retrieval:\n"
        "    vit_preset: vit_tiny_test\n"
        "    bert_preset: bert_tiny_test\n"
        "    image_size: 32\n"
        "    embed_dim: 32\n"
        "    dtype_str: float32\n"
        "predictor_parameters: {}\n")
    img = np.zeros((2, 32, 32, 3), np.float32).tolist()
    req = tmp_path / "req.json"
    req.write_text(json.dumps({"caption": "a dog runs", "image_data": img}))

    from antmmf_tpu.predictors.cli import main

    main(["--config", str(cfg), "--input", str(req), "--no_ckpt"])
    out = json.loads(capsys.readouterr().out.strip())
    assert out, "empty prediction result"

    reqs = tmp_path / "reqs.jsonl"
    reqs.write_text("\n".join(
        json.dumps({"caption": c, "image_data": img})
        for c in ("a dog", "a cat")))
    main(["--config", str(cfg), "--batch", str(reqs), "--no_ckpt"])
    lines = [json.loads(line) for line in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 2


def test_cli_serving_config_with_overrides(capsys):
    """The shipped serving.yml runs through the CLI with tiny overrides."""
    import json as _json

    import numpy as np

    from antmmf_tpu.predictors.cli import main

    img = np.zeros((2, 32, 32, 3), np.float32).tolist()
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        req = os.path.join(td, "r.json")
        open(req, "w").write(_json.dumps(
            {"caption": "a person cooks", "image_data": img}))
        main(["--config", "projects/base_vtp/configs/serving.yml",
              "--input", req, "--no_ckpt", "--predictor", "base_predictor",
              "model_attributes.univl_retrieval.vit_preset", "vit_tiny_test",
              "model_attributes.univl_retrieval.bert_preset",
              "bert_tiny_test",
              "model_attributes.univl_retrieval.image_size", "32",
              "model_attributes.univl_retrieval.embed_dim", "32",
              "model_attributes.univl_retrieval.dtype_str", "float32",
              "model_attributes.univl_retrieval.token_merge_r", "1"])
    out = _json.loads(capsys.readouterr().out.strip())
    assert out


def test_cli_engine_mode(tmp_path, capsys):
    """--engine serves a jsonl of generation requests through the
    continuous-batching engine from the shell: one JSON per request
    (tokens, eviction flag, latency) + a stats line."""
    import json as _json

    import numpy as np

    from antmmf_tpu.predictors import cli

    cfg = tmp_path / "serve.yml"
    cfg.write_text(
        "model_attributes:\n"
        "  pink:\n"
        "    lm_preset: omni_tiny_test\n"
        "    vit_preset: vit_tiny_test\n"
        "    image_size: 32\n"
        "    dtype_str: float32\n")
    rng = np.random.default_rng(0)
    reqs = tmp_path / "reqs.jsonl"
    with open(reqs, "w") as f:
        for i in range(3):
            f.write(_json.dumps({
                "id": f"r{i}",
                "input_ids": [int(t) for t in rng.integers(5, 40, 6)],
                "max_new": 3,
                **({"deadline_s": 0.0} if i == 2 else {}),
            }) + "\n")
    cli.main(["--config", str(cfg), "--engine", str(reqs), "--slots", "2",
              "--step_tokens", "1", "--max_new", "3", "--no_ckpt"])
    lines = [_json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    results = {l["id"]: l for l in lines if "id" in l}
    stats = [l for l in lines if "stats" in l][0]
    assert set(results) == {"r0", "r1", "r2"}
    assert len(results["r0"]["tokens"]) == 3
    assert results["r2"]["evicted"] is True  # 0-second deadline
    assert stats["stats"]["total_tokens"] >= 6
