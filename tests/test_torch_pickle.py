"""Torch-free .pt reader vs real torch.save output."""

import argparse

import numpy as np
import torch

from msmd_tpu.interop.torch_pickle import load_pt, load_reference_checkpoint


def test_load_pt_tensors(tmp_path):
    payload = {
        "f32": torch.randn(3, 4),
        "f64": torch.randn(2, 2, dtype=torch.float64),
        "i64": torch.arange(7),
        "bf16": torch.randn(5, 6).to(torch.bfloat16),
        "bool": torch.tensor([True, False, True]),
        "scalar": torch.tensor(3.5),
        "noncontig": torch.randn(4, 6).t(),  # stride-swapped view
        "nested": {"a": torch.ones(2), "list": [torch.zeros(1), "text", 42]},
    }
    path = tmp_path / "x.pt"
    torch.save(payload, path)

    loaded = load_pt(path)
    np.testing.assert_allclose(loaded["f32"], payload["f32"].numpy())
    np.testing.assert_allclose(loaded["f64"], payload["f64"].numpy())
    np.testing.assert_array_equal(loaded["i64"], payload["i64"].numpy())
    np.testing.assert_allclose(loaded["bf16"], payload["bf16"].float().numpy(), atol=0)
    np.testing.assert_array_equal(loaded["bool"], payload["bool"].numpy())
    assert float(loaded["scalar"]) == 3.5
    np.testing.assert_allclose(loaded["noncontig"], payload["noncontig"].numpy())
    np.testing.assert_allclose(loaded["nested"]["a"], np.ones(2))
    assert loaded["nested"]["list"][1] == "text" and loaded["nested"]["list"][2] == 42


def test_load_reference_checkpoint_layout(tmp_path):
    ns = argparse.Namespace(feature_dim=512, audio_model="hubert")
    payload = {
        "args": ns,
        "model": {"layer.weight": torch.randn(4, 4), "layer.bias": torch.randn(4)},
        "style_enc": {"conv.weight": torch.randn(8, 3, 3)},
        "iter": 777,
    }
    path = tmp_path / "iter_0000777.pt"
    torch.save(payload, path)

    args, model_sd, style_sd, it = load_reference_checkpoint(path)
    assert it == 777
    assert args["feature_dim"] == 512 and args["audio_model"] == "hubert"
    np.testing.assert_allclose(model_sd["layer.weight"], payload["model"]["layer.weight"].numpy())
    np.testing.assert_allclose(style_sd["conv.weight"], payload["style_enc"]["conv.weight"].numpy())
