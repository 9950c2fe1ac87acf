"""Torch checkpoint conversion: converted weights must reproduce torch
outputs numerically (the reference loads torch checkpoints; our chain
converts layouts, runtime/weights.py)."""

import numpy as np
import pytest


def test_torch_conv_state_dict_roundtrip(tmp_path):
    import torch
    import torch.nn as tnn

    import jax.numpy as jnp

    from video_enhancer_tpu import nn
    from video_enhancer_tpu.runtime.weights import (
        convert_torch_state_dict, unflatten_into,
    )

    class TorchNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.embed = tnn.Conv2d(3, 8, 3, padding=1)
            self.head = tnn.Linear(8, 4)

        def forward(self, x):  # x: (B, 3, H, W)
            h = torch.relu(self.embed(x))
            h = h.mean(dim=(2, 3))
            return self.head(h)

    tmodel = TorchNet()
    tmodel.eval()
    sd = tmodel.state_dict()
    pt_path = tmp_path / "ckpt.pt"
    torch.save(sd, pt_path)

    # Our template with the same key paths.
    import jax

    template = {
        "embed": nn.conv2d_init(jax.random.PRNGKey(0), 3, 3, 3, 8),
        "head": nn.dense_init(jax.random.PRNGKey(1), 8, 4),
    }

    loaded = torch.load(pt_path, map_location="cpu", weights_only=True)
    flat = convert_torch_state_dict(loaded)
    params, matched, skipped = unflatten_into(template, flat)
    assert set(matched) == {"embed.w", "embed.b", "head.w", "head.b"}, (
        matched, skipped)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 6, 5, 3)).astype(np.float32)

    def jax_forward(p, x):
        h = jax.nn.relu(nn.conv2d_apply(p["embed"], jnp.asarray(x)))
        h = jnp.mean(h, axis=(1, 2))
        return nn.dense_apply(p["head"], h)

    ours = np.asarray(jax_forward(params, x))
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    assert np.max(np.abs(ours - ref)) < 1e-5


def test_try_load_params_torch_file(tmp_path):
    import torch

    import jax

    from video_enhancer_tpu import nn
    from video_enhancer_tpu.runtime.weights import try_load_params

    w = torch.randn(4, 3, 3, 3)  # torch conv (out,in,kh,kw)
    torch.save({"conv.weight": w, "conv.bias": torch.zeros(4)},
               tmp_path / "m.pth")
    template = {"conv": nn.conv2d_init(jax.random.PRNGKey(0), 3, 3, 3, 4)}
    loaded = try_load_params(tmp_path / "m.pth", template)
    assert loaded is not None
    assert np.allclose(
        np.asarray(loaded["conv"]["w"]),
        w.numpy().transpose(2, 3, 1, 0),
    )


def test_try_load_params_garbage_file(tmp_path):
    import jax

    from video_enhancer_tpu import nn
    from video_enhancer_tpu.runtime.weights import try_load_params

    bad = tmp_path / "bad.npz"
    bad.write_bytes(b"not an npz")
    template = {"conv": nn.conv2d_init(jax.random.PRNGKey(0), 3, 3, 3, 4)}
    assert try_load_params(bad, template) is None  # graceful, keeps init
