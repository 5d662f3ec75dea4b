"""LPIPS network end-to-end with random weights, pinned against torch.

The pretrained VGG16/linear-head checkpoints are user downloads (absent
here), so CI exercises the full pipeline — torch-format state dicts ->
`convert_torch_weights` -> .npz -> JAX forward — against an independent
torch evaluation of the same math (the reference's lpipsPyTorch/modules/
networks.py:66-96 semantics) with tiny random weights.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gaussianavatars_tpu.metrics_lib.lpips import (  # noqa: E402
    _SCALE,
    _SHIFT,
    _VGG_STAGES,
    LPIPS,
    convert_torch_weights,
)

# scaled-down channel counts (same stage/conv structure) keep CPU time low
_TINY_STAGES = [(8, 2), (12, 2), (16, 3), (16, 3), (16, 3)]


def _make_torch_checkpoints(tmp_path, stages, seed=0):
    g = torch.Generator().manual_seed(seed)
    vgg_state = {}
    layer = 0
    in_ch = 3
    convs = []
    for ch, n_convs in stages:
        for _ in range(n_convs):
            w = torch.randn(ch, in_ch, 3, 3, generator=g) * 0.2
            b = torch.randn(ch, generator=g) * 0.1
            vgg_state[f"features.{layer}.weight"] = w
            vgg_state[f"features.{layer}.bias"] = b
            convs.append((w, b))
            in_ch = ch
            layer += 2  # conv + relu
        layer += 1      # maxpool
    lins = [torch.rand(1, ch, 1, 1, generator=g) for ch, _ in stages]
    lin_state = {f"lin{i}.model.1.weight": lins[i] for i in range(5)}
    vgg_path = str(tmp_path / "vgg16.pth")
    lin_path = str(tmp_path / "lpips_vgg.pth")
    torch.save(vgg_state, vgg_path)
    torch.save(lin_state, lin_path)
    return vgg_path, lin_path, convs, lins


def _torch_lpips(a, b, convs, lins, stages):
    """Independent torch evaluation (reference lpipsPyTorch semantics)."""
    import torch.nn.functional as F

    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)

    def features(x):
        x = (x - shift) / scale
        out = []
        ci = 0
        for stage, (ch, n_convs) in enumerate(stages):
            for _ in range(n_convs):
                w, bb = convs[ci]
                x = F.relu(F.conv2d(x, w, bb, padding=1))
                ci += 1
            out.append(x)
            if stage < 4:
                x = F.max_pool2d(x, 2)
        return out

    fa = features(a * 2 - 1)
    fb = features(b * 2 - 1)
    total = torch.zeros(a.shape[0])
    for f1, f2, lin in zip(fa, fb, lins):
        n1 = f1 / (f1.square().sum(1, keepdim=True) + 1e-10).sqrt()
        n2 = f2 / (f2.square().sum(1, keepdim=True) + 1e-10).sqrt()
        d = (n1 - n2) ** 2
        total = total + (d * lin).sum(1).mean(dim=(1, 2))
    return total


def test_lpips_network_matches_torch(tmp_path, monkeypatch):
    monkeypatch.setattr(
        "gaussianavatars_tpu.metrics_lib.lpips._VGG_STAGES", _TINY_STAGES
    )
    vgg_path, lin_path, convs, lins = _make_torch_checkpoints(
        tmp_path, _TINY_STAGES
    )
    npz_path = str(tmp_path / "lpips.npz")
    convert_torch_weights(vgg_path, lin_path, npz_path)

    rng = np.random.default_rng(3)
    a = rng.random((2, 3, 32, 32)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)

    ours = np.asarray(LPIPS(weights_path=npz_path)(a, b))
    ref = _torch_lpips(
        torch.from_numpy(a), torch.from_numpy(b), convs, lins, _TINY_STAGES
    ).numpy()

    assert ours.shape == (2,)
    assert ref.min() > 1e-5  # distances are non-trivial
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-6)


def test_lpips_identical_images_zero(tmp_path, monkeypatch):
    monkeypatch.setattr(
        "gaussianavatars_tpu.metrics_lib.lpips._VGG_STAGES", _TINY_STAGES
    )
    vgg_path, lin_path, _, _ = _make_torch_checkpoints(tmp_path, _TINY_STAGES)
    npz_path = str(tmp_path / "lpips.npz")
    convert_torch_weights(vgg_path, lin_path, npz_path)

    rng = np.random.default_rng(4)
    a = rng.random((3, 24, 24)).astype(np.float32)
    d = float(LPIPS(weights_path=npz_path)(a, a.copy())[0])
    assert abs(d) < 1e-6
