"""LPIPS perceptual metric (VGG16 backbone) in JAX.

Equivalent of the reference's vendored lpipsPyTorch (lpipsPyTorch/modules/
{lpips,networks,utils}.py): normalized VGG16 feature stacks compared after
channel-wise unit-normalization, weighted by pretrained 1x1 linear heads,
spatially averaged and summed over the 5 stages.

Pretrained weights are user-provided (this environment has no torchvision
and no network egress — same asset posture as the FLAME pickles). Two
sources are supported:

  * an .npz produced by `convert_torch_weights` (from a torchvision VGG16
    state dict + the LPIPS 'vgg.pth' linear heads), path via
    $LPIPS_WEIGHTS or the default asset location
  * calling `convert_torch_weights` directly with state-dict paths

Without weights, `lpips_available()` is False and callers (metrics.py, the
train-loop eval) skip the LPIPS column with a warning.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv layout: (out_channels, n_convs) per stage; LPIPS taps the relu
# after the last conv of each stage.
_VGG_STAGES = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]

# LPIPS input scaling (the reference's ScalingLayer constants).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_DEFAULT_PATH = os.path.join(
    os.environ.get("FLAME_ASSET_DIR", "flame_model/assets/flame"),
    "..", "lpips_vgg.npz",
)


def default_weights_path() -> str:
    return os.environ.get("LPIPS_WEIGHTS", os.path.normpath(_DEFAULT_PATH))


def lpips_available(path: Optional[str] = None) -> bool:
    return os.path.exists(path or default_weights_path())


def convert_torch_weights(vgg_state_path: str, lpips_state_path: str,
                          out_path: str) -> None:
    """Convert torch checkpoints -> our .npz.

    vgg_state_path: torchvision vgg16 state dict (features.N.weight/bias).
    lpips_state_path: LPIPS linear heads (lin{0..4}.model.1.weight).
    """
    import torch

    vgg = torch.load(vgg_state_path, map_location="cpu")
    if hasattr(vgg, "state_dict"):
        vgg = vgg.state_dict()
    lin = torch.load(lpips_state_path, map_location="cpu")

    out = {}
    conv_idx = 0
    torch_layer = 0
    for stage, (ch, n_convs) in enumerate(_VGG_STAGES):
        for c in range(n_convs):
            w = vgg[f"features.{torch_layer}.weight"].numpy()
            b = vgg[f"features.{torch_layer}.bias"].numpy()
            out[f"conv{conv_idx}_w"] = w  # [out, in, kh, kw]
            out[f"conv{conv_idx}_b"] = b
            conv_idx += 1
            torch_layer += 2  # conv + relu
        torch_layer += 1      # maxpool
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        if key not in lin:
            key = f"lin{i}.weight"
        out[f"lin{i}"] = np.asarray(lin[key]).reshape(-1)  # [C]
    np.savez(out_path, **out)


class LPIPS:
    """Callable LPIPS(render, gt) for [N?, 3, H, W] images in [0, 1]."""

    def __init__(self, weights_path: Optional[str] = None):
        path = weights_path or default_weights_path()
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"LPIPS weights not found at {path}; convert them with "
                "gaussianavatars_tpu.metrics_lib.lpips.convert_torch_weights"
            )
        data = np.load(path)
        self.convs = []
        i = 0
        while f"conv{i}_w" in data:
            self.convs.append(
                (jnp.asarray(data[f"conv{i}_w"]), jnp.asarray(data[f"conv{i}_b"]))
            )
            i += 1
        self.lins = [jnp.asarray(data[f"lin{i}"]) for i in range(5)]
        self._fn = jax.jit(self._forward)

    def _features(self, x):
        """x: [N, 3, H, W] in [-1, 1] LPIPS convention."""
        x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) / jnp.asarray(
            _SCALE
        )[None, :, None, None]
        feats = []
        ci = 0
        for stage, (ch, n_convs) in enumerate(_VGG_STAGES):
            for c in range(n_convs):
                w, b = self.convs[ci]
                x = jax.lax.conv_general_dilated(
                    x, w, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NCHW", "OIHW", "NCHW"),
                )
                x = jax.nn.relu(x + b[None, :, None, None])
                ci += 1
            feats.append(x)
            if stage < 4:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                    "VALID",
                )
        return feats

    def _forward(self, a, b):
        # inputs [N, 3, H, W] in [0,1] -> [-1,1]
        fa = self._features(a * 2.0 - 1.0)
        fb = self._features(b * 2.0 - 1.0)
        total = 0.0
        for f1, f2, lin in zip(fa, fb, self.lins):
            n1 = f1 / jnp.sqrt(
                jnp.sum(f1 * f1, axis=1, keepdims=True) + 1e-10
            )
            n2 = f2 / jnp.sqrt(
                jnp.sum(f2 * f2, axis=1, keepdims=True) + 1e-10
            )
            diff = (n1 - n2) ** 2
            weighted = jnp.sum(diff * lin[None, :, None, None], axis=1)
            total = total + weighted.mean(axis=(1, 2))
        return total

    def __call__(self, render, gt):
        if render.ndim == 3:
            render, gt = render[None], gt[None]
        return self._fn(jnp.asarray(render), jnp.asarray(gt))
