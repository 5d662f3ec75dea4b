"""Optimizable models: gaussian splat cloud + FLAME head rigging."""

from gaussianavatars_tpu.models.gaussians import (
    GaussianParams,
    FaceFrames,
    GaussianModel,
    world_space_gaussians,
)
