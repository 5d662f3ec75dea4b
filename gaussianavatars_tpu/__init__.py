"""gaussianavatars_tpu — a TPU-native (JAX/XLA/Pallas) framework for rigged
3D Gaussian avatar training and rendering.

Re-designed from scratch for TPU with the capabilities of the reference
GaussianAvatars system (CVPR 2024): FLAME-rigged 3D Gaussian splatting with
differentiable tile rasterization, adaptive densification, and full
train/render/eval tooling.

Layer map (mirrors reference SURVEY.md §1, re-architected TPU-first):

    cli/            train / render / metrics entry points
    config          dataclass config system
    train/          jitted train step, losses, optimizer w/ state surgery
    data/           scene container, dataset readers, camera objects
    models/         GaussianModel pytree + FLAME head (pure-JAX LBS)
    render/         differentiable splat renderer frontend + mesh overlay
    ops/            math kernels: SH, quaternions, EWA projection, tile
                    binning, alpha blending (jnp oracle + Pallas TPU kernels)
    parallel/       device mesh + shard_map strategies (tile x primitive)
    utils/          ply io, obj io, images, schedules, general math
"""

__version__ = "0.1.0"
