"""Production tile rasterizer: project -> bin -> gather -> blend -> composite.

This is the TPU-native equivalent of the full reference CUDA rasterizer
(submodule `diff-gaussian-rasterization`; frontend at
gaussian_renderer/__init__.py:19-101). Stages:

  projection  ops/projection.py   differentiable jnp (VPU, fused by XLA)
  binning     ops/binning.py      non-differentiable sort bookkeeping
  gather      here                differentiable jnp gather by owner id
  blend       ops/tile_blend.py   custom-VJP chunked front-to-back blend
                                  (jnp or Pallas backend)

The instance capacity is a static argument (compile-time bucket). `total`
in the output reports true instance demand so the host loop can grow the
bucket (re-jit) when densification increases coverage.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussianavatars_tpu.ops.binning import bin_gaussians
from gaussianavatars_tpu.ops.projection import (
    CameraParams,
    ProjectedGaussians,
    project_gaussians,
)
from gaussianavatars_tpu.ops.instance_pack import (
    gather_instances,
    pack_projected,
)
from gaussianavatars_tpu.ops.tile_blend import blend_image


class RenderOutput(NamedTuple):
    image: jnp.ndarray          # [3, H, W] final composited image
    transmittance: jnp.ndarray  # [H, W] residual T (bg weight)
    radii: jnp.ndarray          # [N] int32 screen radii (0 = culled)
    visibility: jnp.ndarray     # [N] bool
    instance_total: jnp.ndarray  # [] int32 true instance demand (overflow probe)
    rect_overflow: jnp.ndarray = None  # [] int32 gaussians clamped by the
                                 # dense binning's static rect (re-bucket
                                 # rect_w/rect_h when > 0); None on the
                                 # sort-expansion path


def instance_demand(
    means3d, scales, quats, opacities, shs, sh_degree, camera,
    *, tile_size: int = 16, levels=None, active=None,
):
    """True instance demand (live stream length) for one view — capacity-free.

    Runs projection + dense binning only; use it to pre-size the static
    `capacity` bucket before compiling the full render/train step (e.g.
    `ceil(total / granularity) * granularity`). Also returns the dense
    rect-bucket overflow so callers can scale the level plan first.
    """
    proj = project_gaussians(
        means3d, scales, quats, opacities, shs, sh_degree, camera)
    if active is not None:
        proj = proj._replace(
            valid=proj.valid & active,
            radii=jnp.where(active, proj.radii, 0),
        )
    from gaussianavatars_tpu.ops.binning_dense import bin_gaussians_dense

    binning = bin_gaussians_dense(
        jax.lax.stop_gradient(proj.means2d),
        jax.lax.stop_gradient(proj.depths),
        proj.radii, proj.valid, camera.width, camera.height, tile_size,
        levels=levels,
        means2d_cull=jax.lax.stop_gradient(proj.means2d),
        r2_max=jax.lax.stop_gradient(proj.r2_max),
        ext_x=jax.lax.stop_gradient(proj.ext_x),
        ext_y=jax.lax.stop_gradient(proj.ext_y),
        conics=jax.lax.stop_gradient(proj.conics),
        tau=jax.lax.stop_gradient(proj.tau),
    )
    overflow = (jnp.max(binning.level_overflow)
                if binning.level_overflow.shape[0] else jnp.int32(0))
    return binning.total, overflow


def rasterize(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: jnp.ndarray,
    sh_degree: int,
    camera: CameraParams,
    bg: jnp.ndarray,
    *,
    capacity: int,
    tile_size: int = 16,
    chunk: int = 32,
    backend: str = "jnp",
    scaling_modifier: float = 1.0,
    means2d_offset: jnp.ndarray | None = None,
    colors_precomp: jnp.ndarray | None = None,
    cov3d_precomp: jnp.ndarray | None = None,
    active: jnp.ndarray | None = None,
    tile_row_start=0,
    tile_rows: int | None = None,
    binning_impl: str = "sort",
    levels=None,
    projected: ProjectedGaussians | None = None,
) -> RenderOutput:
    """Differentiable tile-based splat render.

    Args mirror the reference rasterizer contract
    (gaussian_renderer/__init__.py:86-94); `capacity`, `tile_size`, `chunk`
    and `backend` are TPU-side static knobs.

    `binning_impl` selects the instance-stream builder: "sort" = the
    variable-rect expansion (ops/binning.py, any rect size, needs
    `capacity`), "dense" = multi-level dense layout (ops/binning_dense.py,
    much faster on hardware, exact coverage; `levels` overrides the
    routing plan and bucket-overflow shortfalls surface in
    `rect_overflow`).
    """
    if projected is not None:
        # pre-projected gaussians (the sharded path projects on the owning
        # shard, all_gathers, and hands the full set here)
        proj = projected
    else:
        proj = project_gaussians(
            means3d, scales, quats, opacities, shs, sh_degree, camera,
            scaling_modifier=scaling_modifier,
            means2d_offset=means2d_offset,
            colors_precomp=colors_precomp,
            cov3d_precomp=cov3d_precomp,
        )
    if active is not None:
        # capacity-padding slots: geometrically projectable but dead — keep
        # them out of binning entirely (no instances, radius 0)
        proj = proj._replace(
            valid=proj.valid & active,
            radii=jnp.where(active, proj.radii, 0),
        )

    if binning_impl == "dense":
        from gaussianavatars_tpu.ops.binning_dense import bin_gaussians_dense
        from gaussianavatars_tpu.ops.instance_pack import (
            gather_instances_perm,
            permute_rows,
        )

        binning = bin_gaussians_dense(
            jax.lax.stop_gradient(proj.means2d),
            jax.lax.stop_gradient(proj.depths),
            proj.radii,
            proj.valid,
            camera.width,
            camera.height,
            tile_size,
            levels=levels,
            tile_row_start=tile_row_start,
            tile_rows=tile_rows,
            means2d_cull=jax.lax.stop_gradient(proj.means2d),
            r2_max=jax.lax.stop_gradient(proj.r2_max),
            ext_x=jax.lax.stop_gradient(proj.ext_x),
            ext_y=jax.lax.stop_gradient(proj.ext_y),
            conics=jax.lax.stop_gradient(proj.conics),
            tau=jax.lax.stop_gradient(proj.tau),
        )
        pack = pack_projected(
            proj.means2d, proj.conics, proj.colors, proj.opacities
        )
        # rank-order the pack so the stream gather (and its scatter-add
        # transpose) index by depth rank. Only the live stream prefix is
        # gathered: sentinel keys sort to the tail, so slots past
        # `capacity` are never blended (total <= capacity is probed) and
        # gather cost is rows-bound on this hardware.
        pack_ranked = permute_rows(pack, binning.perm, binning.inv_perm)
        live_cap = min(capacity, binning.ranks.shape[0])
        # mask_dead=False: dense binning sorts dead keys past every tile
        # boundary, so no per-tile [start, end) range can reach one — the
        # opacity mask multiply (a full stream rewrite) is dead weight here
        inst = gather_instances_perm(
            pack_ranked, binning.ranks[:live_cap],
            binning.instance_valid[:live_cap], capacity,
            binning.rank_live_counts,
            binning.num_tiles_x * binning.num_tiles_y,
            False,
        )
        if binning.level_overflow.shape[0]:
            # encode WHICH level fell short so the host can grow just
            # that bucket: (level+1) << 24 | shortfall. Zero when no
            # overflow, so `rect_overflow > 0` keeps meaning "re-bucket".
            # (a uniform global scale multiplied EVERY tail bucket for
            # one level's shortfall; at level_scale 8 the n-capped slot
            # count ~5x'd the key sort)
            ov = binning.level_overflow
            lvl = jnp.argmax(ov).astype(jnp.int32)
            worst = ov[lvl]
            rect_overflow = jnp.where(
                worst > 0,
                ((lvl + 1) << 24) | jnp.minimum(worst, (1 << 24) - 1),
                0,
            )
        else:
            rect_overflow = jnp.int32(0)
    else:
        binning = bin_gaussians(
            jax.lax.stop_gradient(proj.means2d),
            jax.lax.stop_gradient(proj.depths),
            proj.radii,
            proj.valid,
            camera.width,
            camera.height,
            tile_size,
            capacity,
            tile_row_start=tile_row_start,
            tile_rows=tile_rows,
            means2d_cull=jax.lax.stop_gradient(proj.means2d),
            r2_max=jax.lax.stop_gradient(proj.r2_max),
        )
        # Differentiable single-gather of packed per-gaussian data: gradients
        # flow from per-instance grads back to per-gaussian tensors via the
        # transpose (segment-sum) of this gather. No per-tile padding: the
        # Pallas kernels floor-align chunk starts and mask stray lanes.
        pack = pack_projected(
            proj.means2d, proj.conics, proj.colors, proj.opacities
        )
        inst = gather_instances(
            pack, binning.gaussian_ids, binning.instance_valid
        )
        rect_overflow = None

    ranges = jnp.stack(
        [binning.tile_starts, binning.tile_ends], axis=-1
    ).astype(jnp.float32)

    # slab height is static: full image without a window, else the window's
    # tile rows (possibly running past the image bottom; callers crop)
    py_offset = jnp.asarray(tile_row_start, jnp.int32) * tile_size
    if tile_rows is None:
        slab_h = camera.height
    else:
        slab_h = tile_rows * tile_size

    color, trans = blend_image(
        inst, ranges, py_offset,
        camera.width, slab_h, tile_size, chunk, backend,
    )
    image = color + trans[None, :, :] * bg[:, None, None]

    return RenderOutput(
        image=image,
        transmittance=trans,
        radii=proj.radii,
        visibility=proj.valid,
        instance_total=binning.total,
        rect_overflow=rect_overflow,
    )
