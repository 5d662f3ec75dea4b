#!/usr/bin/env python3
"""Blend-kernel-only timings (dev tool): scan variants, tiles_per_step."""
import sys
sys.path.insert(0, ".")
import gaussianavatars_tpu.utils.jax_setup  # noqa: F401
import functools
import jax
import jax.numpy as jnp
from benchlib import timeit
from bench import make_bench_scene, WIDTH, HEIGHT, SH_DEGREE
from tests.utils import make_camera
from gaussianavatars_tpu.ops.projection import project_gaussians
from gaussianavatars_tpu.ops.binning_dense import bin_gaussians_dense
from gaussianavatars_tpu.ops.instance_pack import (
    pack_projected, permute_rows, gather_instances_perm)
from gaussianavatars_tpu.ops.blend_pallas import (
    blend_image_fwd_pallas, blend_image_bwd_pallas)

scene = make_bench_scene()
cam = make_camera(width=WIDTH, height=HEIGHT, fovx=0.5, dist=1.0)
TILE, CHUNK, CAP = 32, 128, 786_432

proj = jax.jit(lambda s: project_gaussians(
    s["means3d"], s["scales"], s["quats"], s["opacities"], s["shs"],
    SH_DEGREE, cam))(scene)
b = jax.jit(functools.partial(bin_gaussians_dense, width=WIDTH, height=HEIGHT,
                              tile_size=TILE))(
    proj.means2d, proj.depths, proj.radii, proj.valid,
    means2d_cull=proj.means2d, r2_max=proj.r2_max)
pack = jax.jit(pack_projected)(proj.means2d, proj.conics, proj.colors,
                               proj.opacities)
pack_ranked = jax.jit(lambda pk: permute_rows(pk, b.perm, b.inv_perm))(pack)
inst = jax.jit(lambda pk: gather_instances_perm(
    pk, b.ranks[:CAP], b.instance_valid[:CAP], CAP))(pack_ranked)
ranges = jnp.stack([b.tile_starts, b.tile_ends], -1).astype(jnp.float32)

for tpb in (4,):
    def f_fwd(salt, i, tpb=tpb):
        return blend_image_fwd_pallas(i + salt, ranges, WIDTH, HEIGHT, TILE,
                                      CHUNK, tiles_per_step=tpb)
    color, trans = jax.jit(f_fwd)(jnp.float32(0), inst)
    gc = jnp.ones_like(color); gt = jnp.ones_like(trans)

    def f_bwd(salt, i, tpb=tpb, color=color, trans=trans, gc=gc, gt=gt):
        return blend_image_bwd_pallas(i + salt, ranges, color, trans, gc, gt,
                                      WIDTH, HEIGHT, TILE, CHUNK,
                                      tiles_per_step=tpb)
    timeit(f"blend fwd tpb={tpb}", jax.jit(f_fwd), inst)
    timeit(f"blend bwd tpb={tpb}", jax.jit(f_bwd), inst)

# precision A/B
import gaussianavatars_tpu.ops.blend_pallas as bp
for prec in ("DEFAULT",):
    bp._MM_PRECISION = getattr(jax.lax.Precision, prec)
    def f_fwd2(salt, i):
        return blend_image_fwd_pallas(i + salt, ranges, WIDTH, HEIGHT, TILE,
                                      CHUNK)
    c2, t2 = jax.jit(f_fwd2)(jnp.float32(0), inst)
    import numpy as np
    err = float(jnp.max(jnp.abs(c2 - color)))
    def f_bwd2(salt, i, c2=c2, t2=t2):
        return blend_image_bwd_pallas(i + salt, ranges, c2, t2,
                                      jnp.ones_like(c2), jnp.ones_like(t2),
                                      WIDTH, HEIGHT, TILE, CHUNK)
    timeit(f"blend fwd prec={prec} (img maxdiff {err:.2e})",
           jax.jit(f_fwd2), inst)
    timeit(f"blend bwd prec={prec}", jax.jit(f_bwd2), inst)

# chunk A/B at HIGHEST
bp._MM_PRECISION = jax.lax.Precision.HIGHEST
for ch in (64, 256):
    def f_fwd3(salt, i, ch=ch):
        return blend_image_fwd_pallas(i + salt, ranges, WIDTH, HEIGHT, TILE,
                                      ch)
    c3, t3 = jax.jit(f_fwd3)(jnp.float32(0), inst)
    def f_bwd3(salt, i, ch=ch, c3=c3, t3=t3):
        return blend_image_bwd_pallas(i + salt, ranges, c3, t3,
                                      jnp.ones_like(c3), jnp.ones_like(t3),
                                      WIDTH, HEIGHT, TILE, ch)
    timeit(f"blend fwd chunk={ch}", jax.jit(f_fwd3), inst)
    timeit(f"blend bwd chunk={ch}", jax.jit(f_bwd3), inst)
