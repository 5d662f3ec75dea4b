#!/usr/bin/env python3
"""Stage-level timings for the forward/backward pipeline (dev tool).

Times each stage in isolation on the bench scene so optimization targets
are measured, not guessed: projection, binning internals (the sorts), the
instance gather, blend fwd/bwd, and the scatter-add reduction.
"""
import sys
sys.path.insert(0, ".")
import gaussianavatars_tpu.utils.jax_setup  # noqa: F401
import functools
import jax
import jax.numpy as jnp
import numpy as np
from benchlib import timeit
from bench import make_bench_scene, WIDTH, HEIGHT, SH_DEGREE
from tests.utils import make_camera
from gaussianavatars_tpu.ops.projection import project_gaussians
from gaussianavatars_tpu.ops.binning import compute_tile_rects, tile_grid
from gaussianavatars_tpu.ops.binning_dense import bin_gaussians_dense
from gaussianavatars_tpu.ops.instance_pack import (
    pack_projected, permute_rows, gather_instances_perm)
from gaussianavatars_tpu.ops.blend_pallas import (
    blend_image_fwd_pallas, blend_image_bwd_pallas)

scene = make_bench_scene()
cam = make_camera(width=WIDTH, height=HEIGHT, fovx=0.5, dist=1.0)
TILE = 32
CHUNK = 128
CAP = 786_432

proj = jax.jit(lambda s: project_gaussians(
    s["means3d"], s["scales"], s["quats"], s["opacities"], s["shs"],
    SH_DEGREE, cam))(scene)
jax.block_until_ready(proj.means2d)

# ---- distribution stats (host) ---------------------------------------------
ntx, nty = tile_grid(WIDTH, HEIGHT, TILE)
x0, y0, x1, y1 = compute_tile_rects(proj.means2d, proj.radii, WIDTH, HEIGHT, TILE)
rw = np.asarray(jnp.maximum(x1 - x0, 0))
rh = np.asarray(jnp.maximum(y1 - y0, 0))
live = np.asarray(proj.valid) & (rw > 0) & (rh > 0)
area = (rw * rh)[live]
print(f"gaussians live={live.sum()} tiles={ntx}x{nty}")
print(f"rect area: mean={area.mean():.2f} p50={np.percentile(area,50):.0f} "
      f"p90={np.percentile(area,90):.0f} p99={np.percentile(area,99):.0f} "
      f"max={area.max()}")
for w in (1, 2, 3, 4):
    frac = ((rw[live] <= w) & (rh[live] <= w)).mean()
    print(f"  rect fits {w}x{w}: {frac*100:.1f}%")
# cell-level coverage (cell = c x c tiles): how many cells would a gaussian hit
for c in (1, 2, 4):
    cw = -(-ntx // c); ch = -(-nty // c)
    cx0 = x0 // c; cy0 = y0 // c
    cx1 = (x1 - 1) // c + 1; cy1 = (y1 - 1) // c + 1
    carea = np.maximum(np.asarray(cx1 - cx0), 0) * np.maximum(np.asarray(cy1 - cy0), 0)
    print(f"  cell={c}x{c} tiles ({cw}x{ch} cells): instances={carea[live].sum()}"
          f" mean/gauss={carea[live].mean():.2f}")

# ---- stage timings ----------------------------------------------------------
def f_proj(salt, s):
    p = project_gaussians(s["means3d"] + salt, s["scales"], s["quats"],
                          s["opacities"], s["shs"], SH_DEGREE, cam)
    return p.means2d, p.colors

def f_bin(salt, m2d, dep, rad, val, r2):
    b = bin_gaussians_dense(m2d + salt, dep, rad, val, WIDTH, HEIGHT, TILE,
                            means2d_cull=m2d + salt, r2_max=r2)
    return b.ranks, b.tile_starts, b.total

def f_sortonly(salt, keys):
    return jax.lax.sort(keys + salt.astype(jnp.int32))

def f_depthsort(salt, dep):
    n = dep.shape[0]
    return jax.lax.sort((dep + salt, jnp.arange(n, dtype=jnp.int32)),
                        num_keys=1)[1]

b = jax.jit(functools.partial(bin_gaussians_dense, width=WIDTH, height=HEIGHT,
                              tile_size=TILE))(
    proj.means2d, proj.depths, proj.radii, proj.valid,
    means2d_cull=proj.means2d, r2_max=proj.r2_max)
jax.block_until_ready(b.ranks)
nslots = b.ranks.shape[0]
print(f"slot count (sorted keys) = {nslots}  total live = {int(b.total)}")

pack = jax.jit(pack_projected)(proj.means2d, proj.conics, proj.colors,
                               proj.opacities)

def f_permute(salt, pk):
    return permute_rows(pk + salt, b.perm, b.inv_perm)

pack_ranked = jax.jit(f_permute)(jnp.float32(0), pack)

def f_gather(salt, pk):
    return gather_instances_perm(pk + salt, b.ranks[:CAP],
                                 b.instance_valid[:CAP], CAP)

inst = jax.jit(f_gather)(jnp.float32(0), pack_ranked)
ranges = jnp.stack([b.tile_starts, b.tile_ends], -1).astype(jnp.float32)

def f_scatter(salt, g):
    # transpose of gather_instances_perm: segment-sum rows back per rank
    return jax.vjp(lambda pk: gather_instances_perm(
        pk, b.ranks[:CAP], b.instance_valid[:CAP], CAP), pack_ranked)[1](g + salt)

def f_blendf(salt, i):
    return blend_image_fwd_pallas(i + salt, ranges, WIDTH, HEIGHT, TILE, CHUNK)

color, trans = jax.jit(f_blendf)(jnp.float32(0), inst)
gc = jnp.ones_like(color); gt = jnp.ones_like(trans)

def f_blendb(salt, i):
    return blend_image_bwd_pallas(i + salt, ranges, color, trans, gc, gt,
                                  WIDTH, HEIGHT, TILE, CHUNK)

keys2 = jnp.concatenate([jnp.arange(nslots, dtype=jnp.int32)] )
timeit("projection", jax.jit(f_proj), scene)
timeit("binning_dense total", jax.jit(f_bin), proj.means2d, proj.depths,
       proj.radii, proj.valid, proj.r2_max)
timeit(f"lax.sort {nslots/1e6:.2f}M i32", jax.jit(f_sortonly),
       jax.random.randint(jax.random.PRNGKey(0), (nslots,), 0, 1 << 30))
timeit("depth argsort 100k", jax.jit(f_depthsort), proj.depths)
timeit("permute_rows 100k", jax.jit(f_permute), pack)
timeit(f"gather {CAP} rows", jax.jit(f_gather), pack_ranked)
timeit(f"scatter-add {CAP} rows", jax.jit(f_scatter), inst)
timeit("blend fwd pallas", jax.jit(f_blendf), inst)
timeit("blend bwd pallas", jax.jit(f_blendb), inst)
