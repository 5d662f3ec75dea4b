"""Gaussian splat cloud: parameters, binding chain, densification engine.

TPU-native re-architecture of reference scene/gaussian_model.py. Key design
departures from the torch original, driven by XLA's static-shape model:

  * parameters live in a `GaussianParams` pytree padded to a *capacity
    bucket* with an explicit `n_alive` count — jitted steps never change
    shape; only densification events (every ~2k steps, host-side numpy)
    re-bucket, so recompilation is rare and amortized
  * the binding chain (local->world through per-triangle frames) is a pure
    function (`world_space_gaussians`) so gradients flow into both gaussian
    params AND the FLAME-driven face frames (reference
    scene/gaussian_model.py:113-160)
  * densify/clone/split/prune + Adam-state surgery are explicit numpy
    transformations of (params, opt_state) — the exact re-implementation of
    the reference's optimizer surgery (scene/gaussian_model.py:334-519)

PLY interchange is bit-compatible with the reference (including the
`binding_0` attribute) so artifacts transfer both ways.
"""

from __future__ import annotations

import functools
import itertools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatars_tpu.ops.quaternion import quat_multiply, quat_normalize
from gaussianavatars_tpu.utils import ply as plyio

# Padding for dead (beyond-n_alive) slots: effectively invisible and inert.
_DEAD_OPACITY_LOGIT = -20.0
_DEAD_LOG_SCALE = -20.0


class GaussianParams(NamedTuple):
    """Raw optimizable parameters (capacity-padded device arrays).

    Layout mirrors reference scene/gaussian_model.py:50-55, except SH
    features are stored FLAT 2D on device: `features_dc` [C, 3] and
    `features_rest` [C, 3*(K-1)] (CHANNEL-major: all K-1 red coeffs, then
    green, then blue — the reference PLY f_rest_* bit order and the
    contiguous-block layout ops/sh.eval_sh_flat_cmajor consumes — the
    row-major flattening of the reference's [N, K, 3]). 3D feature
    arrays earn exotic XLA layouts whose reshape/transpose copies cost
    multiple ms per step at 100k gaussians; the [N, K, 3] view exists
    only at host IO boundaries (PLY/parity dumps).
    """

    xyz: jnp.ndarray            # [C, 3] local (bound) or world (unbound)
    features_dc: jnp.ndarray    # [C, 3]
    features_rest: jnp.ndarray  # [C, 3*(K-1)] flat channel-major blocks
    scaling: jnp.ndarray        # [C, 3] log-scale
    rotation: jnp.ndarray       # [C, 4] wxyz (unnormalized)
    opacity: jnp.ndarray        # [C, 1] logit


class FaceFrames(NamedTuple):
    """Per-triangle rigid frames from the driven mesh
    (reference scene/flame_gaussian_model.py:137-154)."""

    center: jnp.ndarray       # [F, 3]
    orient_mat: jnp.ndarray   # [F, 3, 3]
    orient_quat: jnp.ndarray  # [F, 4] wxyz
    scaling: jnp.ndarray      # [F, 1]
    table: jnp.ndarray = None  # optional packed (F, 17) row table
                              # [orient 9 | scale | center 3 | quat 4]; when
                              # present the binding chain uses it directly
                              # (no 3D reshapes/concats in the hot path)


def inverse_sigmoid(x):
    return np.log(x / (1.0 - x))


def _gather_frames(table, binding):
    """ONE per-gaussian row gather of the packed (F, 17) face-frame table
    (rows: orient_mat flat 0:9 | scaling 9 | center 10:13 | quat 13:17).

    The PACKING is the optimization: consumers slice attribute columns
    out of the (C, 17) result (the slices fuse into their elementwise
    users), so one row gather replaces four separate gathers-by-binding —
    and, crucially, the autodiff transpose becomes ONE packed row-major
    scatter-add instead of four (the [F,3,3]-shaped d_orient scatter
    alone traced at 5.6 ms/step at 100k bound gaussians; the packed
    scatter measures ~1.9 ms isolated). A sort-grouped segmented
    reduction (pair-sort by binding + shift-add scan + segment-head
    pick) was measured SLOWER than the packed scatter at this shape
    (2.6 vs 1.9 ms isolated) because the scan must run log2(C) steps to
    bound unknown segment lengths — do not resurrect it without new
    measurements.
    """
    return table[binding]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gather_frames_sorted(table, binding, ends, max_seg=None):
    """`_gather_frames` for SORTED binding (non-decreasing, every face
    populated — the never-empty-a-face invariant): the cotangent becomes a
    segmented reduction instead of a random scatter-add.

    `ends` is [F] int32: the LAST slot index of each face's contiguous run
    (cumsum(binding_counter) - 1). `max_seg` (STATIC) is an upper bound on
    any face's gaussian count: when given, the transpose runs
    log2(max_seg) masked shift-adds (each segment's total lands on its
    FIRST row; ONE [F]-row gather at the segment starts picks it up) —
    measured 0.28 ms at the bound-bench shape (114688 x 17, max_seg 16)
    vs 0.86 ms for the full-length cumsum + ends-diff (log2(C) = 17
    internal passes) and 1.44 ms for the packed scatter. Callers encode
    max_seg in a static arg shape so densify growth retraces
    (train/loop.binding_arg). With max_seg None the cumsum form runs.
    Grads in dead capacity-padding slots are ignored: the cumsum form
    reads totals only at live `ends`; the shift-add form masks the dead
    tail's cotangents explicitly (its binding of 0 would alias face 0's
    id whenever face 0's run is within shift distance of the tail).
    """
    return table[binding]


def _gather_frames_sorted_fwd(table, binding, ends, max_seg):
    return table[binding], (binding, ends)


def _gather_frames_sorted_bwd(max_seg, residuals, g):
    binding, ends = residuals
    if max_seg is None:
        cs = jnp.cumsum(g, axis=0)             # (C, 17)
        tot = cs[ends]                         # (F, 17)
        d_table = tot - jnp.concatenate(
            [jnp.zeros_like(tot[:1]), tot[:-1]], axis=0)
        return (d_table, None, None)
    # segmented suffix shift-add (see instance_pack._gather_perm_bwd):
    # an equal binding at distance s implies the whole gap is one segment.
    # Dead capacity-padding rows carry binding 0, which ALIASES face 0's
    # id whenever face 0's run is within shift distance of the tail (tiny
    # F) — mask their cotangents out up front instead of trusting callers
    # to zero them (one (C, 17) where vs a silent d_table[0] leak).
    live = (jnp.arange(g.shape[0], dtype=jnp.int32) <= ends[-1])[:, None]
    x = jnp.where(live, g, 0.0)
    shift = 1
    while shift < max(2, max_seg):
        same = jnp.pad(binding[shift:] == binding[:-shift], (0, shift))
        x = x + jnp.where(same[:, None],
                          jnp.pad(x[shift:], ((0, shift), (0, 0))), 0.0)
        shift *= 2
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), ends[:-1] + 1])
    return (x[starts], None, None)


_gather_frames_sorted.defvjp(_gather_frames_sorted_fwd,
                             _gather_frames_sorted_bwd)


def world_space_gaussians(
    params: GaussianParams,
    binding: Optional[jnp.ndarray],
    frames: Optional[FaceFrames],
    binding_ends: Optional[jnp.ndarray] = None,
    return_face_scale: bool = False,
    binding_max_seg: Optional[int] = None,
):
    """Activate raw params and (when bound) carry them into world space.

    Returns (means3d [C,3], scales [C,3], quats [C,4], opacities [C],
    shs [C,K,3]). Matches the reference property chain:
      get_xyz      scene/gaussian_model.py:140-150
      get_scaling  :113-123
      get_rotation :125-138
    """
    scales = jnp.exp(params.scaling)
    opacities = jax.nn.sigmoid(params.opacity[:, 0])
    # FLAT [C, 3*K] CHANNEL-major SH concat ([R: dc,rest | G | B]): 2D
    # shapes keep XLA out of permuted [C, K, 3] layouts, and the
    # channel-major block order makes the SH eval + its VJP pure
    # contiguous-block math (ops/sh.eval_sh_flat_cmajor; the k-major flat
    # form still paid ~1.8 ms of interleaved-slice relayouts at 100k)
    if params.features_dc is None:
        # pre-fused [C, 3K] channel-major features (dc at block heads):
        # no per-step concat (see docs/performance.md r5 bound-gap note)
        shs = params.features_rest
    else:
        km = params.features_rest.shape[1] // 3
        dc, rest = params.features_dc, params.features_rest
        shs = jnp.concatenate(
            [dc[:, 0:1], rest[:, :km],
             dc[:, 1:2], rest[:, km:2 * km],
             dc[:, 2:3], rest[:, 2 * km:]], axis=1,
        )

    if binding is None:
        quats = quat_normalize(params.rotation)
        if return_face_scale:
            return params.xyz, scales, quats, opacities, shs, None
        return params.xyz, scales, quats, opacities, shs

    # pack the face-frame attributes into one (F, 17) table (F is small;
    # this concat is differentiable, so frame cotangents flow out of the
    # custom-VJP gather's packed (F, 17) gradient automatically).
    # face_frames_from_verts pre-packs it (flat 2D, no 3D reshapes).
    if frames.table is not None:
        table = frames.table
    else:
        f = frames.orient_mat.shape[0]
        table = jnp.concatenate(
            [frames.orient_mat.reshape(f, 9), frames.scaling, frames.center,
             frames.orient_quat], axis=1,
        )
    if binding_ends is not None:
        rows = _gather_frames_sorted(
            table, binding, binding_ends, binding_max_seg)       # (C, 17)
    else:
        rows = _gather_frames(table, binding)           # (C, 17)
    face_scale = rows[:, 9:10]
    face_center = rows[:, 10:13]
    face_quat = quat_normalize(rows[:, 13:17])

    # componentized R @ x (full-f32 VPU mul-adds; no [C,3,3] einsum whose
    # layouts XLA shuffles with multi-ms copies)
    x, y, z = params.xyz[:, 0], params.xyz[:, 1], params.xyz[:, 2]
    wx = rows[:, 0] * x + rows[:, 1] * y + rows[:, 2] * z
    wy = rows[:, 3] * x + rows[:, 4] * y + rows[:, 5] * z
    wz = rows[:, 6] * x + rows[:, 7] * y + rows[:, 8] * z
    means3d = jnp.stack([wx, wy, wz], axis=-1) * face_scale + face_center
    scales = scales * face_scale
    quats = quat_multiply(face_quat, quat_normalize(params.rotation))
    if return_face_scale:
        # hand the gathered (C, 1) face scale back so callers (scale reg
        # loss) need no second gather-by-binding
        return means3d, scales, quats, opacities, shs, face_scale
    return means3d, scales, quats, opacities, shs


def _round_capacity(n: int, granularity: int) -> int:
    return max(granularity, -(-n // granularity) * granularity)


class AdamState(NamedTuple):
    """Per-tensor Adam moments (same pytree structure as the params)."""

    mu: GaussianParams
    nu: GaussianParams
    count: jnp.ndarray  # scalar step count


class GaussianModel:
    """Host-side container: capacity management, densification, IO.

    The jitted train step consumes `.params` / `.binding` / stats arrays;
    this class owns everything that changes shape or runs host-side.
    """

    _TOKEN_COUNTER = itertools.count()

    def __init__(self, sh_degree: int, capacity_granularity: int = 8192):
        self.max_sh_degree = sh_degree
        self.active_sh_degree = 0
        self.capacity_granularity = capacity_granularity
        # Stable identity for host-side caches keyed on "which model":
        # id() values recycle after GC, so a long-lived process evaluating
        # several models could hit a stale cache with wrong closures.
        self.cache_token = next(GaussianModel._TOKEN_COUNTER)
        # capacity floor: multi-subject batched training pads every
        # subject to a COMMON bucket so the [S, N, ...] stack stays
        # rectangular across divergent densification (train/multisubject.py)
        self.min_capacity = 0

        self.params: GaussianParams | None = None
        self.n_alive = 0
        self.binding: np.ndarray | None = None          # [C] int32
        self.binding_counter: np.ndarray | None = None  # [F] int32
        self.spatial_lr_scale = 0.0

        # densification stats (device arrays, updated inside the train step)
        self.max_radii2d: jnp.ndarray | None = None     # [C]
        self.xyz_gradient_accum: jnp.ndarray | None = None  # [C]
        self.denom: jnp.ndarray | None = None           # [C]

        self.num_timesteps = 1

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------

    @property
    def capacity(self) -> int:
        return 0 if self.params is None else self.params.xyz.shape[0]

    @property
    def n_sh_coeffs(self) -> int:
        return (self.max_sh_degree + 1) ** 2

    def one_up_sh_degree(self):
        if self.active_sh_degree < self.max_sh_degree:
            self.active_sh_degree += 1

    def active_mask(self) -> jnp.ndarray:
        # cached: this runs every training iteration and an eager device
        # op costs an RPC round trip on tunneled TPU frontends
        key = (self.capacity, self.n_alive)
        cached = getattr(self, "_active_cache", None)
        if cached is None or cached[0] != key:
            cached = (key, jnp.arange(self.capacity) < self.n_alive)
            self._active_cache = cached
        return cached[1]

    def create_from_pcd(self, points: Optional[np.ndarray],
                        colors: Optional[np.ndarray],
                        spatial_lr_scale: float, seed: int = 0):
        """Initialize splats from a point cloud, or one-per-face when bound
        (reference scene/gaussian_model.py:172-206)."""
        from gaussianavatars_tpu.ops.sh import rgb2sh

        self.spatial_lr_scale = spatial_lr_scale
        rng = np.random.default_rng(seed)

        if points is None:
            assert self.binding is not None, "unbound init needs a point cloud"
            n = len(self.binding)
            xyz = np.zeros((n, 3), np.float32)
            fused_color = (rng.random((n, 3)) / 255.0).astype(np.float32)
            scales = np.zeros((n, 3), np.float32)  # log(1)
        else:
            n = len(points)
            xyz = np.asarray(points, np.float32)
            fused_color = rgb2sh(np.asarray(colors, np.float32))
            from gaussianavatars_tpu.ops.knn import mean_sq_dist_to_3nn

            dist2 = np.maximum(np.asarray(mean_sq_dist_to_3nn(xyz)), 1e-7)
            scales = np.repeat(
                np.log(np.sqrt(dist2))[:, None], 3, axis=1
            ).astype(np.float32)

        k = self.n_sh_coeffs
        f_dc = np.asarray(fused_color, np.float32).reshape(n, 3)
        f_rest = np.zeros((n, (k - 1) * 3), np.float32)
        rots = np.zeros((n, 4), np.float32)
        rots[:, 0] = 1.0
        opac = inverse_sigmoid(0.1 * np.ones((n, 1), np.float32))

        self._install(
            dict(xyz=xyz, features_dc=f_dc, features_rest=f_rest,
                 scaling=scales, rotation=rots, opacity=opac), n
        )

    def _install(self, arrays: dict, n: int):
        """Pad host arrays to a capacity bucket and move to device.

        Bucket policy: fresh installs round up to the granularity; an
        EXISTING model grows GEOMETRICALLY (double the current bucket
        until it fits) and never shrinks — each distinct capacity is a
        full re-jit of the train step, so a 600k-style schedule with
        densification every 2k must amortize recompiles, not pay one per
        +granularity crossing (VERDICT r3 item 5).
        """
        cap = max(_round_capacity(n, self.capacity_granularity),
                  self.min_capacity)
        cur = self.capacity if getattr(self, "params", None) is not None else 0
        if cur:
            if n <= cur:
                cap = max(cur, self.min_capacity)
            else:
                g = cur
                while g < n:
                    g *= 2
                cap = max(cap, g)
        self.n_alive = n

        def pad(a, fill=0.0):
            out = np.full((cap,) + a.shape[1:], fill, a.dtype)
            out[:n] = a
            return jnp.asarray(out)

        self.params = GaussianParams(
            xyz=pad(arrays["xyz"]),
            features_dc=pad(arrays["features_dc"]),
            features_rest=pad(arrays["features_rest"]),
            scaling=pad(arrays["scaling"], _DEAD_LOG_SCALE),
            rotation=pad(arrays["rotation"] if n else arrays["rotation"]),
            opacity=pad(arrays["opacity"], _DEAD_OPACITY_LOGIT),
        )
        if self.binding is not None:
            b = np.zeros(cap, np.int32)
            b[:n] = self.binding[:n] if len(self.binding) >= n else self.binding
            self.binding = b
        self.reset_stats()

    def repad(self, opt_state: AdamState, capacity: int) -> AdamState:
        """Re-install params/moments at a capacity floor, PRESERVING the
        densification stats (unlike surgery, which resets them). Used by
        the multi-subject driver to re-align subjects onto a common
        bucket after per-subject densification."""
        if capacity <= self.capacity:
            return opt_state
        n = self.n_alive
        stats = [np.asarray(a)[:n] for a in
                 (self.max_radii2d, self.xyz_gradient_accum, self.denom)]
        self.min_capacity = capacity
        p, mu, nu = self._to_host(opt_state)
        new_state = self._from_host(p, mu, nu, opt_state.count)

        def pad_stat(a):
            out = np.zeros((self.capacity,), a.dtype)
            out[:n] = a
            return jnp.asarray(out)

        self.max_radii2d = pad_stat(stats[0])
        self.xyz_gradient_accum = pad_stat(stats[1])
        self.denom = pad_stat(stats[2])
        return new_state

    def reset_stats(self):
        cap = self.capacity
        self.max_radii2d = jnp.zeros((cap,), jnp.float32)
        self.xyz_gradient_accum = jnp.zeros((cap,), jnp.float32)
        self.denom = jnp.zeros((cap,), jnp.float32)

    def binding_device(self) -> Optional[jnp.ndarray]:
        if self.binding is None:
            return None
        cached = getattr(self, "_binding_cache", None)
        if cached is None or cached[0] is not self.binding:
            cached = (self.binding, jnp.asarray(self.binding, jnp.int32))
            self._binding_cache = cached
        return cached[1]

    def binding_ends_device(self) -> Optional[jnp.ndarray]:
        """[F] last-slot index per face when the alive binding prefix is
        SORTED and every face is populated (enables the cumsum-transpose
        gather `_gather_frames_sorted`); None otherwise — e.g. after
        loading a reference PLY whose rows are in append order. Surgery
        re-sorts by binding, so FLAME-initialized models stay eligible.
        """
        if self.binding is None or self.binding_counter is None:
            return None
        cached = getattr(self, "_binding_ends_cache", None)
        if cached is not None and cached[0] is self.binding:
            return cached[1]
        alive = self.binding[: self.n_alive]
        ends = None
        if (len(alive) == self.n_alive
                and np.all(self.binding_counter > 0)
                and int(self.binding_counter.sum()) == self.n_alive
                and np.all(alive[1:] >= alive[:-1])):
            ends = jnp.asarray(
                np.cumsum(self.binding_counter, dtype=np.int64) - 1,
                jnp.int32,
            )
        self._binding_ends_cache = (self.binding, ends)
        return ends

    # ------------------------------------------------------------------
    # Densification (host-side numpy, mirrors reference exactly)
    # ------------------------------------------------------------------

    def _to_host(self, opt_state: AdamState):
        p = {k: np.asarray(getattr(self.params, k))[: self.n_alive]
             for k in GaussianParams._fields}
        mu = {k: np.asarray(getattr(opt_state.mu, k))[: self.n_alive]
              for k in GaussianParams._fields}
        nu = {k: np.asarray(getattr(opt_state.nu, k))[: self.n_alive]
              for k in GaussianParams._fields}
        return p, mu, nu

    def _from_host(self, p, mu, nu, count) -> AdamState:
        n = len(p["xyz"])
        self._install(p, n)

        cap = self.capacity

        def pad(a):
            out = np.zeros((cap,) + a.shape[1:], a.dtype)
            out[:n] = a
            return jnp.asarray(out)

        mu_t = GaussianParams(**{k: pad(mu[k]) for k in GaussianParams._fields})
        nu_t = GaussianParams(**{k: pad(nu[k]) for k in GaussianParams._fields})
        return AdamState(mu=mu_t, nu=nu_t, count=count)

    def densify_and_prune(
        self,
        opt_state: AdamState,
        max_grad: float,
        min_opacity: float,
        extent: float,
        max_screen_size: Optional[float],
        percent_dense: float,
        face_scaling: Optional[np.ndarray] = None,
        seed: int = 0,
        screen_size_prune: str = "reference",
    ) -> AdamState:
        """Clone + split + prune with optimizer-state surgery.

        Mirrors reference scene/gaussian_model.py:446-515 (including the
        bound-path quirks: world-scale thresholds, local-frame split
        sampling, binding inheritance and the never-empty-a-face guard).

        `screen_size_prune`: "reference" (default) reproduces the
        reference's literal behavior — densification_postfix zeroes
        max_radii2D before the prune reads it, so the screen-size test
        never fires; "effective" actually prunes on the pre-densify radii
        (what the reference code *looks like* it does).
        """
        rng = np.random.default_rng(seed)
        p, mu, nu = self._to_host(opt_state)
        n = self.n_alive
        binding = None if self.binding is None else self.binding[:n].copy()
        counter = None if self.binding_counter is None else self.binding_counter.copy()

        grads = np.asarray(self.xyz_gradient_accum)[:n] / np.maximum(
            np.asarray(self.denom)[:n], 1e-12
        )
        grads = np.nan_to_num(grads, nan=0.0)
        max_radii = np.asarray(self.max_radii2d)[:n]

        def get_world_scaling(p_, binding_):
            s = np.exp(p_["scaling"])
            if binding_ is not None:
                s = s * face_scaling[binding_]
            return s

        def append(dst, src):
            return {k: np.concatenate([dst[k], src[k]], 0) for k in dst}

        def zeros_like_fields(src):
            return {k: np.zeros_like(v) for k, v in src.items()}

        # ---- clone (small, high-grad) reference :481-499 ------------------
        world_scale = get_world_scaling(p, binding)
        clone_mask = (grads >= max_grad) & (
            world_scale.max(1) <= percent_dense * extent
        )
        new = {k: v[clone_mask] for k, v in p.items()}
        p = append(p, new)
        mu = append(mu, zeros_like_fields({k: v[clone_mask] for k, v in mu.items()}))
        nu = append(nu, zeros_like_fields({k: v[clone_mask] for k, v in nu.items()}))
        if binding is not None:
            nb = binding[clone_mask]
            binding = np.concatenate([binding, nb])
            np.add.at(counter, nb, 1)

        # ---- split (large, high-grad) reference :446-479 -------------------
        n_after_clone = len(p["xyz"])
        padded_grad = np.zeros(n_after_clone, np.float32)
        padded_grad[:n] = grads
        world_scale = get_world_scaling(p, binding)
        split_mask = (padded_grad >= max_grad) & (
            world_scale.max(1) > percent_dense * extent
        )
        n_split = 2
        stds = world_scale[split_mask]
        stds2 = np.tile(stds, (n_split, 1))
        samples = rng.normal(0.0, 1.0, stds2.shape).astype(np.float32) * stds2
        from gaussianavatars_tpu.ops.quaternion import quat_to_rotmat

        rots = np.asarray(quat_to_rotmat(jnp.asarray(p["rotation"][split_mask])))
        rots2 = np.tile(rots, (n_split, 1, 1))
        new_xyz = np.einsum("nij,nj->ni", rots2, samples) + np.tile(
            p["xyz"][split_mask], (n_split, 1)
        )
        if binding is not None:
            local_scale = stds / face_scaling[binding[split_mask]]
            new_scaling = np.log(
                np.tile(local_scale, (n_split, 1)) / (0.8 * n_split)
            ).astype(np.float32)
        else:
            new_scaling = np.log(stds2 / (0.8 * n_split)).astype(np.float32)

        new = {
            "xyz": new_xyz.astype(np.float32),
            "features_dc": np.tile(p["features_dc"][split_mask], (n_split, 1)),
            "features_rest": np.tile(p["features_rest"][split_mask], (n_split, 1)),
            "scaling": new_scaling,
            "rotation": np.tile(p["rotation"][split_mask], (n_split, 1)),
            "opacity": np.tile(p["opacity"][split_mask], (n_split, 1)),
        }
        p = append(p, new)
        mu = append(mu, zeros_like_fields(new))
        nu = append(nu, zeros_like_fields(new))
        if binding is not None:
            nb = np.tile(binding[split_mask], n_split)
            binding = np.concatenate([binding, nb])
            np.add.at(counter, nb, 1)

        # split originals are pruned afterwards
        prune_split = np.concatenate(
            [split_mask, np.zeros(n_split * split_mask.sum(), bool)]
        )
        p, mu, nu, binding, counter = self._prune(
            p, mu, nu, binding, counter, prune_split
        )

        # ---- prune (transparent / oversized) reference :501-513 ------------
        n_now = len(p["xyz"])
        opac = 1.0 / (1.0 + np.exp(-p["opacity"][:, 0]))
        prune_mask = opac < min_opacity
        if max_screen_size:
            world_scale = get_world_scaling(p, binding)
            big_ws = world_scale.max(1) > 0.1 * extent
            prune_mask = prune_mask | big_ws
            if screen_size_prune == "effective":
                # Prune on the PRE-densify screen radii: the stats tracked
                # for the original n entries, mapped through the split
                # prune (clone/split children have no radii yet). This is
                # what the reference's prune *reads as if* it had — see
                # "reference" below for what it actually sees.
                padded_radii = np.zeros(n_now, np.float32)
                old_kept = np.where(~split_mask[:n])[0]
                padded_radii[: len(old_kept)] = max_radii[old_kept]
                prune_mask = prune_mask | (padded_radii > max_screen_size)
            else:
                # "reference": the reference zeroes max_radii2D in
                # densification_postfix (scene/gaussian_model.py:441-443),
                # which clone AND split always run before densify_and_prune
                # reads it (:505-509) — so big_points_vs is all-False there.
                # Reproduce that literally: no screen-size prune at all.
                assert screen_size_prune == "reference", screen_size_prune
        p, mu, nu, binding, counter = self._prune(
            p, mu, nu, binding, counter, prune_mask
        )

        if binding is not None:
            # keep the binding SORTED (stable: within-face order preserved)
            # so the jitted step can use the cumsum-transpose frame gather
            # (_gather_frames_sorted) instead of a random scatter-add. Row
            # order is semantically free — PLY rows carry binding_0 and the
            # reference's own order is append history.
            order = np.argsort(binding, kind="stable")
            if not np.array_equal(order, np.arange(len(order))):
                binding = binding[order]
                p = {k: v[order] for k, v in p.items()}
                mu = {k: v[order] for k, v in mu.items()}
                nu = {k: v[order] for k, v in nu.items()}

        self.binding = binding
        self.binding_counter = counter
        return self._from_host(p, mu, nu, opt_state.count)

    def _prune(self, p, mu, nu, binding, counter, mask):
        """Drop masked entries; never let a face lose its last gaussian
        (reference scene/gaussian_model.py:371-398)."""
        mask = mask.copy()
        if binding is not None:
            to_prune = binding[mask]
            counter_prune = np.zeros_like(counter)
            np.add.at(counter_prune, to_prune, 1)
            redundant = (counter - counter_prune) > 0
            mask[mask] = redundant[to_prune]
            np.add.at(counter, binding[mask], -1)
            binding = binding[~mask]
        keep = ~mask
        p = {k: v[keep] for k, v in p.items()}
        mu = {k: v[keep] for k, v in mu.items()}
        nu = {k: v[keep] for k, v in nu.items()}
        return p, mu, nu, binding, counter

    def reset_opacity(self, opt_state: AdamState) -> AdamState:
        """Clamp opacity to <= 0.01 and zero its Adam moments
        (reference scene/gaussian_model.py:277-280, 334-347)."""
        opac = jax.nn.sigmoid(self.params.opacity)
        new = jnp.log(jnp.minimum(opac, 0.01) / (1.0 - jnp.minimum(opac, 0.01)))
        alive = self.active_mask()[:, None]
        new = jnp.where(alive, new, _DEAD_OPACITY_LOGIT)
        self.params = self.params._replace(opacity=new)
        mu = opt_state.mu._replace(opacity=jnp.zeros_like(opt_state.mu.opacity))
        nu = opt_state.nu._replace(opacity=jnp.zeros_like(opt_state.nu.opacity))
        return AdamState(mu=mu, nu=nu, count=opt_state.count)

    # ------------------------------------------------------------------
    # PLY interchange (bit-compatible with the reference)
    # ------------------------------------------------------------------

    def save_ply(self, path: str):
        """reference scene/gaussian_model.py:253-275 layout."""
        n = self.n_alive
        p = {k: np.asarray(getattr(self.params, k))[:n]
             for k in GaussianParams._fields}
        cols = []
        xyz = p["xyz"]
        for i, name in enumerate("xyz"):
            cols.append((name, xyz[:, i].astype(np.float32)))
        for name in ("nx", "ny", "nz"):
            cols.append((name, np.zeros(n, np.float32)))
        f_dc = p["features_dc"]
        for i in range(f_dc.shape[1]):
            cols.append((f"f_dc_{i}", f_dc[:, i].astype(np.float32)))
        # device layout IS the reference PLY f_rest bit order
        # (channel-major blocks) — no transpose
        f_rest = p["features_rest"]
        for i in range(f_rest.shape[1]):
            cols.append((f"f_rest_{i}", f_rest[:, i].astype(np.float32)))
        cols.append(("opacity", p["opacity"][:, 0].astype(np.float32)))
        for i in range(3):
            cols.append((f"scale_{i}", p["scaling"][:, i].astype(np.float32)))
        for i in range(4):
            cols.append((f"rot_{i}", p["rotation"][:, i].astype(np.float32)))
        if self.binding is not None:
            cols.append(("binding_0", self.binding[:n].astype(np.float32)))
        plyio.write_ply(path, cols)

    def load_ply(self, path: str, has_target: bool = False):
        """reference scene/gaussian_model.py:282-332."""
        d = plyio.read_ply(path)
        n = len(d["x"])
        xyz = np.stack([d["x"], d["y"], d["z"]], 1).astype(np.float32)
        opac = np.asarray(d["opacity"], np.float32)[:, None]

        f_dc = np.stack(
            [d["f_dc_0"], d["f_dc_1"], d["f_dc_2"]], 1
        ).astype(np.float32)                                      # [N, 3]

        rest_names = sorted(
            (k for k in d if k.startswith("f_rest_")),
            key=lambda s: int(s.split("_")[-1]),
        )
        assert len(rest_names) == 3 * (self.n_sh_coeffs - 1), (
            f"PLY has {len(rest_names)} f_rest coeffs, expected "
            f"{3 * (self.n_sh_coeffs - 1)} for sh_degree {self.max_sh_degree}"
        )
        # PLY f_rest_* column order is channel-major — exactly the flat
        # device layout; one stack, no transpose
        f_rest = np.stack([d[k] for k in rest_names], 1).astype(np.float32)

        scale_names = sorted(
            (k for k in d if k.startswith("scale_")),
            key=lambda s: int(s.split("_")[-1]),
        )
        scales = np.stack([d[k] for k in scale_names], 1).astype(np.float32)
        rot_names = sorted(
            (k for k in d if k.startswith("rot_")),
            key=lambda s: int(s.split("_")[-1]),
        )
        rots = np.stack([d[k] for k in rot_names], 1).astype(np.float32)

        if "binding_0" in d:
            self.binding = np.asarray(d["binding_0"]).astype(np.int32)
            if self.binding_counter is not None:
                counter = np.zeros_like(self.binding_counter)
                np.add.at(counter, self.binding, 1)
                self.binding_counter = counter

        self._install(
            dict(xyz=xyz, features_dc=f_dc, features_rest=f_rest,
                 scaling=scales, rotation=rots, opacity=opac), n
        )
        self.active_sh_degree = self.max_sh_degree

    # ------------------------------------------------------------------
    # Full training-state checkpoint (reference capture/restore :75-111)
    # ------------------------------------------------------------------

    def capture(self, opt_state: AdamState) -> dict:
        n = self.n_alive
        out = {
            # features_rest device layout version: "cmajor" = flat
            # channel-major [N, 3*(K-1)] (r4+). Checkpoints without this
            # field predate the layout change and hold the old
            # coeff-major [N, (K-1)*3] flat order; restore() migrates.
            "features_rest_layout": "cmajor",
            "active_sh_degree": self.active_sh_degree,
            "n_alive": n,
            "spatial_lr_scale": self.spatial_lr_scale,
            "max_radii2d": np.asarray(self.max_radii2d)[:n],
            "xyz_gradient_accum": np.asarray(self.xyz_gradient_accum)[:n],
            "denom": np.asarray(self.denom)[:n],
            "adam_count": int(opt_state.count),
        }
        for k in GaussianParams._fields:
            out[f"param_{k}"] = np.asarray(getattr(self.params, k))[:n]
            out[f"mu_{k}"] = np.asarray(getattr(opt_state.mu, k))[:n]
            out[f"nu_{k}"] = np.asarray(getattr(opt_state.nu, k))[:n]
        if self.binding is not None:
            out["binding"] = self.binding[:n]
            out["binding_counter"] = self.binding_counter
        return out

    def restore(self, data: dict) -> AdamState:
        n = int(data["n_alive"])
        self.active_sh_degree = int(data["active_sh_degree"])
        self.spatial_lr_scale = float(data["spatial_lr_scale"])
        if "binding" in data:
            self.binding = np.asarray(data["binding"], np.int32)
            self.binding_counter = np.asarray(data["binding_counter"], np.int32)
        p = {k: data[f"param_{k}"] for k in GaussianParams._fields}
        mu = {k: data[f"mu_{k}"] for k in GaussianParams._fields}
        nu = {k: data[f"nu_{k}"] for k in GaussianParams._fields}

        layout = str(np.asarray(data.get("features_rest_layout", "kmajor")))
        if layout != "cmajor":
            # pre-r4 checkpoint: features_rest (and its Adam moments) were
            # saved coeff-major [N, (K-1)*3]; migrate to channel-major
            km = self.n_sh_coeffs - 1

            def to_cmajor(a):
                a = np.asarray(a)
                return a.reshape(-1, km, 3).transpose(0, 2, 1).reshape(
                    -1, 3 * km)

            for d_ in (p, mu, nu):
                d_["features_rest"] = to_cmajor(d_["features_rest"])
        state = self._from_host(p, mu, nu, jnp.asarray(int(data["adam_count"])))
        cap = self.capacity

        def pad_stat(a):
            out = np.zeros(cap, np.float32)
            out[:n] = a
            return jnp.asarray(out)

        self.max_radii2d = pad_stat(data["max_radii2d"])
        self.xyz_gradient_accum = pad_stat(data["xyz_gradient_accum"])
        self.denom = pad_stat(data["denom"])
        return state
