"""Multi-subject batched training driver (host orchestration).

BASELINE.md stretch config / SURVEY.md §2.5 "multi-subject batched avatar
training": S avatars train simultaneously, one per 'data' mesh group,
through ONE jitted step (parallel/sharded.make_multisubject_train_step).
Subjects share the FLAME topology but own independent gaussians, FLAME
trainables, Adam moments and densification stats.

The host-side hard part is densification under batching: each subject's
clone/split/prune is independent numpy surgery that changes its gaussian
count, so after the per-subject surgeries every subject is re-padded onto
a COMMON capacity bucket (the max across subjects; GaussianModel.repad
preserves stats while growing). The step re-jits only when that common
bucket — or the instance-stream capacity, on an overflow probe — grows,
exactly mirroring the single-subject loop's grow-and-rejit protocol
(train/loop.py).

Constraints: subjects must share capacity_granularity and FLAME sequence
shapes (stacked [S, ...] inputs must be rectangular); callers pad motion
sequences to a common length beforehand.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from gaussianavatars_tpu.models.gaussians import AdamState
from gaussianavatars_tpu.train import optim
from gaussianavatars_tpu.train.loop import lr_pytree
from gaussianavatars_tpu.utils.schedules import expon_lr


def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs, 0), *trees)


def _take(tree, i):
    return jax.tree.map(lambda x: x[i], tree)


class MultiSubjectTrainer:
    """Drives S subjects through the batched sharded step.

    Args:
      models: S bound FlameGaussianModels (same granularity/topology).
      mesh: jax Mesh with axes ('data', 'prim'); mesh.shape['data'] == S.
      opt_cfg / pipe_cfg: shared hyperparameters.
      width/height: training resolution (shared).
      extents: per-subject scene extents (densification thresholds).
    """

    def __init__(self, models: Sequence, mesh, opt_cfg, pipe_cfg,
                 width: int, height: int, extents: Sequence[float]):
        from gaussianavatars_tpu.parallel.sharded import (
            make_multisubject_train_step,
        )

        self._make_step = make_multisubject_train_step
        self.models = list(models)
        self.mesh = mesh
        self.opt_cfg = opt_cfg
        self.pipe_cfg = pipe_cfg
        self.width, self.height = width, height
        self.extents = list(extents)
        self.s = mesh.shape["data"]
        assert len(self.models) == self.s, (
            f"{len(self.models)} subjects vs data axis {self.s}"
        )
        grans = {m.capacity_granularity for m in self.models}
        assert len(grans) == 1, "subjects must share capacity_granularity"

        # align all subjects onto the common capacity bucket up front
        self._adams = []
        for m in self.models:
            mu, nu, count = optim.init(m.params)
            self._adams.append(AdamState(mu=mu, nu=nu, count=count))
        self._align_capacity()

        self.flame_trs = [m.flame_trainable() for m in self.models]
        self.flame_fixeds = [
            {k: v for k, v in m.flame_param.items()
             if k not in self.flame_trs[i]}
            for i, m in enumerate(self.models)
        ]
        self._flame_moments = [
            optim.init(ft)[:2] for ft in self.flame_trs
        ]
        self._count = self._adams[0].count
        self._step_cache = {}
        self._restack()

    # ------------------------------------------------------------------

    def _align_capacity(self):
        common = max(m.capacity for m in self.models)
        for i, m in enumerate(self.models):
            self._adams[i] = m.repad(self._adams[i], common)
        self.common_capacity = common

    def _restack(self):
        """Host per-subject state -> stacked device arrays."""
        ms = self.models
        self.params_s = _stack([m.params for m in ms])
        self.binding_s = jnp.stack([m.binding_device() for m in ms])
        self.active_s = jnp.stack([m.active_mask() for m in ms])
        self.mu_g = _stack([a.mu for a in self._adams])
        self.nu_g = _stack([a.nu for a in self._adams])
        self.flame_tr_s = _stack(self.flame_trs)
        self.mu_f = _stack([mf for mf, _ in self._flame_moments])
        self.nu_f = _stack([nf for _, nf in self._flame_moments])
        self.max_radii_s = jnp.stack([m.max_radii2d for m in ms])
        self.accum_s = jnp.stack([m.xyz_gradient_accum for m in ms])
        self.denom_s = jnp.stack([m.denom for m in ms])
        self.flame_fixed_s = _stack(self.flame_fixeds)

    def _unstack(self):
        """Stacked device state -> host per-subject models/moments."""
        for i, m in enumerate(self.models):
            m.params = _take(self.params_s, i)
            m.max_radii2d = self.max_radii_s[i]
            m.xyz_gradient_accum = self.accum_s[i]
            m.denom = self.denom_s[i]
            self._adams[i] = AdamState(
                mu=_take(self.mu_g, i), nu=_take(self.nu_g, i),
                count=self._count,
            )
            self.flame_trs[i] = _take(self.flame_tr_s, i)
            self._flame_moments[i] = (_take(self.mu_f, i),
                                      _take(self.nu_f, i))
            m.merge_flame_trainable(self.flame_trs[i])

    def _step_fn(self):
        key = (self.common_capacity, self.pipe_cfg.capacity,
               self.width, self.height)
        fn = self._step_cache.get(key)
        if fn is None:
            fn = self._make_step(
                self.mesh, self.models[0], self.opt_cfg, self.pipe_cfg,
                self.width, self.height,
                sh_degree=self.models[0].max_sh_degree,
            )
            self._step_cache = {key: fn}
        return fn

    # ------------------------------------------------------------------

    def train(self, batch_fn: Callable, first_iter: int, last_iter: int,
              *, densify: bool = True, log: Callable = lambda *_: None):
        """Run iterations [first_iter, last_iter] (1-based, inclusive).

        batch_fn(subject_index, iteration) -> (cam_tuple, gt, bg,
        timestep) supplies each subject's view for the step.
        """
        opt = self.opt_cfg
        losses = {}
        pending_probe = None
        for iteration in range(first_iter, last_iter + 1):
            cams, gts, bgs, tss = [], [], [], []
            for i in range(self.s):
                cam, gt, bg, ts = batch_fn(i, iteration)
                cams.append(jax.tree.map(np.asarray, cam))
                gts.append(np.asarray(gt, np.float32))
                bgs.append(np.asarray(bg, np.float32))
                tss.append(ts)
            xyz_lr = float(expon_lr(
                iteration,
                opt.position_lr_init * self.models[0].spatial_lr_scale,
                opt.position_lr_final * self.models[0].spatial_lr_scale,
                opt.position_lr_delay_mult, opt.position_lr_max_steps,
            ))
            lrs = lr_pytree(opt, xyz_lr, self.flame_trs[0],
                            self.models[0].spatial_lr_scale)

            # numpy leaves: stacks ride the jit dispatch instead of
            # paying eager device-put round trips (see train/loop.py)
            out = self._step_fn()(
                self.params_s, self.flame_tr_s, self.flame_fixed_s,
                self.binding_s, self.active_s,
                jax.tree.map(lambda *xs: np.stack(xs), *cams),
                np.stack(gts), np.stack(bgs),
                np.asarray(tss, np.int32), lrs,
                self.mu_g, self.nu_g, self.mu_f, self.nu_f, self._count,
                self.max_radii_s, self.accum_s, self.denom_s,
            )
            (self.params_s, self.flame_tr_s, self.mu_g, self.nu_g,
             self.mu_f, self.nu_f, self._count, self.max_radii_s,
             self.accum_s, self.denom_s, losses, total_inst) = out

            # overflow probe pipelined one step late via an async D2H
            # copy: a synchronous read costs a host<->device round trip
            # (train/loop.py has the same pattern)
            total_inst.copy_to_host_async()
            probe, pending_probe = pending_probe, total_inst
            if iteration == last_iter:
                probe = total_inst
            if probe is not None:
                ti = int(probe)
                if ti > self.pipe_cfg.capacity:
                    log(f"[multisubject] instance demand {ti} > "
                        f"{self.pipe_cfg.capacity}; growing bucket")
                    self.pipe_cfg.capacity = int(1.5 * ti)
                    self._step_cache.clear()

            if densify and iteration < opt.densify_until_iter:
                hit_densify = (
                    iteration > opt.densify_from_iter
                    and iteration % opt.densification_interval == 0
                )
                hit_reset = iteration % opt.opacity_reset_interval == 0
                if hit_densify or hit_reset:
                    self._unstack()
                    for i, m in enumerate(self.models):
                        if hit_densify:
                            size_threshold = (
                                20 if iteration > opt.opacity_reset_interval
                                else None
                            )
                            face_scaling = None
                            if m.binding is not None:
                                frames = m.face_frames_at(
                                    m.flame_param, int(tss[i]))
                                face_scaling = np.asarray(frames.scaling)
                            self._adams[i] = m.densify_and_prune(
                                self._adams[i], opt.densify_grad_threshold,
                                0.005, self.extents[i], size_threshold,
                                opt.percent_dense, face_scaling,
                                seed=iteration,
                                screen_size_prune=opt.screen_size_prune,
                            )
                        if hit_reset:
                            self._adams[i] = m.reset_opacity(self._adams[i])
                    old_common = self.common_capacity
                    self._align_capacity()
                    if self.common_capacity != old_common:
                        log(f"[multisubject] capacities re-bucketed to "
                            f"{self.common_capacity}")
                        self._step_cache.clear()
                    self._restack()
        self._unstack()
        return losses
