#!/usr/bin/env python3
"""Capture compile/schedule evidence for the chunked re-shard mechanism.

docs/multichip.md claims the projected-splat all_gather is issued as R
independent collectives whose BACKWARD (R psum_scatters) XLA's
latency-hiding scheduler can overlap with the backward-blend compute
chain. Real pods aren't reachable here, so the checkable evidence is the
compiled program itself: on the virtual 8-device mesh this tool compiles
the sharded train step at gather_chunks R=4 and R=1, inventories the
collective ops in the optimized HLO, and records where each collective
sits in the (scheduled) instruction order relative to the compute between
them. R=4 must show ~4x independent all-gather/reduce-scatter pairs with
compute scheduled between them; R=1 shows the monolithic baseline.

Writes docs/multichip_evidence.txt (committed artifact) when run as:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/multichip_evidence.py
"""

import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

# the axon plugin ignores the JAX_PLATFORMS env var; jax_setup honors it
import gaussianavatars_tpu.utils.jax_setup  # noqa: E402,F401


def compile_step(gather_chunks):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import gaussianavatars_tpu.parallel.sharded as sharded
    from gaussianavatars_tpu.config import (
        OptimizationConfig, PipelineConfig,
    )
    from gaussianavatars_tpu.parallel.mesh import make_mesh
    from gaussianavatars_tpu.train import optim
    from gaussianavatars_tpu.train.loop import lr_pytree
    from tests.utils import make_camera
    from __graft_entry__ import _build_tiny_model

    n_data, n_prim = 2, 4
    mesh = make_mesh(n_data=n_data, n_prim=n_prim)
    tmpdir = tempfile.mkdtemp(prefix="mc_evidence_")
    model = _build_tiny_model(tmpdir, capacity_granularity=1024 * n_prim)
    width, height = 64, 16 * 2 * n_prim
    opt_cfg = OptimizationConfig()
    pipe_cfg = PipelineConfig(backend="jnp", capacity=65536, chunk=8)

    orig = sharded._gathered_render

    def patched(*args, **kw):
        kw["gather_chunks"] = gather_chunks
        return orig(*args, **kw)

    sharded._gathered_render = patched
    try:
        step = sharded.make_sharded_train_step(
            mesh, model, opt_cfg, pipe_cfg, width, height, sh_degree=1,
        )
        flame_tr = model.flame_trainable()
        flame_fixed = {k: v for k, v in model.flame_param.items()
                       if k not in flame_tr}
        mu_g, nu_g, _ = optim.init(model.params)
        mu_f, nu_f, count = optim.init(flame_tr)
        cams = []
        for i in range(n_data):
            p = make_camera(width=width, height=height, dist=6.0,
                            angle=0.2 * i)
            cams.append((p.viewmatrix, p.projmatrix, p.campos,
                         jnp.asarray(p.tan_fovx), jnp.asarray(p.tan_fovy)))
        cam_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
        cap = model.capacity
        args = (
            model.params, flame_tr, flame_fixed, model.binding_device(),
            model.active_mask(), cam_batch,
            jnp.zeros((n_data, 3, height, width), jnp.float32),
            jnp.ones((n_data, 3), jnp.float32),
            jnp.arange(n_data, dtype=jnp.int32) % model.num_timesteps,
            lr_pytree(opt_cfg, 1e-3, flame_tr, 1.0),
            mu_g, nu_g, mu_f, nu_f, count,
            jnp.zeros(cap), jnp.zeros(cap), jnp.zeros(cap),
        )
        compiled = jax.jit(step).lower(*args).compile()
        return compiled.as_text()
    finally:
        sharded._gathered_render = orig


def analyze(hlo, label, out):
    lines = hlo.splitlines()
    # collect collectives in the main computation in instruction order
    entries = []
    for i, ln in enumerate(lines):
        m = re.search(r"%?([\w.-]+) = .*(all-gather|reduce-scatter|"
                      r"all-reduce)\(", ln)
        if m and "start" not in ln:
            entries.append((i, m.group(2), m.group(1)))
    counts = {}
    for _, kind, _ in entries:
        counts[kind] = counts.get(kind, 0) + 1
    out.append(f"== {label} ==")
    out.append(f"collective ops in optimized HLO: {counts}")
    # independence evidence: line distance between consecutive same-kind
    # collectives (compute scheduled between them)
    for kind in ("all-gather", "reduce-scatter"):
        ks = [i for i, k, _ in entries if k == kind]
        if len(ks) > 1:
            gaps = [b - a for a, b in zip(ks, ks[1:])]
            out.append(
                f"{kind}: {len(ks)} ops, HLO-line gaps between consecutive "
                f"ops: {gaps} (gap > 1 = other instructions scheduled "
                f"between the collectives)")
        elif ks:
            out.append(f"{kind}: 1 op (monolithic)")
    out.append("")


def main():
    out = [
        "Chunked re-shard mechanism: compile evidence",
        "=" * 44,
        "",
        "Sharded train step, ('data','prim') = (2,4) mesh, 8 virtual",
        "devices, optimized HLO from jax.jit(...).lower().compile().",
        "The gather_chunks=4 build must show the projected-splat exchange",
        "as ~4 independent all-gathers whose backward is ~4 independent",
        "reduce-scatters, with compute between them (the shape XLA's",
        "latency-hiding scheduler overlaps on real ICI); gather_chunks=1",
        "is the monolithic baseline. See docs/multichip.md.",
        "",
    ]
    for r in (1, 4):
        hlo = compile_step(r)
        analyze(hlo, f"gather_chunks={r}", out)
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "multichip_evidence.txt")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print("\n".join(out))
    print(f"written to {os.path.normpath(path)}")


if __name__ == "__main__":
    main()
