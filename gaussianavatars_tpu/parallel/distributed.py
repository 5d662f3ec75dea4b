"""Multi-host initialization (TPU pods).

The reference has no distributed story at all (SURVEY.md §2.5); here
multi-host runs initialize `jax.distributed` and build the ('data','prim')
mesh over the global device set. Keep the `prim` axis within a host where
possible so the projected-splat all_gather rides ICI, not DCN.
"""

from __future__ import annotations

import os


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """`jax.distributed.initialize` with env-var fallbacks.

    On Cloud TPU pods the arguments auto-detect; elsewhere set
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    """
    import jax

    kwargs = {}
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kwargs["coordinator_address"] = addr
    nproc = num_processes or os.environ.get("JAX_NUM_PROCESSES")
    if nproc:
        kwargs["num_processes"] = int(nproc)
    pid = process_id or os.environ.get("JAX_PROCESS_ID")
    if pid is not None and pid != "":
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)


def global_mesh(n_data: int = 1):
    """('data','prim') mesh over all global devices; prim fills a host
    first (ICI-local all_gathers) when the factors allow it."""
    from gaussianavatars_tpu.parallel.mesh import make_mesh

    return make_mesh(n_data=n_data)
