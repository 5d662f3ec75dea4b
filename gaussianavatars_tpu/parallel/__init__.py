"""Multi-chip parallelism: device mesh + shard_map render/train strategies."""

from gaussianavatars_tpu.parallel.mesh import make_mesh
from gaussianavatars_tpu.parallel.sharded import (
    make_sharded_render,
    make_sharded_train_step,
)
