"""Math and kernel layer: pure-JAX ops plus Pallas TPU kernels."""

from gaussianavatars_tpu.ops.sh import eval_sh, rgb2sh, sh2rgb, num_sh_coeffs
from gaussianavatars_tpu.ops.quaternion import (
    quat_normalize,
    quat_multiply,
    quat_to_rotmat,
    rotmat_to_quat,
)
from gaussianavatars_tpu.ops.transforms import (
    world_to_view,
    perspective_projection,
    fov2focal,
    focal2fov,
    compute_face_orientation,
    compute_face_normals,
    compute_vertex_normals,
)
from gaussianavatars_tpu.ops.covariance import (
    build_covariance_3d,
    strip_symmetric,
    build_scaling_rotation,
)
