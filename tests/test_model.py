"""GaussianModel state management: init, IO, adam, densification surgery."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatars_tpu.models.gaussians import (
    AdamState,
    GaussianModel,
    GaussianParams,
    world_space_gaussians,
    FaceFrames,
)
from gaussianavatars_tpu.ops.knn import mean_sq_dist_to_3nn
from gaussianavatars_tpu.train import optim


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    ours = np.asarray(mean_sq_dist_to_3nn(jnp.asarray(pts), block=64))
    d2 = ((pts[:, None] - pts[None, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    ref = np.sort(d2, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_adam_matches_torch():
    import torch

    rng = np.random.default_rng(1)
    p0 = rng.normal(size=(32, 3)).astype(np.float32)
    grads = [rng.normal(size=(32, 3)).astype(np.float32) for _ in range(5)]

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    topt = torch.optim.Adam([tp], lr=0.01, eps=1e-15)
    for g in grads:
        tp.grad = torch.from_numpy(g)
        topt.step()

    params = {"p": jnp.asarray(p0)}
    mu, nu, count = optim.init(params)
    for g in grads:
        params, mu, nu, count = optim.apply(
            params, {"p": jnp.asarray(g)}, mu, nu, count, {"p": 0.01}
        )
    np.testing.assert_allclose(
        np.asarray(params["p"]), tp.detach().numpy(), atol=1e-6
    )


def make_model(n=100, bound=False, n_faces=40, seed=0):
    rng = np.random.default_rng(seed)
    m = GaussianModel(sh_degree=2, capacity_granularity=64)
    if bound:
        binding = rng.integers(0, n_faces, n).astype(np.int32)
        binding[:n_faces] = np.arange(n_faces)  # every face covered
        m.binding = binding
        counter = np.zeros(n_faces, np.int32)
        np.add.at(counter, binding, 1)
        m.binding_counter = counter
        m.create_from_pcd(None, None, spatial_lr_scale=1.0)
        # bound init creates one per face; install our custom binding count
        assert m.n_alive == n
    else:
        pts = rng.normal(size=(n, 3)).astype(np.float32)
        cols = rng.random((n, 3)).astype(np.float32)
        m.create_from_pcd(pts, cols, spatial_lr_scale=2.0)
    return m


def test_create_unbound_and_ply_roundtrip(tmp_path):
    m = make_model(n=100)
    assert m.n_alive == 100
    assert m.capacity == 128
    path = str(tmp_path / "point_cloud.ply")
    m.save_ply(path)

    m2 = GaussianModel(sh_degree=2)
    m2.load_ply(path)
    assert m2.n_alive == 100
    for k in GaussianParams._fields:
        a = np.asarray(getattr(m.params, k))[:100]
        b = np.asarray(getattr(m2.params, k))[:100]
        np.testing.assert_array_equal(a, b, err_msg=k)
    assert m2.active_sh_degree == 2


def test_bound_create_uses_binding():
    rng = np.random.default_rng(3)
    m = GaussianModel(sh_degree=1, capacity_granularity=64)
    n_faces = 30
    m.binding = np.arange(n_faces, dtype=np.int32)
    m.binding_counter = np.ones(n_faces, np.int32)
    m.create_from_pcd(None, None, spatial_lr_scale=1.0)
    assert m.n_alive == n_faces
    # bound init: zero local xyz, log(1)=0 scales
    np.testing.assert_array_equal(np.asarray(m.params.xyz)[:n_faces], 0.0)
    np.testing.assert_array_equal(np.asarray(m.params.scaling)[:n_faces], 0.0)

    frames = FaceFrames(
        center=jnp.asarray(rng.normal(size=(n_faces, 3)).astype(np.float32)),
        orient_mat=jnp.broadcast_to(jnp.eye(3), (n_faces, 3, 3)),
        orient_quat=jnp.broadcast_to(
            jnp.asarray([1.0, 0, 0, 0]), (n_faces, 4)
        ),
        scaling=jnp.asarray(rng.uniform(0.5, 2, (n_faces, 1)).astype(np.float32)),
    )
    means, scales, quats, opac, shs = world_space_gaussians(
        m.params, m.binding_device(), frames
    )
    # local xyz=0 => world position = face center
    np.testing.assert_allclose(
        np.asarray(means)[:n_faces], np.asarray(frames.center), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(scales)[:n_faces],
        np.asarray(frames.scaling) * np.ones(3), atol=1e-6,
    )


def test_densify_clone_split_prune():
    m = make_model(n=100)
    state = AdamState(*(lambda t: (t[0], t[1]))(optim.init(m.params)[:2]),
                      count=jnp.zeros((), jnp.int32))
    # fabricate stats: first 10 high grad; make 5 of them huge (split),
    # 5 small (clone); entries 90..99 transparent (prune)
    grads = np.zeros(128, np.float32)
    grads[:10] = 1.0
    m.xyz_gradient_accum = jnp.asarray(grads)
    m.denom = jnp.asarray(np.ones(128, np.float32))
    m.max_radii2d = jnp.zeros(128)

    scaling = np.asarray(m.params.scaling).copy()
    scaling[:5] = np.log(10.0)     # huge -> split
    scaling[5:10] = np.log(1e-3)   # small -> clone
    opacity = np.asarray(m.params.opacity).copy()
    opacity[90:100] = -10.0        # sigmoid ~ 4.5e-5 < 0.005 -> prune
    m.params = m.params._replace(
        scaling=jnp.asarray(scaling), opacity=jnp.asarray(opacity)
    )

    n_before = m.n_alive
    state = m.densify_and_prune(
        state, max_grad=0.5, min_opacity=0.005, extent=10.0,
        max_screen_size=None, percent_dense=0.01,
    )
    # 100 - 5 split originals + 10 split children + 5 clones - 10 pruned
    assert m.n_alive == n_before - 5 + 10 + 5 - 10
    # adam state shape matches capacity
    assert state.mu.xyz.shape == m.params.xyz.shape


def test_packed_binding_chain_matches_unpacked():
    """world_space_gaussians' packed frame-table gather + componentized
    rotation must match the naive four-gather/einsum formulation in both
    values and frame gradients."""
    from gaussianavatars_tpu.ops.quaternion import (
        quat_multiply, quat_normalize,
    )

    rng = np.random.default_rng(0)
    f, c = 23, 96
    m = GaussianModel(sh_degree=1, capacity_granularity=c)
    binding_np = rng.integers(0, f, c).astype(np.int32)
    m.binding = binding_np
    counter = np.zeros(f, np.int32)
    np.add.at(counter, binding_np, 1)
    m.binding_counter = counter
    m.create_from_pcd(None, None, spatial_lr_scale=1.0)
    m.params = m.params._replace(
        xyz=jnp.asarray(rng.normal(size=(c, 3)).astype(np.float32)))

    def rand_rot(n):
        q = rng.normal(size=(n, 4)).astype(np.float32)
        return q / np.linalg.norm(q, axis=1, keepdims=True)

    from gaussianavatars_tpu.ops.quaternion import quat_to_rotmat
    oq = jnp.asarray(rand_rot(f))
    frames = FaceFrames(
        center=jnp.asarray(rng.normal(size=(f, 3)).astype(np.float32)),
        orient_mat=quat_to_rotmat(oq),
        orient_quat=oq,
        scaling=jnp.asarray(
            rng.uniform(0.5, 2.0, (f, 1)).astype(np.float32)),
    )
    binding = jnp.asarray(binding_np)

    def naive(frames):
        om = frames.orient_mat[binding]
        sc = frames.scaling[binding]
        ce = frames.center[binding]
        fq = quat_normalize(frames.orient_quat[binding])
        xyz = jnp.einsum("nij,nj->ni", om, m.params.xyz,
                         precision=jax.lax.Precision.HIGHEST)
        means = xyz * sc + ce
        scl = jnp.exp(m.params.scaling) * sc
        qts = quat_multiply(fq, quat_normalize(m.params.rotation))
        return means, scl, qts

    def packed(frames):
        means, scl, qts, _, _ = world_space_gaussians(
            m.params, binding, frames)
        return means, scl, qts

    w = [jnp.asarray(rng.normal(size=s).astype(np.float32))
         for s in ((c, 3), (c, 3), (c, 4))]

    for a, b in zip(packed(frames), naive(frames)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    def loss(fn):
        return lambda fr: sum(jnp.sum(x * y) for x, y in zip(fn(fr), w))

    g1 = jax.grad(loss(packed))(frames)
    g2 = jax.grad(loss(naive))(frames)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_sorted_frame_gather_transposes_agree():
    """All three frame-gather cotangent paths produce the same d_table:
    random scatter (_gather_frames), full-length cumsum (max_seg=None),
    and the segment-bounded shift-add (static max_seg). Dead
    capacity-padding cotangents are structurally ignored by the sorted
    paths."""
    from gaussianavatars_tpu.models.gaussians import (
        _gather_frames, _gather_frames_sorted,
    )

    rng = np.random.default_rng(11)
    f, cap = 37, 256
    counts = rng.integers(1, 12, f)            # max_seg bound 16
    binding_live = np.repeat(np.arange(f, dtype=np.int32), counts)
    n = len(binding_live)
    binding = np.zeros(cap, np.int32)
    binding[:n] = binding_live
    ends = np.cumsum(counts, dtype=np.int64) - 1
    table = jnp.asarray(rng.normal(size=(f, 17)).astype(np.float32))
    g_live = rng.normal(size=(cap, 17)).astype(np.float32)
    g_live[n:] = 0.0
    bindd = jnp.asarray(binding)
    endsd = jnp.asarray(ends, jnp.int32)

    def grad_of(fn):
        return jax.grad(
            lambda t: jnp.sum(fn(t) * jnp.asarray(g_live)))(table)

    d_scatter = grad_of(lambda t: _gather_frames(t, bindd))
    d_cumsum = grad_of(
        lambda t: _gather_frames_sorted(t, bindd, endsd, None))
    d_shift = grad_of(
        lambda t: _gather_frames_sorted(t, bindd, endsd, 16))
    np.testing.assert_allclose(d_cumsum, d_scatter, atol=1e-5)
    np.testing.assert_allclose(d_shift, d_scatter, atol=1e-5)

    # garbage cotangents in the dead tail do not leak into any face for
    # the sorted paths (the scatter path would add them to face 0 — the
    # pipeline's active mask guarantees zeros there instead)
    g_dirty = g_live.copy()
    g_dirty[n:] = rng.normal(size=(cap - n, 17))
    d_dirty = jax.grad(
        lambda t: jnp.sum(_gather_frames_sorted(t, bindd, endsd, 16)
                          * jnp.asarray(g_dirty)))(table)
    np.testing.assert_allclose(d_dirty, d_scatter, atol=1e-5)


def test_sorted_frame_gather_tiny_f_dirty_tail():
    """F=1 aliasing case (ADVICE r4): the dead tail's binding of 0 equals
    face 0's id and sits within shift distance of its run — dirty tail
    cotangents must NOT leak into d_table[0]."""
    from gaussianavatars_tpu.models.gaussians import _gather_frames_sorted

    rng = np.random.default_rng(3)
    cap, n = 32, 3                              # face 0 run: slots 0..2
    binding = jnp.zeros(cap, jnp.int32)
    ends = jnp.asarray([n - 1], jnp.int32)
    table = jnp.asarray(rng.normal(size=(1, 17)).astype(np.float32))
    g = rng.normal(size=(cap, 17)).astype(np.float32)

    d = jax.grad(
        lambda t: jnp.sum(_gather_frames_sorted(t, binding, ends, 16)
                          * jnp.asarray(g)))(table)
    np.testing.assert_allclose(np.asarray(d), g[:n].sum(0, keepdims=True),
                               atol=1e-5)


def test_cache_token_is_unique_across_lifetimes():
    """Eval render-fn caches key on cache_token, not id(): id() values
    recycle after GC, which could resurrect a stale capacity closure."""
    tokens = set()
    for _ in range(8):
        m = GaussianModel(sh_degree=1, capacity_granularity=64)
        assert m.cache_token not in tokens
        tokens.add(m.cache_token)
        del m  # a recycled id() would collide here; tokens never do


def _radii_prune_model():
    """Model with one oversized-on-screen gaussian and no other densify
    triggers (no high grads, everything opaque, world scales small)."""
    m = make_model(n=100)
    mu, nu, count = optim.init(m.params)
    state = AdamState(mu=mu, nu=nu, count=count)
    m.xyz_gradient_accum = jnp.zeros(128)
    m.denom = jnp.ones(128)
    radii = np.zeros(128, np.float32)
    radii[7] = 50.0                      # > max_screen_size = 20
    m.max_radii2d = jnp.asarray(radii)
    opacity = np.full((128, 1), 3.0, np.float32)  # sigmoid ~ 0.95
    m.params = m.params._replace(opacity=jnp.asarray(opacity))
    return m, state


def test_screen_size_prune_reference_semantics():
    """Default mode reproduces the reference's literal behavior: the
    screen-size test never fires, because the reference zeroes max_radii2D
    in densification_postfix (scene/gaussian_model.py:441-443) before
    densify_and_prune reads it (:505-509)."""
    m, state = _radii_prune_model()
    n_before = m.n_alive
    m.densify_and_prune(
        state, max_grad=0.5, min_opacity=0.005, extent=1e6,
        max_screen_size=20, percent_dense=0.01,
    )
    assert m.n_alive == n_before  # big-radii gaussian survives

    # "effective" mode actually prunes on the pre-densify radii
    m, state = _radii_prune_model()
    n_before = m.n_alive
    m.densify_and_prune(
        state, max_grad=0.5, min_opacity=0.005, extent=1e6,
        max_screen_size=20, percent_dense=0.01,
        screen_size_prune="effective",
    )
    assert m.n_alive == n_before - 1


def test_densify_binding_guard():
    """A face must never lose its last gaussian."""
    m = GaussianModel(sh_degree=1, capacity_granularity=64)
    m.binding = np.arange(10, dtype=np.int32)
    m.binding_counter = np.ones(10, np.int32)
    m.create_from_pcd(None, None, spatial_lr_scale=1.0)
    mu, nu, count = optim.init(m.params)
    state = AdamState(mu=mu, nu=nu, count=count)

    # make everything transparent -> naive prune would empty all faces
    opacity = np.full((64, 1), -10.0, np.float32)
    m.params = m.params._replace(opacity=jnp.asarray(opacity))
    m.xyz_gradient_accum = jnp.zeros(64)
    m.denom = jnp.ones(64)
    m.max_radii2d = jnp.zeros(64)

    face_scaling = np.ones((10, 1), np.float32)
    m.densify_and_prune(
        state, max_grad=0.5, min_opacity=0.005, extent=10.0,
        max_screen_size=None, percent_dense=0.01, face_scaling=face_scaling,
    )
    assert m.n_alive == 10  # guard kept one per face
    counter = np.zeros(10, np.int32)
    np.add.at(counter, m.binding[:m.n_alive], 1)
    assert (counter >= 1).all()


def test_reset_opacity():
    m = make_model(n=50)
    mu, nu, count = optim.init(m.params)
    state = AdamState(mu=mu, nu=nu, count=count)
    state = m.reset_opacity(state)
    opac = jax.nn.sigmoid(np.asarray(m.params.opacity)[:50])
    assert (opac <= 0.01 + 1e-6).all()
    assert float(jnp.abs(state.mu.opacity).max()) == 0.0


def test_capture_restore_roundtrip():
    m = make_model(n=70)
    mu, nu, count = optim.init(m.params)
    state = AdamState(mu=mu, nu=nu, count=jnp.asarray(5, jnp.int32))
    data = m.capture(state)

    m2 = GaussianModel(sh_degree=2, capacity_granularity=64)
    state2 = m2.restore(data)
    assert m2.n_alive == 70
    np.testing.assert_array_equal(
        np.asarray(m.params.xyz)[:70], np.asarray(m2.params.xyz)[:70]
    )
    assert int(state2.count) == 5


def test_restore_migrates_kmajor_checkpoint():
    """Checkpoints saved before the channel-major features_rest layout
    (no features_rest_layout field) hold coeff-major [N, (K-1)*3] data;
    restore() must transpose it instead of silently corrupting SH colors
    (ADVICE r4, medium)."""
    m = make_model(n=16)
    mu, nu, count = optim.init(m.params)
    state = AdamState(mu=mu, nu=nu, count=jnp.asarray(1, jnp.int32))
    data = m.capture(state)
    assert str(np.asarray(data["features_rest_layout"])) == "cmajor"
    km = m.n_sh_coeffs - 1

    def to_kmajor(a):
        return np.asarray(a).reshape(-1, 3, km).transpose(0, 2, 1).reshape(
            -1, km * 3)

    legacy = dict(data)
    del legacy["features_rest_layout"]
    for k in ("param_features_rest", "mu_features_rest", "nu_features_rest"):
        legacy[k] = to_kmajor(legacy[k])

    m2 = GaussianModel(sh_degree=2, capacity_granularity=64)
    m2.restore(legacy)
    n = m.n_alive
    np.testing.assert_array_equal(
        np.asarray(m.params.features_rest)[:n],
        np.asarray(m2.params.features_rest)[:n])


def test_ply_header_matches_reference_layout(tmp_path):
    """Pin the saved PLY header to the EXACT reference attribute order
    (scene/gaussian_model.py:236-275): x y z nx ny nz, f_dc_{0..2},
    f_rest_{...}, opacity, scale_{0..2}, rot_{0..3}, binding_0 — binary
    little-endian f4 throughout. Reference-trained avatars and ours must
    interchange byte-layout-wise."""
    from gaussianavatars_tpu.models.gaussians import GaussianModel

    m = GaussianModel(sh_degree=1, capacity_granularity=64)
    rng = np.random.default_rng(0)
    pcd = rng.normal(size=(10, 3)).astype(np.float32)
    colors = rng.random((10, 3)).astype(np.float32)
    m.create_from_pcd(pcd, colors, spatial_lr_scale=1.0)
    path = str(tmp_path / "pc.ply")
    m.save_ply(path)

    header = open(path, "rb").read(2048).split(b"end_header")[0]
    lines = header.decode().splitlines()
    assert lines[0] == "ply"
    assert "format binary_little_endian 1.0" in lines
    props = [ln.split()[-1] for ln in lines if ln.startswith("property")]
    ptypes = {ln.split()[-1]: ln.split()[1] for ln in lines
              if ln.startswith("property")}
    want = (["x", "y", "z", "nx", "ny", "nz"]
            + [f"f_dc_{i}" for i in range(3)]
            + [f"f_rest_{i}" for i in range(9)]   # (sh1: (4-1)*3 rest)
            + ["opacity"]
            + [f"scale_{i}" for i in range(3)]
            + [f"rot_{i}" for i in range(4)])
    assert props == want, props
    assert all(t == "float" for t in ptypes.values()), ptypes

    # bound model additionally carries binding_0 as the LAST column
    import tempfile

    import __graft_entry__ as GE

    fm = GE._build_tiny_model(tempfile.mkdtemp(dir=tmp_path),
                              capacity_granularity=16384)
    path2 = str(tmp_path / "pc_bound.ply")
    fm.save_ply(path2)
    header2 = open(path2, "rb").read(4096).split(b"end_header")[0].decode()
    props2 = [ln.split()[-1] for ln in header2.splitlines()
              if ln.startswith("property")]
    assert props2[-1] == "binding_0"
    assert props2[:6] == ["x", "y", "z", "nx", "ny", "nz"]
