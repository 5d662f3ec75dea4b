"""The shared bench protocol module (gaussianavatars_tpu/benchmark.py)."""

import numpy as np

from gaussianavatars_tpu import benchmark as bm


def test_scene_and_model_builders():
    scene = bm.make_bench_scene(n=512)
    assert scene["means3d"].shape == (512, 3)
    assert scene["shs"].shape == (512, 16, 3)
    model = bm.scene_to_model(scene)
    assert model.n_alive == 512
    assert model.active_sh_degree == bm.SH_DEGREE
    # round-trip: activations recover the scene values
    np.testing.assert_allclose(
        np.exp(np.asarray(model.params.scaling)),
        np.asarray(scene["scales"]), rtol=1e-5)


def test_bound_bench_model_small():
    m = bm.make_bound_bench_model(sh_degree=1, n_per_face=1, num_timesteps=2)
    assert m.binding is not None
    f = m.flame_model.faces.shape[0]
    assert m.n_alive == f          # one gaussian per face
    assert m.binding_counter.sum() == f
    assert m.num_timesteps == 2
    # world statistics target the canonical cloud's scale distribution
    frames = m.face_frames_at(m.flame_param, 0)
    world = (np.exp(np.asarray(m.params.scaling[:f]))
             * np.asarray(frames.scaling)[np.asarray(m.binding[:f])])
    log_mean = np.log(world).mean()
    assert -6.5 < log_mean < -4.0  # ~exp(N(-5.2, 0.4))


def test_run_rounds_counts_iterations():
    calls = []

    def dispatch(salt):
        calls.append(salt)
        return salt

    ips = bm.run_rounds(dispatch, list(range(10)), n_iter=10, n_rounds=2,
                        block=lambda v: None)
    assert len(calls) == 20
    assert ips > 0
