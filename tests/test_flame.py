"""FLAME head + LBS correctness on synthetic assets."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussianavatars_tpu.models.flame import FlameHead, _teeth_strip_faces
from gaussianavatars_tpu.ops.lbs import (
    batch_rodrigues,
    batch_rigid_transform,
    blend_shapes,
    lbs,
    vertices2joints,
)

from .flame_fixtures import make_flame_assets


@pytest.fixture(scope="module")
def flame(tmp_path_factory):
    d = tmp_path_factory.mktemp("flame_assets")
    paths = make_flame_assets(str(d))
    return FlameHead(
        shape_params=300, expr_params=100,
        flame_model_path=paths["model"],
        flame_lmk_embedding_path=paths["lmk"],
        flame_template_mesh_path=paths["obj"],
        flame_parts_path="/nonexistent",
        add_teeth=True,
    )


class TestLBSCore:
    def test_rodrigues_vs_scipy(self):
        from scipy.spatial.transform import Rotation

        rng = np.random.default_rng(0)
        vecs = rng.normal(0, 1, (16, 3)).astype(np.float32)
        ours = np.asarray(batch_rodrigues(jnp.asarray(vecs)))
        theirs = Rotation.from_rotvec(vecs + 1e-8).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_rigid_transform_chain(self):
        """Independent dense reconstruction of the kinematic chain."""
        rng = np.random.default_rng(1)
        parents = [-1, 0, 1, 1, 1]
        joints = rng.normal(0, 1, (2, 5, 3)).astype(np.float32)
        from scipy.spatial.transform import Rotation

        rotm = Rotation.random(10, random_state=2).as_matrix().reshape(
            2, 5, 3, 3
        ).astype(np.float32)

        posed, rel = batch_rigid_transform(
            jnp.asarray(rotm), jnp.asarray(joints), parents
        )
        posed, rel = np.asarray(posed), np.asarray(rel)

        # brute force: global transform per joint via explicit recursion
        for b in range(2):
            globals_ = {}
            for j in range(5):
                local = np.eye(4, dtype=np.float32)
                local[:3, :3] = rotm[b, j]
                t = joints[b, j] if j == 0 else joints[b, j] - joints[b, parents[j]]
                local[:3, 3] = t
                globals_[j] = local if j == 0 else globals_[parents[j]] @ local
                np.testing.assert_allclose(
                    posed[b, j], globals_[j][:3, 3], atol=1e-4
                )
                # rel transform: rel = G - [0 | G @ [j_rest; 0]]
                corr = globals_[j] @ np.concatenate([joints[b, j], [0.0]])
                expect = globals_[j].copy()
                expect[:, 3] = expect[:, 3] - corr
                np.testing.assert_allclose(rel[b, j], expect, atol=1e-4)

    def test_lbs_identity_pose(self):
        rng = np.random.default_rng(3)
        v = rng.normal(0, 1, (1, 50, 3)).astype(np.float32)
        posedirs = rng.normal(0, 0.01, (36, 150)).astype(np.float32)
        jreg = np.abs(rng.normal(0, 1, (5, 50)).astype(np.float32)) / 50
        w = rng.random((50, 5)).astype(np.float32)
        w /= w.sum(1, keepdims=True)
        pose = jnp.zeros((1, 15))
        verts, joints, _ = lbs(
            pose, jnp.asarray(v), jnp.asarray(posedirs), jnp.asarray(jreg),
            [-1, 0, 1, 1, 1], jnp.asarray(w),
        )
        # zero pose: identity rotations => verts == v (pose offsets are zero
        # because pose_feature = R - I = 0)
        np.testing.assert_allclose(np.asarray(verts), v, atol=1e-5)

    def test_lbs_global_rotation_is_rigid(self):
        rng = np.random.default_rng(4)
        v = rng.normal(0, 1, (1, 50, 3)).astype(np.float32)
        posedirs = rng.normal(0, 0.01, (36, 150)).astype(np.float32)
        jreg = np.abs(rng.normal(0, 1, (5, 50)).astype(np.float32)) / 50
        jreg /= jreg.sum(1, keepdims=True)
        w = rng.random((50, 5)).astype(np.float32)
        w /= w.sum(1, keepdims=True)
        aa = np.array([[0.3, -0.2, 0.5]], np.float32)
        pose = jnp.concatenate([jnp.asarray(aa), jnp.zeros((1, 12))], axis=1)
        verts, joints, _ = lbs(
            pose, jnp.asarray(v), jnp.asarray(posedirs), jnp.asarray(jreg),
            [-1, 0, 1, 1, 1], jnp.asarray(w),
        )
        from scipy.spatial.transform import Rotation

        R = Rotation.from_rotvec(aa[0] + 1e-8).as_matrix()
        root = np.asarray(vertices2joints(jnp.asarray(jreg), jnp.asarray(v)))[0, 0]
        expect = (v[0] - root) @ R.T + root
        np.testing.assert_allclose(np.asarray(verts)[0], expect, atol=1e-4)


class TestTeethStrips:
    def test_counts_and_ranges(self):
        f_up, f_low = _teeth_strip_faces()
        assert f_up.shape == (84, 3) and f_low.shape == (84, 3)
        assert f_up.min() >= 0 and f_up.max() < 120
        # no degenerate faces
        for f in (f_up, f_low):
            assert (f[:, 0] != f[:, 1]).all()
            assert (f[:, 1] != f[:, 2]).all()
            assert (f[:, 0] != f[:, 2]).all()

    def test_spot_checks_match_reference_tables(self):
        """Spot-check triples against the reference's hand-enumerated
        tables (flame_model/flame.py:308-479) at starts, ends and the
        center-flip of every strip."""
        f_up, f_low = _teeth_strip_faces()
        # upper front strip: faces 0..27
        assert f_up[0].tolist() == [0, 31, 30]
        assert f_up[1].tolist() == [0, 1, 31]
        assert f_up[13].tolist() == [6, 7, 37]
        assert f_up[14].tolist() == [7, 8, 37]
        assert f_up[15].tolist() == [8, 38, 37]
        assert f_up[27].tolist() == [14, 44, 43]
        # upper back strip: faces 28..55
        assert f_up[28].tolist() == [60, 75, 76]
        assert f_up[42].tolist() == [67, 82, 68]
        assert f_up[55].tolist() == [74, 88, 89]
        # upper rim strip: faces 56..83
        assert f_up[56].tolist() == [75, 30, 76]
        assert f_up[70].tolist() == [82, 37, 38]
        assert f_up[83].tolist() == [88, 44, 89]
        # lower front: 0..27
        assert f_low[0].tolist() == [45, 46, 15]
        assert f_low[14].tolist() == [52, 23, 22]
        assert f_low[27].tolist() == [58, 59, 29]
        # lower back: 28..55
        assert f_low[28].tolist() == [90, 106, 105]
        assert f_low[42].tolist() == [97, 98, 112]
        assert f_low[55].tolist() == [104, 119, 118]
        # lower rim: 56..83
        assert f_low[56].tolist() == [105, 106, 45]
        assert f_low[70].tolist() == [112, 53, 52]
        assert f_low[83].tolist() == [118, 119, 59]


class TestFlameHead:
    def test_topology_counts(self, flame):
        assert flame.num_verts == 5023 + 120
        assert flame.num_faces == 9976 + 168
        assert flame.shapedirs.shape == (5143, 3, 400)
        assert flame.lbs_weights.shape == (5143, 5)
        # teeth skinning assignment
        m = flame.mask
        up = m.v["teeth_upper"]
        low = m.v["teeth_lower"]
        assert (flame.lbs_weights[up, 1] == 1.0).all()
        assert (flame.lbs_weights[low, 2] == 1.0).all()

    def test_forward_shapes_and_translation(self, flame):
        b = 1
        out = flame.forward(
            jnp.zeros((b, 300)), jnp.zeros((b, 100)),
            jnp.zeros((b, 3)), jnp.zeros((b, 3)), jnp.zeros((b, 3)),
            jnp.zeros((b, 6)), jnp.asarray([[0.1, 0.2, 0.3]]),
            return_landmarks=True, return_verts_cano=True,
        )
        verts, cano, lmks = out
        assert verts.shape == (1, 5143, 3)
        assert lmks.shape == (1, 70, 3)
        np.testing.assert_allclose(
            np.asarray(verts), np.asarray(cano) + np.asarray([0.1, 0.2, 0.3]),
            atol=1e-5,
        )

    def test_shape_blend(self, flame):
        b = 1
        shape = jnp.zeros((b, 300)).at[0, 5].set(2.0)
        verts = flame.forward(
            shape, jnp.zeros((b, 100)),
            jnp.zeros((b, 3)), jnp.zeros((b, 3)), jnp.zeros((b, 3)),
            jnp.zeros((b, 6)), jnp.zeros((b, 3)),
            return_landmarks=False,
        )
        base = flame.forward(
            jnp.zeros((b, 300)), jnp.zeros((b, 100)),
            jnp.zeros((b, 3)), jnp.zeros((b, 3)), jnp.zeros((b, 3)),
            jnp.zeros((b, 6)), jnp.zeros((b, 3)),
            return_landmarks=False,
        )
        diff = np.asarray(verts - base)
        expect = 2.0 * flame.shapedirs[:, :, 5]
        np.testing.assert_allclose(diff[0], expect, atol=1e-5)

    def test_jaw_moves_lower_teeth_only(self, flame):
        b = 1
        jaw = jnp.asarray([[0.4, 0.0, 0.0]])
        verts = flame.forward(
            jnp.zeros((b, 300)), jnp.zeros((b, 100)),
            jnp.zeros((b, 3)), jnp.zeros((b, 3)), jaw,
            jnp.zeros((b, 6)), jnp.zeros((b, 3)),
            return_landmarks=False,
        )
        base = flame.forward(
            jnp.zeros((b, 300)), jnp.zeros((b, 100)),
            jnp.zeros((b, 3)), jnp.zeros((b, 3)), jnp.zeros((b, 3)),
            jnp.zeros((b, 6)), jnp.zeros((b, 3)),
            return_landmarks=False,
        )
        diff = np.abs(np.asarray(verts - base))[0]
        low = flame.mask.v["teeth_lower"]
        up = flame.mask.v["teeth_upper"]
        assert diff[low].max() > 1e-4       # lower teeth follow the jaw
        assert diff[up].max() < 1e-6        # upper teeth pinned to neck

    def test_laplacian_zero_on_constant(self, flame):
        verts = jnp.ones((1, flame.num_verts, 3))
        lap = flame.laplacian_smooth(verts)
        np.testing.assert_allclose(np.asarray(lap), 0.0, atol=1e-5)

    def test_forward_is_differentiable(self, flame):
        def f(expr):
            v = flame.forward(
                jnp.zeros((1, 300)), expr,
                jnp.zeros((1, 3)), jnp.zeros((1, 3)), jnp.zeros((1, 3)),
                jnp.zeros((1, 6)), jnp.zeros((1, 3)),
                return_landmarks=False,
            )
            return jnp.sum(v**2)

        g = jax.grad(f)(jnp.ones((1, 100)) * 0.1)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


class TestReferencePinning:
    """Recorded-value pins against the reference's enumerated tables
    (VERDICT r1 items 5/6): the reference hand-enumerates 168 teeth faces
    (flame_model/flame.py:308-479); our procedural strips must reproduce
    them EXACTLY or saved bindings won't transfer."""

    # sha256 over int64 bytes of concat(f_teeth_upper, f_teeth_lower),
    # recorded once from the reference tables
    TEETH_FACES_SHA256 = (
        "c68158e59906bf9dd28654a0058caa7b60d8ee7561590de4b405aa78ec6dbd13"
    )

    def test_teeth_faces_checksum(self):
        import hashlib

        from gaussianavatars_tpu.models.flame import _teeth_strip_faces

        fu, fl = _teeth_strip_faces()
        assert fu.shape == (84, 3) and fl.shape == (84, 3)
        h = hashlib.sha256(
            np.ascontiguousarray(
                np.concatenate([fu, fl])).astype(np.int64).tobytes()
        ).hexdigest()
        assert h == self.TEETH_FACES_SHA256

    def test_teeth_uv_grid(self, flame):
        # reference flame.py:273-279: 15x8 grid with the permuted v rows
        u = np.linspace(0.62, 0.38, 15, dtype=np.float32)
        vv = np.linspace(1 - 0.0083, 1 - 0.0425, 7, dtype=np.float32)
        vv = vv[[3, 2, 0, 1, 3, 4, 6, 5]]
        uv = np.stack(np.meshgrid(u, vv, indexing="ij"), axis=-1)
        uv = uv.transpose(1, 0, 2).reshape(120, 2)
        got = np.asarray(flame.verts_uvs[-120:])
        np.testing.assert_allclose(got, uv, atol=1e-6)

    def test_mask_tables_complete(self, flame):
        # the ~20 hand-curated regions must all be present with the
        # reference cardinalities (flame.py:643-814)
        expect = {
            "neck_top": 34, "lip_inside_ring_upper": 15,
            "lip_inside_ring_lower": 15, "lip_outside_ring_upper": 15,
            "lip_outside_ring_lower": 15, "lip_inside_upper": 51,
            "lip_inside_lower": 45, "lip_inside": 128, "neck_upper": 149,
            "neck_lower": 130, "neck_base": 21, "bottomline": 30,
            "left_iris": 97, "right_iris": 97,
            # halves include the 64/63-entry teeth extensions
            "left_half": 2569 + 64, "right_half": 2569 + 63,
        }
        for name, count in expect.items():
            assert name in flame.mask.v, name
            assert len(flame.mask.v[name]) == count, (
                name, len(flame.mask.v[name]), count)
        for name in ("left_eyelid", "right_eyelid", "eyelids", "lips_tight",
                     "irises", "teeth", "teeth_upper", "teeth_lower"):
            assert name in flame.mask.v, name

    def test_halves_cover_teeth(self, flame):
        halves = np.union1d(flame.mask.v["left_half"],
                            flame.mask.v["right_half"])
        teeth = flame.mask.v["teeth"]
        missing = np.setdiff1d(teeth, halves)
        # the reference's right_half teeth extension itself skips vertex
        # 5096 (flame.py:267 lists ...5095, 5097...); we reproduce the
        # tables verbatim, quirk included
        assert missing.tolist() == [5096], missing

    def test_face_clusters_lookup(self, flame):
        from gaussianavatars_tpu.models.flame import FlameMask

        m = FlameMask(
            faces=np.asarray(flame.faces),
            num_verts=flame.num_verts,
            face_clusters=("lip_inside", "left_iris"),
        )
        assert m.fid2cid.shape == (m.num_faces + 1,)
        # cluster ids: 1 default, 2 for lip_inside faces, 3 for left_iris
        assert set(np.unique(m.fid2cid)) <= {1, 2, 3}
        assert (m.fid2cid[m.f["lip_inside"]] >= 2).all()
        assert (m.fid2cid[m.f["left_iris"]] == 3).all()
