"""Synthetic FLAME-like assets for testing (real assets are user downloads).

Generates a pickle + template OBJ with the real FLAME dimensions (5023
verts, 9976 faces, 5 joints, 300+100 blendshape dims) so the topology
constants (lip rings, teeth augmentation) are exercised for real, just with
random geometry/bases.
"""

import os
import pickle

import numpy as np

V = 5023
F = 9976
J = 5
SHAPE_DIMS = 400  # 300 shape + 100 expr


def make_flame_assets(dirpath, seed=0, v=V, f=F):
    rng = np.random.default_rng(seed)
    os.makedirs(dirpath, exist_ok=True)

    # Head-like surface with LOCAL triangles: vertices along a spiral on a
    # ~0.1-radius sphere, faces connecting spiral neighbors across turns
    # (grid triangulation). This matters: a real FLAME mesh has ~3-8 mm
    # triangles, and the standard bound init (local scale 1 x face scale)
    # inherits that unit — random all-to-all connectivity gave ~0.24-unit
    # "triangles" whose init splats covered the whole frame and blew the
    # binning's full-grid level on any realistic protocol.
    w = 62                      # spiral windings; ~81 points per turn
    t = (np.arange(v) + 0.5) / v
    z = 1.0 - 2.0 * t
    r_xy = np.sqrt(np.maximum(1.0 - z * z, 1e-6))
    phi = 2.0 * np.pi * w * t
    sphere = np.stack(
        [r_xy * np.cos(phi), r_xy * np.sin(phi), z], axis=1)
    v_template = (0.1 * sphere + rng.normal(0, 0.002, (v, 3))
                  ).astype(np.float64)
    k = v // w                  # index stride of one spiral turn
    i = np.arange(v - k - 1)
    grid = np.concatenate([
        np.stack([i, i + 1, i + k], axis=1),
        np.stack([i + 1, i + k + 1, i + k], axis=1),
    ])
    extra = f - len(grid)
    assert extra >= 0
    j = np.arange(extra)
    faces = np.concatenate(
        [grid, np.stack([j, j + 2, j + k + 1], axis=1)])[:f]

    # FLAME chain: root(global) -> neck -> jaw, eyes under neck
    kintree = np.zeros((2, J), np.int64)
    kintree[0] = [-1, 0, 1, 1, 1]
    kintree[1] = np.arange(J)

    weights = rng.random((v, J))
    weights /= weights.sum(1, keepdims=True)

    model = dict(
        v_template=v_template,
        # blendshape magnitudes scaled to the local triangle size (~6e-3):
        # per-vertex iid displacements larger than an edge would mangle
        # the surface (real FLAME bases are spatially smooth instead)
        shapedirs=rng.normal(0, 5e-4, (v, 3, SHAPE_DIMS)),
        posedirs=rng.normal(0, 5e-5, (v, 3, (J - 1) * 9)),
        J_regressor=np.abs(rng.normal(0, 1, (J, v))) / v,
        kintree_table=kintree,
        weights=weights,
        f=faces,
    )
    pkl_path = os.path.join(dirpath, "flame2023.pkl")
    with open(pkl_path, "wb") as fh:
        pickle.dump(model, fh)

    # template OBJ with matching topology + a trivial UV per vertex
    obj_path = os.path.join(dirpath, "head_template_mesh.obj")
    with open(obj_path, "w") as fh:
        for p in v_template:
            fh.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        for i in range(v):
            fh.write(f"vt {((i % 97) / 97):.6f} {((i % 89) / 89):.6f}\n")
        for tri in faces:
            fh.write(
                f"f {tri[0]+1}/{tri[0]+1} {tri[1]+1}/{tri[1]+1} "
                f"{tri[2]+1}/{tri[2]+1}\n"
            )

    # landmark embedding
    lmk = dict(
        full_lmk_faces_idx=rng.integers(0, f, (1, 70)),
        full_lmk_bary_coords=rng.dirichlet(np.ones(3), (1, 70)),
    )
    np.save(os.path.join(dirpath, "landmark_embedding_with_eyes.npy"),
            np.array(lmk, dtype=object), allow_pickle=True)

    return dict(
        model=pkl_path, obj=obj_path,
        lmk=os.path.join(dirpath, "landmark_embedding_with_eyes.npy"),
    )
