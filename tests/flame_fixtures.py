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

    v_template = rng.normal(0, 0.1, (v, 3)).astype(np.float64)
    faces = rng.integers(0, v, (f, 3))
    # ensure non-degenerate triples
    bad = (faces[:, 0] == faces[:, 1]) | (faces[:, 1] == faces[:, 2]) | (
        faces[:, 0] == faces[:, 2]
    )
    faces[bad] = np.stack(
        [np.arange(bad.sum()) % v, (np.arange(bad.sum()) + 1) % v,
         (np.arange(bad.sum()) + 2) % v], axis=1
    )

    # FLAME chain: root(global) -> neck -> jaw, eyes under neck
    kintree = np.zeros((2, J), np.int64)
    kintree[0] = [-1, 0, 1, 1, 1]
    kintree[1] = np.arange(J)

    weights = rng.random((v, J))
    weights /= weights.sum(1, keepdims=True)

    model = dict(
        v_template=v_template,
        shapedirs=rng.normal(0, 0.01, (v, 3, SHAPE_DIMS)),
        posedirs=rng.normal(0, 0.001, (v, 3, (J - 1) * 9)),
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
