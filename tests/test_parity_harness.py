"""tools/parity_vs_reference.py: structural checks + dump-compare logic.

The real reference artifacts are downloads, so CI exercises the harness on
synthetic assets (same topology dimensions) and on fabricated dumps; the
real-asset run is documented in the tool's docstring / README.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import parity_vs_reference as pvr  # noqa: E402


def test_check_assets_on_synthetic(tmp_path):
    """Synthetic assets share the real topology dims, so every structural
    invariant (counts, teeth checksum) must hold on them too."""
    from tests.flame_fixtures import make_flame_assets

    make_flame_assets(str(tmp_path))
    assert pvr.check_assets(str(tmp_path))


def test_exchange_cameras_deterministic():
    a = pvr.exchange_cameras()
    b = pvr.exchange_cameras()
    assert len(a) == pvr.N_VIEWS
    for ca, cb in zip(a, b):
        np.testing.assert_array_equal(
            np.asarray(ca["full_proj_transform"]),
            np.asarray(cb["full_proj_transform"]),
        )
    # distinct views
    assert not np.allclose(
        np.asarray(a[0]["world_view_transform"]),
        np.asarray(a[3]["world_view_transform"]),
    )


def _fake_dump(d, rng, perturb=0.0):
    os.makedirs(d, exist_ok=True)
    for i in range(pvr.N_VIEWS):
        img = rng.random((3, 8, 8)).astype(np.float32)
        if perturb:
            img = img + perturb
        np.save(os.path.join(d, f"view_{i}.npy"), img)
    g = {k: rng.normal(size=(16, 3)).astype(np.float32) + perturb
         for k in ("d_xyz", "d_opacity", "d_scaling", "d_rotation",
                   "d_f_dc")}
    np.savez(os.path.join(d, "grads.npz"), **g)


def test_compare_accepts_identical_and_rejects_divergent(tmp_path):
    a, b, c = (str(tmp_path / n) for n in "abc")
    rng = np.random.default_rng(0)
    _fake_dump(a, np.random.default_rng(1))
    _fake_dump(b, np.random.default_rng(1))          # identical content
    _fake_dump(c, np.random.default_rng(1), perturb=0.25)  # diverged
    assert pvr.compare(a, b)
    assert not pvr.compare(a, c)
