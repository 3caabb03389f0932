"""Native C++ velodyne projector vs the numpy reference implementation."""

import numpy as np
import pytest

from ssde_tpu.native import get_lib, project_velodyne_native


def numpy_project(velo, P, height, width, vel_depth=False):
    velo = velo[velo[:, 0] >= 0, :]
    pts_im = (P @ velo.T).T
    keep = pts_im[:, 2] > 0
    pts_im, velo = pts_im[keep], velo[keep]
    uv = pts_im[:, :2] / pts_im[:, 2:3]
    depth_vals = velo[:, 0] if vel_depth else pts_im[:, 2]
    cols = np.round(uv[:, 0]) - 1
    rows = np.round(uv[:, 1]) - 1
    valid = ((cols >= 0) & (rows >= 0) & (cols < width) & (rows < height)
             & (depth_vals > 0))
    cols = cols[valid].astype(np.int64)
    rows = rows[valid].astype(np.int64)
    depth_vals = depth_vals[valid]
    out = np.zeros((height, width), np.float32)
    order = np.lexsort((-depth_vals, rows * width + cols))
    rows, cols, depth_vals = rows[order], cols[order], depth_vals[order]
    out[rows, cols] = depth_vals
    return out


@pytest.fixture
def scene(rng):
    n = 5000
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = rng.rand(n) * 60 + 0.5          # forward
    pts[:, 1] = rng.randn(n) * 8                # left/right
    pts[:, 2] = rng.randn(n) * 2                # up/down
    pts[:, 3] = 1.0
    pts[: n // 10, 0] *= -1                     # some behind-camera points
    # velo (x fwd, y left, z up) -> cam (x right, y down, z fwd), then K
    Rt = np.array(
        [[0.0, -1.0, 0.0, 0.05],
         [0.0, 0.0, -1.0, -0.05],
         [1.0, 0.0, 0.0, 0.3]], dtype=np.float64,
    )
    K = np.array(
        [[700.0, 0.0, 600.0],
         [0.0, 700.0, 180.0],
         [0.0, 0.0, 1.0]], dtype=np.float64,
    )
    return pts, K @ Rt


def test_native_builds():
    assert get_lib() is not None, "native library failed to build"


def test_native_matches_numpy(scene):
    pts, P = scene
    h, w = 375, 1242
    native = project_velodyne_native(pts, P, h, w)
    assert native is not None
    ref = numpy_project(pts, P, h, w)
    np.testing.assert_allclose(native, ref, atol=1e-4)
    assert (native > 0).sum() > 100  # scene actually hits the image


def test_native_vel_depth(scene):
    pts, P = scene
    h, w = 375, 1242
    native = project_velodyne_native(pts, P, h, w, vel_depth=True)
    ref = numpy_project(pts, P, h, w, vel_depth=True)
    np.testing.assert_allclose(native, ref, atol=1e-4)
