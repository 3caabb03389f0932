"""Golden-value tests for ssde_tpu.ops.geometry against the reference formulas.

Torch (CPU) is used only to evaluate the published Monodepth2 math
(Rodrigues, backproject/project) as an independent oracle.
"""

import numpy as np
import jax.numpy as jnp
import torch
import pytest

from ssde_tpu.ops import (
    disp_to_depth,
    depth_to_disp,
    rot_from_axisangle,
    get_translation_matrix,
    transformation_from_parameters,
    backproject_depth,
    project_3d,
    reproject_coords,
)


def torch_rot_from_axisangle(vec):
    angle = torch.norm(vec, 2, 2, True)
    axis = vec / (angle + 1e-7)
    ca, sa = torch.cos(angle), torch.sin(angle)
    C = 1 - ca
    x = axis[..., 0].unsqueeze(1)
    y = axis[..., 1].unsqueeze(1)
    z = axis[..., 2].unsqueeze(1)
    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC
    rot = torch.zeros((vec.shape[0], 4, 4))
    rot[:, 0, 0] = torch.squeeze(x * xC + ca)
    rot[:, 0, 1] = torch.squeeze(xyC - zs)
    rot[:, 0, 2] = torch.squeeze(zxC + ys)
    rot[:, 1, 0] = torch.squeeze(xyC + zs)
    rot[:, 1, 1] = torch.squeeze(y * yC + ca)
    rot[:, 1, 2] = torch.squeeze(yzC - xs)
    rot[:, 2, 0] = torch.squeeze(zxC - ys)
    rot[:, 2, 1] = torch.squeeze(yzC + xs)
    rot[:, 2, 2] = torch.squeeze(z * zC + ca)
    rot[:, 3, 3] = 1
    return rot


def test_disp_to_depth():
    disp = jnp.array([0.0, 0.25, 0.5, 1.0])
    scaled, depth = disp_to_depth(disp, 0.1, 100.0)
    np.testing.assert_allclose(np.asarray(depth[0]), 100.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(depth[-1]), 0.1, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(scaled), 0.01 + (10.0 - 0.01) * np.asarray(disp), rtol=1e-6
    )
    # round trip
    back = depth_to_disp(depth, 0.1, 100.0)
    np.testing.assert_allclose(np.asarray(back), np.asarray(disp), atol=1e-6)


def test_rot_from_axisangle_matches_reference(rng):
    vec = rng.randn(4, 1, 3).astype(np.float32) * 0.3
    ours = np.asarray(rot_from_axisangle(jnp.asarray(vec)))
    ref = torch_rot_from_axisangle(torch.from_numpy(vec)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_rotation_orthonormal(rng):
    vec = rng.randn(8, 3).astype(np.float32)
    R = np.asarray(rot_from_axisangle(jnp.asarray(vec)))[:, :3, :3]
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)


def test_transformation_invert(rng):
    aa = rng.randn(4, 1, 3).astype(np.float32) * 0.2
    t = rng.randn(4, 1, 3).astype(np.float32) * 0.5
    T = np.asarray(transformation_from_parameters(jnp.asarray(aa), jnp.asarray(t)))
    Tinv = np.asarray(
        transformation_from_parameters(jnp.asarray(aa), jnp.asarray(t), invert=True)
    )
    prod = np.einsum("bij,bjk->bik", T, Tinv)
    np.testing.assert_allclose(prod, np.tile(np.eye(4), (4, 1, 1)), atol=1e-5)


def test_translation_matrix():
    t = jnp.array([[1.0, 2.0, 3.0]])
    T = np.asarray(get_translation_matrix(t))
    expected = np.eye(4, dtype=np.float32)
    expected[:3, 3] = [1, 2, 3]
    np.testing.assert_allclose(T[0], expected)


def _intrinsics(batch, height, width):
    K = np.array(
        [[0.58, 0, 0.5, 0], [0, 1.92, 0.5, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        dtype=np.float32,
    )
    K[0] *= width
    K[1] *= height
    inv_K = np.linalg.pinv(K)
    return (
        np.tile(K[None], (batch, 1, 1)),
        np.tile(inv_K[None], (batch, 1, 1)),
    )


def test_backproject_project_identity(rng):
    """Projecting backprojected points with identity pose recovers the pixel grid."""
    B, H, W = 2, 12, 20
    K, inv_K = _intrinsics(B, H, W)
    depth = (rng.rand(B, H, W, 1).astype(np.float32) * 10 + 1.0)
    points = backproject_depth(jnp.asarray(depth), jnp.asarray(inv_K))
    assert points.shape == (B, 4, H * W)
    T = np.tile(np.eye(4, dtype=np.float32)[None], (B, 1, 1))
    pix = np.asarray(project_3d(points, jnp.asarray(K), jnp.asarray(T), H, W))
    xs, ys = np.meshgrid(np.arange(W), np.arange(H))
    ex = (xs / (W - 1) - 0.5) * 2
    ey = (ys / (H - 1) - 0.5) * 2
    np.testing.assert_allclose(pix[..., 0], np.tile(ex[None], (B, 1, 1)), atol=1e-4)
    np.testing.assert_allclose(pix[..., 1], np.tile(ey[None], (B, 1, 1)), atol=1e-4)


def test_reproject_coords_matches_two_step(rng):
    B, H, W = 2, 12, 20
    K, inv_K = _intrinsics(B, H, W)
    depth = (rng.rand(B, H, W, 1).astype(np.float32) * 10 + 1.0)
    aa = rng.randn(B, 1, 3).astype(np.float32) * 0.05
    t = rng.randn(B, 1, 3).astype(np.float32) * 0.1
    T = transformation_from_parameters(jnp.asarray(aa), jnp.asarray(t))
    points = backproject_depth(jnp.asarray(depth), jnp.asarray(inv_K))
    two_step = np.asarray(project_3d(points, jnp.asarray(K), T, H, W))
    fused = np.asarray(
        reproject_coords(jnp.asarray(depth), jnp.asarray(inv_K), jnp.asarray(K), T)
    )
    np.testing.assert_allclose(fused, two_step, atol=1e-4)
