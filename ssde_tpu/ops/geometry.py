"""Differentiable multi-view geometry (pure jnp, NHWC layout).

Functional equivalents of the reference's ``layers.py`` geometry utilities
(reference: layers.py:16-193) re-designed for XLA: no precomputed buffers or
fixed batch sizes — pixel grids are generated inline and constant-folded by
the compiler; everything is shape-polymorphic at trace time and jit-friendly.

Conventions:
  * images / depth maps are NHWC: depth is (B, H, W, 1).
  * intrinsics K / inv_K are (B, 4, 4); poses T are (B, 4, 4).
  * normalized pixel coords live in [-1, 1] with the align_corners=True
    normalization (x / (W-1), matching reference Project3D, layers.py:190-192).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Small 4x4 / 3x3 pose-intrinsics algebra must stay exact float32: JAX's
# DEFAULT matmul precision may run f32 contractions through bf16 passes on
# TPU, which is fine for convs but corrupts SE(3) composition.
_HI = jax.lax.Precision.HIGHEST


def disp_to_depth(disp, min_depth: float, max_depth: float):
    """Sigmoid disparity -> (scaled_disp, depth).

    depth = 1 / (1/max_depth + (1/min_depth - 1/max_depth) * disp)
    (reference: layers.py:16-25)
    """
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    depth = 1.0 / scaled_disp
    return scaled_disp, depth


def depth_to_disp(depth, min_depth: float, max_depth: float):
    """Inverse of :func:`disp_to_depth` (maps depth back to sigmoid units)."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = 1.0 / depth
    return (scaled_disp - min_disp) / (max_disp - min_disp)


def rot_from_axisangle(vec):
    """Axis-angle (B, 1, 3) or (B, 3) -> rotation as (B, 4, 4) homogeneous matrix.

    Rodrigues formula (reference: layers.py:64-103).
    """
    if vec.ndim == 3:
        vec = vec[:, 0, :]
    angle = jnp.linalg.norm(vec, axis=-1, keepdims=True)  # (B, 1)
    axis = vec / (angle + 1e-7)

    ca = jnp.cos(angle)[..., 0]
    sa = jnp.sin(angle)[..., 0]
    C = 1.0 - ca

    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * x * C, y * y * C, z * z * C
    xyC, yzC, zxC = x * y * C, y * z * C, z * x * C

    zero = jnp.zeros_like(ca)
    one = jnp.ones_like(ca)
    rot = jnp.stack(
        [
            xC + ca, xyC - zs, zxC + ys, zero,
            xyC + zs, yC + ca, yzC - xs, zero,
            zxC - ys, yzC + xs, zC + ca, zero,
            zero, zero, zero, one,
        ],
        axis=-1,
    ).reshape(vec.shape[0], 4, 4)
    return rot


def get_translation_matrix(translation):
    """Translation (B, 3) or (B, 1, 3) -> (B, 4, 4) homogeneous matrix.

    (reference: layers.py:48-61)
    """
    t = translation.reshape(-1, 3)
    B = t.shape[0]
    T = jnp.broadcast_to(jnp.eye(4, dtype=t.dtype), (B, 4, 4))
    T = T.at[:, :3, 3].set(t)
    return T


def transformation_from_parameters(axisangle, translation, invert: bool = False):
    """(axisangle, translation) -> (B, 4, 4) SE(3).

    With ``invert=True`` returns the inverse transform (used for negative
    frame offsets; reference: layers.py:28-45).
    """
    R = rot_from_axisangle(axisangle)
    t = translation.reshape(-1, 3)
    if invert:
        R = jnp.swapaxes(R, 1, 2)
        t = -t
    T = get_translation_matrix(t)
    if invert:
        return jnp.matmul(R, T, precision=_HI)
    return jnp.matmul(T, R, precision=_HI)


def _pixel_grid(height: int, width: int, dtype=jnp.float32):
    """Homogeneous pixel grid (3, H*W): rows are (x, y, 1)."""
    xs = jax.lax.broadcasted_iota(dtype, (height, width), 1).reshape(-1)
    ys = jax.lax.broadcasted_iota(dtype, (height, width), 0).reshape(-1)
    ones = jnp.ones_like(xs)
    return jnp.stack([xs, ys, ones], axis=0)


def backproject_depth(depth, inv_K):
    """Depth (B, H, W, 1) + inv_K (B, 4, 4) -> homogeneous cam points (B, 4, H*W).

    (reference: layers.py:139-168, BackprojectDepth)
    """
    B, H, W, _ = depth.shape
    pix = _pixel_grid(H, W, depth.dtype)  # (3, N)
    cam = jnp.einsum("bij,jn->bin", inv_K[:, :3, :3], pix, precision=_HI)  # (B, 3, N)
    cam = cam * depth.reshape(B, 1, H * W)
    ones = jnp.ones((B, 1, H * W), dtype=depth.dtype)
    return jnp.concatenate([cam, ones], axis=1)


def project_3d(points, K, T, height: int, width: int, eps: float = 1e-7):
    """Cam points (B, 4, H*W) + K, T (B, 4, 4) -> normalized pix coords (B, H, W, 2).

    Output is in [-1, 1] (align_corners=True normalization; reference:
    layers.py:171-193, Project3D).
    """
    B = points.shape[0]
    P = jnp.matmul(K, T, precision=_HI)[:, :3, :]  # (B, 3, 4)
    cam = jnp.einsum("bij,bjn->bin", P, points, precision=_HI)  # (B, 3, N)
    pix = cam[:, :2, :] / (cam[:, 2:3, :] + eps)  # (B, 2, N)
    pix = pix.reshape(B, 2, height, width).transpose(0, 2, 3, 1)  # (B, H, W, 2)
    scale = jnp.array([width - 1, height - 1], dtype=points.dtype)
    pix = pix / scale
    return (pix - 0.5) * 2.0


def reproject_coords(depth, inv_K, K, T, eps: float = 1e-7):
    """Fused backproject + project: one einsum chain, no (B,4,N) intermediate.

    depth (B, H, W, 1) -> sampling coords (B, H, W, 2) in [-1, 1].

    Mathematically identical to ``project_3d(backproject_depth(...))`` but
    folds the two 3x3/3x4 matmuls into a single precomposed (B, 3, 4) matrix
    applied per-pixel, which XLA fuses with the surrounding elementwise work.
    """
    B, H, W, _ = depth.shape
    P = jnp.matmul(K, T, precision=_HI)  # (B, 4, 4)
    # cam point = inv_K33 @ pix * depth, then [P3x4] @ [cam; 1]
    # => pixhom' = (P[:, :3, :3] @ inv_K33) @ pix * depth + P[:, :3, 3]
    M = jnp.matmul(P[:, :3, :3], inv_K[:, :3, :3], precision=_HI)  # (B, 3, 3)
    t = P[:, :3, 3]  # (B, 3)
    pix = _pixel_grid(H, W, depth.dtype)  # (3, N)
    ray = jnp.einsum("bij,jn->bin", M, pix, precision=_HI)  # (B, 3, N)
    cam = ray * depth.reshape(B, 1, H * W) + t[:, :, None]
    uv = cam[:, :2, :] / (cam[:, 2:3, :] + eps)
    uv = uv.reshape(B, 2, H, W).transpose(0, 2, 3, 1)
    scale = jnp.array([W - 1, H - 1], dtype=depth.dtype)
    return (uv / scale - 0.5) * 2.0
