"""Self-supervision losses (pure jnp, NHWC).

Functional re-design of the reference's loss stack:
  * SSIM (reference layers.py:218-248)
  * photometric reprojection 0.85*SSIM + 0.15*L1 (trainer.py:517-530)
  * per-pixel min over (identity, reprojection) with auto-masking tie-break
    noise (trainer.py:582-607)
  * edge-aware smoothness on mean-normalized disparity (layers.py:202-215,
    trainer.py:612-616)
  * 7 depth error metrics (layers.py:251-269)

Everything is expressed as jnp so XLA fuses the elementwise chain into the
surrounding convolutions (the warp itself has fused Pallas kernels in
``ssde_tpu.ops.pallas``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .image import avg_pool_3x3, reflect_pad_2d

_C1 = 0.01**2
_C2 = 0.03**2


def ssim(x, y):
    """(1 - SSIM)/2 distance map, clamped to [0, 1].

    3x3 mean filter over reflection-padded inputs (reference layers.py:218-248).
    Input/output NHWC; output same spatial shape as input.
    """
    x = reflect_pad_2d(x, 1)
    y = reflect_pad_2d(y, 1)

    mu_x = avg_pool_3x3(x)
    mu_y = avg_pool_3x3(y)
    sigma_x = avg_pool_3x3(x * x) - mu_x * mu_x
    sigma_y = avg_pool_3x3(y * y) - mu_y * mu_y
    sigma_xy = avg_pool_3x3(x * y) - mu_x * mu_y

    ssim_n = (2 * mu_x * mu_y + _C1) * (2 * sigma_xy + _C2)
    ssim_d = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
    return jnp.clip((1 - ssim_n / ssim_d) / 2, 0.0, 1.0)


def reprojection_loss(pred, target, no_ssim: bool = False):
    """Per-pixel photometric error (B, H, W, 1).

    0.85 * SSIM + 0.15 * L1, channel-averaged (reference trainer.py:517-530).
    """
    l1 = jnp.mean(jnp.abs(target - pred), axis=-1, keepdims=True)
    if no_ssim:
        return l1
    s = jnp.mean(ssim(pred, target), axis=-1, keepdims=True)
    return 0.85 * s + 0.15 * l1


def smooth_loss(disp, img):
    """Edge-aware first-order disparity smoothness (reference layers.py:202-215).

    ``disp`` (B, H, W, 1), ``img`` (B, H, W, 3); returns scalar.
    """
    grad_disp_x = jnp.abs(disp[:, :, :-1, :] - disp[:, :, 1:, :])
    grad_disp_y = jnp.abs(disp[:, :-1, :, :] - disp[:, 1:, :, :])

    grad_img_x = jnp.mean(
        jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :]), axis=-1, keepdims=True
    )
    grad_img_y = jnp.mean(
        jnp.abs(img[:, :-1, :, :] - img[:, 1:, :, :]), axis=-1, keepdims=True
    )

    grad_disp_x = grad_disp_x * jnp.exp(-grad_img_x)
    grad_disp_y = grad_disp_y * jnp.exp(-grad_img_y)
    return jnp.mean(grad_disp_x) + jnp.mean(grad_disp_y)


def photometric_loss(
    preds,
    identities,
    target,
    rng=None,
    *,
    no_ssim: bool = False,
    disable_automasking: bool = False,
    avg_reprojection: bool = False,
):
    """min-reprojection + auto-masking loss for one scale.

    Args:
      preds: list of warped source frames, each (B, H, W, 3).
      identities: list of un-warped source frames (same shapes); ignored when
        ``disable_automasking``.
      target: (B, H, W, 3) frame 0.
      rng: PRNG key for the 1e-5 tie-break noise on identity losses
        (reference trainer.py:592-594); pass None to skip the noise
        (deterministic eval/tests).

    Returns:
      (per-pixel loss (B, H, W, 1), identity_selection mask (B, H, W, 1)).
    """
    reproj = jnp.concatenate(
        [reprojection_loss(p, target, no_ssim) for p in preds], axis=-1
    )
    if avg_reprojection:
        reproj = jnp.mean(reproj, axis=-1, keepdims=True)

    if disable_automasking:
        combined = reproj
        n_ident = 0
    else:
        ident = jnp.concatenate(
            [reprojection_loss(p, target, no_ssim) for p in identities], axis=-1
        )
        if avg_reprojection:
            ident = jnp.mean(ident, axis=-1, keepdims=True)
        if rng is not None:
            ident = ident + jax.random.normal(rng, ident.shape, ident.dtype) * 1e-5
        n_ident = ident.shape[-1]
        combined = jnp.concatenate([ident, reproj], axis=-1)

    if combined.shape[-1] == 1:
        to_optimise = combined
        idxs = jnp.zeros_like(combined, dtype=jnp.int32)
    else:
        to_optimise = jnp.min(combined, axis=-1, keepdims=True)
        idxs = jnp.argmin(combined, axis=-1, keepdims=True)

    mask = (idxs > n_ident - 1).astype(combined.dtype) if n_ident else jnp.ones_like(to_optimise)
    return to_optimise, mask


def compute_depth_errors(gt, pred):
    """abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3 (reference layers.py:251-269)."""
    thresh = jnp.maximum(gt / pred, pred / gt)
    a1 = jnp.mean((thresh < 1.25).astype(jnp.float32))
    a2 = jnp.mean((thresh < 1.25**2).astype(jnp.float32))
    a3 = jnp.mean((thresh < 1.25**3).astype(jnp.float32))

    rmse = jnp.sqrt(jnp.mean((gt - pred) ** 2))
    rmse_log = jnp.sqrt(jnp.mean((jnp.log(gt) - jnp.log(pred)) ** 2))
    abs_rel = jnp.mean(jnp.abs(gt - pred) / gt)
    sq_rel = jnp.mean((gt - pred) ** 2 / gt)
    return abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3
