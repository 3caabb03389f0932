"""Device-side preprocessing (jit-compiled, NHWC).

The reference does ColorJitter + a 4-scale ANTIALIAS resize pyramid in
DataLoader workers on the host (mono_dataset.py:92-111). Here the host
ships one scale-0 image per frame and the TPU builds the pyramid (2x2 box
downsampling — the device-friendly equivalent of recursive antialiased
halving) and applies the photometric jitter, so preprocessing overlaps the
training step instead of competing for host cores.

Jitter follows torchvision semantics: brightness/contrast/saturation
factors multiply toward the image / grey mean / per-pixel grey, hue rotates
in HSV space. One (factor-4) vector is shared by all frames of an item
(mono_dataset.py:92-97: identical aug for all pose-net inputs).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

_GRAY_W = jnp.array([0.2989, 0.5870, 0.1140])


def _grayscale(img):
    return jnp.sum(img * _GRAY_W, axis=-1, keepdims=True)


def _rgb_to_hsv(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.max(img, axis=-1)
    minc = jnp.min(img, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.where(delta > 0, delta, 1.0)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(img):
    h, s, v = img[..., 0], img[..., 1], img[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def color_jitter(img, factors):
    """Apply [brightness, contrast, saturation, hue] factors.

    img: (..., H, W, 3) in [0, 1]; factors: (..., 4) broadcastable over the
    leading axes (one factor vector per batch item).
    """
    b = factors[..., 0][..., None, None, None]
    c = factors[..., 1][..., None, None, None]
    s = factors[..., 2][..., None, None, None]
    hue = factors[..., 3][..., None, None]

    img = jnp.clip(img * b, 0.0, 1.0)
    mean = jnp.mean(_grayscale(img), axis=(-3, -2), keepdims=True)
    img = jnp.clip(img * c + (1.0 - c) * mean, 0.0, 1.0)
    img = jnp.clip(img * s + (1.0 - s) * _grayscale(img), 0.0, 1.0)

    hsv = _rgb_to_hsv(img)
    h = (hsv[..., 0] + hue) % 1.0
    img = _hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))
    return jnp.clip(img, 0.0, 1.0)


def downsample2x_box(img):
    """2x2 box filter downsample (pyramid step)."""
    B = img.shape[:-3]
    H, W, C = img.shape[-3:]
    img = img.reshape(B + (H // 2, 2, W // 2, 2, C))
    return img.mean(axis=(-4, -2))


def build_pyramid(img, num_scales: int):
    """[scale0, scale1, ...] by recursive 2x box downsampling."""
    out = [img]
    for _ in range(num_scales - 1):
        out.append(downsample2x_box(out[-1]))
    return out


def scale_intrinsics(K, height: int, width: int, num_scales: int):
    """Per-scale pixel intrinsics from normalized K
    (reference mono_dataset.py:173-183). K: (B, 4, 4)."""
    out = {}
    for s in range(num_scales):
        scale_vec = jnp.array(
            [width // (2**s), height // (2**s), 1.0, 1.0], dtype=K.dtype
        )
        Ks = K * scale_vec[None, :, None]
        out[f"K/{s}"] = Ks
        out[f"inv_K/{s}"] = jnp.linalg.inv(Ks)
    return out


def preprocess_batch(
    batch: Dict,
    height: int,
    width: int,
    num_scales: int,
    frame_idxs: Sequence,
    is_train: bool = True,
    *,
    pyramid_frames: Sequence = None,
    aug_num_scales: int = None,
):
    """Stacked host batch -> the reference's full key contract.

    Input keys: f"color/{i}" (B, H, W, 3), "K" (B, 4, 4), "jitter" (B, 4).
    Output keys: f"color/{i}/{s}", f"color_aug/{i}/{s}", f"K/{s}",
    f"inv_K/{s}" (+ passthrough of "depth_gt"/"stereo_T").

    ``pyramid_frames`` / ``aug_num_scales`` trim unused work inside the
    train step: the (default) non-v1_multiscale loss consumes only the
    frame-0 color pyramid, scale-0 colors of the source frames, and
    scale-0 color_aug — building all 24 full pyramids the reference's
    host loader materializes (mono_dataset.py:116-139) costs real step
    time on device. Defaults build everything (eval/logging parity).
    """
    inputs = {}
    jitter = batch.get("jitter")
    if pyramid_frames is None:
        pyramid_frames = list(frame_idxs)
    if aug_num_scales is None:
        aug_num_scales = num_scales
    for i in frame_idxs:
        img = batch[f"color/{i}"]
        if img.dtype == jnp.uint8:
            # frames shipped as uint8 (decoded-cache path): convert on
            # device, where the divide fuses into the pyramid/jitter ops
            img = img.astype(jnp.float32) / 255.0
        n_s = num_scales if i in pyramid_frames else 1
        for s, scaled in enumerate(build_pyramid(img, n_s)):
            inputs[f"color/{i}/{s}"] = scaled
        aug = color_jitter(img, jitter) if (is_train and jitter is not None) else img
        for s, scaled in enumerate(build_pyramid(aug, aug_num_scales)):
            inputs[f"color_aug/{i}/{s}"] = scaled
    inputs.update(scale_intrinsics(batch["K"], height, width, num_scales))
    for k in ("depth_gt", "stereo_T"):
        if k in batch:
            inputs[k] = batch[k]
    return inputs
