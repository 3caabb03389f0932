"""Parity tests for the fused Pallas photometric-error kernel.

The kernel (ops/pallas/photometric.py) fuses reflect-pad 3x3 SSIM + L1
into one pass and carries a hand-derived custom VJP; these tests pin it
to the jnp formulation (ops/losses.reprojection_loss, itself golden-
tested against torch in test_image_warp_losses.py) in interpret mode.
Reference math: layers.py:218-248 + trainer.py:517-530.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssde_tpu.ops.losses import reprojection_loss
from ssde_tpu.ops.pallas.photometric import (
    fits_photometric,
    reprojection_loss_pallas,
)

B, H, W, C = 2, 16, 128, 3
P = 3  # stacked (scale, frame) pairs
G = P * B


@pytest.fixture
def data(rng):
    pred = jnp.asarray(rng.rand(G, H, W, C).astype(np.float32))
    targ = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    return pred, targ


def _ref(pred, targ):
    return reprojection_loss(pred, jnp.tile(targ, (G // B, 1, 1, 1)))


def test_forward_parity(data):
    pred, targ = data
    ref = _ref(pred, targ)
    out = reprojection_loss_pallas(pred, targ, interpret=True)
    assert out.shape == (G, H, W, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_custom_vjp_parity(data):
    pred, targ = data

    # nonlinear post-map so upstream cotangents vary per pixel
    def f_ref(p):
        return jnp.sum(jnp.sin(_ref(p, targ) * 3.0))

    def f_pal(p):
        return jnp.sum(jnp.sin(reprojection_loss_pallas(p, targ, True) * 3.0))

    g_ref = jax.grad(f_ref)(pred)
    g_pal = jax.grad(f_pal)(pred)
    scale = float(jnp.max(jnp.abs(g_ref)))
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), atol=2e-5 * max(scale, 1.0)
    )


def test_target_gets_zero_grad(data):
    """Loss-graph convention: target is raw data, zero cotangent."""
    pred, targ = data
    g = jax.grad(
        lambda t: jnp.sum(reprojection_loss_pallas(pred, t, True))
    )(targ)
    assert float(jnp.max(jnp.abs(g))) == 0.0


def test_fits_predicate():
    from ssde_tpu.ops.pallas.photometric import _block_rows, _fits_kernel

    assert fits_photometric(192, 640)  # KITTI 640x192 flagship
    assert not fits_photometric(190, 640)  # H % 8 != 0
    assert not fits_photometric(192, 630)  # W % 128 != 0
    # 320x1024 (the 1024x320 config) exceeds the whole-image VMEM budget
    # but is served by the H-blocked variant
    assert not _fits_kernel(320, 1024)
    assert _block_rows(320, 1024) is not None
    assert fits_photometric(320, 1024)


def test_blocked_forward_and_vjp_parity(data, monkeypatch):
    """H-blocked variant == whole-image math (global-row masks, halo slabs).

    Forces the blocked branch on the small test shape by failing the
    whole-image predicate; BH=8 with nH=2 exercises both edge blocks."""
    import ssde_tpu.ops.pallas.photometric as pm

    monkeypatch.setattr(pm, "_fits_kernel", lambda h, w: False)
    assert pm._block_rows(H, W) is not None
    pred, targ = data
    ref = _ref(pred, targ)
    out = reprojection_loss_pallas(pred, targ, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def f_ref(p):
        return jnp.sum(jnp.sin(_ref(p, targ) * 3.0))

    def f_pal(p):
        return jnp.sum(jnp.sin(reprojection_loss_pallas(p, targ, True) * 3.0))

    g_ref = jax.grad(f_ref)(pred)
    g_pal = jax.grad(f_pal)(pred)
    scale = float(jnp.max(jnp.abs(g_ref)))
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), atol=2e-5 * max(scale, 1.0)
    )


def test_compute_losses_fused_path_matches(monkeypatch, rng):
    """End-to-end: the batched loss with the fused kernel (interpret mode)
    matches the jnp path on identical inputs/outputs dicts."""
    from ssde_tpu.config import Options
    from ssde_tpu.train.steps import compute_losses

    opts = Options(height=H, width=W, batch_size=B, scales=[0, 1],
                   frame_ids=[0, -1, 1], compute_dtype="float32")
    source_ids = [-1, 1]
    inputs, outputs = {}, {}
    inputs["color/0/0"] = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    for f in source_ids:
        inputs[f"color/{f}/0"] = jnp.asarray(
            rng.rand(B, H, W, 3).astype(np.float32))
    for s in opts.scales:
        hh, ww = H // 2**s, W // 2**s
        inputs[f"color/0/{s}"] = jnp.asarray(
            rng.rand(B, hh, ww, 3).astype(np.float32))
        outputs[f"disp/{s}"] = jnp.asarray(
            0.3 + 0.4 * rng.rand(B, hh, ww, 1).astype(np.float32))
        for f in source_ids:
            outputs[f"color/{f}/{s}"] = jnp.asarray(
                rng.rand(B, H, W, 3).astype(np.float32))

    opts.use_pallas = False
    base = compute_losses(inputs, dict(outputs), opts, source_ids, rng=None)
    opts.use_pallas = True
    monkeypatch.setenv("SSDE_PHOTO_INTERPRET", "1")
    fused = compute_losses(inputs, dict(outputs), opts, source_ids, rng=None)
    for k in base:
        np.testing.assert_allclose(
            float(fused[k]), float(base[k]), atol=3e-6,
            err_msg=f"loss key {k}")


def test_blocked_interior_block_parity(monkeypatch, rng):
    """nH=3: the middle block has REAL prev and next neighbors (the
    edge-clamped views of the nH=2 case never exercise that)."""
    import ssde_tpu.ops.pallas.photometric as pm

    monkeypatch.setattr(pm, "_fits_kernel", lambda h, w: False)
    h = 24  # BH=8 -> 3 blocks
    assert pm._block_rows(h, W) == 8
    pred = jnp.asarray(rng.rand(B, h, W, C).astype(np.float32))
    targ = jnp.asarray(rng.rand(B, h, W, C).astype(np.float32))
    ref = reprojection_loss(pred, targ)
    out = reprojection_loss_pallas(pred, targ, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    g_ref = jax.grad(
        lambda p: jnp.sum(jnp.sin(reprojection_loss(p, targ) * 3.0)))(pred)
    g_pal = jax.grad(lambda p: jnp.sum(jnp.sin(
        reprojection_loss_pallas(p, targ, True) * 3.0)))(pred)
    scale = float(jnp.max(jnp.abs(g_ref)))
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), atol=2e-5 * max(scale, 1.0)
    )
