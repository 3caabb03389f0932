"""1024x320 stress parity (BASELINE config #5 resolution) — slow tier.

At W=1024 the banded warp runs 8 column tiles (vs 5 at 640) and the
photometric kernel must take its H-blocked path (320x1024 exceeds the
whole-image VMEM budget, photometric.py:_fits_kernel). These interpret-
mode tests pin both kernels to their exact jnp formulations at exactly
this resolution with KITTI-like reprojection grids, so the vband/tile
budgets are exercised where they are most stressed (round-3 verdict
item 6).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssde_tpu.ops.losses import reprojection_loss
from ssde_tpu.ops.pallas.photometric import (
    fits_photometric,
    photometric_error_planar,
)
from ssde_tpu.ops.pallas.warp_banded import (
    band_violation_fraction,
    grid_sample_banded,
)
from ssde_tpu.ops.warp import grid_sample

pytestmark = pytest.mark.slow

H, W = 320, 1024


def _kitti_like_grid(rng, B, S, Ho, Wo):
    """Identity sampling grid + small smooth reprojection offsets (a few
    pixels), the coordinate distribution KITTI training produces."""
    ys, xs = np.meshgrid(np.linspace(-1, 1, Ho), np.linspace(-1, 1, Wo),
                         indexing="ij")
    base = np.stack([xs, ys], axis=-1)[None, None]  # (1, 1, Ho, Wo, 2)
    # smooth per-(b, s) offsets: up to ~3 px horizontally, ~2 px vertically
    off = rng.rand(B, S, 1, 1, 2).astype(np.float32) * 2 - 1
    off[..., 0] *= 3.0 * 2.0 / Wo
    off[..., 1] *= 2.0 * 2.0 / Ho
    return jnp.asarray((base + off).astype(np.float32))


def test_banded_warp_1024(rng):
    B, S = 1, 2
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    grids = _kitti_like_grid(rng, B, S, H, W)
    viol = float(band_violation_fraction(img.shape, grids, vband=8))
    assert viol == 0.0, "grid fixture should satisfy the band budgets"

    out = grid_sample_banded(img, grids, interpret=True, vband=8)
    ref = jnp.stack([grid_sample(img, grids[:, s]) for s in range(S)], axis=1)
    # kernel taps are bf16 (by design); parity at bf16 tolerance
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_banded_warp_1024_grad(rng):
    B, S = 1, 1
    img = jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32))
    grids = _kitti_like_grid(rng, B, S, H, W)

    g1 = jax.grad(lambda g: jnp.sum(
        grid_sample_banded(img, g, interpret=True, vband=8) ** 2))(grids)
    g2 = jax.grad(lambda g: jnp.sum(
        jnp.stack([grid_sample(img, g[:, s]) for s in range(S)], 1) ** 2))(grids)
    # grid grads carry the W/2 (=512) unnormalization factor, so compare
    # at bf16-tap relative precision against the gradient's scale
    a, b = np.asarray(g1), np.asarray(g2)
    scale = np.abs(b).max()
    assert np.abs(a - b).max() <= 0.02 * scale, (
        np.abs(a - b).max(), scale)


def test_blocked_photometric_1024(rng):
    assert fits_photometric(H, W), "1024x320 must take the H-blocked path"
    B, P = 1, 2
    G = P * B
    pred = jnp.asarray(rng.rand(G, 3, H, W).astype(np.float32))
    targ = jnp.asarray(rng.rand(B, 3, H, W).astype(np.float32))

    out = photometric_error_planar(pred, targ, True)
    pred_n = jnp.transpose(pred, (0, 2, 3, 1))
    targ_n = jnp.transpose(jnp.tile(targ, (G // B, 1, 1, 1)), (0, 2, 3, 1))
    ref = np.asarray(reprojection_loss(pred_n, targ_n))[..., 0]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_blocked_photometric_1024_grad(rng):
    B, P = 1, 1
    G = P * B
    pred = jnp.asarray(rng.rand(G, 3, H, W).astype(np.float32))
    targ = jnp.asarray(rng.rand(B, 3, H, W).astype(np.float32))

    g1 = jax.grad(lambda p: jnp.sum(
        photometric_error_planar(p, targ, True) ** 2))(pred)

    def ref_loss(p):
        pn = jnp.transpose(p, (0, 2, 3, 1))
        tn = jnp.transpose(jnp.tile(targ, (G // B, 1, 1, 1)), (0, 2, 3, 1))
        return jnp.sum(reprojection_loss(pn, tn) ** 2)

    g2 = jax.grad(ref_loss)(pred)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-4)
