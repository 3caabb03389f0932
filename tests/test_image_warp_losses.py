"""Golden tests for image ops, grid_sample, and losses against torch CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from ssde_tpu.ops import (
    upsample2x_nearest,
    resize_bilinear,
    pixel_shuffle,
    avg_pool_3x3,
    reflect_pad_2d,
    grid_sample,
    ssim,
    reprojection_loss,
    smooth_loss,
    compute_depth_errors,
    photometric_loss,
)


def nchw(x):  # NHWC numpy -> NCHW torch
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def nhwc(t):  # NCHW torch -> NHWC numpy
    return np.transpose(t.numpy(), (0, 2, 3, 1))


def test_upsample_nearest(rng):
    x = rng.rand(2, 4, 6, 3).astype(np.float32)
    ours = np.asarray(upsample2x_nearest(jnp.asarray(x)))
    ref = nhwc(F.interpolate(nchw(x), scale_factor=2, mode="nearest"))
    np.testing.assert_allclose(ours, ref)


def test_resize_bilinear_no_align(rng):
    x = rng.rand(2, 6, 10, 3).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), (12, 20), align_corners=False))
    ref = nhwc(F.interpolate(nchw(x), size=(12, 20), mode="bilinear", align_corners=False))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_resize_bilinear_align(rng):
    x = rng.rand(2, 6, 10, 2).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), (12, 20), align_corners=True))
    ref = nhwc(F.interpolate(nchw(x), size=(12, 20), mode="bilinear", align_corners=True))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_resize_bilinear_downscale(rng):
    x = rng.rand(1, 8, 12, 1).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), (4, 6), align_corners=False))
    ref = nhwc(F.interpolate(nchw(x), size=(4, 6), mode="bilinear", align_corners=False))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_pixel_shuffle(rng):
    x = rng.rand(2, 3, 5, 8).astype(np.float32)
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    ref = nhwc(F.pixel_shuffle(nchw(x), 2))
    np.testing.assert_allclose(ours, ref)


def test_avg_pool_reflect(rng):
    x = rng.rand(2, 6, 8, 3).astype(np.float32)
    padded = reflect_pad_2d(jnp.asarray(x), 1)
    ours = np.asarray(avg_pool_3x3(padded))
    t = F.pad(nchw(x), (1, 1, 1, 1), mode="reflect")
    ref = nhwc(F.avg_pool2d(t, 3, 1))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_grid_sample_matches_torch(rng):
    img = rng.rand(2, 8, 12, 3).astype(np.float32)
    # grid values beyond [-1,1] exercise border clamping
    grid = (rng.rand(2, 8, 12, 2).astype(np.float32) * 2.4 - 1.2)
    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    ref = nhwc(
        F.grid_sample(
            nchw(img),
            torch.from_numpy(grid),
            mode="bilinear",
            padding_mode="border",
            align_corners=False,
        )
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_align_corners(rng):
    img = rng.rand(1, 6, 6, 2).astype(np.float32)
    grid = (rng.rand(1, 5, 7, 2).astype(np.float32) * 2 - 1)
    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid), align_corners=True))
    ref = nhwc(
        F.grid_sample(
            nchw(img), torch.from_numpy(grid),
            mode="bilinear", padding_mode="border", align_corners=True,
        )
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_grad_finite_differences(rng):
    """Gradient through warp w.r.t. the grid matches finite differences."""
    img = jnp.asarray(rng.rand(1, 5, 5, 1).astype(np.float32))
    grid = jnp.asarray(rng.rand(1, 4, 4, 2).astype(np.float32) * 1.2 - 0.6)

    def loss(g):
        return jnp.sum(grid_sample(img, g) ** 2)

    g = jax.grad(loss)(grid)
    eps = 1e-3
    for idx in [(0, 0, 0, 0), (0, 1, 2, 1), (0, 3, 3, 0)]:
        gp = grid.at[idx].add(eps)
        gm = grid.at[idx].add(-eps)
        fd = (loss(gp) - loss(gm)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g[idx]), np.asarray(fd), atol=2e-2)


def torch_ssim(x, y):
    refl = torch.nn.ReflectionPad2d(1)
    pool = torch.nn.AvgPool2d(3, 1)
    x, y = refl(x), refl(y)
    mu_x, mu_y = pool(x), pool(y)
    sigma_x = pool(x**2) - mu_x**2
    sigma_y = pool(y**2) - mu_y**2
    sigma_xy = pool(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + 0.01**2) * (2 * sigma_xy + 0.03**2)
    d = (mu_x**2 + mu_y**2 + 0.01**2) * (sigma_x + sigma_y + 0.03**2)
    return torch.clamp((1 - n / d) / 2, 0, 1)


def test_ssim_matches_reference(rng):
    x = rng.rand(2, 8, 10, 3).astype(np.float32)
    y = rng.rand(2, 8, 10, 3).astype(np.float32)
    ours = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y)))
    ref = nhwc(torch_ssim(nchw(x), nchw(y)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_ssim_identical_is_zero(rng):
    x = jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32))
    np.testing.assert_allclose(np.asarray(ssim(x, x)), 0.0, atol=1e-6)


def test_reprojection_loss_weights(rng):
    x = rng.rand(1, 8, 8, 3).astype(np.float32)
    y = rng.rand(1, 8, 8, 3).astype(np.float32)
    full = np.asarray(reprojection_loss(jnp.asarray(x), jnp.asarray(y)))
    l1_only = np.asarray(reprojection_loss(jnp.asarray(x), jnp.asarray(y), no_ssim=True))
    s = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y))).mean(-1, keepdims=True)
    np.testing.assert_allclose(full, 0.85 * s + 0.15 * l1_only, atol=1e-6)


def test_smooth_loss_matches_reference(rng):
    disp = rng.rand(2, 8, 10, 1).astype(np.float32)
    img = rng.rand(2, 8, 10, 3).astype(np.float32)
    ours = float(smooth_loss(jnp.asarray(disp), jnp.asarray(img)))
    d, i = nchw(disp), nchw(img)
    gx = torch.abs(d[:, :, :, :-1] - d[:, :, :, 1:])
    gy = torch.abs(d[:, :, :-1, :] - d[:, :, 1:, :])
    ix = torch.mean(torch.abs(i[:, :, :, :-1] - i[:, :, :, 1:]), 1, keepdim=True)
    iy = torch.mean(torch.abs(i[:, :, :-1, :] - i[:, :, 1:, :]), 1, keepdim=True)
    ref = float((gx * torch.exp(-ix)).mean() + (gy * torch.exp(-iy)).mean())
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_depth_errors(rng):
    gt = rng.rand(100).astype(np.float32) * 50 + 1
    pred = gt * (1 + rng.randn(100).astype(np.float32) * 0.05)
    pred = np.clip(pred, 0.5, None)
    ours = [float(v) for v in compute_depth_errors(jnp.asarray(gt), jnp.asarray(pred))]
    g, p = torch.from_numpy(gt), torch.from_numpy(pred)
    thresh = torch.max(g / p, p / g)
    ref = [
        float(torch.mean(torch.abs(g - p) / g)),
        float(torch.mean((g - p) ** 2 / g)),
        float(torch.sqrt(((g - p) ** 2).mean())),
        float(torch.sqrt(((torch.log(g) - torch.log(p)) ** 2).mean())),
        float((thresh < 1.25).float().mean()),
        float((thresh < 1.25**2).float().mean()),
        float((thresh < 1.25**3).float().mean()),
    ]
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_photometric_loss_automask_prefers_identity():
    """A static pixel (identical in all frames) must be masked out (identity wins)."""
    B, H, W = 1, 8, 8
    target = jnp.ones((B, H, W, 3)) * 0.5
    # warped preds are bad everywhere; identity sources equal target -> identity loss 0
    preds = [target + 0.3, target - 0.3]
    idents = [target, target]
    loss, mask = photometric_loss(preds, idents, target, rng=None)
    assert float(loss.mean()) < 1e-6  # identity (0 loss) selected
    assert float(mask.mean()) == 0.0  # nothing selected from reprojections


def test_photometric_loss_no_automask():
    B, H, W = 1, 6, 6
    target = jnp.ones((B, H, W, 3)) * 0.5
    preds = [target + 0.2, target + 0.1]
    loss, mask = photometric_loss(preds, [], target, disable_automasking=True)
    # min over the two reprojection losses = the closer pred
    expected = reprojection_loss(preds[1], target)
    np.testing.assert_allclose(np.asarray(loss), np.asarray(expected), atol=1e-6)


def test_grid_sample_mxu_matches_gather(rng):
    """MXU one-hot warp == gather warp up to bf16 rounding."""
    from ssde_tpu.ops.warp import grid_sample_mxu

    img = rng.rand(2, 16, 32, 3).astype(np.float32)
    grid = (rng.rand(2, 16, 32, 2).astype(np.float32) * 2.4 - 1.2)
    a = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    b = np.asarray(grid_sample_mxu(jnp.asarray(img), jnp.asarray(grid), chunk=8))
    np.testing.assert_allclose(a, b, atol=2e-2)


def test_grid_sample_mxu_gradients(rng):
    from ssde_tpu.ops.warp import grid_sample_mxu

    img = jnp.asarray(rng.rand(1, 8, 16, 1).astype(np.float32))
    grid = jnp.asarray(rng.rand(1, 8, 16, 2).astype(np.float32) * 1.2 - 0.6)
    g1 = jax.grad(lambda g: jnp.sum(grid_sample(img, g) ** 2))(grid)
    g2 = jax.grad(lambda g: jnp.sum(grid_sample_mxu(img, g, chunk=8) ** 2))(grid)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=0.12)


def test_grid_sample_pallas_interpret(rng):
    """Pallas warp kernel (interpret mode on CPU) matches the gather warp."""
    from ssde_tpu.ops.pallas.warp import grid_sample_pallas

    img = rng.rand(1, 16, 128, 3).astype(np.float32)
    grid = (rng.rand(1, 16, 128, 2).astype(np.float32) * 2.2 - 1.1)
    a = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    b = np.asarray(grid_sample_pallas(jnp.asarray(img), jnp.asarray(grid),
                                      False, 8, True))
    np.testing.assert_allclose(a, b, atol=2e-2)


def test_grid_sample_pallas_grad_interpret(rng):
    from ssde_tpu.ops.pallas.warp import grid_sample_pallas
    from ssde_tpu.ops.warp import grid_sample_mxu

    img = jnp.asarray(rng.rand(1, 16, 128, 1).astype(np.float32))
    grid = jnp.asarray(rng.rand(1, 16, 128, 2).astype(np.float32) * 1.2 - 0.6)
    g1 = jax.grad(lambda g: jnp.sum(grid_sample_mxu(img, g) ** 2))(grid)
    g2 = jax.grad(
        lambda g: jnp.sum(grid_sample_pallas(img, g, False, 8, True) ** 2)
    )(grid)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=0.01, atol=0.05)


def test_grid_sample_family_interpret(rng):
    """Family lane-gather kernel (interpret mode) matches the gather warp
    for every scale field."""
    from ssde_tpu.ops.pallas.warp_gather import grid_sample_family

    img = rng.rand(2, 16, 128, 3).astype(np.float32)
    grids = (rng.rand(2, 3, 16, 128, 2).astype(np.float32) * 2.2 - 1.1)
    outs = np.asarray(grid_sample_family(jnp.asarray(img), jnp.asarray(grids),
                                         False, 8, True))
    for s in range(3):
        ref = np.asarray(grid_sample(jnp.asarray(img),
                                     jnp.asarray(grids[:, s])))
        np.testing.assert_allclose(outs[:, s], ref, atol=2e-2)


def test_grid_sample_family_grad_interpret(rng):
    from ssde_tpu.ops.pallas.warp_gather import grid_sample_family
    from ssde_tpu.ops.warp import grid_sample_mxu

    img = jnp.asarray(rng.rand(1, 16, 128, 1).astype(np.float32))
    grids = jnp.asarray(rng.rand(1, 2, 16, 128, 2).astype(np.float32) * 1.2 - 0.6)
    g1 = jax.grad(
        lambda g: jnp.sum(grid_sample_family(img, g, False, 8, True) ** 2)
    )(grids)
    g2 = jnp.stack(
        [jax.grad(lambda g: jnp.sum(grid_sample_mxu(img, g) ** 2))(grids[:, s])
         for s in range(2)],
        axis=1,
    )
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=0.01,
                               atol=0.05)


def test_grid_sample_banded_interpret(rng):
    """Banded Pallas warp (interpret mode): fast path matches the gather
    warp for band-respecting coordinates; strict path for wild ones."""
    from ssde_tpu.ops.pallas.warp_banded import (
        band_violation_fraction,
        grid_sample_banded,
    )

    B, H, W = 1, 64, 128
    img = rng.rand(B, H, W, 3).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    gx = (2 * (xs + 0.5) / W - 1)[None] + rng.randn(B, H, W) * 0.02
    gy = (2 * (ys + 0.5) / H - 1)[None] + rng.randn(B, H, W) * 0.02
    grid = np.stack([gx, gy], -1).astype(np.float32)
    grids = jnp.asarray(np.stack([grid, grid], 1))

    assert float(band_violation_fraction(img.shape, grids)) == 0.0
    outs = np.asarray(grid_sample_banded(jnp.asarray(img), grids,
                                         False, 8, True))
    ref = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(outs[:, 0], ref, atol=2e-2)

    # the narrow training band (vband=16, span budget 7) agrees too
    assert float(band_violation_fraction(img.shape, grids, vband=16)) == 0.0
    outs16 = np.asarray(grid_sample_banded(jnp.asarray(img), grids,
                                           False, 8, True, False, 16))
    np.testing.assert_allclose(outs16, outs, atol=1e-6)

    wild = jnp.asarray(
        (rng.rand(B, 1, H, W, 2).astype(np.float32) * 2.4 - 1.2))
    assert float(band_violation_fraction(img.shape, wild)) > 0
    outs_w = np.asarray(grid_sample_banded(jnp.asarray(img), wild,
                                           False, 8, True, True))
    ref_w = np.asarray(grid_sample(jnp.asarray(img), wild[:, 0]))
    np.testing.assert_allclose(outs_w[:, 0], ref_w, atol=2e-2)


def test_grid_sample_banded_planar_interpret(rng):
    """Planar (scale-major) banded warp == NHWC banded warp, value + grad."""
    from ssde_tpu.ops.pallas.warp_banded import (
        grid_sample_banded,
        grid_sample_banded_planar,
    )

    B, S, H, W = 2, 3, 64, 128
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    gx = (2 * (xs + 0.5) / W - 1)[None, None] + rng.randn(B, S, H, W) * 0.02
    gy = (2 * (ys + 0.5) / H - 1)[None, None] + rng.randn(B, S, H, W) * 0.02
    grids_bs = jnp.asarray(np.stack([gx, gy], -1).astype(np.float32))
    grids_sb = grids_bs.transpose(1, 0, 2, 3, 4)

    out_n = grid_sample_banded(img, grids_bs, False, 8, True)   # (B,S,H,W,C)
    out_p = grid_sample_banded_planar(img, grids_sb, False, 8, True)
    ref = np.asarray(out_n).transpose(1, 0, 4, 2, 3).reshape(S * B, 3, H, W)
    np.testing.assert_allclose(np.asarray(out_p), ref, atol=1e-6)

    g_n = jax.grad(lambda g: jnp.sum(
        grid_sample_banded(img, g, False, 8, True) ** 2))(grids_bs)
    g_p = jax.grad(lambda g: jnp.sum(
        grid_sample_banded_planar(img, g, False, 8, True) ** 2))(grids_sb)
    np.testing.assert_allclose(np.asarray(g_p),
                               np.asarray(g_n).transpose(1, 0, 2, 3, 4),
                               rtol=1e-5, atol=1e-5)


def test_compute_losses_planar_reindex(rng, monkeypatch):
    """The planar fused-loss path slices rep_all back to the same
    per-scale reprojection maps as the NHWC path."""
    from ssde_tpu.config import Options
    from ssde_tpu.train.steps import compute_losses

    monkeypatch.setenv("SSDE_PHOTO_INTERPRET", "1")
    B, H, W = 2, 32, 128  # W=128 satisfies fits_photometric lane tiling
    opts = Options(height=H, width=W, batch_size=B, scales=[0, 1],
                   compute_dtype="float32", use_pallas=True)
    source_ids = [-1, 1]
    inputs = {}
    for f in (0, -1, 1):
        inputs[f"color/{f}/0"] = jnp.asarray(
            rng.rand(B, H, W, 3).astype(np.float32))
    outputs = {}
    for s in opts.scales:
        outputs[f"disp/{s}"] = jnp.asarray(
            rng.rand(B, H // 2 ** s, W // 2 ** s, 1).astype(np.float32) * 0.5)
        inputs[f"color/0/{s}"] = jnp.asarray(
            rng.rand(B, H // 2 ** s, W // 2 ** s, 3).astype(np.float32))
        for f in source_ids:
            outputs[f"color/{f}/{s}"] = jnp.asarray(
                rng.rand(B, H, W, 3).astype(np.float32))

    l_nhwc = compute_losses(inputs, dict(outputs), opts, source_ids)

    S = len(opts.scales)
    for f in source_ids:  # planar twins of the same warped colors
        outputs[f"color_planar/{f}"] = jnp.concatenate(
            [outputs[f"color/{f}/{s}"].transpose(0, 3, 1, 2)
             for s in opts.scales], axis=0)
    l_planar = compute_losses(inputs, outputs, opts, source_ids)
    np.testing.assert_allclose(float(l_planar["loss"]),
                               float(l_nhwc["loss"]), rtol=1e-5)
    for s in opts.scales:
        np.testing.assert_allclose(float(l_planar[f"loss/{s}"]),
                                   float(l_nhwc[f"loss/{s}"]), rtol=1e-5)


def test_grid_sample_banded_grad_interpret(rng):
    from ssde_tpu.ops.pallas.warp_banded import grid_sample_banded
    from ssde_tpu.ops.warp import grid_sample_mxu

    B, H, W = 1, 64, 128
    img = jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32))
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    gx = (2 * (xs + 0.5) / W - 1)[None] + rng.randn(B, H, W) * 0.02
    gy = (2 * (ys + 0.5) / H - 1)[None] + rng.randn(B, H, W) * 0.02
    grid = jnp.asarray(np.stack([gx, gy], -1).astype(np.float32))
    grids = grid[:, None]
    g1 = jax.grad(
        lambda g: jnp.sum(grid_sample_banded(img, g, False, 8, True) ** 2)
    )(grids)
    g2 = jax.grad(lambda g: jnp.sum(grid_sample_mxu(img, g) ** 2))(grid)
    np.testing.assert_allclose(np.asarray(g1[:, 0]), np.asarray(g2),
                               rtol=0.02, atol=0.05)


def test_grid_sample_onehot_interpret(rng):
    from ssde_tpu.ops.pallas.warp_onehot import grid_sample_onehot

    B, H, W = 1, 64, 128
    img = rng.rand(B, H, W, 3).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    gx = (2 * (xs + 0.5) / W - 1)[None] + rng.randn(B, H, W) * 0.02
    gy = (2 * (ys + 0.5) / H - 1)[None] + rng.randn(B, H, W) * 0.02
    grid = np.stack([gx, gy], -1).astype(np.float32)
    grids = jnp.asarray(np.stack([grid], 1))
    outs = np.asarray(grid_sample_onehot(jnp.asarray(img), grids,
                                         False, 8, True))
    ref = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(outs[:, 0], ref, atol=2e-2)
