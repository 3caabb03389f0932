"""Data layer tests: transforms (vs torch color math), pipeline, synthetic."""

import numpy as np
import jax.numpy as jnp
import pytest

from ssde_tpu.data import (
    Loader,
    SyntheticKittiDataset,
    make_synthetic_batch,
    color_jitter,
    build_pyramid,
    scale_intrinsics,
    preprocess_batch,
)


def test_color_jitter_identity(rng):
    img = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    factors = jnp.asarray(np.tile([1.0, 1.0, 1.0, 0.0], (2, 1)).astype(np.float32))
    out = color_jitter(img, factors)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_color_jitter_brightness(rng):
    img = jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32) * 0.5)
    factors = jnp.asarray(np.array([[1.2, 1.0, 1.0, 0.0]], dtype=np.float32))
    out = np.asarray(color_jitter(img, factors))
    np.testing.assert_allclose(out, np.clip(np.asarray(img) * 1.2, 0, 1), atol=1e-5)


def test_color_jitter_hue_roundtrip(rng):
    """hue shift of +0.5 twice returns the original color."""
    img = jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32))
    half = jnp.asarray(np.array([[1.0, 1.0, 1.0, 0.5]], dtype=np.float32))
    out = color_jitter(color_jitter(img, half), half)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)


def test_build_pyramid_shapes(rng):
    img = jnp.asarray(rng.rand(2, 32, 64, 3).astype(np.float32))
    pyr = build_pyramid(img, 4)
    assert [p.shape for p in pyr] == [
        (2, 32, 64, 3), (2, 16, 32, 3), (2, 8, 16, 3), (2, 4, 8, 3)
    ]
    # box filter preserves the mean
    np.testing.assert_allclose(
        float(pyr[0].mean()), float(pyr[-1].mean()), atol=1e-6
    )


def test_scale_intrinsics():
    K = jnp.asarray(
        np.tile(
            np.array([[0.58, 0, 0.5, 0], [0, 1.92, 0.5, 0],
                      [0, 0, 1, 0], [0, 0, 0, 1]], dtype=np.float32)[None],
            (2, 1, 1),
        )
    )
    out = scale_intrinsics(K, 192, 640, 4)
    k0 = np.asarray(out["K/0"])[0]
    assert k0[0, 0] == pytest.approx(0.58 * 640)
    assert k0[1, 1] == pytest.approx(1.92 * 192)
    prod = np.asarray(out["K/2"])[0] @ np.asarray(out["inv_K/2"])[0]
    np.testing.assert_allclose(prod, np.eye(4), atol=1e-4)


def test_preprocess_batch_contract():
    batch = make_synthetic_batch(2, 64, 128)
    inputs = preprocess_batch(batch, 64, 128, 4, [0, -1, 1])
    for i in [0, -1, 1]:
        for s in range(4):
            assert f"color/{i}/{s}" in inputs
            assert f"color_aug/{i}/{s}" in inputs
            assert inputs[f"color/{i}/{s}"].shape == (2, 64 // 2**s, 128 // 2**s, 3)
    for s in range(4):
        assert inputs[f"K/{s}"].shape == (2, 4, 4)


def test_loader_batches():
    ds = SyntheticKittiDataset(height=32, width=64, length=10)
    loader = Loader(ds, batch_size=4, shuffle=True, drop_last=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["color/0"].shape == (4, 32, 64, 3)


def test_synthetic_has_parallax():
    ds = SyntheticKittiDataset(height=32, width=64, length=4)
    item = ds[0]
    # neighbouring frames differ (camera moved)
    assert np.abs(item["color/0"] - item["color/1"]).mean() > 1e-3


def test_item_rng_deterministic_and_schedule_free():
    """Augmentation draws are per-(seed, epoch, index): identical no matter
    which worker/schedule fetches the item, re-drawn across epochs."""
    from ssde_tpu.data.kitti import item_rng

    a = [item_rng(0, 0, i).random() for i in range(8)]
    b = [item_rng(0, 0, i).random() for i in reversed(range(8))][::-1]
    assert a == b  # order of access cannot change the draws
    c = [item_rng(0, 1, i).random() for i in range(8)]
    assert a != c  # epoch advance re-draws
    d = [item_rng(1, 0, i).random() for i in range(8)]
    assert a != d  # seed isolates runs


def test_synthetic_set_epoch_changes_jitter():
    ds = SyntheticKittiDataset(height=32, width=64, length=16, seed=3)
    first = [ds[i]["jitter"].copy() for i in range(16)]
    again = [ds[i]["jitter"].copy() for i in range(16)]
    for x, y in zip(first, again):
        np.testing.assert_array_equal(x, y)  # same epoch -> same coins
    ds.set_epoch(1)
    second = [ds[i]["jitter"].copy() for i in range(16)]
    assert any(
        not np.array_equal(x, y) for x, y in zip(first, second)
    )  # new epoch -> fresh coins
