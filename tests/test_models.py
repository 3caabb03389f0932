"""Shape/contract tests for the Flax model zoo (small inputs, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssde_tpu.models import (
    ResnetEncoder,
    DepthDecoder,
    PoseDecoder,
    PoseCNN,
    AttentionConv,
    ResidualAttentionUnit,
    ResnetEncoderAttention,
    AttentionResNet,
    FeatureFusionBlock,
    Fusion,
    Fusion_v3,
    UpscalePS,
)

H, W = 64, 96  # multiples of 32


def init_and_run(model, *args, method=None, train=False, **kwargs):
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, *args, **kwargs)
    return model.apply(variables, *args, **kwargs), variables


def test_resnet18_encoder_shapes():
    x = jnp.zeros((2, H, W, 3))
    enc = ResnetEncoder(18)
    feats, variables = init_and_run(enc, x)
    assert len(feats) == 5
    expected_ch = [64, 64, 128, 256, 512]
    expected_div = [2, 4, 8, 16, 32]
    for f, ch, d in zip(feats, expected_ch, expected_div):
        assert f.shape == (2, H // d, W // d, ch)
    assert list(enc.num_ch_enc) == expected_ch


def test_resnet50_encoder_shapes():
    x = jnp.zeros((1, H, W, 3))
    enc = ResnetEncoder(50)
    feats, _ = init_and_run(enc, x)
    assert [f.shape[-1] for f in feats] == [64, 256, 512, 1024, 2048]
    assert list(enc.num_ch_enc) == [64, 256, 512, 1024, 2048]


def test_resnet_param_count_matches_torchvision():
    """Parameter count equality with torchvision resnet18 backbone (sans fc).

    torchvision resnet18 has 11,689,512 params; the fc head (512*1000+1000)
    is not part of the encoder -> 11,176,512 learnable weights (conv + bn
    scale/bias). BatchNorm running stats are not learnable and live in
    batch_stats.
    """
    x = jnp.zeros((1, H, W, 3))
    _, variables = init_and_run(ResnetEncoder(18), x)
    ours = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert ours == 11_176_512


def test_multiimage_encoder():
    x = jnp.zeros((2, H, W, 6))
    feats, _ = init_and_run(ResnetEncoder(18, num_input_images=2), x)
    assert feats[0].shape == (2, H // 2, W // 2, 64)


def test_depth_decoder_shapes():
    x = jnp.zeros((2, H, W, 3))
    enc = ResnetEncoder(18)
    feats, _ = init_and_run(enc, x)
    dec = DepthDecoder(scales=(0, 1, 2, 3))
    outputs, _ = init_and_run(dec, feats)
    for s in range(4):
        d = outputs[f"disp/{s}"]
        assert d.shape == (2, H // 2**s, W // 2**s, 1)
        vals = np.asarray(d)
        assert (vals >= 0).all() and (vals <= 1).all()


def test_depth_decoder_pre_disp():
    x = jnp.zeros((2, H, W, 3))
    feats, _ = init_and_run(ResnetEncoder(18), x)
    dec = DepthDecoder()
    rng = jax.random.PRNGKey(0)
    variables = dec.init(rng, feats, pre_disp=True)
    outputs = dec.apply(variables, feats, pre_disp=True)
    expected_ch = {0: 16, 1: 32, 2: 64, 3: 128}
    for s in range(4):
        assert outputs[f"disp/{s}"].shape[-1] == expected_ch[s]


def test_pose_decoder():
    x = jnp.zeros((2, H, W, 6))
    enc = ResnetEncoder(18, num_input_images=2)
    feats, _ = init_and_run(enc, x)
    pd = PoseDecoder(num_input_features=1, num_frames_to_predict_for=2)
    (aa, t), _ = init_and_run(pd, [feats])
    assert aa.shape == (2, 2, 1, 3)
    assert t.shape == (2, 2, 1, 3)


def test_pose_cnn():
    x = jnp.zeros((2, H, W, 6))
    (aa, t), _ = init_and_run(PoseCNN(num_input_frames=2), x)
    assert aa.shape == (2, 1, 1, 3)


def test_attention_conv_matches_reference_semantics(rng):
    """Our windowed attention equals a direct torch port of the reference math."""
    import torch
    import torch.nn.functional as F

    B, h, w, C, k = 1, 6, 8, 8, 3
    x = rng.rand(B, h, w, C).astype(np.float32)

    model = AttentionConv(C, k, groups=2)
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(x))
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))

    p = variables["params"]
    wq = np.asarray(p["query_conv"]["kernel"])[0, 0].T  # (C, Cin)
    wk = np.asarray(p["key_conv"]["kernel"])[0, 0].T
    wv = np.asarray(p["value_conv"]["kernel"])[0, 0].T
    rel_h = np.asarray(p["rel_h"])  # (C/2, k)
    rel_w = np.asarray(p["rel_w"])

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    pad = (k - 1) // 2
    xp = F.pad(xt, [pad, pad, pad, pad])
    q = torch.einsum("oc,bchw->bohw", torch.from_numpy(wq), xt)
    kk = torch.einsum("oc,bchw->bohw", torch.from_numpy(wk), xp)
    vv = torch.einsum("oc,bchw->bohw", torch.from_numpy(wv), xp)
    kk = kk.unfold(2, k, 1).unfold(3, k, 1)  # B,C,H,W,k,k
    vv = vv.unfold(2, k, 1).unfold(3, k, 1)
    k_h, k_w = kk.split(C // 2, dim=1)
    rh = torch.from_numpy(rel_h).view(C // 2, 1, 1, k, 1)
    rw = torch.from_numpy(rel_w).view(C // 2, 1, 1, 1, k)
    kk = torch.cat((k_h + rh, k_w + rw), dim=1)
    kk = kk.contiguous().view(B, C, h, w, -1)
    vv = vv.contiguous().view(B, C, h, w, -1)
    logits = q.view(B, C, h, w, 1) * kk
    attn = F.softmax(logits, dim=-1)
    ref = torch.einsum("bchwk,bchwk->bchw", attn, vv).numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_residual_attention_unit_shape(rng):
    x = jnp.asarray(rng.rand(1, 6, 8, 4).astype(np.float32))
    out, _ = init_and_run(ResidualAttentionUnit(4), x)
    assert out.shape == x.shape


def test_attention_encoder_shapes():
    x = jnp.zeros((1, H, W, 3))
    feats, _ = init_and_run(ResnetEncoderAttention(18), x)
    assert [f.shape[-1] for f in feats] == [64, 64, 128, 256, 512]


def test_attention_resnet_shapes():
    x = jnp.zeros((1, H, W, 3))
    feats, _ = init_and_run(AttentionResNet((1, 1, 1, 1)), x)
    assert [f.shape[-1] for f in feats] == [64, 64, 128, 256, 512]


def test_upscale_ps(rng):
    x = jnp.asarray(rng.rand(1, 4, 6, 8).astype(np.float32))
    out, _ = init_and_run(UpscalePS(output_ch=1, scale=2), x)
    assert out.shape == (1, 8, 12, 1)


def test_feature_fusion_block(rng):
    d = jnp.asarray(rng.rand(1, 8, 12, 1).astype(np.float32))
    ffb = FeatureFusionBlock(features=2)
    rngk = jax.random.PRNGKey(0)
    variables = ffb.init(rngk, d, d, d, d)
    out, up = ffb.apply(variables, d, d, d, d)
    assert out.shape == (1, 8, 12, 1)
    assert up.shape == (1, 16, 24, 1)


def _pre_disp_dicts(rng, h, w):
    ch = {0: 16, 1: 32, 2: 64, 3: 128}
    return {
        f"disp/{s}": jnp.asarray(
            rng.rand(1, h // 2**s, w // 2**s, ch[s]).astype(np.float32)
        )
        for s in range(4)
    }


def test_fusion_pyramid(rng):
    h, w = 32, 64
    dec = _pre_disp_dicts(rng, h, w)
    dec1 = _pre_disp_dicts(rng, h, w)
    dec2 = _pre_disp_dicts(rng, h, w)
    model = Fusion()
    variables = model.init(jax.random.PRNGKey(0), dec, dec1, dec2)
    out = model.apply(variables, dec, dec1, dec2)
    # every scale's disp is emitted at full resolution (PixelShuffle to 1x)
    for s in range(4):
        assert out[f"disp/{s}"].shape == (1, h, w, 1)


def test_fusion_v3(rng):
    h, w = 32, 64
    mk = lambda: {
        f"disp/{s}": jnp.asarray(
            rng.rand(1, h // 2**s, w // 2**s, 1).astype(np.float32)
        )
        for s in range(4)
    }
    dec, dec1, dec2 = mk(), mk(), mk()
    model = Fusion_v3(attention=False)
    variables = model.init(jax.random.PRNGKey(0), dec, dec1, dec2)
    out = model.apply(variables, dec, dec1, dec2)
    for s in range(4):
        assert out[f"disp/{s}"].shape == (1, h // 2**s, w // 2**s, 1)
