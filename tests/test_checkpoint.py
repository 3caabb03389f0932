"""Checkpoint round-trip + torch-converter structure tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssde_tpu.checkpoint import (
    convert_depth_decoder,
    convert_pose_cnn,
    convert_pose_decoder,
    convert_resnet_encoder,
    load_checkpoint,
    save_checkpoint,
)
from ssde_tpu.models import DepthDecoder, PoseCNN, PoseDecoder, ResnetEncoder

H, W = 64, 96


def _flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flat(v, path))
        else:
            out[path] = v
    return out


def test_save_load_roundtrip(tmp_path):
    x = jnp.zeros((1, H, W, 3))
    enc = ResnetEncoder(18)
    variables = enc.init(jax.random.PRNGKey(0), x)
    params = {"encoder": variables["params"]}
    stats = {"encoder": variables["batch_stats"]}

    folder = str(tmp_path / "weights_0")
    save_checkpoint(folder, params, stats, None, height=H, width=W)
    assert os.path.exists(os.path.join(folder, "encoder.ckpt"))

    # perturb then load back
    zeroed = jax.tree.map(jnp.zeros_like, params)
    loaded, loaded_stats, _, meta = load_checkpoint(folder, zeroed, stats)
    for k, v in _flat(loaded["encoder"]).items():
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(_flat(params["encoder"])[k])
        )
    assert meta == {"height": H, "width": W, "use_stereo": False}


def _torch_keys_from_flax_encoder(params, stats):
    """Inverse mapping: flax ResnetEncoder tree -> reference .pth key dict."""
    sd = {}
    flat = _flat(params)
    for path, v in flat.items():
        parts = path.split("/")
        v = np.asarray(v)
        if parts[0] == "conv1":
            sd["encoder.conv1.weight"] = np.transpose(v, (3, 2, 0, 1))
        elif parts[0] == "bn1":
            field = {"scale": "weight", "bias": "bias"}[parts[-1]]
            sd[f"encoder.bn1.{field}"] = v
        elif parts[0].startswith("layer"):
            stage, block = parts[0].rsplit("_", 1)
            if parts[1] == "downsample_conv":
                sd[f"encoder.{stage}.{block}.downsample.0.weight"] = np.transpose(
                    v, (3, 2, 0, 1))
            elif parts[1] == "downsample_bn":
                field = {"scale": "weight", "bias": "bias"}[parts[-1]]
                sd[f"encoder.{stage}.{block}.downsample.1.{field}"] = v
            elif parts[1].startswith("conv"):
                sd[f"encoder.{stage}.{block}.{parts[1]}.weight"] = np.transpose(
                    v, (3, 2, 0, 1))
            elif parts[1].startswith("bn"):
                field = {"scale": "weight", "bias": "bias"}[parts[-1]]
                sd[f"encoder.{stage}.{block}.{parts[1]}.{field}"] = v
    for path, v in _flat(stats).items():
        parts = path.split("/")
        v = np.asarray(v)
        field = {"mean": "running_mean", "var": "running_var"}[parts[-1]]
        if parts[0] == "bn1":
            sd[f"encoder.bn1.{field}"] = v
        else:
            stage, block = parts[0].rsplit("_", 1)
            name = parts[1]
            if name == "downsample_bn":
                sd[f"encoder.{stage}.{block}.downsample.1.{field}"] = v
            else:
                sd[f"encoder.{stage}.{block}.{name}.{field}"] = v
    return sd


def test_convert_resnet_encoder_roundtrip():
    x = jnp.zeros((1, H, W, 3))
    enc = ResnetEncoder(18)
    variables = enc.init(jax.random.PRNGKey(3), x)
    sd = _torch_keys_from_flax_encoder(variables["params"], variables["batch_stats"])
    sd["height"] = H  # the reference embeds these in encoder.pth
    sd["width"] = W
    p, s, meta = convert_resnet_encoder(sd)
    assert int(meta["height"]) == H
    flat_ref = _flat(jax.tree.map(np.asarray, dict(variables["params"])))
    flat_conv = _flat(p)
    assert set(flat_ref) == set(flat_conv)
    for k in flat_ref:
        np.testing.assert_array_equal(flat_conv[k], flat_ref[k])
    flat_sref = _flat(jax.tree.map(np.asarray, dict(variables["batch_stats"])))
    assert set(_flat(s)) == set(flat_sref)

    # converted params must be loadable: run the encoder with them
    out = enc.apply({"params": p, "batch_stats": s}, x, False)
    assert len(out) == 5


def test_convert_depth_decoder_structure():
    x = jnp.zeros((1, H, W, 3))
    enc = ResnetEncoder(18)
    ev = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(ev, x, False)
    dec = DepthDecoder()
    dv = dec.init(jax.random.PRNGKey(1), feats)

    # fabricate a torch state dict with the reference's ModuleList layout
    sd = {}
    order = []
    for i in range(4, -1, -1):
        order += [f"upconv_{i}_0", f"upconv_{i}_1"]
    order += [f"dispconv_{s}" for s in range(4)]
    for idx, name in enumerate(order):
        if name.startswith("upconv"):
            w = dv["params"][name]["conv"]["conv"]["kernel"]
            b = dv["params"][name]["conv"]["conv"]["bias"]
            sd[f"decoder.{idx}.conv.conv.weight"] = np.transpose(np.asarray(w), (3, 2, 0, 1))
            sd[f"decoder.{idx}.conv.conv.bias"] = np.asarray(b)
        else:
            w = dv["params"][name]["conv"]["kernel"]
            b = dv["params"][name]["conv"]["bias"]
            sd[f"decoder.{idx}.conv.weight"] = np.transpose(np.asarray(w), (3, 2, 0, 1))
            sd[f"decoder.{idx}.conv.bias"] = np.asarray(b)

    p = convert_depth_decoder(sd)
    assert set(_flat(p)) == set(_flat(jax.tree.map(np.asarray, dict(dv["params"]))))
    outputs = dec.apply({"params": p}, feats)
    assert "disp/0" in outputs


def test_convert_pose_decoder_structure():
    sd = {
        "net.0.weight": np.zeros((256, 512, 1, 1), np.float32),
        "net.0.bias": np.zeros((256,), np.float32),
        "net.1.weight": np.zeros((256, 256, 3, 3), np.float32),
        "net.1.bias": np.zeros((256,), np.float32),
        "net.2.weight": np.zeros((256, 256, 3, 3), np.float32),
        "net.2.bias": np.zeros((256,), np.float32),
        "net.3.weight": np.zeros((12, 256, 1, 1), np.float32),
        "net.3.bias": np.zeros((12,), np.float32),
    }
    p = convert_pose_decoder(sd)
    assert p["squeeze"]["kernel"].shape == (1, 1, 512, 256)
    assert p["pose_2"]["kernel"].shape == (1, 1, 256, 12)


def test_convert_pose_cnn_structure():
    sd = {
        "net.0.weight": np.zeros((16, 6, 7, 7), np.float32),
        "net.0.bias": np.zeros((16,), np.float32),
        "pose_conv.weight": np.zeros((6, 256, 1, 1), np.float32),
        "pose_conv.bias": np.zeros((6,), np.float32),
    }
    p = convert_pose_cnn(sd)
    assert p["conv_0"]["kernel"].shape == (7, 7, 6, 16)
    assert p["pose_conv"]["kernel"].shape == (1, 1, 256, 6)


def test_convert_gru_blocks_roundtrip():
    """Fabricate a reference-layout GRU .pth dict from our flax init and
    check the converter reproduces the tree exactly."""
    from ssde_tpu.models import make_gru, ConvGRUBlocks

    Hs, Ws = 32, 64
    block = make_gru("v3", Hs, Ws)
    dec = {
        f"disp/{s}": jnp.zeros((1, Hs // 2**s, Ws // 2**s, c))
        for s, c in zip(range(4), (16, 32, 64, 128))
    }
    zeros = [jnp.zeros((1, Hs // 2**s, Ws // 2**s, c))
             for s, c in zip(range(4), (16, 32, 64, 128))]
    variables = block.init(jax.random.PRNGKey(0), dec, zeros)
    p = jax.tree.map(np.asarray, dict(variables["params"]))

    sd = {}
    for s in range(4):
        unit = p[f"cgru_{s}"]
        sd[f"cgru_{s}.h0_layer1"] = np.transpose(unit["h0"], (0, 3, 1, 2))
        for conv in ("conv_gates", "conv_can"):
            sd[f"cgru_{s}.cgru_1.{conv}.weight"] = np.transpose(
                unit["cell"][conv]["kernel"], (3, 2, 0, 1))
            sd[f"cgru_{s}.cgru_1.{conv}.bias"] = unit["cell"][conv]["bias"]
        sd[f"conv3x3_{s}.conv.weight"] = np.transpose(
            p[f"conv3x3_{s}"]["conv"]["kernel"], (3, 2, 0, 1))
        sd[f"conv3x3_{s}.conv.bias"] = p[f"conv3x3_{s}"]["conv"]["bias"]

    from ssde_tpu.checkpoint import convert_gru_blocks

    conv = convert_gru_blocks(sd)
    flat_ref = _flat(p)
    flat_conv = _flat(conv)
    assert set(flat_ref) == set(flat_conv)
    for k in flat_ref:
        np.testing.assert_array_equal(flat_conv[k], flat_ref[k])
    # converted params drive the block
    out_h, disp = block.apply({"params": conv}, dec, zeros)
    assert disp["disp/0"].shape == (1, Hs, Ws, 1)
