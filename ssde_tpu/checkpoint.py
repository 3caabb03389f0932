"""Checkpointing: native msgpack save/load + PyTorch ``.pth`` converters.

Native format mirrors the reference's per-module file contract
(``weights_<epoch>/{encoder,depth,pose_encoder,pose,gru,head,fusion}.ckpt``
+ ``adam.ckpt``, reference trainer.py:711-763), with height/width/
use_stereo embedded in the encoder file exactly as the reference embeds
them in ``encoder.pth`` (trainer.py:717-721; read back by
test_simple.py:76-77 and evaluate_depth.py:87).

Converters load Monodepth2-family PyTorch checkpoints (zoo or
reference-trained) into our NHWC flax trees: conv kernels transpose
(O, I, H, W) -> (H, W, I, O); BatchNorm weight/bias -> scale/bias and
running stats -> batch_stats.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional, Tuple

import numpy as np

import flax
from flax import serialization


# ---------------------------------------------------------------- native IO

def save_module(path: str, params, extra: Optional[dict] = None):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {"params": serialization.to_bytes(params), "extra": extra or {}}
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_module(path: str, template=None) -> Tuple[Any, dict]:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    params = serialization.from_bytes(template, payload["params"])
    return params, payload.get("extra", {})


def save_checkpoint(folder: str, params: Dict[str, Any], batch_stats: Dict[str, Any],
                    opt_state=None, *, height: int, width: int,
                    use_stereo: bool = False):
    """Per-module checkpoint directory (reference save_model contract)."""
    os.makedirs(folder, exist_ok=True)
    for name, p in params.items():
        extra = {"batch_stats": serialization.to_bytes(batch_stats.get(name, {}))}
        if name == "encoder":
            extra.update({"height": height, "width": width, "use_stereo": use_stereo})
        save_module(os.path.join(folder, f"{name}.ckpt"), p, extra)
    if opt_state is not None:
        save_module(os.path.join(folder, "adam.ckpt"), opt_state)


def load_checkpoint(folder: str, params: Dict[str, Any],
                    batch_stats: Dict[str, Any], models_to_load=None,
                    opt_state=None):
    """Load intersecting modules from ``folder`` into (params, batch_stats).

    Mirrors reference load_model: missing files are skipped
    (trainer.py:740-751)."""
    params = dict(params)
    batch_stats = dict(batch_stats)
    meta = {}
    for name in models_to_load or list(params):
        path = os.path.join(folder, f"{name}.ckpt")
        if name not in params or not os.path.exists(path):
            continue
        loaded, extra = load_module(path, params[name])
        params[name] = loaded
        if "batch_stats" in extra and name in batch_stats:
            batch_stats[name] = serialization.from_bytes(
                batch_stats[name], extra["batch_stats"]
            )
        if name == "encoder":
            meta = {k: extra[k] for k in ("height", "width", "use_stereo")
                    if k in extra}
    new_opt = None
    adam_path = os.path.join(folder, "adam.ckpt")
    if opt_state is not None and os.path.exists(adam_path):
        # Tolerate optimizer-state layout drift (e.g. the chain grew a
        # freeze slot): params/batch_stats still load; training resumes
        # with fresh Adam moments instead of crashing (mirrors the
        # reference's "Cannot find Adam weights, randomly initialized"
        # fallback, trainer.py:755-763).
        try:
            new_opt, _ = load_module(adam_path, opt_state)
        except Exception as e:  # noqa: BLE001 - any deserialization mismatch
            import warnings

            warnings.warn(
                f"adam.ckpt does not match the current optimizer layout "
                f"({e}); optimizer state freshly initialized"
            )
            new_opt = None
    return params, batch_stats, new_opt, meta


# ------------------------------------------------------- torch conversion

def _load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    out = {}
    for k, v in sd.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().numpy()
        else:
            out[k] = np.asarray(v)
    return out


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """(O, I, kh, kw) -> (kh, kw, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def _set(tree: dict, path: str, value):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def convert_resnet_encoder(sd: Dict[str, np.ndarray]):
    """Reference ResnetEncoder .pth -> (params, batch_stats).

    Handles both "encoder.conv1.weight" (wrapped, reference
    resnet_encoder.py:82) and bare torchvision "conv1.weight" keys, and
    strips the reference's embedded height/width/use_stereo entries."""
    params: dict = {}
    stats: dict = {}
    meta = {}
    for key, v in sd.items():
        if key in ("height", "width", "use_stereo"):
            meta[key] = v
            continue
        k = key[len("encoder."):] if key.startswith("encoder.") else key
        if k.startswith("fc."):
            continue
        parts = k.split(".")
        if parts[0] in ("conv1", "bn1"):
            prefix = parts[0]
            rest = parts[1]
            if prefix == "conv1":
                _set(params, "conv1/kernel", _conv_kernel(v))
            else:
                _bn_assign(params, stats, "bn1/bn", rest, v)
        elif parts[0].startswith("layer"):
            stage = parts[0]          # layer1
            block = parts[1]          # 0
            sub = parts[2]            # conv1 / bn1 / downsample
            name = f"{stage}_{block}"
            if sub == "downsample":
                which = parts[3]      # 0 (conv) or 1 (bn)
                rest = parts[4]
                if which == "0":
                    _set(params, f"{name}/downsample_conv/kernel", _conv_kernel(v))
                else:
                    _bn_assign(params, stats, f"{name}/downsample_bn/bn", rest, v)
            elif sub.startswith("conv"):
                _set(params, f"{name}/{sub}/kernel", _conv_kernel(v))
            elif sub.startswith("bn"):
                _bn_assign(params, stats, f"{name}/{sub}/bn", parts[3], v)
    return params, stats, meta


def _bn_assign(params, stats, base, field, v):
    if field == "weight":
        _set(params, f"{base}/scale", v)
    elif field == "bias":
        _set(params, f"{base}/bias", v)
    elif field == "running_mean":
        _set(stats, f"{base}/mean", v)
    elif field == "running_var":
        _set(stats, f"{base}/var", v)
    # num_batches_tracked: dropped


def convert_depth_decoder(sd: Dict[str, np.ndarray], scales=(0, 1, 2, 3)):
    """Reference DepthDecoder .pth -> params.

    The reference registers modules as an ordered ModuleList ``decoder.N``
    (depth_decoder.py:47): N = 0..9 are (upconv, 4..0, 0/1) ConvBlocks,
    then one dispconv per scale."""
    order = []
    for i in range(4, -1, -1):
        order.append(f"upconv_{i}_0")
        order.append(f"upconv_{i}_1")
    for s in scales:
        order.append(f"dispconv_{s}")

    params: dict = {}
    for key, v in sd.items():
        parts = key.split(".")
        assert parts[0] == "decoder"
        idx = int(parts[1])
        name = order[idx]
        field = "kernel" if parts[-1] == "weight" else "bias"
        value = _conv_kernel(v) if parts[-1] == "weight" else v
        if name.startswith("upconv"):
            # ConvBlock -> Conv3x3(name=conv) -> nn.Conv(name=conv)
            _set(params, f"{name}/conv/conv/{field}", value)
        else:
            _set(params, f"{name}/conv/{field}", value)
    return params


def convert_pose_decoder(sd: Dict[str, np.ndarray]):
    """Reference PoseDecoder .pth -> params (net.0 = squeeze, net.1..3 = pose_0..2)."""
    names = {"0": "squeeze", "1": "pose_0", "2": "pose_1", "3": "pose_2"}
    params: dict = {}
    for key, v in sd.items():
        parts = key.split(".")
        idx = parts[1]
        field = "kernel" if parts[-1] == "weight" else "bias"
        value = _conv_kernel(v) if parts[-1] == "weight" else v
        _set(params, f"{names[idx]}/{field}", value)
    return params


def convert_pose_cnn(sd: Dict[str, np.ndarray]):
    params: dict = {}
    for key, v in sd.items():
        parts = key.split(".")
        if parts[0] == "net":
            name = f"conv_{parts[1]}"
        else:
            name = "pose_conv"
        field = "kernel" if parts[-1] == "weight" else "bias"
        value = _conv_kernel(v) if parts[-1] == "weight" else v
        _set(params, f"{name}/{field}", value)
    return params


def load_monodepth2_checkpoint(folder: str):
    """Load a reference-format checkpoint folder
    ({encoder,depth,pose_encoder,pose}.pth) into flax trees.

    Returns (params, batch_stats, meta) with meta carrying the encoder's
    embedded height/width/use_stereo."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    meta: Dict[str, Any] = {}

    enc_path = os.path.join(folder, "encoder.pth")
    if os.path.exists(enc_path):
        p, s, meta = convert_resnet_encoder(_load_torch_state_dict(enc_path))
        params["encoder"], stats["encoder"] = p, s
    depth_path = os.path.join(folder, "depth.pth")
    if os.path.exists(depth_path):
        params["depth"] = convert_depth_decoder(_load_torch_state_dict(depth_path))
    pe_path = os.path.join(folder, "pose_encoder.pth")
    if os.path.exists(pe_path):
        p, s, _ = convert_resnet_encoder(_load_torch_state_dict(pe_path))
        params["pose_encoder"], stats["pose_encoder"] = p, s
    pose_path = os.path.join(folder, "pose.pth")
    if os.path.exists(pose_path):
        params["pose"] = convert_pose_decoder(_load_torch_state_dict(pose_path))
    gru_path = os.path.join(folder, "gru.pth")
    if os.path.exists(gru_path):
        params["gru"] = convert_gru_blocks(_load_torch_state_dict(gru_path))
    head_path = os.path.join(folder, "head.pth")
    if os.path.exists(head_path):
        params["head"] = convert_head(_load_torch_state_dict(head_path))
    fusion_path = os.path.join(folder, "fusion.pth")
    if os.path.exists(fusion_path):
        params["fusion"] = convert_fusion_v2(_load_torch_state_dict(fusion_path))
    return params, stats, meta


def _convert_attention_conv(sd, prefix, out, out_prefix):
    """rnn.py/fusion_v2.py AttentionConv params -> flax AttentionConv tree.

    rel_h torch shape (C/2,1,1,k,1) or (1,1,1,k,1) -> ours (C/2,k) or (k,).
    """
    for name in ("key_conv", "query_conv", "value_conv"):
        w = sd.get(f"{prefix}.{name}.weight")
        if w is not None:
            _set(out, f"{out_prefix}/{name}/kernel", _conv_kernel(w))
        b = sd.get(f"{prefix}.{name}.bias")
        if b is not None:
            _set(out, f"{out_prefix}/{name}/bias", b)
    for rel in ("rel_h", "rel_w"):
        r = sd.get(f"{prefix}.{rel}")
        if r is not None:
            r = np.asarray(r)
            r = r.reshape(r.shape[0], -1) if r.shape[0] > 1 else r.reshape(-1)
            _set(out, f"{out_prefix}/{rel}", r)


def _convert_rcu(sd, prefix, out, out_prefix):
    """ResidualConvUnit or ResidualAttentionUnit under ``prefix``."""
    if f"{prefix}.conv1.weight" in sd:  # conv variant
        for i in (1, 2):
            _set(out, f"{out_prefix}/conv{i}/kernel",
                 _conv_kernel(sd[f"{prefix}.conv{i}.weight"]))
            _set(out, f"{out_prefix}/conv{i}/bias", sd[f"{prefix}.conv{i}.bias"])
    else:  # attention variant
        for i in (1, 2):
            _convert_attention_conv(sd, f"{prefix}.atten{i}", out,
                                    f"{out_prefix}/atten{i}")


def convert_gru_blocks(sd: Dict[str, np.ndarray], cell: str = "gru"):
    """Reference ConvGRUBlocks_v* .pth -> flax ConvGRUBlocks params.

    Key layout (reference rnn.py): ``cgru_{s}.h0_layer1`` (1, C, H, W),
    ``cgru_{s}.cgru_1.conv_gates/conv_can`` (GRU) or ``.clstm_1.conv``
    (LSTM), per-scale heads ``conv3x3_{s}.conv`` and fusion blocks
    ``fusion_{s}.*``."""
    params: dict = {}
    for key, v in sd.items():
        parts = key.split(".")
        if parts[0].startswith("cgru_"):
            unit = parts[0]
            if parts[1] in ("h0_layer1", "c0_layer1"):
                name = "h0" if parts[1] == "h0_layer1" else "c0"
                _set(params, f"{unit}/{name}", np.transpose(v, (0, 2, 3, 1)))
            elif parts[1] in ("cgru_1", "clstm_1"):
                conv = parts[2]  # conv_gates | conv_can | conv
                field = "kernel" if parts[-1] == "weight" else "bias"
                value = _conv_kernel(v) if parts[-1] == "weight" else v
                _set(params, f"{unit}/cell/{conv}/{field}", value)
        elif parts[0].startswith("conv3x3_"):
            field = "kernel" if parts[-1] == "weight" else "bias"
            value = _conv_kernel(v) if parts[-1] == "weight" else v
            _set(params, f"{parts[0]}/conv/{field}", value)
    # fusion blocks (attention or conv residual units + conv3x3 head)
    fusion_prefixes = sorted({k.split(".")[0] for k in sd
                              if k.startswith("fusion_")})
    for fp in fusion_prefixes:
        for rcu in ("resConfUnit1", "resConfUnit2", "resConfUnit3"):
            if any(k.startswith(f"{fp}.{rcu}.") for k in sd):
                _convert_rcu(sd, f"{fp}.{rcu}", params, f"{fp}/{rcu}")
        if f"{fp}.conv3x3.conv.weight" in sd:
            _set(params, f"{fp}/conv3x3/conv/kernel",
                 _conv_kernel(sd[f"{fp}.conv3x3.conv.weight"]))
            _set(params, f"{fp}/conv3x3/conv/bias", sd[f"{fp}.conv3x3.conv.bias"])
    return params


def convert_head(sd: Dict[str, np.ndarray]):
    """Reference Head_v4/Head_v7 .pth -> flax Head params."""
    params: dict = {}
    for key, v in sd.items():
        parts = key.split(".")
        field = "kernel" if parts[-1] == "weight" else "bias"
        value = _conv_kernel(v) if parts[-1] == "weight" else v
        _set(params, f"{parts[0]}/conv/{field}", value)
    return params


def convert_fusion_v2(sd: Dict[str, np.ndarray]):
    """Reference fusion_v2.Fusion / Fusion_v3 .pth -> flax params.

    Blocks ``fusion_block_{n}`` with residual units, conv_init/conv_1 and
    UpscalePS convs. A bare FeatureFusionBlock state dict (the scale-loop
    trainer saves its single block as fusion.pth, reference trainer.py:78)
    has no ``fusion_block_`` prefix — converted at the tree root."""
    params: dict = {}
    blocks = sorted({k.split(".")[0] for k in sd if k.startswith("fusion_block")})
    if not blocks and any(k.startswith("resConfUnit") for k in sd):
        out: dict = {}
        for rcu in ("resConfUnit1", "resConfUnit2", "resConfUnit3"):
            if any(k.startswith(f"{rcu}.") for k in sd):
                _convert_rcu(sd, rcu, out, rcu)
        if "conv3x3.conv.weight" in sd:
            _set(out, "conv3x3/conv/kernel", _conv_kernel(sd["conv3x3.conv.weight"]))
            _set(out, "conv3x3/conv/bias", sd["conv3x3.conv.bias"])
        return out
    for bp in blocks:
        for rcu in ("resConfUnit1", "resConfUnit2", "resConfUnit3"):
            if any(k.startswith(f"{bp}.{rcu}.") for k in sd):
                _convert_rcu(sd, f"{bp}.{rcu}", params, f"{bp}/{rcu}")
        for conv in ("conv_init", "conv_1"):
            if f"{bp}.{conv}.weight" in sd:
                _set(params, f"{bp}/{conv}/kernel",
                     _conv_kernel(sd[f"{bp}.{conv}.weight"]))
                _set(params, f"{bp}/{conv}/bias", sd[f"{bp}.{conv}.bias"])
        if f"{bp}.conv3x3.conv.weight" in sd:
            _set(params, f"{bp}/conv3x3/conv/kernel",
                 _conv_kernel(sd[f"{bp}.conv3x3.conv.weight"]))
            _set(params, f"{bp}/conv3x3/conv/bias", sd[f"{bp}.conv3x3.conv.bias"])
        for ups in ("upscale", "upscale_1", "upscale_2"):
            if f"{bp}.{ups}.conv.weight" in sd:
                _set(params, f"{bp}/{ups}/conv/kernel",
                     _conv_kernel(sd[f"{bp}.{ups}.conv.weight"]))
                _set(params, f"{bp}/{ups}/conv/bias", sd[f"{bp}.{ups}.conv.bias"])
    return params
