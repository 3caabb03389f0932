"""DPT-hybrid (ViT-B + ResNet-50 stem) monocular depth model in Flax (NHWC).

Native TPU re-design of the model the reference trainer selects with
``--model dpt_gru`` (reference trainer_dpt.py:63-70:
``DPTDepthModel(backbone="vitb_rn50_384", non_negative=True)``). The
reference imports an external, un-vendored ``dpt`` package, so that config
cannot run as checked in; this module implements the same architecture
natively so the config trains end-to-end here:

  * hybrid backbone: ResNet-50 stages to 1/16 (this repo's Bottleneck
    blocks), 1x1 patch embedding to 768-d tokens + cls token + learned
    position embeddings (bilinear-resized to the input grid), 12
    pre-LN transformer blocks (12 heads, MLP 3072);
  * feature hooks at [stem 1/4, stem 1/8, block 9, block 12] (the
    vitb_rn50_384 hook set);
  * reassemble: readout "project" (token ⊕ cls -> Linear -> GELU), 1x1
    projection, resample to the 1/16 and 1/32 grids;
  * RefineNet-style fusion (FeatureFusionBlock with ResidualConvUnit,
    align_corners=True bilinear upsampling, 256 features);
  * monodepth head: 3x3 conv -> x2 upsample -> 3x3 conv -> ReLU -> 1x1
    conv -> ReLU (``non_negative=True``).

Self-attention maps of the blocks the reference visualizes
(util/misc.py:8-11: layers 3, 6, 9, 12) are returned under
``attention`` when ``capture_attention=True`` — the native equivalent of
``model.pretrained.attention["attn_k"]``.

Interop note — DECIDED (round 4): this module targets architecture
parity, not checkpoint parity, as a final scope decision. The reference
itself cannot load published ``vitb_rn50_384`` weights (its ``dpt``
package import fails as checked in, trainer_dpt.py:30), so there is no
reference behavior to match; a timm/DPT key converter would be new
surface with nothing to validate against. The trainer contract
(``disp/0`` in (0, 1) for disp_to_depth) is served by a sigmoid on the
inverse-depth logits, while ``non_negative`` ReLU inverse depth is
exposed for standalone inference (reference
dpt.models.DPTDepthModel.forward semantics).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.image import resize_bilinear
from .resnet import Bottleneck, _BatchNorm, max_pool_3x3_s2


class _ResNet50Stem(nn.Module):
    """conv1 + layer1..layer2 of ResNet-50 (to 1/8), plus layer3 (1/16).

    Returns (f_4, f_8, f_16) with channels (256, 512, 1024) — the hybrid
    backbone's convolutional hook features and the ViT patch grid.
    """

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = _BatchNorm(self.dtype, name="bn1")(x, train)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)
        feats = []
        planes = 64
        for stage_idx, n_blocks in enumerate((3, 4, 6)):
            stride = 1 if stage_idx == 0 else 2
            for block_idx in range(n_blocks):
                in_ch = x.shape[-1]
                out_ch = planes * 4
                need_ds = block_idx == 0 and (stride != 1 or in_ch != out_ch)
                x = Bottleneck(
                    planes,
                    stride=stride if block_idx == 0 else 1,
                    downsample=need_ds,
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_{block_idx}",
                )(x, train)
            feats.append(x)
            planes *= 2
        return tuple(feats)  # (1/4, 256), (1/8, 512), (1/16, 1024)


class _Attention(nn.Module):
    dim: int = 768
    num_heads: int = 12
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        h = self.num_heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B, N, 3, h, C // h), 3, axis=2)
        q, k, v = (t[:, :, 0].transpose(0, 2, 1, 3) for t in (q, k, v))
        scale = (C // h) ** -0.5
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out), attn


class _Block(nn.Module):
    """Pre-LN transformer block (ViT-B: 768 d, 12 heads, MLP 3072)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y, attn = _Attention(dtype=self.dtype, name="attn")(
            nn.LayerNorm(name="norm1")(x)
        )
        x = x + y
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(3072, dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(768, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y, attn


class _Readout(nn.Module):
    """readout="project": fold the cls token into every spatial token."""

    dtype: Any = None

    @nn.compact
    def __call__(self, tokens):
        cls, spatial = tokens[:, :1], tokens[:, 1:]
        x = jnp.concatenate(
            [spatial, jnp.broadcast_to(cls, spatial.shape)], axis=-1
        )
        x = nn.Dense(768, dtype=self.dtype, name="project")(x)
        return nn.gelu(x)


class _ResidualConvUnit(nn.Module):
    features: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                      name="conv1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                      name="conv2")(out)
        return out + x


class _FusionBlock(nn.Module):
    """RefineNet fusion: rcu(skip) + carry -> rcu -> x2 bilinear -> 1x1."""

    features: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, carry, skip=None):
        x = carry
        if skip is not None:
            x = x + _ResidualConvUnit(self.features, self.dtype,
                                      name="rcu1")(skip)
        x = _ResidualConvUnit(self.features, self.dtype, name="rcu2")(x)
        h, w = x.shape[1:3]
        x = resize_bilinear(x, (2 * h, 2 * w), align_corners=True)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       name="out_conv")(x)


class DPTDepthModel(nn.Module):
    """DPT-hybrid depth model (reference trainer_dpt.py:65-66).

    ``__call__`` returns a dict with ``disp/0`` in (0, 1) (trainer
    contract) plus ``inv_depth`` (the non-negative ReLU head output) and,
    with ``capture_attention``, ``attention`` = {"attn_1".."attn_4"}.
    """

    features: int = 256
    non_negative: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, capture_attention: bool = False):
        B, H, W, _ = x.shape
        assert H % 32 == 0 and W % 32 == 0, "input dims must be /32"
        gh, gw = H // 16, W // 16

        f4, f8, f16 = _ResNet50Stem(dtype=self.dtype, name="stem")(x, train)

        tokens = nn.Conv(768, (1, 1), dtype=self.dtype,
                         name="patch_embed")(f16).reshape(B, gh * gw, 768)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, 768))
        # learned pos embed on a canonical 24x24 (384/16) grid + cls slot,
        # bilinear-resized to the actual token grid (DPT _resize_pos_embed)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 24 * 24 + 1, 768))
        pos_sp = resize_bilinear(
            pos[:, 1:].reshape(1, 24, 24, 768), (gh, gw), align_corners=False
        ).reshape(1, gh * gw, 768)
        tokens = tokens + pos_sp
        cls_tok = jnp.broadcast_to(cls + pos[:, :1], (B, 1, 768))
        t = jnp.concatenate([cls_tok, tokens.astype(cls_tok.dtype)], axis=1)

        attn_maps = {}
        hook_tokens = {}
        for i in range(12):
            t, attn = _Block(dtype=self.dtype, name=f"block_{i}")(t)
            if i in (2, 5, 8, 11):  # layers 3,6,9,12 (util/misc.py:18)
                attn_maps[f"attn_{(i + 1) // 3}"] = attn
            if i in (8, 11):  # vitb_rn50_384 transformer hooks
                hook_tokens[i] = t
        t = nn.LayerNorm(name="norm")(t)
        hook_tokens[11] = t  # final hook reads the post-norm tokens

        def reassemble(tok, name, resample):
            y = _Readout(dtype=self.dtype, name=f"{name}_readout")(tok)
            y = y.reshape(B, gh, gw, 768)
            y = nn.Conv(768, (1, 1), dtype=self.dtype, name=f"{name}_proj")(y)
            if resample == "down2":  # 1/16 -> 1/32
                y = nn.Conv(768, (3, 3), (2, 2), padding=1, dtype=self.dtype,
                            name=f"{name}_resample")(y)
            return y

        l1 = f4                                       # 1/4, 256
        l2 = f8                                       # 1/8, 512
        l3 = reassemble(hook_tokens[8], "reassemble3", "same")   # 1/16, 768
        l4 = reassemble(hook_tokens[11], "reassemble4", "down2")  # 1/32, 768

        r1 = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                     dtype=self.dtype, name="scratch_rn1")(l1)
        r2 = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                     dtype=self.dtype, name="scratch_rn2")(l2)
        r3 = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                     dtype=self.dtype, name="scratch_rn3")(l3)
        r4 = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                     dtype=self.dtype, name="scratch_rn4")(l4)

        p = _FusionBlock(self.features, self.dtype, name="fusion4")(r4)
        p = _FusionBlock(self.features, self.dtype, name="fusion3")(p, r3)
        p = _FusionBlock(self.features, self.dtype, name="fusion2")(p, r2)
        p = _FusionBlock(self.features, self.dtype, name="fusion1")(p, r1)
        # p is now at 1/2 resolution

        h = nn.Conv(self.features // 2, (3, 3), padding=1, dtype=self.dtype,
                    name="head_conv1")(p)
        h = resize_bilinear(h, (H, W), align_corners=True)
        h = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype,
                    name="head_conv2")(h)
        h = nn.relu(h)
        logits = nn.Conv(1, (1, 1), dtype=self.dtype, name="head_conv3")(h)

        out = {
            "disp/0": nn.sigmoid(logits.astype(jnp.float32)),
            "inv_depth": (nn.relu(logits) if self.non_negative
                          else logits).astype(jnp.float32)[..., 0],
        }
        if capture_attention:
            out["attention"] = attn_maps
        return out


def get_mean_attention_map(attn, token_index: int, grid_hw: Tuple[int, int]):
    """Mean over heads of one query token's attention to the spatial grid.

    Native equivalent of ``dpt.vit.get_mean_attention_map`` (reference
    util/misc.py:3): ``attn`` (B, heads, N+1, N+1); ``token_index``
    indexes the SPATIAL tokens (e.g. 1 = upper-left, -1 = lower-right);
    returns (B, gh, gw) attention maps.
    """
    gh, gw = grid_hw
    spatial = attn[:, :, 1:, 1:]  # drop cls query/key slots
    row = spatial[:, :, token_index if token_index >= 0
                  else spatial.shape[2] + token_index]
    return jnp.mean(row, axis=1).reshape(attn.shape[0], gh, gw)
