"""ConvGRU / ConvLSTM recurrent depth heads in Flax (NHWC).

Re-design of reference ``networks/rnn.py`` (1306 LoC, versions v1..v10 as
near-duplicate classes) into one parameterized family:

  * :class:`ConvGRUCell` — conv gates (reset/update) + tanh candidate
    (reference rnn.py:101-140);
  * :class:`ConvLSTMCell` — single conv producing i,f,o,g (rnn.py:32-79);
  * :class:`ConvGRUBlocks` — the per-scale block, ``version`` selects the
    wiring (v1 rnn.py:187-265, v2 :270-368, v3 :796-870, v4 :874-957,
    v5 :960-1028, v7 :1032-1104, v8 :371-469, v9/v10 :472-569);
  * :class:`Head` — the external conv heads for v4/v6/v7 (rnn.py:909-957,
    1107-1130).

Each block step is a pure function ``(dec_outputs, hidden) -> (hidden',
disp_or_None)`` so trainers unroll time with ``jax.lax.scan`` instead of
the reference's Python loop (trainer_gru.py:383-397). Learned initial
hidden states are parameters (``h0`` / ``c0``), exposed via
``initial_state``; resolutions are derived from (height, width) rather
than hard-coded to 640x192.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.image import pixel_shuffle
from .common import Conv3x3, _ConvParams, conv_same_nhwc
from .fusion import GRUFusionBlock, GRUFusionBlock_v2


def _planar_cell(x_shape, hid: int, k: int) -> bool:
    """Trace-time choice: run the cell convs in planar (B, H, C, W) layout
    through the fused Pallas zero-pad kernel (ops/pallas/conv3x3).

    XLA's NHWC lowering of the cells' small-channel 3x3 convs materializes
    an im2col (~9x the activation traffic, see conv3x3.py docstring); the
    planar kernel keeps the halo in VMEM. Worth it only in the small-
    channel / wide-row regime (GRU scales 0-1: hid 32/64 at W 640/320) —
    at hid >= 128 the NHWC lanes are already full, and planar's W padding
    loses at the coarse scales. ``SSDE_PLANAR_GRU=0|1`` overrides the
    heuristic (subject to the kernel's static fit).
    """
    if k != 3:
        return False
    from ..ops.pallas.conv3x3 import fits_conv3x3

    _, H, W, C = x_shape
    fits = fits_conv3x3(H, W, C + hid, 3 * hid) and W % 128 == 0
    env = os.environ.get("SSDE_PLANAR_GRU")
    if env is not None:
        return fits and env not in ("0", "false")
    if os.environ.get("SSDE_CONV_INTERPRET"):
        return fits
    return fits and hid <= 64 and W >= 256 and jax.default_backend() != "cpu"


def _pad_w(x, wp: int):
    """Right-pad the lane dim of a planar (B, H, C, W) tensor to wp."""
    if x.shape[3] >= wp:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, wp - x.shape[3])))


def _gru_planar_cfg(version: str, height: int, width: int, attention: bool,
                    n_scales: int):
    """Per-scale (planar, wp, wl) plan for the v9/v10 block wiring.

    A planar scale runs its WHOLE step — GRU cell, fusion RCUs, disp
    head, PixelShuffle up — in chain-padded planar layout (physical width
    wp, logical wl; see conv3x3_zero_chain), including the scan carry, so
    the only transposes are the per-step dec-feature entry and the tiny
    1-channel disp exit. Applies only where the fusion blocks are
    attention-free (v10, or v9 with --no attention) — attention units
    keep NHWC, and mixing layouts per scale would re-buy the transposes.
    """
    cfg = [(False, 0, 0)] * n_scales
    spec = GRU_HIDDEN_SPECS.get(version)
    if version not in ("v9", "v10") or spec["cell"] != "gru":
        return cfg
    env = os.environ.get("SSDE_PLANAR_GRU")
    force = bool(os.environ.get("SSDE_CONV_INTERPRET"))
    if env is not None:
        if env in ("0", "false"):
            return cfg
        force = True
    elif not force and jax.default_backend() == "cpu":
        return cfg
    from ..ops.pallas.attention_win import fits_attend3
    from ..ops.pallas.conv3x3 import fits_conv3x3

    # v9's fusion blocks use attention units; their planar path needs the
    # fused attention kernel (feats = GRUFusionBlock_v2 features per scale)
    feats = (32, 64, 128, 256)

    # scale 3 is hardwired NHWC in the block wiring (hid 256 fills the
    # lanes; W/8 < one lane tile), so only scales 0-2 are candidates
    for s in range(min(3, n_scales)):
        Hs, Ws = height >> s, width >> s
        hid, cx = spec["hid"][s], spec["in_ch"][s]
        wp = -(-Ws // 128) * 128
        ok = fits_conv3x3(Hs, wp, cx + hid, 3 * hid) and (
            force or (hid <= 64 and Ws >= 256 and 4 * wp <= 5 * Ws)
        )
        if ok and attention and version != "v10":
            ok = fits_attend3(Hs, feats[s], Ws)
        cfg[s] = (True, wp, Ws) if ok else (False, 0, 0)
    return cfg


class ConvGRUCell(nn.Module):
    hidden_dim: int
    kernel_size: int = 3
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, h, planar: bool = False, wl: int = 0):
        k, hid = self.kernel_size, self.hidden_dim
        cx = x.shape[2] if planar else x.shape[-1]
        # Parameters are exactly the reference layout (rnn.py:101-140):
        # conv_gates (cx+hid -> 2*hid) on concat([x, h]) and conv_can
        # (cx+hid -> hid) on concat([x, reset*h]). The COMPUTE is
        # restructured: conv(concat([a, b]), K) == conv(a, K[:ca]) +
        # conv(b, K[ca:]), so each source tensor is convolved once (x at
        # 3*hid out) and the two activation concats — pure HBM traffic —
        # disappear. Weight-space slices/concats are tiny and hoisted.
        kg, bg = _ConvParams((k, k, cx + hid, 2 * hid), self.use_bias,
                             name="conv_gates")()
        kc, bc = _ConvParams((k, k, cx + hid, hid), self.use_bias,
                             name="conv_can")()
        kx = jnp.concatenate([kg[:, :, :cx], kc[:, :, :cx]], axis=-1)
        bx = (jnp.concatenate([bg, bc]) if self.use_bias else None)
        if planar:
            # x/h are already chain-padded planar (B, H, C, W), logical wl
            return self._planar(x, h, kx, bx, kg[:, :, cx:], kc[:, :, cx:],
                                wl or x.shape[3])
        if _planar_cell(x.shape, hid, k):
            return self._planar(
                x.transpose(0, 1, 3, 2), h.transpose(0, 1, 3, 2), kx, bx,
                kg[:, :, cx:], kc[:, :, cx:], x.shape[2],
            ).transpose(0, 1, 3, 2)
        xs = conv_same_nhwc(x, kx, bx, self.dtype)
        hs = conv_same_nhwc(h, kg[:, :, cx:], None, self.dtype)
        gates = xs[..., :2 * hid] + hs
        reset = nn.sigmoid(gates[..., :hid])
        update = nn.sigmoid(gates[..., hid:])
        ch = conv_same_nhwc(reset * h, kc[:, :, cx:], None, self.dtype)
        cand = jnp.tanh(xs[..., 2 * hid:] + ch)
        return (1.0 - update) * h + update * cand

    def _planar(self, x, h, kx, bx, kgh, kch, wl):
        """Same gate equations in chain-padded planar (B, H, C, W) layout:
        three fused Pallas zero-pad convs (x -> 3*hid, h -> 2*hid,
        reset*h -> hid), logical width ``wl``. Fill columns stay zero: the
        kernels mask their outputs past wl, so reset/update are 0.5 there
        and cand/h are 0 — (1-u)*0 + u*tanh(0) == 0. Parameters and
        results are identical to the NHWC path (tested)."""
        from ..ops.pallas.conv3x3 import conv3x3_zero_chain

        hid = self.hidden_dim
        interp = bool(os.environ.get("SSDE_CONV_INTERPRET"))
        dt = self.dtype or x.dtype
        cast = lambda a: a.astype(dt) if a is not None else None
        xp, hp = cast(x), cast(h)
        xs = conv3x3_zero_chain(xp, cast(kx), cast(bx), wl=wl,
                                interpret=interp)
        hs = conv3x3_zero_chain(hp, cast(kgh), None, wl=wl, interpret=interp)
        gates = xs[:, :, :2 * hid] + hs
        reset = nn.sigmoid(gates[:, :, :hid])
        update = nn.sigmoid(gates[:, :, hid:])
        ch = conv3x3_zero_chain(reset * hp, cast(kch), None, wl=wl,
                                interpret=interp)
        cand = jnp.tanh(xs[:, :, 2 * hid:] + ch)
        new = (1.0 - update) * hp + update * cand
        return new


class ConvLSTMCell(nn.Module):
    hidden_dim: int
    kernel_size: int = 3
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, state):
        h, c = state
        k, hid = self.kernel_size, self.hidden_dim
        cx = x.shape[-1]
        # same split-conv restructure as ConvGRUCell (no activation concat)
        kv, bv = _ConvParams((k, k, cx + hid, 4 * hid), self.use_bias,
                             name="conv")()
        conv = (conv_same_nhwc(x, kv[:, :, :cx], bv, self.dtype)
                + conv_same_nhwc(h, kv[:, :, cx:], None, self.dtype))
        i, f, o, g = jnp.split(conv, 4, axis=-1)
        c_next = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
        h_next = nn.sigmoid(o) * jnp.tanh(c_next)
        return h_next, c_next


class RecurrentUnit(nn.Module):
    """One per-scale recurrent cell with a learnable initial state.

    Mirrors reference ConvGRUModel_v1 / ConvLSTMModel_v1 (rnn.py:82-163):
    h0 (and c0 for LSTM) are trainable parameters of shape (1, H, W, C)
    broadcast over batch.
    """

    hidden_dim: int
    height: int
    width: int
    cell: str = "gru"  # "gru" | "lstm"
    kernel_size: int = 3
    dtype: Any = None

    def setup(self):
        shape = (1, self.height, self.width, self.hidden_dim)
        self.h0 = self.param("h0", nn.initializers.zeros, shape)
        if self.cell == "lstm":
            self.c0 = self.param("c0", nn.initializers.zeros, shape)
            self._cell = ConvLSTMCell(self.hidden_dim, self.kernel_size,
                                      dtype=self.dtype, name="cell")
        else:
            self._cell = ConvGRUCell(self.hidden_dim, self.kernel_size,
                                     dtype=self.dtype, name="cell")

    def initial_state(self, batch_size: int, planar: bool = False,
                      wp: int = 0):
        """``planar=True`` returns the carry in chain-padded planar layout
        (B, H, C, wp) with zero fill; the h0/c0 PARAMETERS stay (1,H,W,C)
        so checkpoints are layout-agnostic."""

        def prep(t):
            if planar:
                t = t.transpose(0, 1, 3, 2)
                if wp > t.shape[3]:
                    t = jnp.pad(t, ((0, 0),) * 3 + ((0, wp - t.shape[3]),))
            return jnp.broadcast_to(t, (batch_size,) + t.shape[1:])

        if self.cell == "lstm":
            return (prep(self.h0), prep(self.c0))
        return prep(self.h0)

    def __call__(self, x, state, planar: bool = False, wl: int = 0):
        if planar:
            return self._cell(x, state, planar=True, wl=wl)
        return self._cell(x, state)


# (input_dims, hidden_dims, cell, needs_external_head, n_scales)
GRU_HIDDEN_SPECS = {
    "v1": dict(in_ch=(1, 1, 1, 1), hid=(1, 1, 1, 1), cell="gru"),
    "v2": dict(in_ch=(2, 2, 2, 1), hid=(2, 2, 2, 2), cell="gru"),
    "v3": dict(in_ch=(16, 32, 64, 128), hid=(16, 32, 64, 128), cell="gru"),
    "v4": dict(in_ch=(16, 32, 64, 128), hid=(16, 32, 64, 128), cell="gru"),
    "v5": dict(in_ch=(64, 64, 128, 256, 512), hid=(64, 64, 128, 256, 512), cell="gru"),
    "v7": dict(in_ch=(32, 64, 128, 128), hid=(32, 64, 128, 256), cell="gru"),
    "v8": dict(in_ch=(32, 64, 128, 128), hid=(32, 64, 128, 256), cell="lstm"),
    "v9": dict(in_ch=(32, 64, 128, 128), hid=(32, 64, 128, 256), cell="gru"),
    "v10": dict(in_ch=(32, 64, 128, 128), hid=(32, 64, 128, 256), cell="gru"),
}


class ConvGRUBlocks(nn.Module):
    """Per-scale recurrent blocks, one step.

    ``version`` selects the reference wiring (see module docstring).
    (height, width) is the scale-0 resolution; scale s runs at
    (H/2^s, W/2^s) — except v5, which sits inside the encoder skips at
    (H/2^(s+1), W/2^(s+1)) (rnn.py:960-1028).
    """

    version: str = "v9"
    height: int = 192
    width: int = 640
    attention: bool = True
    dtype: Any = None

    def setup(self):
        spec = GRU_HIDDEN_SPECS[self.version]
        self.cell_kind = spec["cell"]
        n = len(spec["hid"])
        units = []
        for s in range(n):
            div = 2 ** (s + 1) if self.version == "v5" else 2**s
            units.append(
                RecurrentUnit(
                    spec["hid"][s],
                    self.height // div,
                    self.width // div,
                    cell=spec["cell"],
                    dtype=self.dtype,
                    name=f"cgru_{s}",
                )
            )
        self.units = units
        self.planar_cfg = _gru_planar_cfg(self.version, self.height,
                                          self.width, self.attention, n)

        if self.version == "v1":
            self.heads = [Conv3x3(1, dtype=self.dtype, name=f"conv3x3_{s}")
                          for s in range(4)]
        elif self.version == "v3":
            self.heads = [Conv3x3(1, dtype=self.dtype, name=f"conv3x3_{s}")
                          for s in range(4)]
        elif self.version == "v2":
            self.fusions = [
                GRUFusionBlock(2, up=(s > 0), attention=self.attention,
                               dtype=self.dtype, name=f"fusion_{s}")
                for s in range(4)
            ]
        elif self.version in ("v8", "v9", "v10"):
            feats = (32, 64, 128, 256)
            att = self.attention and self.version != "v10"
            self.fusions = [
                GRUFusionBlock_v2(feats[s], up=(s > 0), attention=att,
                                  dtype=self.dtype, name=f"fusion_{s}")
                for s in range(4)
            ]

    def initial_state(self, batch_size: int):
        return [u.initial_state(batch_size, planar=c[0], wp=c[1])
                for u, c in zip(self.units, self.planar_cfg)]

    def _hidden_of(self, state):
        return state[0] if self.cell_kind == "lstm" else state

    def __call__(self, dec_outputs, hidden_states):
        v = self.version
        if v in ("v1", "v3"):
            new = [self.units[s](dec_outputs[f"disp/{s}"], hidden_states[s])
                   for s in range(4)]
            disp = {f"disp/{s}": nn.sigmoid(self.heads[s](new[s]))
                    for s in range(4)}
            return new, disp

        if v == "v4":
            new = [self.units[s](dec_outputs[f"disp/{s}"], hidden_states[s])
                   for s in range(4)]
            return new, None

        if v == "v5":
            # dec_outputs is the list of 5 encoder feature maps here
            new = [self.units[s](dec_outputs[s], hidden_states[s])
                   for s in range(5)]
            return new, None

        if v == "v7":
            new = [None] * 4
            out3 = self.units[3](dec_outputs["disp/3"], hidden_states[3])
            up = pixel_shuffle(out3, 2)
            new[3] = out3
            for s in (2, 1, 0):
                x = jnp.concatenate([dec_outputs[f"disp/{s}"], up], axis=-1)
                out = self.units[s](x, hidden_states[s])
                new[s] = out
                if s > 0:
                    up = pixel_shuffle(out, 2)
            return new, None

        if v == "v2":
            disp = {}
            new = [None] * 4
            # scale 3: gru input is the raw coarsest disp (1 ch)
            new[3] = self.units[3](dec_outputs["disp/3"], hidden_states[3])
            fin1 = jnp.concatenate([dec_outputs["disp/3"]] * 2, axis=-1)
            disp["disp/3"], up = self.fusions[3](fin1, new[3])
            for s in (2, 1, 0):
                x = jnp.concatenate([dec_outputs[f"disp/{s}"], up], axis=-1)
                new[s] = self.units[s](x, hidden_states[s])
                if s > 0:
                    disp[f"disp/{s}"], up = self.fusions[s](x, new[s])
                else:
                    disp["disp/0"] = self.fusions[0](x, new[0])
            return new, disp

        if v in ("v8", "v9", "v10"):
            disp = {}
            new = [None] * 4
            cfg = self.planar_cfg

            def mix(s):
                # temporal fusion: average of previous and new hidden
                return (self._hidden_of(hidden_states[s])
                        + self._hidden_of(new[s])) / 2

            # scale 3 (H/8 x W/8) always runs NHWC: hid 256 fills the
            # lanes and W/8 is narrower than a lane tile
            new[3] = self.units[3](dec_outputs["disp/3"], hidden_states[3])
            fin1 = jnp.concatenate([dec_outputs["disp/3"]] * 2, axis=-1)
            disp["disp/3"], up = self.fusions[3](fin1, mix(3))
            up_wl = 0  # 0: `up` is NHWC; else planar with this logical W
            for s in (2, 1, 0):
                pl, wp, wl = cfg[s]
                dec = dec_outputs[f"disp/{s}"]
                if pl:
                    dec_p = _pad_w(dec.transpose(0, 1, 3, 2), wp)
                    up_p = (up[..., :wp] if up_wl
                            else _pad_w(up.transpose(0, 1, 3, 2), wp))
                    x = jnp.concatenate([dec_p, up_p], axis=2)
                    new[s] = self.units[s](x, hidden_states[s], planar=True,
                                           wl=wl)
                    if s > 0:
                        disp[f"disp/{s}"], up = self.fusions[s](
                            x, mix(s), planar=True, wl=wl)
                        up_wl = 2 * wl
                    else:
                        disp["disp/0"] = self.fusions[0](x, mix(0),
                                                         planar=True, wl=wl)
                else:
                    if up_wl:
                        up = up[..., :up_wl].transpose(0, 1, 3, 2)
                        up_wl = 0
                    x = jnp.concatenate([dec, up], axis=-1)
                    new[s] = self.units[s](x, hidden_states[s])
                    if s > 0:
                        disp[f"disp/{s}"], up = self.fusions[s](x, mix(s))
                    else:
                        disp["disp/0"] = self.fusions[0](x, mix(0))
            return new, disp

        raise ValueError(f"unknown gru version {v!r}")


class Head(nn.Module):
    """External sigmoid conv heads for v4/v6 (16/32/64/128 ch, rnn.py:909-957)
    and v7 (32/64/128/256 ch, rnn.py:1107-1130)."""

    channels: Tuple[int, ...] = (16, 32, 64, 128)
    dtype: Any = None

    @nn.compact
    def __call__(self, outputs, zero_scale_only: bool = False):
        disp = {}
        scales = (0,) if zero_scale_only else (0, 1, 2, 3)
        for s in scales:
            x = outputs[s] if isinstance(outputs, (list, tuple)) else outputs[f"disp/{s}"]
            disp[f"disp/{s}"] = nn.sigmoid(
                Conv3x3(1, dtype=self.dtype, name=f"conv3x3_{s}")(x)
            )
        return disp


def make_gru(version: str, height: int, width: int, attention: bool = True,
             dtype=None) -> ConvGRUBlocks:
    """Factory mirroring the reference's --gru_version selector
    (trainer_gru.py:108-155). v6 maps to v4 wiring (its attention-GRU cell
    is commented out in the reference, rnn.py:1252-1307)."""
    if version == "v6":
        version = "v4"
    if version == "v2_wo_att":
        return ConvGRUBlocks("v2", height, width, attention=False, dtype=dtype)
    return ConvGRUBlocks(version, height, width, attention=attention, dtype=dtype)
