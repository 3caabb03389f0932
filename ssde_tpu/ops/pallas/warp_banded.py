"""Banded lane-gather Pallas warp: the training fast path.

Mosaic's in-kernel ``take_along_axis`` requires the gather dimension to
fit one vreg (128 lanes), so a W=640 source row cannot be gathered
directly. This kernel exploits the structure of reprojection warps
instead: within one output row, the source y's span a few rows and each
128-column output tile's source x's span ~a tile. Per program it

  * loads an 8-aligned (VBAND+8)-row source window and dynamically
    ROLLS it so the row's exact min y0 lands at band row 0 (dynamic
    sublane slices must be 8-aligned; the roll removes the alignment
    slack so the whole band is usable y-span budget),
  * gathers the horizontal taps from the THREE static neighbor column
    tiles (t-1, t, t+1) with membership masks — valid iff
    ``x0 - t*TW`` is in ``[-TW, 2*TW - 2]``; taps are bf16 PIXEL PAIRS
    ``(img[c,x] << 16) | img[c,x+1]`` packed into int32 lanes (a bf16
    in the top half-word of an f32 is exact), so ONE gather per
    (window, plane) serves BOTH horizontal taps and the tile-crossing
    tap-1 masks vanish (a channel-pair packing that halves the plane
    count instead is kept under ``SSDE_WARP_PACK=channel``; pixel
    measured 19.2 -> 15.9 ms fwd+bwd per B=48 family),
  * applies the vertical 2-tap lerp as a masked reduction over the band,
  * emits the warped value plus the two directional-derivative residuals
    (d out/d wx, d out/d wy) for the O(output) custom-VJP backward.

There is deliberately NO runtime fallback (a lax.cond around a Pallas
fast path makes XLA execute BOTH branches; measured 231 -> 140 ms per
train step after removing it). Out-of-budget coordinates therefore
APPROXIMATE: source rows beyond the vertical band clamp to the band
edge, and source columns outside the 3-tile window (or beyond a Wo-wide
source) produce ZEROS, not border values. For in-budget coordinates —
which reprojection warps of plausible KITTI poses always are — semantics
match torch ``grid_sample(mode='bilinear', padding_mode='border',
align_corners=False)``. Use ``strict=True`` for exact semantics on
arbitrary grids, and :func:`band_violation_fraction` (wired into the
training losses dict as ``warp/band_violation``) to monitor both the y-
and x-budgets at run time. Reference op: trainer.py:508-511.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except ImportError:  # pragma: no cover
    _PALLAS_OK = False

VBAND = 8       # default source rows per band (exact, roll-aligned)
TW = 128        # output columns per tile (one vreg)
# horizontal taps come from the 3 STATIC neighbor column-tiles (t-1, t,
# t+1) with membership masks: valid iff x0 - t*TW is in [-TW, 2*TW - 2]
YSPAN = VBAND - 2   # per-row y-span budget (2-tap edge; no alignment slack)


def _banded_kernel(C: int, H: int, W: int, chunk: int, vband: int,
                   pixel_pack: bool,
                   fx_ref, fy_ref, img_ref, out_ref, rdx_ref, rdy_ref):
    """img_ref holds PACKED int32 planes of bf16 pairs (a bf16 payload in
    the top half-word of an f32 IS that value in f32, so unpacking is a
    mask / shift + bitcast and the math below is bit-identical to
    gathering f32 upcasts per channel). Two packings:

    * channel pack (default): plane p carries channel 2p's bits in the
      top half-word and channel 2p+1's in the bottom (bottom zero when C
      is odd) — gather/select/roll work runs on ceil(C/2) planes
      (measured 47.7 -> 36.5 ms for the 8-warp B=48 family at vband=16).
    * pixel pack: plane c's lane x carries (img[c, x] << 16) | img[c, x+1]
      — C planes, but ONE gather per (window, plane) serves BOTH
      horizontal taps, and the tile-crossing tap-1 case (x0 at a tile's
      last lane) is baked into the pack, so tap-1 masks/index clamps
      vanish.
    """
    Wo = fx_ref.shape[-1]
    n_tiles = Wo // TW
    P = C if pixel_pack else (C + 1) // 2              # packed planes
    L = vband + 8                                      # aligned load height

    fx = fx_ref[0]                                     # (chunk, Wo) f32
    fy = fy_ref[0]
    x0f = jnp.clip(jnp.floor(fx), 0.0, float(max(W - 2, 0)))
    y0f = jnp.clip(jnp.floor(fy), 0.0, float(max(H - 2, 0)))
    wx = fx - x0f
    wy = fy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    for k in range(chunk):
        yk = y0[k:k + 1, :]                            # (1, Wo)
        # exact band start: load L rows at an 8-aligned offset (Mosaic's
        # dynamic sublane slices must be multiples of 8), then roll so
        # the exact ymin lands at row 0 — no alignment slack, so the
        # whole band is usable y-span budget
        ymin = jnp.clip(jnp.min(yk), 0, H - vband)
        # the // 8 * 8 must be OUTERMOST so Mosaic can statically prove
        # the dynamic sublane offset is 8-aligned
        yal = (jnp.minimum(ymin, H - L) // 8) * 8
        off = ymin - yal                               # in [0, L-1]
        # rows beyond the band clamp to its edge (bounded error; the
        # wrapper's violation monitor tracks how often this fires)
        ys = jnp.clip(yk - ymin, 0, vband - 2)
        iota_v = lax.broadcasted_iota(jnp.int32, (vband, TW), 0)

        bands = []
        for p in range(P):
            band = img_ref[0, p, pl.ds(yal, L), :]     # (L, W) int32
            bands.append(pltpu.roll(band, (L - off) % L, 0))

        for t in range(n_tiles):
            sl = slice(t * TW, (t + 1) * TW)
            xt = x0[k:k + 1, sl]                       # (1, TW)
            wxt = wx[k:k + 1, sl]
            wyt = wy[k:k + 1, sl]
            yst = ys[0:1, sl]

            m0 = (iota_v == yst).astype(jnp.float32)   # (vband, TW)
            m1 = (iota_v == yst + 1).astype(jnp.float32)
            vyw = m0 * (1.0 - wyt) + m1 * wyt
            vyd = m1 - m0

            windows = [w for w in (t - 1, t, t + 1) if 0 <= w < n_tiles]
            hi_mask = jnp.int32(-65536)                # 0xffff0000
            taps0 = [None] * C                         # unpacked f32 taps
            taps1 = [None] * C
            if pixel_pack:
                # ONE gather per (window, plane): the packed lane already
                # holds both horizontal taps, and the pack baked in the
                # tile-crossing tap-1 case
                masks = []
                for w in windows:
                    rel = xt - w * TW                  # (1, TW)
                    masks.append((
                        jnp.broadcast_to((rel >= 0) & (rel <= TW - 1),
                                         (vband, TW)),
                        jnp.broadcast_to(jnp.clip(rel, 0, TW - 1),
                                         (vband, TW)),
                    ))
                for c in range(C):
                    a = jnp.zeros((vband, TW), jnp.int32)
                    for w, (ok, idx) in zip(windows, masks):
                        win = bands[c][:vband, w * TW:(w + 1) * TW]
                        a = jnp.where(
                            ok, jnp.take_along_axis(win, idx, axis=1), a)
                    taps0[c] = lax.bitcast_convert_type(a & hi_mask,
                                                        jnp.float32)
                    taps1[c] = lax.bitcast_convert_type(a << 16,
                                                        jnp.float32)
            else:
                # Mosaic's gather wants idx.shape == source.shape: one
                # gather per (window, tap)
                masks = []
                for w in windows:
                    rel = xt - w * TW                  # (1, TW)
                    per_tap = []
                    for tap in (0, 1):
                        r = rel + tap
                        per_tap.append((
                            jnp.broadcast_to((r >= 0) & (r <= TW - 1),
                                             (vband, TW)),
                            jnp.broadcast_to(jnp.clip(r, 0, TW - 1),
                                             (vband, TW)),
                        ))
                    masks.append(per_tap)
                for p in range(P):
                    # gather requires 32-bit data; int32 zeros unpack to 0.0f
                    a0 = jnp.zeros((vband, TW), jnp.int32)
                    a1 = jnp.zeros((vband, TW), jnp.int32)
                    for w, per_tap in zip(windows, masks):
                        win = bands[p][:vband, w * TW:(w + 1) * TW]
                        (ok0, idx0), (ok1, idx1) = per_tap
                        a0 = jnp.where(ok0, jnp.take_along_axis(win, idx0, axis=1), a0)
                        a1 = jnp.where(ok1, jnp.take_along_axis(win, idx1, axis=1), a1)
                    taps0[2 * p] = lax.bitcast_convert_type(a0 & hi_mask,
                                                            jnp.float32)
                    taps1[2 * p] = lax.bitcast_convert_type(a1 & hi_mask,
                                                            jnp.float32)
                    if 2 * p + 1 < C:
                        taps0[2 * p + 1] = lax.bitcast_convert_type(
                            a0 << 16, jnp.float32)
                        taps1[2 * p + 1] = lax.bitcast_convert_type(
                            a1 << 16, jnp.float32)
            for c in range(C):
                ad = taps1[c] - taps0[c]
                aw = taps0[c] + wxt * ad
                out_ref[0, c, k:k + 1, sl] = jnp.sum(vyw * aw, axis=0,
                                                     keepdims=True)
                rdx_ref[0, c, k:k + 1, sl] = jnp.sum(
                    vyw * ad, axis=0, keepdims=True).astype(jnp.bfloat16)
                rdy_ref[0, c, k:k + 1, sl] = jnp.sum(
                    vyd * aw, axis=0, keepdims=True).astype(jnp.bfloat16)


def _unnormalize_clamped(grid, H, W, align_corners):
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (W - 1)
        fy = (gy + 1.0) * 0.5 * (H - 1)
    else:
        fx = ((gx + 1.0) * W - 1.0) * 0.5
        fy = ((gy + 1.0) * H - 1.0) * 0.5
    return jnp.clip(fx, 0.0, W - 1), jnp.clip(fy, 0.0, H - 1)


def _taps_banded_pallas(img, fx, fy, S, chunk, interpret, vband,
                        smajor: bool = False):
    """Kernel invocation. fx/fy (B*S, Ho, Wo); img (B, H, W, C).

    Returns (out, rdx, rdy) each (B*S, C, Ho, Wo) f32. ``smajor`` selects
    the scale-major G ordering (g = s*B + b, used by the planar variant)
    instead of the default batch-major one (g = b*S + s).
    """
    B, H, W, C = img.shape
    G, Ho, Wo = fx.shape
    pixel_pack = os.environ.get("SSDE_WARP_PACK", "pixel") == "pixel"
    P = C if pixel_pack else (C + 1) // 2
    # pack bf16 pairs into int32 planes (see _banded_kernel): the pack is
    # one cheap XLA pass over the source images, done ONCE per warp
    # family regardless of S
    bits = lax.bitcast_convert_type(
        img.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    if pixel_pack:
        # plane c lane x = (img[c, x] << 16) | img[c, x+1]; the last
        # column repeats itself = exactly the border-clamp tap
        nxt = jnp.concatenate([bits[:, :, 1:], bits[:, :, -1:]], axis=2)
        planes = [(bits[..., c] << 16) | nxt[..., c] for c in range(C)]
    else:
        planes = []
        for p in range(P):
            hi = bits[..., 2 * p] << 16
            lo = (bits[..., 2 * p + 1] if 2 * p + 1 < C
                  else jnp.zeros_like(hi))
            planes.append(hi | lo)
    imgp = lax.bitcast_convert_type(
        jnp.stack(planes, axis=1), jnp.int32)       # (B, P, H, W)

    grid = (G, Ho // chunk)
    coord_spec = pl.BlockSpec((1, chunk, Wo), lambda g, r: (g, r, 0))
    if smajor:
        img_spec = pl.BlockSpec((1, P, H, W), lambda g, r: (g % B, 0, 0, 0))
    else:
        img_spec = pl.BlockSpec((1, P, H, W), lambda g, r: (g // S, 0, 0, 0))
    out_spec = pl.BlockSpec((1, C, chunk, Wo), lambda g, r: (g, 0, r, 0))
    out_shape = jax.ShapeDtypeStruct((G, C, Ho, Wo), jnp.float32)
    # residuals only feed the pose/disp gradient dot in the bwd: bf16
    # halves their HBM footprint and write/read traffic
    res_shape = jax.ShapeDtypeStruct((G, C, Ho, Wo), jnp.bfloat16)

    kernel = functools.partial(_banded_kernel, C, H, W, chunk, vband,
                               pixel_pack)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[coord_spec, coord_spec, img_spec],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_shape, res_shape, res_shape),
        interpret=interpret,
    )(fx, fy, imgp)


def _taps_mxu_reference(img, grids, align_corners):
    """Exact fallback: one-hot MXU taps per scale, same outputs/layout."""
    from ..warp import _mxu_coords, _mxu_taps

    B, H, W, C = img.shape
    _, S, Ho, Wo, _ = grids.shape
    outs, rdxs, rdys = [], [], []
    for s in range(S):
        x0, y0, wx, wy, _, _ = _mxu_coords(img.shape, grids[:, s],
                                           align_corners)
        t00, t01, t10, t11 = _mxu_taps(img, x0, y0, chunk=1, band=H)
        wxe = wx[..., None]
        wye = wy[..., None]
        out = (t00 * (1 - wxe) + t01 * wxe) * (1 - wye) + (
            t10 * (1 - wxe) + t11 * wxe) * wye
        rdx = (1 - wye) * (t01 - t00) + wye * (t11 - t10)
        rdy = (1 - wxe) * (t10 - t00) + wxe * (t11 - t01)
        outs.append(out)
        rdxs.append(rdx.astype(jnp.bfloat16))
        rdys.append(rdy.astype(jnp.bfloat16))

    def pack(ts):  # S x (B, Ho, Wo, C) -> (B*S, C, Ho, Wo)
        t = jnp.stack(ts, axis=1)
        return t.transpose(0, 1, 4, 2, 3).reshape(B * S, C, Ho, Wo)

    return pack(outs), pack(rdxs), pack(rdys)




@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def grid_sample_banded(img, grids, align_corners: bool = False,
                       chunk: int = 8, interpret: bool = False,
                       strict: bool = False, vband: int = VBAND):
    """Warp one source with S coordinate fields; banded Pallas fast path.

    img (B, H, W, C); grids (B, S, Ho, Wo, 2) in [-1, 1].
    Returns (B, S, Ho, Wo, C) f32. No gradient flows into ``img``
    (raw data in this framework's loss graph, like the reference's).

    ``strict=True`` uses the exact (unbanded) MXU formulation — use it
    when coordinates may violate the band budgets (see module docstring).
    A runtime lax.cond fallback is deliberately NOT used: XLA lowers the
    conditional so that both branches execute (measured 231 -> 140 ms per
    train step after removing it). Violating rows clamp to the band edge;
    monitor with :func:`band_violation_fraction`.

    ``vband`` (multiple of 8) sets the vertical band height: per-row
    in-kernel VPU work (gathers, masks, reductions) scales ~linearly with
    it, and the per-output-row source-y span budget is ``vband - 2``
    (only the 2-tap edge — the kernel loads an 8-aligned superset and
    dynamically rolls the exact band start to row 0, so no alignment
    slack is lost). KITTI reprojection spans are a few pixels; the
    training default (8) trades the unused budget for speed.
    """
    out, _ = _gsb_fwd(img, grids, align_corners, chunk, interpret, strict,
                      vband)
    return out


def band_violation_fraction(img_shape, grids, align_corners: bool = False,
                            vband: int = VBAND, row_stride: int = 1):
    """Fraction of kernel work units whose coordinates break a band budget.

    Checks BOTH approximation sources of the banded kernel: output rows
    whose source-y span exceeds the vertical band (clamped to the band
    edge) and output column tiles with any source-x outside the 3 static
    neighbor tiles (emitted as zeros). 0.0 means the kernel is exact
    (modulo bf16 taps); training logs this as ``warp/band_violation``
    — a sustained non-zero value means switch to ``strict=True`` (or the
    ``mxu`` backend) for that data distribution.

    ``row_stride`` checks every Nth output row only (each checked row is
    exact). The full-res check read all grids back from HBM and cost
    ~8 ms of a 199 ms B=48 train step; violations come from the pose /
    depth *distribution*, never a single isolated row, so the training
    monitor samples rows at stride 4.
    """
    _, H, W, _ = img_shape
    if row_stride > 1:
        grids = grids[..., ::row_stride, :, :]
    fx, fy = _unnormalize_clamped(grids, H, W, align_corners)
    y0 = jnp.clip(jnp.floor(fy), 0, H - 2)
    span = jnp.max(y0, axis=-1) - jnp.min(y0, axis=-1)
    bad_y = span > vband - 2
    x0 = jnp.clip(jnp.floor(fx), 0, W - 2).astype(jnp.int32)
    Wo = x0.shape[-1]
    n_tiles = max(Wo // TW, 1)
    rel = x0.reshape(*x0.shape[:-1], n_tiles, Wo // n_tiles) - (
        jnp.arange(n_tiles, dtype=jnp.int32)[:, None] * TW
    )
    bad_x = jnp.any((rel < -TW) | (rel > 2 * TW - 2), axis=-1)
    bad = bad_y[..., None] | bad_x
    return jnp.mean(bad.astype(jnp.float32))


def _gsb_fwd(img, grids, align_corners, chunk, interpret, strict=False,
             vband=VBAND):
    B, H, W, C = img.shape
    _, S, Ho, Wo, _ = grids.shape
    if chunk % 8 or Ho % chunk:
        chunk = Ho if Ho % 8 else 8

    if strict or not _PALLAS_OK or H < vband + 8 or W < TW or Wo % TW:
        # exact MXU path (strict callers / geometry the kernel can't serve)
        out_p, rdx_p, rdy_p = _taps_mxu_reference(img, grids, align_corners)
    else:
        fx, fy = _unnormalize_clamped(grids, H, W, align_corners)
        out_p, rdx_p, rdy_p = _taps_banded_pallas(
            img, fx.reshape(B * S, Ho, Wo), fy.reshape(B * S, Ho, Wo),
            S, chunk, interpret, vband)

    def to_nhwc(t):  # (B*S, C, Ho, Wo) -> (B, S, Ho, Wo, C)
        return t.reshape(B, S, C, Ho, Wo).transpose(0, 1, 3, 4, 2)

    out = to_nhwc(out_p)
    res = (to_nhwc(rdx_p), to_nhwc(rdy_p), grids,
           jax.ShapeDtypeStruct(img.shape, img.dtype))
    return out, res


def _grad_masks(grids, H, W, align_corners):
    gx = grids[..., 0].astype(jnp.float32)
    gy = grids[..., 1].astype(jnp.float32)
    if align_corners:
        rx = (gx + 1.0) * 0.5 * (W - 1)
        ry = (gy + 1.0) * 0.5 * (H - 1)
        sx, sy = (W - 1) * 0.5, (H - 1) * 0.5
    else:
        rx = ((gx + 1.0) * W - 1.0) * 0.5
        ry = ((gy + 1.0) * H - 1.0) * 0.5
        sx, sy = W * 0.5, H * 0.5
    in_x = ((rx > 0) & (rx < W - 1)).astype(jnp.float32) * sx
    in_y = ((ry > 0) & (ry < H - 1)).astype(jnp.float32) * sy
    return in_x, in_y


def _gsb_bwd(align_corners, chunk, interpret, strict, vband, res, dout):
    rdx, rdy, grids, img_spec = res
    _, H, W, _ = img_spec.shape
    dout = dout.astype(jnp.float32)
    in_x, in_y = _grad_masks(grids, H, W, align_corners)
    dwx = jnp.sum(dout * rdx.astype(jnp.float32), axis=-1)
    dwy = jnp.sum(dout * rdy.astype(jnp.float32), axis=-1)
    dgrids = jnp.stack([dwx * in_x, dwy * in_y], axis=-1)
    return jnp.zeros(img_spec.shape, img_spec.dtype), dgrids


grid_sample_banded.defvjp(_gsb_fwd, _gsb_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def grid_sample_banded_planar(img, grids, align_corners: bool = False,
                              chunk: int = 8, interpret: bool = False,
                              vband: int = VBAND):
    """Banded warp emitting the kernel's native planar layout.

    img (B, H, W, C); grids (S, B, Ho, Wo, 2) scale-major. Returns
    (S*B, C, Ho, Wo) f32 with g = s*B + b — exactly the layout the fused
    Pallas photometric kernel consumes, so the training loss path skips
    the planar->NHWC->planar round-trip (~1.1 GB of HBM transposes per
    step at B=48). Same band semantics/monitoring as grid_sample_banded.
    """
    out, _ = _gsbp_fwd(img, grids, align_corners, chunk, interpret, vband)
    return out


def _gsbp_fwd(img, grids, align_corners, chunk, interpret, vband):
    B, H, W, C = img.shape
    S, _, Ho, Wo, _ = grids.shape
    if chunk % 8 or Ho % chunk:
        chunk = Ho if Ho % 8 else 8

    if not _PALLAS_OK or H < vband + 8 or W < TW or Wo % TW:
        # exact fallback: NHWC reference taps, repacked to the planar
        # contract (CPU parity tests / geometry the kernel can't serve)
        out_b, rdx_b, rdy_b = _taps_mxu_reference(
            img, grids.transpose(1, 0, 2, 3, 4), align_corners)

        def to_smajor(t):  # (B*S, C, Ho, Wo) b-major -> (S*B, ...) s-major
            return t.reshape(B, S, C, Ho, Wo).transpose(1, 0, 2, 3, 4) \
                .reshape(S * B, C, Ho, Wo)

        out_p, rdx_p, rdy_p = map(to_smajor, (out_b, rdx_b, rdy_b))
    else:
        fx, fy = _unnormalize_clamped(grids, H, W, align_corners)
        out_p, rdx_p, rdy_p = _taps_banded_pallas(
            img, fx.reshape(S * B, Ho, Wo), fy.reshape(S * B, Ho, Wo),
            S, chunk, interpret, vband, smajor=True)

    res = (rdx_p, rdy_p, grids, jax.ShapeDtypeStruct(img.shape, img.dtype))
    return out_p, res


def _gsbp_bwd(align_corners, chunk, interpret, vband, res, dout):
    rdx, rdy, grids, img_spec = res
    _, H, W, _ = img_spec.shape
    S, B, Ho, Wo, _ = grids.shape
    dout = dout.astype(jnp.float32)
    in_x, in_y = _grad_masks(grids, H, W, align_corners)
    dwx = jnp.sum(dout * rdx.astype(jnp.float32), axis=1).reshape(
        S, B, Ho, Wo)
    dwy = jnp.sum(dout * rdy.astype(jnp.float32), axis=1).reshape(
        S, B, Ho, Wo)
    dgrids = jnp.stack([dwx * in_x, dwy * in_y], axis=-1)
    return jnp.zeros(img_spec.shape, img_spec.dtype), dgrids


grid_sample_banded_planar.defvjp(_gsbp_fwd, _gsbp_bwd)
