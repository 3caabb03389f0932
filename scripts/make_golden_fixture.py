#!/usr/bin/env python
"""Generate the committed golden-disparity fixture for checkpoint parity.

Builds the REAL reference modules (ResnetEncoder(18) + DepthDecoder,
/root/reference/networks) with deterministic seeded weights and
non-trivial BatchNorm running stats, saves them in the zoo checkpoint
format ({encoder,depth}.pth with the height/width/use_stereo keys the
reference embeds, utils.py:51-114), runs one fixed 640x192 image through
the torch graph in eval mode, and writes
tests/fixtures/golden_mono.npz with:

  image        (1, 192, 640, 3) f32 NHWC input
  disp         (1, 192, 640, 1) f32 golden sigmoid disparity
  state_md5    md5 of the concatenated state_dict bytes (staleness check)

tests/test_golden_checkpoint.py regenerates the same weights from the
seed, verifies state_md5, loads them through
ssde_tpu.checkpoint.load_monodepth2_checkpoint (the REAL zoo loading
path) and asserts the flax forward reproduces the committed disparity —
so any drift in NCHW->NHWC conversion, BN stats handling, reflect-pad or
resize semantics fails against a frozen artifact.

No network access needed (BASELINE's mono_640x192 zoo download is not
reachable from this host); seeded-real-architecture weights exercise the
same conversion surface.
"""

import hashlib
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("SSDE_REFERENCE_DIR", "/root/reference")
sys.path.insert(0, ROOT)
sys.path.insert(0, REF)
sys.path.insert(0, os.path.join(ROOT, "tests"))

SEED = 20260817
H, W = 192, 640


def build_reference_modules():
    import torch

    from torchvision_stub import install

    install()
    import networks  # reference package

    # torch's default (kaiming) init, made deterministic by seeding the
    # global RNG before construction, keeps activations in a realistic
    # range (constant-0.1-scale weights saturate the sigmoid disp head to
    # a degenerate constant map); BN running stats are then randomized so
    # the converter's stats handling is exercised with non-trivial values.
    torch.manual_seed(SEED)
    encoder = networks.ResnetEncoder(18, False)
    decoder = networks.DepthDecoder(encoder.num_ch_enc, scales=range(4))

    g = torch.Generator().manual_seed(SEED)
    for module in (encoder, decoder):
        sd = module.state_dict()
        new = {}
        for k, v in sd.items():
            if not v.dtype.is_floating_point:
                new[k] = v
            elif k.endswith("running_var"):
                new[k] = torch.rand(v.shape, generator=g) * 0.5 + 0.75
            elif k.endswith("running_mean"):
                new[k] = torch.randn(v.shape, generator=g) * 0.05
            else:
                new[k] = v
        module.load_state_dict(new)
        module.eval()
    return encoder, decoder


def state_md5(*modules):
    import torch

    h = hashlib.md5()
    for m in modules:
        for k, v in sorted(m.state_dict().items()):
            h.update(k.encode())
            h.update(np.ascontiguousarray(v.numpy()).tobytes()
                     if v.dtype.is_floating_point else bytes(str(v), "utf8"))
    return h.hexdigest()


def main(out_path=None, ckpt_dir=None):
    import torch

    encoder, decoder = build_reference_modules()
    md5 = state_md5(encoder, decoder)

    rng = np.random.RandomState(7)
    image = rng.rand(1, H, W, 3).astype(np.float32)
    x = torch.from_numpy(image.transpose(0, 3, 1, 2))
    with torch.no_grad():
        disp = decoder(encoder(x))[("disp", 0)].numpy()
    disp = disp.transpose(0, 2, 3, 1)

    if ckpt_dir is not None:
        os.makedirs(ckpt_dir, exist_ok=True)
        enc_sd = encoder.state_dict()
        enc_sd["height"] = torch.tensor(H)
        enc_sd["width"] = torch.tensor(W)
        enc_sd["use_stereo"] = torch.tensor(False)
        torch.save(enc_sd, os.path.join(ckpt_dir, "encoder.pth"))
        torch.save(decoder.state_dict(), os.path.join(ckpt_dir, "depth.pth"))

    if out_path is not None:
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        np.savez_compressed(out_path, image=image, disp=disp,
                            state_md5=np.array(md5), seed=np.array(SEED))
        print(f"wrote {out_path}: disp range [{disp.min():.4f}, "
              f"{disp.max():.4f}], md5 {md5}")
    return image, disp, md5


if __name__ == "__main__":
    main(out_path=os.path.join(ROOT, "tests", "fixtures", "golden_mono.npz"))
