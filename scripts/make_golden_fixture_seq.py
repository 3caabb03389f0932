#!/usr/bin/env python
"""Generate real-scale frozen goldens for the GRU and fusion families.

Companion to make_golden_fixture.py (mono encoder/decoder): the
mono_640x192-zoo AbsRel-parity clause in BASELINE cannot be validated
directly on this host (zero network egress — verified each round), so
the checkpoint-conversion surface is frozen against REAL-ARCHITECTURE,
REAL-RESOLUTION reference forwards instead:

* ``gru``: reference ConvGRUBlocks_v9 (rnn.py:472-569) at the FULL
  640x192 h0 sizes it hard-codes, seeded weights, one recurrence step
  from h0 on seeded decoder features -> per-scale disp maps.
* ``fusion``: reference Fusion_v3 (fusion_v2.py:312-341, attention=True)
  at full resolution on a seeded 3-frame disp pyramid -> fused disps.

Weights are NOT committed (regenerated from the seed and verified by
md5); the committed npz holds the full-resolution golden disp maps.
tests/test_golden_checkpoint.py loads the regenerated .pth files through
``convert_gru_blocks`` / ``convert_fusion_v2`` — the converters real zoo
checkpoints would use (reference trainer_gru.py:81-120) — and asserts
the flax forwards reproduce these maps.
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

SEED_GRU = 20260820
SEED_FUSION = 20260821
H, W = 192, 640
GRU_IN_CH = (16, 32, 64, 128)


def _randomize(module, seed):
    import torch

    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    new = {}
    for k, v in sd.items():
        if not v.dtype.is_floating_point:
            new[k] = v
        elif k.endswith("running_var"):
            new[k] = torch.rand(v.shape, generator=g) + 0.5
        else:
            new[k] = torch.randn(v.shape, generator=g) * 0.1
    module.load_state_dict(new)
    module.eval()
    return module


def _state_md5(module):
    import torch  # noqa: F401

    h = hashlib.md5()
    for k, v in sorted(module.state_dict().items()):
        h.update(k.encode())
        h.update(np.ascontiguousarray(v.numpy()).tobytes()
                 if v.dtype.is_floating_point else bytes(str(v), "utf8"))
    return h.hexdigest()


def build_gru(seed=SEED_GRU):
    import torch  # noqa: F401

    from torchvision_stub import install

    install()
    from networks.rnn import ConvGRUBlocks_v9

    tm = ConvGRUBlocks_v9(kernel_size=(3, 3), bias=True, device="cpu",
                          attention=True)
    return _randomize(tm, seed)


def gru_inputs(seed=SEED_GRU + 1, B=1):
    import torch

    g = torch.Generator().manual_seed(seed)
    return {
        ("disp", s): torch.randn(B, GRU_IN_CH[s], H // 2**s, W // 2**s,
                                 generator=g)
        for s in range(4)
    }


def run_gru(tm, dec, B=1):
    import torch

    hidden = [tm.state_dict()[f"cgru_{s}.h0_layer1"].repeat(B, 1, 1, 1)
              for s in range(4)]
    with torch.no_grad():
        new_hidden, disp = tm(dec, hidden)
    return new_hidden, disp


def build_fusion(seed=SEED_FUSION):
    from torchvision_stub import install

    install()
    from networks.fusion_v2 import Fusion_v3

    return _randomize(Fusion_v3(attention=True), seed)


def fusion_inputs(seed=SEED_FUSION + 1, B=1):
    import torch

    g = torch.Generator().manual_seed(seed)
    return {
        ("disp", s): torch.rand(3 * B, 1, H // 2**s, W // 2**s, generator=g)
        for s in range(4)
    }


def run_fusion(tm, stacked):
    import torch

    with torch.no_grad():
        return tm(stacked)


def main(out_path):
    gru = build_gru()
    gru_md5 = _state_md5(gru)
    print("gru weights ready, md5", gru_md5, flush=True)
    _, gru_disp = run_gru(gru, gru_inputs())
    print("gru forward done", flush=True)

    fusion = build_fusion()
    fusion_md5 = _state_md5(fusion)
    fused = run_fusion(fusion, fusion_inputs())
    print("fusion forward done", flush=True)

    arrays = {
        "gru_md5": np.array(gru_md5),
        "fusion_md5": np.array(fusion_md5),
    }
    for s in range(4):
        arrays[f"gru_disp_{s}"] = gru_disp[("disp", s)].numpy()
        arrays[f"fusion_disp_{s}"] = fused[("disp", s)].numpy()
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez_compressed(out_path, **arrays)
    print(f"wrote {out_path} "
          f"(gru disp0 range [{arrays['gru_disp_0'].min():.4f}, "
          f"{arrays['gru_disp_0'].max():.4f}])")


if __name__ == "__main__":
    main(os.path.join(ROOT, "tests", "fixtures", "golden_seq.npz"))
