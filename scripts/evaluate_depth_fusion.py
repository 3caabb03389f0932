#!/usr/bin/env python
"""Depth evaluation for the 3-frame fusion models — reference
evaluate_depth_13.py (scale-loop FeatureFusionBlock) and
evaluate_depth_fusion_v3.py (Fusion_v3).

Each test item loads frames [0, -1, -2], triples the batch through the
encoder/decoder and applies the fusion stack, then evaluates the fused
scale-0 disparity with the eigen protocol.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ssde_tpu.config import MonodepthOptions, Options
from ssde_tpu.eval.depth import evaluate_depth_predictions


def main():
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--fusion_variant", type=str, default="v3",
                        choices=["pyramid", "v3", "scale_loop"])
    args, remaining = parser.parse_known_args()
    opt = MonodepthOptions().parse(remaining)

    import jax
    import jax.numpy as jnp

    from ssde_tpu.checkpoint import load_checkpoint
    from ssde_tpu.data.kitti import KITTIRAWDataset
    from ssde_tpu.data.pipeline import Loader
    from ssde_tpu.data.splits import readlines, split_file
    from ssde_tpu.data.transforms import preprocess_batch
    from ssde_tpu.ops import disp_to_depth
    from ssde_tpu.train.steps_fusion import (
        build_fusion_models,
        init_fusion_params,
    )

    jax.config.update("jax_default_matmul_precision", "float32")
    opt.compute_dtype = "float32"

    filenames = readlines(split_file(opt.eval_split, "test"))
    gt_path = os.path.join(os.path.dirname(split_file(opt.eval_split, "test")),
                           "gt_depths.npz")
    gt_depths = np.load(gt_path, allow_pickle=True)["data"]

    models = build_fusion_models(opt, args.fusion_variant)
    ds = KITTIRAWDataset(opt.data_path, filenames, opt.height, opt.width,
                         frame_idxs=[0, -1, -2], is_train=False,
                         img_ext=".png" if opt.png else ".jpg",
                         load_depth=False)
    loader = Loader(ds, 8, shuffle=False, drop_last=False,
                    num_workers=opt.num_workers)

    sample = ds[0]
    from ssde_tpu.data.pipeline import collate

    inputs0 = preprocess_batch(collate([sample]), opt.height, opt.width,
                               opt.num_scales, [0, -1, -2], is_train=False)
    params, batch_stats = init_fusion_params(models, jax.random.PRNGKey(0),
                                             inputs0)
    params, batch_stats, _, _ = load_checkpoint(
        opt.load_weights_folder, params, batch_stats,
        ["encoder", "depth", "fusion"],
    )

    from ssde_tpu.train.steps import _apply_bn

    @jax.jit
    def infer(batch):
        inputs = preprocess_batch(batch, opt.height, opt.width, opt.num_scales,
                                  [0, -1, -2], is_train=False)
        enc_in = jnp.concatenate(
            [inputs[f"color/{i}/0"] for i in (0, -1, -2)], axis=0
        )
        feats = models.encoder.apply(
            {"params": params["encoder"],
             "batch_stats": batch_stats.get("encoder", {})},
            enc_in, False,
        )
        pre_disp = models.variant == "pyramid"
        dec_all = models.depth.apply({"params": params["depth"]}, feats,
                                     pre_disp=pre_disp)
        B = inputs["color/0/0"].shape[0]
        dec = {k: v[:B] for k, v in dec_all.items()}
        d1 = {k: v[B:2 * B] for k, v in dec_all.items()}
        d2 = {k: v[2 * B:] for k, v in dec_all.items()}
        if models.variant == "scale_loop":
            upt = jnp.zeros_like(dec["disp/3"])
            out = {}
            for s in range(3, -1, -1):
                out[f"disp/{s}"], upt = models.fusion.apply(
                    {"params": params["fusion"]},
                    dec[f"disp/{s}"], upt, d1[f"disp/{s}"], d2[f"disp/{s}"],
                )
        else:
            out = models.fusion.apply({"params": params["fusion"]}, dec, d1, d2)
        return out["disp/0"][..., 0]

    pred_disps = []
    for batch in loader:
        disp = infer(batch)
        scaled, _ = disp_to_depth(disp, opt.min_depth, opt.max_depth)
        pred_disps.append(np.asarray(scaled))
    pred_disps = np.concatenate(pred_disps, axis=0)

    metrics = evaluate_depth_predictions(
        pred_disps, list(gt_depths),
        eval_split=opt.eval_split,
        disable_median_scaling=opt.disable_median_scaling,
        pred_depth_scale_factor=opt.pred_depth_scale_factor,
    )
    names = ["abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"]
    print("\n  " + ("{:>8} | " * 7).format(*names))
    print(("&{: 8.3f}  " * 7).format(*[metrics[n] for n in names]) + "\\\\")
    return metrics


if __name__ == "__main__":
    main()
