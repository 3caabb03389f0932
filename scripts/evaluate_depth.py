#!/usr/bin/env python
"""Eigen-split depth evaluation — reference evaluate_depth.py.

Supports --eval_mono/--eval_stereo, --ext_disp_to_eval, --save_pred_disps,
--post_process (flip averaging), --disable_median_scaling and the
benchmark-submission png export.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ssde_tpu.config import MonodepthOptions, Options
from ssde_tpu.eval.depth import (
    STEREO_SCALE_FACTOR,
    batch_post_process_disparity,
    evaluate_depth_predictions,
)


def load_gt_depths(opt: Options):
    from ssde_tpu.data.splits import split_file

    gt_path = os.path.join(os.path.dirname(split_file(opt.eval_split, "test")),
                           "gt_depths.npz")
    return np.load(gt_path, fix_imports=True, encoding="latin1",
                   allow_pickle=True)["data"]


def predict_disps(opt: Options):
    """Run the encoder/decoder over the test split (batched, jitted)."""
    import jax
    import jax.numpy as jnp

    from ssde_tpu.checkpoint import load_checkpoint, load_monodepth2_checkpoint
    from ssde_tpu.data.kitti import KITTIRAWDataset
    from ssde_tpu.data.pipeline import Loader
    from ssde_tpu.data.splits import readlines, split_file
    from ssde_tpu.ops import disp_to_depth
    from ssde_tpu.train.steps import build_mono_models, init_mono_params, make_mono_infer_fn
    from ssde_tpu.data.transforms import preprocess_batch

    jax.config.update("jax_default_matmul_precision", "float32")

    folder = opt.load_weights_folder
    if folder and not os.path.isdir(folder):
        from ssde_tpu.utils import MONODEPTH2_ZOO, download_model_if_doesnt_exist

        if os.path.basename(folder) in MONODEPTH2_ZOO:
            # --load_weights_folder models/<zoo name>: bootstrap the
            # published checkpoint (reference test_simple.py:60-65)
            folder = download_model_if_doesnt_exist(
                os.path.basename(folder), os.path.dirname(folder) or "models")
    assert os.path.isdir(folder), f"Cannot find a folder at {folder}"
    filenames = readlines(split_file(opt.eval_split, "test"))

    opt.compute_dtype = "float32"
    models = build_mono_models(opt)
    ds = KITTIRAWDataset(opt.data_path, filenames, opt.height, opt.width,
                         frame_idxs=[0], is_train=False,
                         img_ext=".png" if opt.png else ".jpg",
                         load_depth=False)
    loader = Loader(ds, 16, shuffle=False, drop_last=False,
                    num_workers=opt.num_workers)

    sample = {"color/0": np.zeros((1, opt.height, opt.width, 3), np.float32),
              "K": np.eye(4, dtype=np.float32)[None]}
    inputs = preprocess_batch(sample, opt.height, opt.width, 1, [0],
                              is_train=False)
    inputs["color_aug/0/0"] = inputs["color/0/0"]
    params, batch_stats = init_mono_params(models, jax.random.PRNGKey(0), inputs)

    if any(f.endswith(".pth") for f in os.listdir(folder)):
        p, s, _ = load_monodepth2_checkpoint(folder)
        params.update({k: v for k, v in p.items() if k in params})
        batch_stats.update({k: v for k, v in s.items() if k in batch_stats})
    else:
        params, batch_stats, _, _ = load_checkpoint(folder, params, batch_stats,
                                                    ["encoder", "depth"])

    infer = make_mono_infer_fn(models)
    disps = []
    for batch in loader:
        imgs = jnp.asarray(batch["color/0"])
        disp = infer(params, batch_stats, imgs)[..., 0]
        if opt.post_process:
            disp_flipped = infer(params, batch_stats, imgs[:, :, ::-1, :])[..., 0]
            disp = batch_post_process_disparity(
                np.asarray(disp), np.asarray(disp_flipped)[:, :, ::-1]
            )
        scaled_disp, _ = disp_to_depth(jnp.asarray(disp), opt.min_depth, opt.max_depth)
        disps.append(np.asarray(scaled_disp))
    return np.concatenate(disps, axis=0)


def evaluate(opt: Options):
    if opt.ext_disp_to_eval is not None:
        pred_disps = np.load(opt.ext_disp_to_eval)
        if opt.eval_eigen_to_benchmark:
            # remap externally-loaded eigen-split predictions onto the
            # benchmark split order (reference evaluate_depth.py:143-147)
            from ssde_tpu.data.splits import DEFAULT_SPLITS_DIR

            ids = np.load(os.path.join(DEFAULT_SPLITS_DIR, "benchmark",
                                       "eigen_to_benchmark_ids.npy"))
            pred_disps = pred_disps[ids]
    else:
        assert opt.eval_mono != opt.eval_stereo, (
            "Please choose mono or stereo evaluation by setting either "
            "--eval_mono or --eval_stereo"
        )
        pred_disps = predict_disps(opt)

    if opt.save_pred_disps:
        out = os.path.join(opt.load_weights_folder,
                           f"disps_{opt.eval_split}_split.npy")
        print(f"-> Saving predicted disparities to {out}")
        np.save(out, pred_disps)

    if opt.no_eval:
        print("-> Evaluation disabled. Done.")
        return None

    if opt.eval_split == "benchmark":
        save_dir = os.path.join(opt.load_weights_folder, "benchmark_predictions")
        os.makedirs(save_dir, exist_ok=True)
        print(f"-> Saving out benchmark predictions to {save_dir}")
        from PIL import Image

        # KITTI benchmark submission format (reference evaluate_depth.py:
        # 163-171): resize disparity to 1216x352, depth = 5.4/disp clipped
        # to [0, 80] m, stored as uint16 png at 1/256 m resolution.
        for idx in range(len(pred_disps)):
            disp = Image.fromarray(pred_disps[idx].astype(np.float32), "F")
            disp_resized = np.asarray(
                disp.resize((1216, 352), Image.BILINEAR), np.float32)
            depth = STEREO_SCALE_FACTOR / disp_resized
            depth = np.clip(depth, 0, 80)
            depth = np.uint16(depth * 256)
            Image.fromarray(depth).save(os.path.join(save_dir, f"{idx:010d}.png"))
        print("-> No ground truth is available for the KITTI benchmark; done.")
        return None

    gt_depths = load_gt_depths(opt)

    disable_median = opt.disable_median_scaling
    scale_factor = opt.pred_depth_scale_factor
    if opt.eval_stereo:
        print(f"   Stereo evaluation - disabling median scaling, "
              f"scaling by {STEREO_SCALE_FACTOR}")
        disable_median = True
        scale_factor = STEREO_SCALE_FACTOR
    else:
        print("   Mono evaluation - using median scaling")

    metrics = evaluate_depth_predictions(
        pred_disps, list(gt_depths),
        eval_split=opt.eval_split,
        disable_median_scaling=disable_median,
        pred_depth_scale_factor=scale_factor,
    )
    if "med_scale" in metrics:
        print(" Scaling ratios | med: {:0.3f} | std: {:0.3f}".format(
            metrics["med_scale"], metrics["med_scale_std"]))
    names = ["abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"]
    print("\n  " + ("{:>8} | " * 7).format(*names))
    print(("&{: 8.3f}  " * 7).format(*[metrics[n] for n in names]) + "\\\\")
    print("\n-> Done!")
    return metrics


if __name__ == "__main__":
    options = MonodepthOptions().parse()
    evaluate(options)
