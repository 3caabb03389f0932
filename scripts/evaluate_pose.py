#!/usr/bin/env python
"""Odometry (ATE) evaluation on odom_9 / odom_10 — reference evaluate_pose.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ssde_tpu.config import MonodepthOptions, Options


def evaluate(opt: Options):
    import jax
    import jax.numpy as jnp

    from ssde_tpu.checkpoint import (
        convert_pose_decoder,
        convert_resnet_encoder,
        _load_torch_state_dict,
        load_checkpoint,
    )
    from ssde_tpu.data.kitti import KITTIOdomDataset
    from ssde_tpu.data.pipeline import Loader
    from ssde_tpu.data.splits import readlines, split_file
    from ssde_tpu.models import PoseDecoder, ResnetEncoder
    from ssde_tpu.eval.pose import evaluate_pose_sequence
    from ssde_tpu.ops import transformation_from_parameters

    jax.config.update("jax_default_matmul_precision", "float32")

    assert os.path.isdir(opt.load_weights_folder), \
        f"Cannot find a folder at {opt.load_weights_folder}"
    assert opt.eval_split in ("odom_9", "odom_10"), \
        "eval_split should be either odom_9 or odom_10"
    sequence_id = int(opt.eval_split.split("_")[1])

    filenames = readlines(
        split_file("odom", f"test_files_{sequence_id:02d}")
    )
    ds = KITTIOdomDataset(opt.data_path, filenames, opt.height, opt.width,
                          frame_idxs=[0, 1], is_train=False,
                          img_ext=".png" if opt.png else ".jpg")
    loader = Loader(ds, 16, shuffle=False, drop_last=False,
                    num_workers=opt.num_workers)

    pose_encoder = ResnetEncoder(opt.num_layers, num_input_images=2)
    pose = PoseDecoder(num_input_features=1, num_frames_to_predict_for=2)

    x = jnp.zeros((1, opt.height, opt.width, 6))
    venc = pose_encoder.init(jax.random.PRNGKey(0), x, False)
    pfeats = pose_encoder.apply(venc, x, False)
    vpose = pose.init(jax.random.PRNGKey(1), [pfeats])

    params = {"pose_encoder": venc["params"], "pose": vpose["params"]}
    stats = {"pose_encoder": venc.get("batch_stats", {})}
    folder = opt.load_weights_folder
    if any(f.endswith(".pth") for f in os.listdir(folder)):
        p, s, _ = convert_resnet_encoder(
            _load_torch_state_dict(os.path.join(folder, "pose_encoder.pth")))
        params["pose_encoder"], stats["pose_encoder"] = p, s
        params["pose"] = convert_pose_decoder(
            _load_torch_state_dict(os.path.join(folder, "pose.pth")))
    else:
        params, stats, _, _ = load_checkpoint(folder, params, stats,
                                              ["pose_encoder", "pose"])

    @jax.jit
    def infer(pair):
        feats = pose_encoder.apply(
            {"params": params["pose_encoder"], "batch_stats": stats["pose_encoder"]},
            pair, False,
        )
        aa, t = pose.apply({"params": params["pose"]}, [feats])
        return transformation_from_parameters(aa[:, 0], t[:, 0])

    pred_poses = []
    for batch in loader:
        pair = jnp.concatenate(
            [jnp.asarray(batch["color/0"]), jnp.asarray(batch["color/1"])],
            axis=-1,
        )
        pred_poses.append(np.asarray(infer(pair)))
    pred_poses = np.concatenate(pred_poses, axis=0)

    gt_poses_path = os.path.join(opt.data_path, "poses", f"{sequence_id:02d}.txt")
    from ssde_tpu.data.kitti_utils import read_odom_poses

    gt_global_poses = read_odom_poses(gt_poses_path)
    mean_ate, std_ate = evaluate_pose_sequence(pred_poses, gt_global_poses)
    print("\n   Trajectory error: {:0.3f}, std: {:0.3f}\n".format(mean_ate, std_ate))

    save_path = os.path.join(opt.load_weights_folder, "poses.npy")
    np.save(save_path, pred_poses)
    print("-> Predictions saved to", save_path)
    return mean_ate, std_ate


if __name__ == "__main__":
    options = MonodepthOptions().parse()
    evaluate(options)
