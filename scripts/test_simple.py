#!/usr/bin/env python
"""Single-image / folder depth inference demo — reference test_simple.py.

Loads a checkpoint folder (reference .pth or native .ckpt), reads the feed
height/width embedded in the encoder checkpoint (the key contract of
reference test_simple.py:76-77), and writes ``*_disp.npy`` +
magma-colormapped ``*_disp.jpeg`` next to each input image.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(
        description="Simple testing function for depth prediction (TPU)."
    )
    parser.add_argument("--image_path", type=str, required=True,
                        help="path to a test image or folder of images")
    parser.add_argument("--model_path", type=str, default=None,
                        help="path to a checkpoint folder "
                             "(reference .pth or native .ckpt)")
    parser.add_argument("--model_name", type=str, default=None,
                        help="name of a models/<name> checkpoint folder")
    parser.add_argument("--ext", type=str, default="jpg")
    parser.add_argument("--num_layers", type=int, default=18)
    parser.add_argument("--no_colormap", action="store_true")
    return parser.parse_args()


def test_simple(args):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ssde_tpu.checkpoint import load_checkpoint, load_monodepth2_checkpoint
    from ssde_tpu.config import Options
    from ssde_tpu.ops import disp_to_depth, resize_bilinear
    from ssde_tpu.train.steps import build_mono_models, init_mono_params, make_mono_infer_fn
    from ssde_tpu.data.transforms import preprocess_batch

    jax.config.update("jax_default_matmul_precision", "float32")

    folder = args.model_path or os.path.join("models", args.model_name)
    if not os.path.isdir(folder) and args.model_name:
        # zoo bootstrap (reference test_simple.py:60-65): download + unzip
        # the published Monodepth2 checkpoint, md5-verified. On an offline
        # machine this raises with the URL so the user can fetch it
        # manually and unzip into models/<name>/.
        from ssde_tpu.utils import MONODEPTH2_ZOO, download_model_if_doesnt_exist

        if args.model_name in MONODEPTH2_ZOO:
            try:
                folder = download_model_if_doesnt_exist(args.model_name)
            except Exception as e:
                url = MONODEPTH2_ZOO[args.model_name][0]
                raise SystemExit(
                    f"Could not download {args.model_name} ({e}). If this "
                    f"machine is offline, fetch {url} elsewhere and unzip "
                    f"it into models/{args.model_name}/"
                )
    assert os.path.isdir(folder), f"Cannot find checkpoint folder {folder}"

    # read feed size from the encoder checkpoint
    feed_height, feed_width = 192, 640
    if os.path.exists(os.path.join(folder, "encoder.pth")):
        p, s, meta = load_monodepth2_checkpoint(folder)
        feed_height = int(meta.get("height", feed_height))
        feed_width = int(meta.get("width", feed_width))
        from_torch = True
    else:
        from_torch = False

    opt = Options(height=feed_height, width=feed_width,
                  num_layers=args.num_layers, compute_dtype="float32")
    models = build_mono_models(opt)
    sample = {"color/0": np.zeros((1, feed_height, feed_width, 3), np.float32),
              "K": np.eye(4, dtype=np.float32)[None]}
    inputs = preprocess_batch(sample, feed_height, feed_width, 1, [0],
                              is_train=False)
    inputs["color_aug/0/0"] = inputs["color/0/0"]
    params, batch_stats = init_mono_params(models, jax.random.PRNGKey(0), inputs)
    if from_torch:
        params.update({k: v for k, v in p.items() if k in params})
        batch_stats.update({k: v for k, v in s.items() if k in batch_stats})
        _, _, meta2 = p, s, meta
    else:
        params, batch_stats, _, meta = load_checkpoint(
            folder, params, batch_stats, ["encoder", "depth"])
        if meta:
            feed_height = int(meta.get("height", feed_height))
            feed_width = int(meta.get("width", feed_width))

    infer = make_mono_infer_fn(models)

    if os.path.isfile(args.image_path):
        paths = [args.image_path]
        output_dir = os.path.dirname(args.image_path)
    else:
        paths = glob.glob(os.path.join(args.image_path, f"*.{args.ext}"))
        output_dir = args.image_path
    print(f"-> Predicting on {len(paths)} test images")

    for idx, image_path in enumerate(paths):
        if image_path.endswith("_disp.jpg"):
            continue
        with Image.open(image_path) as img:
            img = img.convert("RGB")
            orig_w, orig_h = img.size
            resized = img.resize((feed_width, feed_height), Image.LANCZOS)
        x = jnp.asarray(np.asarray(resized, np.float32) / 255.0)[None]
        disp = infer(params, batch_stats, x)
        disp_resized = resize_bilinear(disp, (orig_h, orig_w))[0, ..., 0]

        name = os.path.splitext(os.path.basename(image_path))[0]
        scaled_disp, _ = disp_to_depth(disp, 0.1, 100)
        np.save(os.path.join(output_dir, f"{name}_disp.npy"),
                np.asarray(scaled_disp))

        if not args.no_colormap:
            try:
                import matplotlib.cm as cm

                d = np.asarray(disp_resized)
                vmax = np.percentile(d, 95)
                normed = np.clip(d / max(vmax, 1e-9), 0, 1)
                colored = (cm.get_cmap("magma")(normed)[..., :3] * 255).astype(np.uint8)
                Image.fromarray(colored).save(
                    os.path.join(output_dir, f"{name}_disp.jpeg"))
            except ImportError:
                pass
        print(f"   Processed {idx + 1} of {len(paths)} images - saved prediction")
    print("-> Done!")


if __name__ == "__main__":
    test_simple(parse_args())
