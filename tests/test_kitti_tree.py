"""Real-data glue against a miniature on-disk KITTI tree (fast tier).

Round-3 verdict: the synthetic-data tests bypass the split-file / path
layout glue, which rotted unseen (GRU training and odometry eval crashed
on split-file name resolution; CLI stereo never loaded frame "s"). These
tests write a tiny raw-KITTI + odometry directory tree with real jpgs,
calib files and velodyne .bins, and drive the datasets and trainer
``_build_data`` paths through it — no models, no jit, loader-level only.

Layouts covered (reference kitti_dataset.py:59-102, kitti_dataset_seq.py):
  <root>/2011_09_26/2011_09_26_drive_0001_sync/image_0{2,3}/data/*.jpg
  <root>/2011_09_26/2011_09_26_drive_0001_sync/velodyne_points/data/*.bin
  <root>/2011_09_26/calib_{cam_to_cam,velo_to_cam}.txt
  <root>/sequences/09/image_{2,3}/*.jpg + <root>/poses/09.txt
"""

import os

import numpy as np
import pytest
from PIL import Image

from ssde_tpu.config import Options
from ssde_tpu.data.kitti import KITTIOdomDataset, KITTIRAWDataset
from ssde_tpu.data.sequence import (
    KITTISeqDataset,
    count_scene_frames,
    generate_frame_tuples,
)
from ssde_tpu.data.splits import split_file

DATE = "2011_09_26"
DRIVE = f"{DATE}_drive_0001_sync"
SCENE = f"{DATE}/{DRIVE}"
N_FRAMES = 8

CAM_TO_CAM = """S_rect_02: 1.242000e+03 3.750000e+02
R_rect_00: 1.0 0.0 0.0 0.0 1.0 0.0 0.0 0.0 1.0
P_rect_02: 7.215377e+02 0.000000e+00 6.095593e+02 4.485728e+01 0.000000e+00 7.215377e+02 1.728540e+02 2.163791e-01 0.000000e+00 0.000000e+00 1.000000e+00 2.745884e-03
P_rect_03: 7.215377e+02 0.000000e+00 6.095593e+02 -3.395242e+02 0.000000e+00 7.215377e+02 1.728540e+02 2.199936e+00 0.000000e+00 0.000000e+00 1.000000e+00 2.729905e-03
"""
VELO_TO_CAM = """R: 7.533745e-03 -9.999714e-01 -6.166020e-04 1.480249e-02 7.280733e-04 -9.998902e-01 9.998621e-01 7.523790e-03 1.480755e-02
T: -4.069766e-03 -7.631618e-02 -2.717806e-01
"""


def _save_jpg(path, seed):
    rs = np.random.RandomState(seed)
    img = Image.fromarray((rs.rand(48, 160, 3) * 255).astype(np.uint8))
    img.save(path)


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_data")

    # --- raw layout ---
    for cam in ("image_02", "image_03"):
        d = root / DATE / DRIVE / cam / "data"
        d.mkdir(parents=True)
        for i in range(N_FRAMES):
            _save_jpg(d / f"{i:010d}.jpg", 100 * (cam == "image_03") + i)
    velo_dir = root / DATE / DRIVE / "velodyne_points" / "data"
    velo_dir.mkdir(parents=True)
    for i in range(N_FRAMES):
        rs = np.random.RandomState(i)
        pts = rs.rand(256, 4).astype(np.float32)
        pts[:, 0] = pts[:, 0] * 20 + 5          # x: in front of the car
        pts[:, 1] = (pts[:, 1] - 0.5) * 10      # y: lateral spread
        pts[:, 2] = (pts[:, 2] - 0.5) * 2       # z: vertical spread
        pts.tofile(velo_dir / f"{i:010d}.bin")
    (root / DATE / "calib_cam_to_cam.txt").write_text(CAM_TO_CAM)
    (root / DATE / "calib_velo_to_cam.txt").write_text(VELO_TO_CAM)

    # --- odometry layout ---
    for cam in ("image_2", "image_3"):
        d = root / "sequences" / "09" / cam
        d.mkdir(parents=True)
        for i in range(N_FRAMES):
            _save_jpg(d / f"{i:06d}.jpg", 200 + i)
    poses_dir = root / "poses"
    poses_dir.mkdir()
    rows = np.tile(np.eye(4)[:3].reshape(-1), (N_FRAMES, 1))
    rows[:, 3] = np.arange(N_FRAMES) * 0.5  # forward translation
    np.savetxt(poses_dir / "09.txt", rows)

    # --- matching split lists (both naming conventions) ---
    splits = tmp_path_factory.mktemp("splits")
    ez = splits / "eigen_zhou"
    ez.mkdir()
    train_lines = [f"{SCENE} {i} l" for i in range(2, 6)]
    (ez / "train_files.txt").write_text("\n".join(train_lines) + "\n")
    (ez / "val_files.txt").write_text(f"{SCENE} 3 l\n{SCENE} 4 l\n")
    (ez / "train_sequences.txt").write_text(SCENE + "\n")
    (ez / "val_sequences.txt").write_text(SCENE + "\n")
    odom = splits / "odom"
    odom.mkdir()
    (odom / "test_files_09.txt").write_text(
        "\n".join(f"09 {i} l" for i in range(N_FRAMES)) + "\n")
    return {"data": str(root), "splits": str(splits)}


def test_split_file_resolves_both_conventions(kitti_tree):
    # scene lists have no "_files" suffix (reference trainer_gru.py:218);
    # frame lists do — split_file must resolve both (round-3 crash)
    d = kitti_tree["splits"]
    p = split_file("eigen_zhou", "train_sequences", splits_dir=d)
    assert p.endswith("train_sequences.txt") and os.path.exists(p)
    p = split_file("eigen_zhou", "train", splits_dir=d)
    assert p.endswith("train_files.txt") and os.path.exists(p)
    p = split_file("odom", "test_files_09", splits_dir=d)
    assert p.endswith("test_files_09.txt") and os.path.exists(p)


def test_vendored_splits_resolve():
    # the repo's own vendored lists: the GRU scene lists and the odometry
    # test lists must resolve to existing files with the default dir
    for split, which in [("eigen_zhou", "train_sequences"),
                         ("eigen_zhou", "val_sequences"),
                         ("eigen_zhou", "train"),
                         ("odom", "test_files_09"),
                         ("odom", "test_files_10")]:
        p = split_file(split, which)
        assert os.path.exists(p), p


def test_raw_dataset_stereo_item(kitti_tree):
    ds = KITTIRAWDataset(
        kitti_tree["data"], [f"{SCENE} 3 l"], 32, 64,
        frame_idxs=[0, -1, 1, "s"], is_train=False,
    )
    item = ds[0]
    for k in ("color/0", "color/-1", "color/1", "color/s"):
        assert item[k].shape == (32, 64, 3)
    assert item["stereo_T"].shape == (4, 4)
    assert item["stereo_T"][0, 3] == pytest.approx(-0.1)  # left camera
    assert item["depth_gt"].shape == (375, 1242)
    assert (item["depth_gt"] > 0).any()  # velodyne points projected in


def test_mono_trainer_build_data_stereo(kitti_tree, monkeypatch):
    from ssde_tpu.train.trainer import Trainer

    monkeypatch.setenv("SSDE_SPLITS_DIR", kitti_tree["splits"])
    opt = Options(synthetic_data=False, data_path=kitti_tree["data"],
                  use_stereo=True, height=32, width=64, batch_size=2,
                  num_workers=1, split="eigen_zhou")
    t = object.__new__(Trainer)  # data-layer glue only, skip model build
    t.opt = opt
    assert "s" in t._frame_idxs()
    t._build_data()
    item = t.train_dataset[0]
    assert "color/s" in item and "stereo_T" in item
    batch = next(iter(t.train_loader))
    assert batch["color/s"].shape == (2, 32, 64, 3)


def test_gru_trainer_build_data(kitti_tree, monkeypatch):
    from ssde_tpu.train.trainer_gru import GRUTrainer

    monkeypatch.setenv("SSDE_SPLITS_DIR", kitti_tree["splits"])
    opt = Options(synthetic_data=False, data_path=kitti_tree["data"],
                  height=32, width=64, batch_size=2, num_workers=1,
                  len_sequence=2, split="eigen_zhou")
    t = object.__new__(GRUTrainer)
    t.opt = opt
    t._build_data()  # round-3 crash site (train_sequences resolution)
    assert len(t.train_dataset) > 0
    item = t.train_dataset[0]
    assert item["color/0"].shape == (2, 32, 64, 3)
    assert item["depth_gt"].shape == (2, 375, 1242)


def test_seq_tuple_sampling(kitti_tree):
    n_frames = count_scene_frames([SCENE], kitti_tree["data"])
    assert n_frames[SCENE] == N_FRAMES
    # k=2 like the trainer (reference trainer_gru.py:222): windows of
    # length T+2 so the right neighbour of the last centre frame exists
    tuples = generate_frame_tuples(n_frames, [SCENE], 2, 2, 10)
    assert tuples, "no tuples sampled"
    for scene, rng_ in tuples:
        assert scene == SCENE
        assert rng_.stop <= N_FRAMES
    ds = KITTISeqDataset(kitti_tree["data"], tuples[:1], 32, 64, 2)
    item = ds[0]
    assert item["color/-1"].shape == (2, 32, 64, 3)


def test_decoded_cache_parity(kitti_tree, tmp_path):
    """uint8 decode-once cache: bit-identical frames to the PIL path
    (both resize the same way; the float path is just uint8/255), cache
    hit on the second construction, device-side conversion matches."""
    cache = str(tmp_path / "cache")
    line = [f"{SCENE} 3 l"]
    ds_f = KITTIRAWDataset(kitti_tree["data"], line, 32, 64,
                           frame_idxs=[0, -1, 1], is_train=False)
    ds_u = KITTIRAWDataset(kitti_tree["data"], line, 32, 64,
                           frame_idxs=[0, -1, 1], is_train=False,
                           decoded_cache=cache)
    a, b = ds_f[0], ds_u[0]
    assert b["color/0"].dtype == np.uint8
    for k in ("color/0", "color/-1", "color/1"):
        np.testing.assert_array_equal(a[k], b[k].astype(np.float32) / 255.0)
    assert len(os.listdir(cache)) == 3  # one .npy per decoded frame
    b2 = ds_u[0]  # second visit: served from cache
    np.testing.assert_array_equal(b["color/0"], b2["color/0"])

    # uint8 batch through the device-side preprocess == float32 batch
    from ssde_tpu.data.pipeline import collate
    from ssde_tpu.data.transforms import preprocess_batch

    bf = collate([a]); bu = collate([b])
    assert bu["color/0"].dtype == np.uint8
    pf = preprocess_batch(bf, 32, 64, 2, [0, -1, 1], is_train=False)
    pu = preprocess_batch(bu, 32, 64, 2, [0, -1, 1], is_train=False)
    for k in pf:
        np.testing.assert_allclose(np.asarray(pf[k]), np.asarray(pu[k]),
                                   atol=1e-6)


def test_odom_layout_and_poses(kitti_tree):
    ds = KITTIOdomDataset(kitti_tree["data"], [f"09 {i} l" for i in range(4)],
                          32, 64, frame_idxs=[0, 1], is_train=False)
    item = ds[0]
    assert item["color/0"].shape == (32, 64, 3)
    assert item["color/1"].shape == (32, 64, 3)

    from ssde_tpu.data.kitti_utils import read_odom_poses

    poses = read_odom_poses(os.path.join(kitti_tree["data"], "poses", "09.txt"))
    assert poses.shape == (N_FRAMES, 4, 4)
    assert poses[3, 0, 3] == pytest.approx(1.5)
