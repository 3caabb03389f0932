"""Evaluation protocol tests: depth metrics, flip post-process, pose ATE."""

import numpy as np
import pytest

from ssde_tpu.eval.depth import (
    batch_post_process_disparity,
    compute_errors,
    evaluate_depth_predictions,
)
from ssde_tpu.eval.pose import compute_ate, dump_xyz, evaluate_pose_sequence


def test_compute_errors_perfect():
    gt = np.linspace(1, 50, 100)
    out = compute_errors(gt, gt)
    abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3 = out
    assert abs_rel == 0 and rmse == 0
    assert a1 == a2 == a3 == 1.0


def test_eigen_protocol_median_scaling(rng):
    """Predictions off by a global scale are fixed by median scaling."""
    gt = [np.full((375, 1242), 10.0, dtype=np.float32) for _ in range(3)]
    # scaled disparity = 1/depth; predict depth 5 (half of gt) everywhere
    pred_disps = np.full((3, 192, 640), 1.0 / 5.0, dtype=np.float32)
    m = evaluate_depth_predictions(pred_disps, gt, eval_split="eigen")
    assert m["abs_rel"] < 1e-5
    assert m["med_scale"] == pytest.approx(2.0, rel=1e-3)
    m2 = evaluate_depth_predictions(pred_disps, gt, eval_split="eigen",
                                    disable_median_scaling=True)
    assert m2["abs_rel"] == pytest.approx(0.5, rel=1e-3)


def test_flip_postprocess_shape(rng):
    l = rng.rand(2, 8, 16).astype(np.float32)
    r = rng.rand(2, 8, 16).astype(np.float32)
    out = batch_post_process_disparity(l, r)
    assert out.shape == (2, 8, 16)
    # center column is the average of both
    np.testing.assert_allclose(out[:, :, 8], 0.5 * (l + r)[:, :, 8], atol=1e-6)


def test_ate_zero_for_perfect_prediction():
    # constant forward motion
    T = np.eye(4)
    T[2, 3] = 1.0
    gt_global = [np.eye(4)]
    for _ in range(10):
        gt_global.append(gt_global[-1] @ T)
    gt_global = np.stack(gt_global)
    pred = np.stack([T] * 10)
    mean_ate, std_ate = evaluate_pose_sequence(pred, gt_global)
    assert mean_ate == pytest.approx(0.0, abs=1e-9)


def test_ate_positive_for_wrong_prediction():
    T = np.eye(4)
    T[2, 3] = 1.0
    gt_global = [np.eye(4)]
    for _ in range(10):
        gt_global.append(gt_global[-1] @ T)
    gt_global = np.stack(gt_global)
    bad = np.eye(4)
    bad[0, 3] = 0.5  # sideways drift
    bad[2, 3] = 1.0
    pred = np.stack([bad] * 10)
    mean_ate, _ = evaluate_pose_sequence(pred, gt_global)
    assert mean_ate > 0.01


def test_dump_xyz_accumulates():
    T = np.eye(4)
    T[0, 3] = 2.0
    xyz = dump_xyz([T, T, T])
    np.testing.assert_allclose(xyz[-1], [6.0, 0, 0])


def test_context_vector_helpers_torch_parity(rng):
    """gru_utils temporal-context helpers (reference gru_utils.py:124-163;
    dead code there, ported for API completeness) match a direct torch
    transcription."""
    import torch

    from ssde_tpu.metrics import banded_mask, context_vector, context_vectors

    B, T, k = 2, 5, 2
    l1 = rng.rand(B, T, 3, 4, 4).astype(np.float32)
    l2 = rng.rand(B, T, 3, 4, 4).astype(np.float32)

    ours = context_vectors(l1, l2, k)

    t1 = torch.tensor(l1).view(B, T, -1)
    t2 = torch.tensor(l2).view(B, T, -1)
    scores = torch.bmm(t1, t1.transpose(1, 2)).double()
    mask = torch.tensor(banded_mask(T, k)).unsqueeze(0).double()
    scores = mask * scores
    scores = scores / (torch.sum(scores, 2).unsqueeze(2) + 1e-6)
    ref = torch.bmm(scores.float(), t2)[:, k:].view(
        torch.tensor(l2)[:, k:].shape)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-6)

    x = rng.rand(3, 4).astype(np.float32)
    prev1 = [rng.rand(3, 4).astype(np.float32) for _ in range(3)]
    prev2 = [rng.rand(3, 4).astype(np.float32) for _ in range(3)]
    ours1 = context_vector(x, [p.reshape(1, -1) for p in prev1],
                           [p.reshape(1, -1) for p in prev2], (3, 4))
    xt = torch.tensor(x).view(1, -1)
    s = torch.mm(xt, torch.cat([torch.tensor(p).view(1, -1)
                                for p in prev1]).T)
    s = s / (torch.sum(s, 1) + 1e-6)
    ref1 = torch.mm(s, torch.cat([torch.tensor(p).view(1, -1)
                                  for p in prev2])).view(3, 4)
    np.testing.assert_allclose(ours1, ref1.numpy(), rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # three jitted runner protocols; ~60 s on a 1-core host
def test_gru_stream_evaluator(tmp_path):
    """Stateful runners: single / warmup / scene protocols on tiny shapes."""
    import jax
    import numpy as np
    from ssde_tpu.config import Options
    from ssde_tpu.data.pipeline import collate
    from ssde_tpu.data.synthetic import SyntheticSeqDataset
    from ssde_tpu.eval.gru_runners import GRUStreamEvaluator
    from ssde_tpu.train.steps_gru import build_gru_models, init_gru_params

    opts = Options(height=32, width=64, batch_size=1, len_sequence=2,
                   compute_dtype="float32", gru_version="v9",
                   disable_attention=True, scales=[0, 1, 2, 3])
    models = build_gru_models(opts)
    ds = SyntheticSeqDataset(32, 64, n=2, length=1)
    batch = collate([ds[0]])
    params, stats = init_gru_params(models, jax.random.PRNGKey(0), batch)
    ev = GRUStreamEvaluator(models, params, stats)

    frame = np.random.RandomState(0).rand(1, 32, 64, 3).astype(np.float32)
    d1 = ev.predict_single(frame)
    assert d1.shape == (1, 32, 64)
    prev = [np.random.RandomState(i).rand(1, 32, 64, 3).astype(np.float32)
            for i in range(2)]
    d2 = ev.predict_with_warmup(prev, frame)
    assert d2.shape == (1, 32, 64)
    # warm-up changes the hidden state, so predictions differ
    assert np.abs(d1 - d2).max() > 1e-7
    scene = ev.predict_scene(prev + [frame])
    assert len(scene) == 3 and scene[-1].shape == (1, 32, 64)
    # the final streamed frame equals the warmup-protocol prediction
    np.testing.assert_allclose(scene[-1], d2, atol=1e-6)

    # batched warmup (evaluate_depth_gru_fusion --eval_batch_size) is
    # item-wise identical to sequential B=1 warmup
    frame_b = np.random.RandomState(7).rand(1, 32, 64, 3).astype(np.float32)
    prev_b = [np.random.RandomState(10 + i).rand(1, 32, 64, 3).astype(np.float32)
              for i in range(2)]
    d_b = ev.predict_with_warmup(prev_b, frame_b)
    stacked = ev.predict_with_warmup(
        [np.concatenate([a, b], axis=0) for a, b in zip(prev, prev_b)],
        np.concatenate([frame, frame_b], axis=0),
    )
    np.testing.assert_allclose(stacked[0], d2[0], atol=1e-5)
    np.testing.assert_allclose(stacked[1], d_b[0], atol=1e-5)
