"""Trajectory-prediction evaluation metrics and dataset analysis.

Parity: result_analysis.ipynb cells 1-4 (reference L6 layer, SURVEY.md §2.5
A1/A2): position-error statistics, direction angle error, success rates at
distance thresholds, autoregressive multi-step error, collision prediction,
and spatial density maps over logged datasets.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def position_error_metrics(
    pred: np.ndarray, target: np.ndarray
) -> Dict[str, float]:
    """Mean / median / max / std Euclidean position error.

    pred, target: (..., 2) arrays of (x, y)."""
    err = np.linalg.norm(
        np.asarray(pred) - np.asarray(target), axis=-1
    ).reshape(-1)
    return {
        "mean_error": float(err.mean()),
        "median_error": float(np.median(err)),
        "max_error": float(err.max()),
        "std_error": float(err.std()),
        "rmse": float(np.sqrt((err**2).mean())),
    }


def direction_error_metrics(
    pred: np.ndarray, target: np.ndarray, prev: np.ndarray
) -> Dict[str, float]:
    """Angle between predicted and true movement vectors (degrees), over
    steps where the agent actually moved."""
    pv = np.asarray(pred) - np.asarray(prev)
    tv = np.asarray(target) - np.asarray(prev)
    pn = np.linalg.norm(pv, axis=-1)
    tn = np.linalg.norm(tv, axis=-1)
    moved = (pn > 1e-6) & (tn > 1e-6)
    if not moved.any():
        return {"mean_angle_error_deg": 0.0, "median_angle_error_deg": 0.0}
    cos = np.sum(pv * tv, axis=-1) / np.maximum(pn * tn, 1e-9)
    ang = np.degrees(np.arccos(np.clip(cos, -1.0, 1.0)))[moved]
    return {
        "mean_angle_error_deg": float(ang.mean()),
        "median_angle_error_deg": float(np.median(ang)),
    }


def success_rates(
    pred: np.ndarray,
    target: np.ndarray,
    thresholds: Sequence[float] = (0.5, 1.0, 1.5, 2.0),
) -> Dict[str, float]:
    """Fraction of predictions within `thr` cells of the target
    (result_analysis.ipynb thresholds {0.5, 1, 1.5, 2})."""
    err = np.linalg.norm(
        np.asarray(pred) - np.asarray(target), axis=-1
    ).reshape(-1)
    return {
        f"success_rate@{t}": float((err <= t).mean()) for t in thresholds
    }


def multi_step_prediction_error(
    predict_fn,
    obs_seq: np.ndarray,
    positions: np.ndarray,
    horizon: int,
    seq_len: int,
) -> List[float]:
    """Autoregressive multi-step error: feed predictions back as positions.

    predict_fn(window_obs (W, N, D)) -> (N, 2) predicted next positions.
    obs_seq: (T, N, D); positions: (T, N, 2). Returns mean error per
    horizon step (result_analysis.ipynb `multi_step_prediction_accuracy`).
    Note: only the position features in the obs are rolled forward; the
    rest of the observation is held at its last real value, matching the
    notebook's simplification.
    """
    T = obs_seq.shape[0]
    start = seq_len
    errors = [[] for _ in range(horizon)]
    for t0 in range(start, T - horizon):
        window = obs_seq[t0 - seq_len : t0].copy()
        for h in range(horizon):
            pred = np.asarray(predict_fn(window))
            true = positions[t0 + h]
            errors[h].append(
                np.linalg.norm(pred - true, axis=-1).mean()
            )
            nxt = obs_seq[t0 + h].copy()
            window = np.concatenate([window[1:], nxt[None]], axis=0)
    return [float(np.mean(e)) for e in errors]


def collision_prediction_metrics(
    pred: np.ndarray, target: np.ndarray, threshold: float = 1.5
) -> Dict[str, float]:
    """Agent-pair proximity (< threshold cells) prediction quality
    (result_analysis.ipynb `analyze_collision_prediction`).

    pred, target: (T, N, 2)."""
    def pair_close(pos):
        d = np.linalg.norm(pos[:, :, None, :] - pos[:, None, :, :], axis=-1)
        iu = np.triu_indices(pos.shape[1], k=1)
        return d[:, iu[0], iu[1]] < threshold

    p = pair_close(np.asarray(pred)).reshape(-1)
    t = pair_close(np.asarray(target)).reshape(-1)
    tp = float((p & t).sum())
    fp = float((p & ~t).sum())
    fn = float((~p & t).sum())
    precision = tp / max(tp + fp, 1.0)
    recall = tp / max(tp + fn, 1.0)
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)
    return {
        "collision_precision": precision,
        "collision_recall": recall,
        "collision_f1": f1,
        "collision_accuracy": float((p == t).mean()),
    }


def hausdorff_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Symmetric Hausdorff distance between two trajectories (T, 2)
    (result_analysis.ipynb cell 1 imports scipy's directed_hausdorff;
    computed directly here — max over both directed distances)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    d = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)  # (Ta, Tb)
    return float(max(d.min(axis=1).max(), d.min(axis=0).max()))


def dtw_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Dynamic-time-warping distance between two trajectories (T, 2)
    (result_analysis.ipynb cell 1 imports fastdtw): classic O(Ta*Tb) DP
    with Euclidean point cost."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    d = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
    Ta, Tb = d.shape
    acc = np.full((Ta + 1, Tb + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, Ta + 1):
        # acc[i, j] = d + min(acc[i-1, j], acc[i-1, j-1], acc[i, j-1]);
        # the in-row dependency resolves with a scan over j.
        prev = np.minimum(acc[i - 1, 1:], acc[i - 1, :-1])
        for j in range(1, Tb + 1):
            acc[i, j] = d[i - 1, j - 1] + min(prev[j - 1], acc[i, j - 1])
    return float(acc[Ta, Tb])


def trajectory_shape_metrics(
    pred: np.ndarray, target: np.ndarray
) -> Dict[str, float]:
    """Per-agent Hausdorff/DTW between predicted and true trajectories,
    averaged over agents. pred, target: (T, N, 2)."""
    pred = np.asarray(pred)
    target = np.asarray(target)
    hs, ds = [], []
    for n in range(pred.shape[1]):
        hs.append(hausdorff_distance(pred[:, n], target[:, n]))
        ds.append(dtw_distance(pred[:, n], target[:, n]))
    return {
        "hausdorff_mean": float(np.mean(hs)),
        "hausdorff_max": float(np.max(hs)),
        "dtw_mean": float(np.mean(ds)),
        "dtw_max": float(np.max(ds)),
    }


def spatial_density(
    positions: np.ndarray, grid_size, normalize: bool = True
) -> np.ndarray:
    """(H, W) visit-count heatmap over logged agent positions
    (analyze_dataset.ipynb). positions: (..., 2) as (x, y)."""
    H, W = grid_size
    pos = np.asarray(positions).reshape(-1, 2)
    x = np.clip(pos[:, 0].astype(int), 0, W - 1)
    y = np.clip(pos[:, 1].astype(int), 0, H - 1)
    density = np.zeros((H, W))
    np.add.at(density, (y, x), 1.0)
    if normalize and density.max() > 0:
        density /= density.max()
    return density


def trajectory_statistics(positions: np.ndarray) -> Dict[str, float]:
    """Per-agent movement stats over an episode. positions: (T, N, 2)."""
    pos = np.asarray(positions)
    deltas = np.linalg.norm(np.diff(pos, axis=0), axis=-1)  # (T-1, N)
    return {
        "total_distance_mean": float(deltas.sum(axis=0).mean()),
        "step_distance_mean": float(deltas.mean()),
        "fraction_moving": float((deltas > 1e-6).mean()),
    }


def _evaluate_predictor(
    predict, dataset, indices=None, batch_size: int = 64
) -> Dict[str, float]:
    """Shared evaluation driver: run `predict(host_batch) -> (B, N, 2)` over
    the dataset in fixed-shape batches, then compute position errors,
    success rates, and collision metrics (result_analysis.ipynb cell 3)."""
    indices = list(indices if indices is not None else range(len(dataset)))
    preds, targets = [], []
    for i in range(0, len(indices), batch_size):
        idx = indices[i : i + batch_size]
        # Pad the tail batch to keep one compiled shape.
        pad = batch_size - len(idx)
        b = dataset.batch(idx + idx[-1:] * pad)
        preds.append(np.asarray(predict(b))[: len(idx)])
        targets.append(b["next_pos"][: len(idx)])
    pred = np.concatenate(preds)
    target = np.concatenate(targets)
    out = position_error_metrics(pred, target)
    out.update(success_rates(pred, target))
    out.update(collision_prediction_metrics(pred[None], target[None]))
    return out


def evaluate_gde(
    model,
    params,
    dataset,
    indices: Optional[Sequence[int]] = None,
    batch_size: int = 64,
) -> Dict[str, float]:
    """Full evaluation of a trained GraphODE over a dataset: position
    errors, success rates, collision metrics (result_analysis.ipynb cell 3)."""
    import jax
    import jax.numpy as jnp

    from swarm_ode_tpu.graphs.temporal import build_temporal_batch

    t_span = jnp.array([0.0, 1.0], jnp.float32)

    @jax.jit
    def predict_dev(obs, count):
        g = build_temporal_batch(obs, count, dataset.num_agvs)
        pred = model.apply_batched(params, g, t_span)["trajectories"][1]
        cur = jnp.take_along_axis(
            pred, jnp.maximum(count - 1, 0)[:, None, None, None], axis=1
        )[:, 0]
        return cur  # (B, N, 2) newest-frame agents

    def predict(b):
        import jax.numpy as jnp

        return predict_dev(
            jnp.asarray(b["obs"]), jnp.asarray(b["count"], jnp.int32)
        )

    return _evaluate_predictor(predict, dataset, indices, batch_size)


def evaluate_baseline(
    model,
    params,
    dataset,
    position_only: bool = False,
    indices: Optional[Sequence[int]] = None,
    batch_size: int = 64,
) -> Dict[str, float]:
    """Same metric suite as evaluate_gde for the GRU/LSTM/PositionOnly
    trajectory baselines (reference train_baselines.py:338-531), so the
    model-comparison table is apples-to-apples."""
    import jax
    import jax.numpy as jnp

    predict_dev = jax.jit(lambda x: model.apply(params, x))

    def predict(b):
        return predict_dev(jnp.asarray(b["pos" if position_only else "obs"]))

    return _evaluate_predictor(predict, dataset, indices, batch_size)
