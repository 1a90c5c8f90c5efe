"""GRU/LSTM trajectory-prediction baselines (reference
train_baselines.py:338-531).

Same recipe as the reference's `train_baseline_model`: AdamW, grad clip,
MSE on next positions; four model variants (GRU / LSTM on observations,
PositionOnly GRU / LSTM). Batches are dp-sharded like train_gde.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from swarm_ode_tpu.data.dataset import TrajectoryDataset, train_val_split
from swarm_ode_tpu.models.gru import (
    GRUTrajectoryPredictor,
    LSTMTrajectoryPredictor,
    PositionOnlyGRU,
    PositionOnlyLSTM,
)
from swarm_ode_tpu.parallel import mesh as meshlib

MODEL_FACTORIES = {
    "gru": lambda ds, hid: GRUTrajectoryPredictor(
        obs_dim=ds.obs_dim, num_agents=ds.num_agents, hidden_dim=hid
    ),
    "lstm": lambda ds, hid: LSTMTrajectoryPredictor(
        obs_dim=ds.obs_dim, num_agents=ds.num_agents, hidden_dim=hid
    ),
    "pos_gru": lambda ds, hid: PositionOnlyGRU(
        num_agents=ds.num_agents, hidden_dim=hid
    ),
    "pos_lstm": lambda ds, hid: PositionOnlyLSTM(
        num_agents=ds.num_agents, hidden_dim=hid
    ),
}


@dataclasses.dataclass
class BaselineTrainConfig:
    model: str = "gru"  # gru | lstm | pos_gru | pos_lstm
    num_epochs: int = 200
    batch_size: int = 32
    lr: float = 1e-3
    weight_decay: float = 1e-4
    grad_clip: float = 1.0
    hidden_dim: int = 128
    seed: int = 0
    val_frac: float = 0.2
    # Keep the stacked episode tensor in device memory and cut windows
    # inside the jitted step (same fast path as train_gde; requires
    # equal-length episodes). 'bfloat16' halves resident bytes, 'uint8'
    # quarters them — obs values are small integers/flags, exact in both
    # (validated; see train_gde.compact_episodes).
    device_data: bool = True
    device_dtype: str = "float32"


def train_baseline(
    dataset: TrajectoryDataset,
    config: BaselineTrainConfig = BaselineTrainConfig(),
    verbose: bool = True,
) -> Dict:
    mesh = meshlib.make_mesh(("dp",))
    n_dev = mesh.devices.size
    position_only = config.model.startswith("pos_")
    model = MODEL_FACTORIES[config.model](dataset, config.hidden_dim)

    sample = dataset.batch([0])
    x0 = jnp.asarray(sample["pos" if position_only else "obs"])
    params = model.init(jax.random.PRNGKey(config.seed), x0)

    tx = optax.chain(
        optax.clip_by_global_norm(config.grad_clip),
        optax.adamw(config.lr, weight_decay=config.weight_decay),
    )
    opt_state = tx.init(params)
    params = meshlib.replicate(mesh, params)
    opt_state = meshlib.replicate(mesh, opt_state)

    def loss_fn(p, batch):
        x = batch["pos"] if position_only else batch["obs"]
        pred = model.apply(p, x)  # (B, N, 2)
        per = jnp.mean((pred - batch["next_pos"]) ** 2, axis=(1, 2))
        w = batch["weight"]
        return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)

    # Device-resident fast path (same as train_gde): ship (B, 2) index
    # pairs, cut windows on device.
    from swarm_ode_tpu.train.train_gde import (
        _extract_windows,
        stack_episodes_streamed,
    )

    ep_lens = {ep.shape[0] for ep in dataset.episodes}
    use_dev = config.device_data and len(ep_lens) == 1
    data = {}
    index_np = None
    if use_dev:
        index_np = np.asarray(dataset._index, np.int32)
        episodes_np, dev_dtype = stack_episodes_streamed(
            dataset.episodes, config.device_dtype
        )
        data = {
            "episodes": meshlib.replicate(
                mesh, jnp.asarray(episodes_np, dev_dtype)
            ),
            "positions": meshlib.replicate(
                mesh, jnp.asarray(np.stack(dataset._positions))
            ),
        }

    def batch_to_loss_input(batch, data):
        if not use_dev:
            return batch
        obs, count, nxt, pos = _extract_windows(
            data["episodes"], data["positions"], dataset.seq_len,
            batch["idx"][:, 0], batch["idx"][:, 1], with_pos=True,
        )
        return {
            "obs": obs, "pos": pos, "next_pos": nxt,
            "weight": batch["weight"],
        }

    def _step_math(params, opt_state, batch, data):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, batch_to_loss_input(batch, data))
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    train_step = jax.jit(_step_math)

    eval_loss = jax.jit(
        lambda p, b, data: loss_fn(p, batch_to_loss_input(b, data))
    )

    # Epoch-scan fast path, same rationale as train_gde: one dispatch and
    # one scalar readback per epoch instead of a host round trip per batch
    # (which dominates through the remote-chip tunnel).
    @jax.jit
    def train_epoch_scan(params, opt_state, pairs, data):
        def body(carry, pb):
            params, opt_state = carry
            batch = {
                "idx": pb,
                "weight": jnp.ones((pb.shape[0],), jnp.float32),
            }
            params, opt_state, loss = _step_math(
                params, opt_state, batch, data
            )
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), pairs
        )
        return params, opt_state, losses

    @jax.jit
    def eval_epoch_scan(params, pairs, data):
        def body(_, pb):
            batch = {
                "idx": pb,
                "weight": jnp.ones((pb.shape[0],), jnp.float32),
            }
            return None, loss_fn(params, batch_to_loss_input(batch, data))

        _, losses = jax.lax.scan(body, None, pairs)
        return losses

    def epoch_pairs(perm, B):
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_full = len(perm) // B
        pairs = index_np[perm[: n_full * B]].reshape(n_full, B, 2)
        spec = P(None, "dp") if B % n_dev == 0 else P()
        return jax.device_put(
            jnp.asarray(pairs, jnp.int32), NamedSharding(mesh, spec)
        )

    def device_batch(idx):
        if use_dev:
            b = {
                "idx": index_np[np.asarray(idx)],
                "weight": np.ones(len(idx), np.float32),
            }
        else:
            raw = dataset.batch(idx)
            b = {
                "obs": raw["obs"],
                "pos": raw["pos"],
                "next_pos": raw["next_pos"],
                "weight": np.ones(len(idx), np.float32),
            }
        b, mask = meshlib.pad_to_multiple(jax.tree.map(jnp.asarray, b), n_dev)
        b["weight"] = b["weight"] * mask
        return meshlib.shard_batch(mesh, b)

    train_idx, val_idx = train_val_split(len(dataset), config.val_frac,
                                         config.seed)
    rng = np.random.RandomState(config.seed)
    history = {"train_loss": [], "val_loss": []}
    best_val, best_params = np.inf, params
    B = config.batch_size
    for epoch in range(config.num_epochs):
        t0 = time.time()
        perm = rng.permutation(train_idx)
        tot, nb = 0.0, 0
        if use_dev:
            params, opt_state, losses = train_epoch_scan(
                params, opt_state, epoch_pairs(perm, B), data
            )
            tot, nb = float(losses.sum()), losses.shape[0]
        else:
            for i in range(0, len(perm) - B + 1, B):
                batch = device_batch(perm[i : i + B])
                params, opt_state, loss = train_step(
                    params, opt_state, batch, data
                )
                tot += float(loss)
                nb += 1
        vtot, vnb = 0.0, 0
        if use_dev and len(val_idx) >= B:
            vlosses = eval_epoch_scan(params, epoch_pairs(val_idx, B), data)
            vtot, vnb = float(vlosses.sum()), vlosses.shape[0]
        else:
            for i in range(0, max(len(val_idx) - B + 1, 1), B):
                vtot += float(
                    eval_loss(params, device_batch(val_idx[i : i + B]), data)
                )
                vnb += 1
        train_loss, val_loss = tot / max(nb, 1), vtot / max(vnb, 1)
        history["train_loss"].append(train_loss)
        history["val_loss"].append(val_loss)
        if val_loss < best_val:
            best_val, best_params = val_loss, params
        if verbose:
            print(
                f"[{config.model}] Epoch {epoch:3d} | Train: {train_loss:.6f}"
                f" | Val: {val_loss:.6f} | {time.time() - t0:.1f}s",
                flush=True,
            )
    return {
        "model": model,
        "params": best_params,
        "history": history,
        "best_val_loss": best_val,
    }
