"""Offline Graph-ODE trajectory training (reference train_gde.py:428-535).

Recipe parity: AdamW(lr 1e-3, weight decay 1e-4), grad-clip 1.0, batch 32,
200 epochs, 80/20 split, MSE between the ODE solution's t=1 decoded
positions of the *current-frame* nodes and the next-step positions
(train_gde.py:469-535).

TPU-native: the temporal graphs are built on device inside the jitted
train step (vmapped builder), the batch is sharded over the mesh's `dp`
axis with replicated parameters, and XLA inserts the gradient psum —
shard_map-style data parallelism with zero hand-written collectives.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from swarm_ode_tpu.data.dataset import TrajectoryDataset, train_val_split
from swarm_ode_tpu.graphs.temporal import (
    TemporalWindow,
    build_temporal_batch,
    build_temporal_graph,
)
from swarm_ode_tpu.models.gde import GraphODE
from swarm_ode_tpu.parallel import mesh as meshlib
from swarm_ode_tpu.utils.logging import MetricsLogger


@dataclasses.dataclass
class GDETrainConfig:
    num_epochs: int = 200
    batch_size: int = 32
    lr: float = 1e-3
    weight_decay: float = 1e-4
    grad_clip: float = 1.0
    hidden_dim: int = 64
    ode_solver: str = "euler"
    distance_threshold: float = 5.0
    seed: int = 0
    val_frac: float = 0.2
    # Keep the whole dataset in device memory and extract windows inside the
    # jitted step (fast path; requires equal-length episodes). Falls back to
    # host-side gathering otherwise.
    device_data: bool = True
    # Rotate at most this many episodes through device memory at a time
    # (0 = all resident). Reference-scale medium (1000 episodes x 500 steps
    # x 28 agents x ~500 obs dims) is ~29 GB f32 — beyond one chip's HBM;
    # shard rotation keeps the fast on-device window extraction while
    # streaming one episode shard per inner pass. Shuffling is then
    # shard-local (shard order + within-shard order both reshuffled per
    # epoch) — a standard big-dataset compromise.
    device_shard_episodes: int = 0
    # Device storage dtype for the resident episode tensor. Observations
    # are small integers and 0/1 flags — exactly representable in bfloat16
    # ('bfloat16' halves resident bytes with bit-identical values) and, for
    # the reference envs, in [0, 255] ('uint8' quarters them — validated
    # against the data before upload; reference-scale medium drops from
    # 12.2 GB resident to 6.1 GB, leaving HBM headroom the 16 GB chip
    # needs: the bf16 run OOMed during the first train-step compile).
    device_dtype: str = "float32"
    # Supervise the ODE at t = 1..horizon (one solve, losses at every
    # integer time). horizon=1 is the reference recipe
    # (train_gde.py:469-535); the t=1-only model diverges when integrated
    # past its trained horizon (RESULTS.md "multi-horizon" table), so
    # horizon>1 is the fix for genuine continuous-time rollouts.
    # horizon>1 requires the device-resident data path.
    horizon: int = 1
    # Max train/val batches per device dispatch in the epoch-scan path
    # (0 = the whole epoch in ONE dispatch). The axon tunnel kills the
    # worker when a single execution runs too long (~every dispatch over
    # ~80 s; empirically 5/5 round-3 worker crashes were epoch scans —
    # large h4 at ~80-90 s/epoch died 3/3 at epoch 1, medium h4 at 64 s
    # died once in ~100, medium h1 at 19 s and all env/RL dispatches
    # (~1 s) never). Chunking syncs every `epoch_scan_chunk` batches,
    # bounding dispatch duration at the cost of one extra compile for
    # the remainder-sized chunk.
    epoch_scan_chunk: int = 0
    # Per-horizon loss weights (length == horizon, horizon>1 only;
    # None = uniform). The uniform multi-horizon model loses t=+1 to its
    # own h=1 ancestor (RESULTS.md round-3 table); up-weighting t=+1
    # (e.g. (3,1,1,1)) targets one model that wins both the 1-step and
    # rollout regimes — the reference trains t=1-endpoint only
    # (train_gde.py:469-535), so any horizon>1 weighting is ours.
    horizon_weights: Optional[tuple] = None
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 50


def _batch_loss(model: GraphODE, num_agvs, distance_threshold,
                horizon: int = 1, horizon_weights=None):
    """Whole-batch loss on the structured batched path (same math as
    vmap-of-per-graph; see models/gde.py::apply_batched). horizon=1 keeps
    the reference's t=1-endpoint MSE; horizon>1 averages MSE over the
    trajectory points t = 1..horizon (batch carries (B, Hz, N, 2) targets
    and an (B, Hz) horizon-validity weight), optionally reweighted per
    horizon by `horizon_weights` (length-horizon tuple; uniform weights
    reproduce the unweighted loss exactly — pinned by test)."""
    t_span = jnp.arange(horizon + 1, dtype=jnp.float32)

    def loss_fn(params, batch):
        g = build_temporal_batch(
            batch["obs"], batch["count"], num_agvs, distance_threshold
        )
        out = model.apply_batched(params, g, t_span)
        cur_slot = jnp.maximum(batch["count"] - 1, 0)  # (B,)
        if horizon == 1:
            pred = out["trajectories"][1]  # (B, W, N, 2)
            cur = jnp.take_along_axis(
                pred, cur_slot[:, None, None, None], axis=1
            )[:, 0]  # (B, N, 2) — newest frame's agents
            losses = jnp.mean((cur - batch["next_pos"]) ** 2, axis=(1, 2))
        else:
            pred = out["trajectories"][1:]  # (Hz, B, W, N, 2)
            cur = jnp.take_along_axis(
                pred, cur_slot[None, :, None, None, None], axis=2
            )[:, :, 0]  # (Hz, B, N, 2)
            tgt = jnp.moveaxis(batch["next_pos"], 1, 0)  # (Hz, B, N, 2)
            per = jnp.mean((cur - tgt) ** 2, axis=(2, 3))  # (Hz, B)
            hw = jnp.moveaxis(batch["hweight"], 1, 0)  # (Hz, B)
            if horizon_weights is not None:
                hw = hw * jnp.asarray(
                    horizon_weights, dtype=jnp.float32
                )[:, None]
            losses = jnp.sum(per * hw, axis=0) / jnp.maximum(
                jnp.sum(hw, axis=0), 1.0
            )
        weights = batch["weight"]
        return jnp.sum(losses * weights) / jnp.maximum(jnp.sum(weights), 1.0)

    return loss_fn


def compact_episodes(episodes_np: np.ndarray, device_dtype: str):
    """(host dtype prep for the resident tensor) Returns the array to
    upload and the jnp storage dtype for `device_dtype` in
    {'float32','bfloat16','uint8'}. uint8 is validated: obs must be
    integral in [0, 255] (true for all reference envs — coordinates,
    flags and small ids; medium-19-9 tops out at 24)."""
    dev_dtype = {
        "bfloat16": jnp.bfloat16,
        "uint8": jnp.uint8,
        "float32": jnp.float32,
    }[device_dtype]
    if device_dtype == "uint8":
        lo, hi = float(episodes_np.min()), float(episodes_np.max())
        if not (
            0.0 <= lo and hi <= 255.0
            and np.array_equal(episodes_np, np.floor(episodes_np))
        ):
            raise ValueError(
                f"device_dtype='uint8' needs integral obs in [0, 255]; "
                f"got range [{lo}, {hi}]"
            )
        episodes_np = episodes_np.astype(np.uint8)
    return episodes_np, dev_dtype


def stack_episodes_streamed(episodes, device_dtype: str):
    """compact_episodes(np.stack(episodes), ...) without the giant
    intermediates: one preallocated output in the final host dtype,
    filled episode by episode (validation included for uint8).

    On hosts where anonymous page faults are slow (measured down to
    ~4 MB/s on some virtualized boxes), np.stack of a large dataset plus
    compact_episodes' full-size floor/compare temporaries dominates
    staging wall-clock; the streamed fill allocates the output once and
    cycles small per-episode temporaries that glibc reuses."""
    dev_dtype = {
        "bfloat16": jnp.bfloat16,
        "uint8": jnp.uint8,
        "float32": jnp.float32,
    }[device_dtype]
    E = len(episodes)
    shape = (E,) + tuple(episodes[0].shape)
    if device_dtype == "uint8":
        out = np.empty(shape, np.uint8)
        for e, ep in enumerate(episodes):
            x = np.asarray(ep)
            lo, hi = float(x.min()), float(x.max())
            if not (
                0.0 <= lo and hi <= 255.0
                and np.array_equal(x, np.floor(x))
            ):
                raise ValueError(
                    f"device_dtype='uint8' needs integral obs in [0, 255]; "
                    f"episode {e} has range [{lo}, {hi}]"
                )
            out[e] = x
        return out, dev_dtype
    host_dtype = np.asarray(episodes[0]).dtype
    out = np.empty(shape, host_dtype)
    for e, ep in enumerate(episodes):
        out[e] = ep
    return out, dev_dtype


def _extract_windows(
    episodes_dev, positions_dev, seq_len, e_idx, t_idx, with_pos=False,
    horizon: int = 1, true_len: Optional[int] = None,
):
    """On-device window extraction: (ep, t) index pairs -> the exact
    TrajectoryDataset.window semantics (zero-padded warmup, count, next
    positions, and optionally the position window) via dynamic slices —
    no host copies in the training loop.

    The dataset tensors are passed as arguments (NOT closed over) so they
    stay runtime inputs rather than being baked into the compiled program
    as constants.
    """
    W = seq_len

    def one(e, t):
        ep = episodes_dev[e]  # (T, N, D)
        T = ep.shape[0]
        start = jnp.clip(t - W + 1, 0, T - W)
        obs_w = jax.lax.dynamic_slice_in_dim(ep, start, W, axis=0)
        slot_t = start + jnp.arange(W)
        valid = slot_t <= t
        # Cast up from the compact resident dtype (bfloat16/uint8 — both
        # exact for these obs); downstream graph building wants f32.
        obs_w = jnp.where(
            valid[:, None, None], obs_w.astype(jnp.float32), 0.0
        )
        count = jnp.minimum(t + 1, W).astype(jnp.int32)
        if horizon > 1:
            # (Hz, N, 2) targets at t+1 .. t+horizon plus per-horizon
            # validity (positions_dev is edge-padded by `horizon` frames
            # at upload so the slice never clamps; hweight masks the pad).
            next_pos = jax.lax.dynamic_slice_in_dim(
                positions_dev[e], t + 1, horizon, axis=0
            )
            hweight = (
                t + 1 + jnp.arange(horizon) <= (true_len - 1)
            ).astype(jnp.float32)
        else:
            next_pos = positions_dev[e, t + 1]
        if with_pos:
            pos_w = jax.lax.dynamic_slice_in_dim(
                positions_dev[e], start, W, axis=0
            )
            pos_w = jnp.where(valid[:, None, None], pos_w, 0.0)
            return obs_w, count, next_pos, pos_w
        if horizon > 1:
            return obs_w, count, next_pos, hweight
        return obs_w, count, next_pos

    return jax.vmap(one)(e_idx, t_idx)


def train_gde(
    dataset: TrajectoryDataset,
    config: GDETrainConfig = GDETrainConfig(),
    logger: Optional[MetricsLogger] = None,
    verbose: bool = True,
) -> Dict:
    """Train GraphODE on a trajectory dataset. Returns dict with params and
    loss history."""
    mesh = meshlib.make_mesh(("dp",))
    n_dev = mesh.devices.size
    model = GraphODE(
        node_dim=dataset.obs_dim,
        num_agvs=dataset.num_agvs,
        num_pickers=dataset.num_pickers,
        hidden_dim=config.hidden_dim,
        ode_solver=config.ode_solver,
    )

    # Init from one sample window.
    sample = dataset.batch([0])
    w0 = TemporalWindow(
        obs=jnp.asarray(sample["obs"][0]), count=jnp.int32(sample["count"][0])
    )
    g0 = build_temporal_graph(w0, dataset.num_agvs, config.distance_threshold)
    params = model.init(
        jax.random.PRNGKey(config.seed), g0, jnp.array([0.0, 1.0])
    )

    tx = optax.chain(
        optax.clip_by_global_norm(config.grad_clip),
        optax.adamw(config.lr, weight_decay=config.weight_decay),
    )
    opt_state = tx.init(params)
    params = meshlib.replicate(mesh, params)
    opt_state = meshlib.replicate(mesh, opt_state)

    if config.horizon_weights is not None:
        if len(config.horizon_weights) != config.horizon:
            raise ValueError(
                f"horizon_weights needs length {config.horizon}, got "
                f"{len(config.horizon_weights)}"
            )
        if config.horizon == 1:
            raise ValueError("horizon_weights requires horizon > 1")
    loss_fn = _batch_loss(model, dataset.num_agvs, config.distance_threshold,
                          horizon=config.horizon,
                          horizon_weights=config.horizon_weights)

    # Device-resident dataset fast path: windows are cut on device from the
    # stacked episode tensor, so the host only ships (B, 2) index pairs.
    # When the dataset exceeds device_shard_episodes, the stacked tensor is
    # rotated through HBM one episode shard at a time.
    ep_lens = {ep.shape[0] for ep in dataset.episodes}
    use_dev = config.device_data and len(ep_lens) == 1
    if config.horizon > 1 and not use_dev:
        raise ValueError(
            "horizon>1 requires the device-resident data path "
            "(device_data=True with equal-length episodes)"
        )
    true_len = next(iter(ep_lens)) if use_dev else None
    data = {}
    episodes_np = positions_np = index_np = None
    dev_dtype = None
    E = len(dataset.episodes)
    shard_eps = (
        min(config.device_shard_episodes or E, E) if use_dev else E
    )
    sharded = use_dev and shard_eps < E
    if use_dev:
        episodes_np, dev_dtype = stack_episodes_streamed(
            dataset.episodes, config.device_dtype
        )
        positions_np = np.stack(dataset._positions)
        if config.horizon > 1:
            # Edge-pad so the (t+1, horizon) target slice never clamps;
            # hweight masks the padded frames (see _extract_windows).
            positions_np = np.pad(
                positions_np,
                ((0, 0), (0, config.horizon), (0, 0), (0, 0)),
                mode="edge",
            )
        index_np = np.asarray(dataset._index, np.int32)  # (M, 2)
        if not sharded:
            data = {
                "episodes": meshlib.replicate(
                    mesh, jnp.asarray(episodes_np, dev_dtype)
                ),
                "positions": meshlib.replicate(
                    mesh, jnp.asarray(positions_np)
                ),
            }

    def put_shard(ep_ids):
        """Device-put one episode shard; returns (data dict, remap) where
        remap maps global episode id -> shard slot."""
        remap = np.full(E, -1, np.int64)
        remap[ep_ids] = np.arange(len(ep_ids))
        return {
            "episodes": meshlib.replicate(
                mesh, jnp.asarray(episodes_np[ep_ids], dev_dtype)
            ),
            "positions": meshlib.replicate(
                mesh, jnp.asarray(positions_np[ep_ids])
            ),
        }, remap

    seq_len = dataset.seq_len

    def batch_to_loss_input(batch, data):
        if not use_dev:
            return batch
        if config.horizon > 1:
            obs, count, nxt, hw = _extract_windows(
                data["episodes"], data["positions"], seq_len,
                batch["idx"][:, 0], batch["idx"][:, 1],
                horizon=config.horizon, true_len=true_len,
            )
            return {
                "obs": obs,
                "count": count,
                "next_pos": nxt,
                "hweight": hw,
                "weight": batch["weight"],
            }
        obs, count, nxt = _extract_windows(
            data["episodes"], data["positions"], seq_len,
            batch["idx"][:, 0], batch["idx"][:, 1],
        )
        return {
            "obs": obs,
            "count": count,
            "next_pos": nxt,
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

    # Epoch-scan fast path (resident data only): the per-batch Python loop
    # costs one host<->device round trip per step (float(loss) sync +
    # batch upload), which dominates the 1.6 ms device step through the
    # remote-chip tunnel (~12 min/epoch observed vs ~20 s of device math
    # at reference scale). Shipping the whole epoch's shuffled index
    # tensor (n_batches, B, 2) and scanning the train step on device makes
    # an epoch ONE dispatch + ONE scalar readback.
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

    def epoch_pairs(perm):
        """Full batches only (matches the per-batch loop's remainder
        drop), dp-sharded on the batch axis inside each scan step
        (replicated when B doesn't divide over the mesh)."""
        n_full = len(perm) // B
        pairs = index_np[perm[: n_full * B]].reshape(n_full, B, 2)
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P(None, "dp") if B % n_dev == 0 else P()
        return jax.device_put(
            jnp.asarray(pairs, jnp.int32), NamedSharding(mesh, spec)
        )

    def device_batch(idx, remap=None):
        if use_dev:
            pairs = index_np[np.asarray(idx)]
            if remap is not None:
                pairs = np.stack(
                    [remap[pairs[:, 0]], pairs[:, 1]], axis=1
                ).astype(np.int32)
            b = {
                "idx": pairs,
                "weight": np.ones(len(idx), np.float32),
            }
        else:
            raw = dataset.batch(idx)
            b = {
                "obs": raw["obs"],
                "count": raw["count"],
                "next_pos": raw["next_pos"],
                "weight": np.ones(len(idx), np.float32),
            }
        b, mask = meshlib.pad_to_multiple(
            jax.tree.map(jnp.asarray, b), n_dev
        )
        b["weight"] = b["weight"] * mask
        return meshlib.shard_batch(mesh, b)

    if sharded:
        # Episode-level 80/20 split when rotating shards (no window leaks
        # across the split, and each shard visit is self-contained); the
        # reference's window-level split applies in the resident paths.
        ep_rng = np.random.RandomState(config.seed)
        ep_perm = ep_rng.permutation(E)
        n_val_ep = max(1, int(E * config.val_frac))
        val_eps = np.sort(ep_perm[:n_val_ep])
        train_eps = np.sort(ep_perm[n_val_ep:])
        win_ep = index_np[:, 0]
        train_shards = [
            train_eps[i : i + shard_eps]
            for i in range(0, len(train_eps), shard_eps)
        ]
        val_shards = [
            val_eps[i : i + shard_eps]
            for i in range(0, len(val_eps), shard_eps)
        ]
        train_win = [
            np.nonzero(np.isin(win_ep, s))[0] for s in train_shards
        ]
        val_win = [np.nonzero(np.isin(win_ep, s))[0] for s in val_shards]
    else:
        train_idx, val_idx = train_val_split(
            len(dataset), config.val_frac, config.seed
        )
    rng = np.random.RandomState(config.seed)
    history = {"train_loss": [], "val_loss": []}
    best_val = np.inf
    best_params = params
    ckpt = None
    start_epoch = 0
    if config.checkpoint_dir:
        from swarm_ode_tpu.utils.checkpoint import CheckpointManager

        ckpt = CheckpointManager(config.checkpoint_dir)
        # Resume (the reference only ever saves, SURVEY.md §5; here restore
        # picks up params + optimizer + epoch).
        latest = ckpt.latest_step()
        if latest is not None:
            restored = ckpt.restore(
                {
                    "params": jax.tree.map(np.asarray, params),
                    "opt_state": jax.tree.map(np.asarray, opt_state),
                    "epoch": np.int32(0),
                }
            )
            if restored is not None:
                params = meshlib.replicate(mesh, restored["params"])
                opt_state = meshlib.replicate(mesh, restored["opt_state"])
                start_epoch = int(restored["epoch"]) + 1
                if verbose:
                    print(f"Resumed from checkpoint at epoch {latest}")

    B = config.batch_size
    for epoch in range(start_epoch, config.num_epochs):
        t0 = time.time()
        tot, nb = 0.0, 0
        if sharded:
            for si in rng.permutation(len(train_shards)):
                sdata, remap = put_shard(train_shards[si])
                perm = rng.permutation(train_win[si])
                for i in range(0, len(perm) - B + 1, B):
                    batch = device_batch(perm[i : i + B], remap)
                    params, opt_state, loss = train_step(
                        params, opt_state, batch, sdata
                    )
                    tot += float(loss)
                    nb += 1
        elif use_dev:
            pairs = epoch_pairs(rng.permutation(train_idx))
            chunk = config.epoch_scan_chunk or pairs.shape[0]
            for ci in range(0, pairs.shape[0], chunk):
                params, opt_state, losses = train_epoch_scan(
                    params, opt_state, pairs[ci : ci + chunk], data
                )
                # float() syncs here, capping the dispatch length.
                tot += float(losses.sum())
                nb += losses.shape[0]
        else:
            perm = rng.permutation(train_idx)
            for i in range(0, len(perm) - B + 1, B):
                batch = device_batch(perm[i : i + B])
                params, opt_state, loss = train_step(
                    params, opt_state, batch, data
                )
                tot += float(loss)
                nb += 1
        train_loss = tot / max(nb, 1)

        vtot, vnb = 0.0, 0
        if sharded:
            for si in range(len(val_shards)):
                sdata, remap = put_shard(val_shards[si])
                vw = val_win[si]
                for i in range(0, max(len(vw) - B + 1, 1), B):
                    batch = device_batch(vw[i : i + B], remap)
                    vtot += float(eval_loss(params, batch, sdata))
                    vnb += 1
        elif use_dev and len(val_idx) >= B:
            vpairs = epoch_pairs(val_idx)
            chunk = config.epoch_scan_chunk or vpairs.shape[0]
            for ci in range(0, vpairs.shape[0], chunk):
                vlosses = eval_epoch_scan(
                    params, vpairs[ci : ci + chunk], data
                )
                vtot += float(vlosses.sum())
                vnb += vlosses.shape[0]
        else:
            for i in range(0, max(len(val_idx) - B + 1, 1), B):
                batch = device_batch(val_idx[i : i + B])
                vtot += float(eval_loss(params, batch, data))
                vnb += 1
        val_loss = vtot / max(vnb, 1)
        history["train_loss"].append(train_loss)
        history["val_loss"].append(val_loss)
        if val_loss < best_val:
            best_val = val_loss
            best_params = params
        if ckpt and (
            val_loss == best_val or epoch % config.checkpoint_every == 0
        ):
            ckpt.save(
                epoch,
                {
                    "params": jax.tree.map(np.asarray, params),
                    "opt_state": jax.tree.map(np.asarray, opt_state),
                    "epoch": np.int32(epoch),
                },
                force=True,
            )
        if logger:
            logger.log(
                {"epoch": epoch, "train_loss": train_loss, "val_loss": val_loss}
            )
        if verbose:
            print(
                f"Epoch {epoch:3d} | Train Loss: {train_loss:.6f} "
                f"| Val Loss: {val_loss:.6f} | {time.time() - t0:.1f}s",
                flush=True,
            )

    return {
        "model": model,
        "params": best_params,
        "final_params": params,
        "history": history,
        "best_val_loss": best_val,
    }
