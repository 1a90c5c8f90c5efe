"""Mesh-correctness tests: the distributed layer the reference lacks
(SURVEY.md §5 comm-backend row; reference picks a single device at
/root/reference/scripts/train_gde.py:456).

Asserts that sharding is a pure placement decision: a dp-sharded GDE train
step produces the same loss and the same updated parameters as the
single-device step, a dp x mp (4x2) mesh with tensor-parallel SAGE weights
matches dp-only, and an explicit shard_map+psum gradient equals the
full-batch gradient. Runs on the 8-device virtual CPU mesh from conftest.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from swarm_ode_tpu.graphs.temporal import TemporalWindow, build_temporal_graph
from swarm_ode_tpu.models.gde import GraphODE
from swarm_ode_tpu.parallel import mesh as meshlib
from swarm_ode_tpu.train.train_gde import _batch_loss

NUM_AGVS, OBS_DIM, WINDOW, NODES = 3, 16, 5, 5


def _model_and_batch(batch_size=8):
    model = GraphODE(node_dim=OBS_DIM, num_agvs=NUM_AGVS, hidden_dim=8)
    rng = np.random.RandomState(0)
    batch = {
        "obs": jnp.asarray(
            rng.rand(batch_size, WINDOW, NODES, OBS_DIM).astype(np.float32)
        ),
        "count": jnp.full((batch_size,), WINDOW, jnp.int32),
        "next_pos": jnp.asarray(
            rng.rand(batch_size, NODES, 2).astype(np.float32)
        ),
        "weight": jnp.ones((batch_size,), jnp.float32),
    }
    w0 = TemporalWindow(obs=batch["obs"][0], count=batch["count"][0])
    g0 = build_temporal_graph(w0, NUM_AGVS)
    params = model.init(jax.random.PRNGKey(0), g0, jnp.array([0.0, 1.0]))
    return model, params, batch


def _train_step(model):
    loss_fn = _batch_loss(model, NUM_AGVS, 5.0)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step, tx


def _max_abs_diff(a, b):
    return max(
        float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def test_dp_sharded_step_matches_single_device():
    with jax.default_matmul_precision("highest"):
        model, params, batch = _model_and_batch()
        step, tx = _train_step(model)

        # Single device: everything on device 0, no sharding.
        dev0 = jax.devices()[0]
        p1 = jax.device_put(params, dev0)
        s1 = tx.init(p1)
        b1 = jax.device_put(batch, dev0)
        p1, s1, loss1 = step(p1, s1, b1)

        # dp-sharded over the full 8-device mesh: replicated params,
        # batch split over 'dp'; XLA inserts the gradient psum.
        mesh = meshlib.make_mesh(("dp",))
        p8 = meshlib.replicate(mesh, params)
        s8 = meshlib.replicate(mesh, tx.init(p8))
        b8 = meshlib.shard_batch(mesh, batch)
        p8, s8, loss8 = step(p8, s8, b8)

        assert abs(float(loss1) - float(loss8)) < 1e-6
        assert _max_abs_diff(p1, p8) < 1e-6


def test_dp_mp_mesh_matches_dp_only():
    """4x2 mesh: batch on 'dp', GraphODEFunc SAGE weights tensor-parallel on
    'mp'. Must equal the dp-only result — sharding never changes math."""
    with jax.default_matmul_precision("highest"):
        model, params, batch = _model_and_batch()
        step, tx = _train_step(model)

        mesh_dp = meshlib.make_mesh(("dp",))
        p_dp = meshlib.replicate(mesh_dp, params)
        s_dp = meshlib.replicate(mesh_dp, tx.init(p_dp))
        b_dp = meshlib.shard_batch(mesh_dp, batch)
        p_dp, s_dp, loss_dp = step(p_dp, s_dp, b_dp)

        mesh = meshlib.make_mesh(("dp", "mp"), shape=(4, 2))

        def param_sharding(path, leaf):
            pathstr = "/".join(str(p.key) for p in path if hasattr(p, "key"))
            if ("conv1" in pathstr or "conv2" in pathstr) and leaf.ndim == 2:
                return NamedSharding(mesh, P(None, "mp"))
            return NamedSharding(mesh, P())

        p_mp = jax.tree_util.tree_map_with_path(
            lambda path, x: jax.device_put(x, param_sharding(path, x)), params
        )
        s_mp = jax.tree_util.tree_map_with_path(
            lambda path, x: jax.device_put(x, param_sharding(path, x)),
            tx.init(p_mp),
        )
        b_mp = meshlib.shard_batch(mesh, batch)
        p_mp, s_mp, loss_mp = step(p_mp, s_mp, b_mp)

        assert abs(float(loss_dp) - float(loss_mp)) < 1e-6
        assert _max_abs_diff(p_dp, p_mp) < 1e-6


def test_shard_map_psum_gradient():
    """Explicit shard_map data parallelism over meshlib's mesh.

    Two collective facts are pinned down here:
    - psum of per-shard partial losses across 'dp' == full-batch loss;
    - the gradient w.r.t. *replicated* params of a dp-varying loss is
      already globally summed: under jax's varying-manual-axes semantics
      the transpose of broadcasting replicated params inserts the psum
      (an explicit extra psum would double-count by n_dev).
    """
    with jax.default_matmul_precision("highest"):
        mesh = meshlib.make_mesh(("dp",))
        n_dev = mesh.devices.size
        rng = np.random.RandomState(1)
        W = jnp.asarray(rng.rand(16, 4).astype(np.float32))
        x = jnp.asarray(rng.rand(8 * n_dev, 16).astype(np.float32))
        y = jnp.asarray(rng.rand(8 * n_dev, 4).astype(np.float32))

        def local_loss(w, xs, ys):
            return jnp.sum((xs @ w - ys) ** 2)

        def sharded_loss_and_grad(w, xs, ys):
            loss = jax.lax.psum(local_loss(w, xs, ys), "dp")
            grad = jax.grad(local_loss)(w, xs, ys)  # implicit psum (vma)
            return loss, grad

        loss_sharded, g_sharded = jax.jit(
            jax.shard_map(
                sharded_loss_and_grad,
                mesh=mesh,
                in_specs=(P(), P("dp"), P("dp")),
                out_specs=(P(), P()),
            )
        )(W, x, y)
        loss_full, g_full = jax.value_and_grad(local_loss)(W, x, y)
        np.testing.assert_allclose(
            float(loss_sharded), float(loss_full), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(g_sharded), np.asarray(g_full), rtol=1e-6, atol=1e-6
        )


def test_dp_sharded_env_rollout_matches_unsharded():
    """The '8 chips ~ 1.2M env steps/s' extrapolation rests on the env
    rollout being embarrassingly data-parallel: sharding the batch of
    PRNG keys over 'dp' must reproduce the unsharded vmapped rollout
    trajectory-for-trajectory with zero collectives (VERDICT r2 #9;
    bench.py runs this exact program single-chip)."""
    from swarm_ode_tpu.config import EnvConfig
    from swarm_ode_tpu.env import step as step_mod
    from swarm_ode_tpu.env.layout import build_layout
    from swarm_ode_tpu.env.state import make_params
    from swarm_ode_tpu.policies import heuristic as H

    cfg = EnvConfig.from_env_id("tarware-tiny-3agvs-2pickers-partialobs-v1")
    lay = build_layout(cfg)
    params = make_params(cfg, lay)
    policy = H.make_policy(params, lay)
    steps = 12

    def one(key):
        es = step_mod.reset(params, key)
        hs = H.init_state(params)

        def body(carry, _):
            es, hs = carry
            actions, hs = policy(params, es, hs)
            es, rew, done, info = step_mod.step(params, es, actions)
            return (es, hs), (
                es.agent_xy,
                actions,
                rew,
                info["shelf_deliveries"],
            )

        _, traj = jax.lax.scan(body, (es, hs), None, length=steps)
        return traj

    run = jax.jit(jax.vmap(one))
    mesh = meshlib.make_mesh(("dp",))
    n_dev = mesh.devices.size
    keys = jax.random.split(jax.random.PRNGKey(7), 2 * n_dev)

    # Unsharded: whole batch on device 0.
    xy1, act1, rew1, del1 = run(jax.device_put(keys, jax.devices()[0]))

    # dp-sharded keys: jit auto-partitions; the program must lower with
    # no cross-device communication and identical per-env trajectories.
    keys_sh = jax.device_put(keys, NamedSharding(mesh, P("dp")))
    xy8, act8, rew8, del8 = run(keys_sh)
    assert isinstance(xy8.sharding, NamedSharding)
    assert xy8.sharding.spec[0] == "dp"
    assert len(xy8.addressable_shards) == n_dev

    np.testing.assert_array_equal(np.asarray(xy1), np.asarray(xy8))
    np.testing.assert_array_equal(np.asarray(act1), np.asarray(act8))
    np.testing.assert_array_equal(np.asarray(del1), np.asarray(del8))
    np.testing.assert_allclose(
        np.asarray(rew1), np.asarray(rew8), rtol=0, atol=1e-7
    )


def test_mesh_helpers():
    mesh = meshlib.make_mesh(("dp",))
    n_dev = mesh.devices.size
    assert n_dev == len(jax.devices())

    batch = {"a": jnp.ones((5, 3)), "b": jnp.zeros((5,), jnp.int32)}
    padded, mask = meshlib.pad_to_multiple(batch, n_dev)
    assert padded["a"].shape[0] == 8 and int(mask.sum()) == 5

    sharded = meshlib.shard_batch(mesh, padded)
    sh = sharded["a"].sharding
    assert isinstance(sh, NamedSharding) and sh.spec == P("dp")
    # Every device holds a distinct 1-row shard.
    assert len(sharded["a"].addressable_shards) == n_dev
    assert sharded["a"].addressable_shards[0].data.shape == (1, 3)

    rep = meshlib.replicate(mesh, {"w": jnp.arange(4.0)})
    assert rep["w"].sharding.spec == P()
