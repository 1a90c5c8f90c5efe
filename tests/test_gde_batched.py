"""The structured batched GDE path equals vmap of the per-graph path.

`GraphODE.apply_batched` computes SAGE aggregation on the structured
(spatial blocks + temporal shift) form of the batch instead of B dense
(W*N, W*N) adjacencies; these tests pin that the math — and therefore
trained parameters — are interchangeable between the two paths
(reference train_gde.py:20-106 semantics either way).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swarm_ode_tpu.graphs.temporal import (
    TemporalWindow,
    build_temporal_batch,
    build_temporal_graph,
)
from swarm_ode_tpu.models.gde import GraphODE
from swarm_ode_tpu.ops.sage import masked_mean_aggregate, temporal_mean_aggregate


def _rand_batch(rng, B=4, W=5, N=7, D=13):
    obs = rng.rand(B, W, N, D).astype(np.float32) * 10.0
    count = rng.randint(1, W + 1, size=(B,)).astype(np.int32)
    # zero-pad invalid frames the way _extract_windows does
    valid = np.arange(W)[None, :] < count[:, None]
    obs = obs * valid[:, :, None, None]
    return jnp.asarray(obs), jnp.asarray(count)


def test_structured_aggregation_matches_dense():
    rng = np.random.RandomState(0)
    obs, count = _rand_batch(rng)
    B, W, N, D = obs.shape
    num_agvs = 3
    bg = build_temporal_batch(obs, count, num_agvs)

    batched = temporal_mean_aggregate(bg.x, bg.spatial, bg.frame_valid)

    for b in range(B):
        g = build_temporal_graph(
            TemporalWindow(obs=obs[b], count=count[b]), num_agvs
        )
        dense = masked_mean_aggregate(g.x, g.adj, g.node_mask)
        np.testing.assert_allclose(
            np.asarray(batched[b]).reshape(W * N, D),
            np.asarray(dense),
            rtol=1e-5,
            atol=1e-5,
        )


@pytest.mark.parametrize("solver", ["euler", "rk4"])
def test_apply_batched_matches_per_graph(solver):
    rng = np.random.RandomState(1)
    obs, count = _rand_batch(rng, B=3, W=4, N=5, D=11)
    num_agvs = 2
    model = GraphODE(node_dim=11, hidden_dim=8, ode_solver=solver)
    g0 = build_temporal_graph(
        TemporalWindow(obs=obs[0], count=count[0]), num_agvs
    )
    t_span = jnp.array([0.0, 1.0], jnp.float32)
    params = model.init(jax.random.PRNGKey(0), g0, t_span)

    bg = build_temporal_batch(obs, count, num_agvs)
    out_b = model.apply_batched(params, bg, t_span)["trajectories"]

    for b in range(obs.shape[0]):
        g = build_temporal_graph(
            TemporalWindow(obs=obs[b], count=count[b]), num_agvs
        )
        out = model.apply(params, g, t_span)["trajectories"]
        W, N = obs.shape[1], obs.shape[2]
        np.testing.assert_allclose(
            np.asarray(out_b[:, b]).reshape(2, W * N, 2),
            np.asarray(out),
            rtol=1e-4,
            atol=1e-5,
        )


def test_train_step_loss_matches_legacy_vmap():
    """The production loss (batched path) equals the round-1 vmapped
    per-graph loss on identical params/batch."""
    from swarm_ode_tpu.train.train_gde import _batch_loss

    rng = np.random.RandomState(2)
    obs, count = _rand_batch(rng, B=4, W=4, N=5, D=11)
    num_agvs = 2
    model = GraphODE(node_dim=11, hidden_dim=8, ode_solver="euler")
    t_span = jnp.array([0.0, 1.0], jnp.float32)
    g0 = build_temporal_graph(
        TemporalWindow(obs=obs[0], count=count[0]), num_agvs
    )
    params = model.init(jax.random.PRNGKey(0), g0, t_span)
    batch = {
        "obs": obs,
        "count": count,
        "next_pos": jnp.asarray(rng.rand(4, 5, 2).astype(np.float32)),
        "weight": jnp.ones((4,), jnp.float32),
    }

    loss_new = _batch_loss(model, num_agvs, 5.0)(params, batch)

    def legacy(params, batch):
        def one(obs_w, c, nxt):
            g = build_temporal_graph(
                TemporalWindow(obs=obs_w, count=c), num_agvs, 5.0
            )
            out = model.apply(params, g, t_span)
            W, N = obs_w.shape[0], obs_w.shape[1]
            pred = out["trajectories"][1].reshape(W, N, 2)
            return jnp.mean((pred[jnp.maximum(c - 1, 0)] - nxt) ** 2)

        losses = jax.vmap(one)(batch["obs"], batch["count"], batch["next_pos"])
        return jnp.sum(losses * batch["weight"]) / jnp.sum(batch["weight"])

    np.testing.assert_allclose(
        float(loss_new), float(legacy(params, batch)), rtol=1e-5
    )
