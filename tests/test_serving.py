"""Hermetic policy export (serving.py): trace -> serialize -> reload ->
identical actions, with and without the claim auction."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swarm_ode_tpu.config import EnvConfig
from swarm_ode_tpu.env import observations, step as step_mod
from swarm_ode_tpu.env.layout import build_layout
from swarm_ode_tpu.env.state import make_params
from swarm_ode_tpu.serving import export_policy, load_policy, make_policy_fn
from swarm_ode_tpu.train.run_rl import RLRunConfig, _make_network


@pytest.fixture(scope="module")
def setup():
    cfg = EnvConfig.from_env_id("tarware-tiny-3agvs-2pickers-partialobs-v1")
    params = make_params(cfg, build_layout(cfg))
    net = _make_network(
        RLRunConfig(net="gnn", hidden_dim=16),
        params.num_actions, params.num_agvs, params.num_pickers,
        coord_scale=1.0 / float(max(params.grid_h, params.grid_w)),
    )
    key = jax.random.PRNGKey(0)
    es = step_mod.reset(params, key)
    obs = observations.observe(params, es)
    from swarm_ode_tpu.graphs.hetero import hetero_graph_from_obs

    net_params = net.init(key, hetero_graph_from_obs(params, obs))
    return params, net, net_params, es, obs


@pytest.mark.parametrize("coordinated", [False, True])
def test_export_roundtrip_matches_direct_call(setup, coordinated):
    params, net, net_params, es, obs = setup
    policy = make_policy_fn(params, net, net_params, coordinated=coordinated)
    blob = export_policy(policy, obs)
    assert isinstance(blob, bytes) and len(blob) > 1000
    served = load_policy(blob)

    # Roll a few env steps; served blob and direct function must agree.
    key = jax.random.PRNGKey(1)
    for _ in range(5):
        want = np.asarray(policy(obs))
        got = np.asarray(served(np.asarray(obs, np.float32)))
        np.testing.assert_array_equal(got, want)
        es, _, _, _ = step_mod.step(params, es, jnp.asarray(want))
        obs = observations.observe(params, es)


def test_exported_blob_is_file_persistable(setup, tmp_path):
    params, net, net_params, es, obs = setup
    policy = make_policy_fn(params, net, net_params)
    blob = export_policy(policy, obs)
    p = tmp_path / "policy.stablehlo"
    p.write_bytes(blob)
    served = load_policy(p.read_bytes())
    np.testing.assert_array_equal(
        np.asarray(served(np.asarray(obs, np.float32))),
        np.asarray(policy(obs)),
    )


def test_stochastic_export_roundtrip(setup):
    """Temperature policies export with the (obs, seed) convention:
    same seed -> identical served actions; valid actions always."""
    params, net, net_params, es, obs = setup
    policy = make_policy_fn(params, net, net_params, temperature=1.5)
    blob = export_policy(policy, obs, stochastic=True)
    served = load_policy(blob)
    masks = np.asarray(observations.compute_valid_action_masks(params, es))
    for seed in (0, 7, 123):
        want = np.asarray(policy(obs, jnp.uint32(seed)))
        got = np.asarray(served(np.asarray(obs, np.float32), seed))
        np.testing.assert_array_equal(got, want)
        assert all(masks[i, a] > 0 for i, a in enumerate(got))
    # Missing seed is a loud error, not a silent greedy fallback.
    with pytest.raises(ValueError, match="seed"):
        served(np.asarray(obs, np.float32))


def test_exported_policy_actions_are_valid(setup):
    params, net, net_params, es, obs = setup
    served = load_policy(
        export_policy(make_policy_fn(params, net, net_params, True), obs)
    )
    masks = np.asarray(observations.compute_valid_action_masks(params, es))
    acts = np.asarray(served(np.asarray(obs, np.float32)))
    assert all(masks[i, a] > 0 for i, a in enumerate(acts))


def test_gde_export_roundtrip():
    """The flagship trajectory model exports to a hermetic blob:
    (window obs, count) in, (horizon+1, N, 2) trajectory out, equal to
    the direct apply — including a warmup (count < W) window."""
    from swarm_ode_tpu.graphs.temporal import (
        TemporalWindow,
        build_temporal_graph,
    )
    from swarm_ode_tpu.models.gde import GraphODE
    from swarm_ode_tpu.serving import export_gde, load_gde, make_gde_fn

    W, N, D, H = 4, 5, 9, 3
    model = GraphODE(node_dim=D, num_agvs=3, num_pickers=2, hidden_dim=8)
    rng = np.random.RandomState(0)
    obs = rng.rand(W, N, D).astype(np.float32) * 8.0
    w0 = TemporalWindow(obs=jnp.asarray(obs), count=jnp.int32(W))
    params = model.init(
        jax.random.PRNGKey(0),
        build_temporal_graph(w0, 3, 5.0),
        jnp.array([0.0, 1.0]),
    )
    fn = make_gde_fn(model, params, horizon=H)
    blob = export_gde(fn, window=W, num_agents=N, obs_dim=D)
    assert isinstance(blob, bytes) and len(blob) > 1000
    served = load_gde(blob)
    for count in (W, 2):
        want = np.asarray(fn(jnp.asarray(obs), jnp.int32(count)))
        got = np.asarray(served(obs, count))
        assert want.shape == (H + 1, N, 2)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_committed_blobs_load():
    """Any serving blob committed under results_data/ must still
    deserialize and advertise cpu among its lowering platforms (blobs are
    exported multi-platform so CPU consumers can replay TPU-trained
    policies)."""
    import pathlib

    from jax import export as jax_export

    blobs = sorted(
        pathlib.Path(__file__).resolve().parent.parent.glob(
            "results_data/*.stablehlo"
        )
    )
    if not blobs:
        pytest.skip("no committed blobs yet")
    for p in blobs:
        exported = jax_export.deserialize(p.read_bytes())
        assert len(exported.in_avals) >= 1, p.name
        assert "cpu" in exported.platforms, (
            f"{p.name} lowered for {exported.platforms} — not replayable "
            "on CPU"
        )
