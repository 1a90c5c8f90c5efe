"""Behavior cloning from logged dispatcher decisions (train/train_bc.py):
datagen -> decision arrays -> masked-CE training -> greedy rollout eval,
in miniature on the tiny env."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_h5(tmp_path_factory):
    from swarm_ode_tpu.data.collect import collect_data

    path = str(tmp_path_factory.mktemp("bc") / "tiny.h5")
    stats = collect_data(
        "tarware-tiny-3agvs-2pickers-partialobs-v1",
        num_episodes=4,
        seed=0,
        out_path=path,
        batch=2,
        chunk=50,
        verbose=False,
    )
    assert stats["episodes"] == 4
    return path


def test_load_decision_arrays(tiny_h5):
    from swarm_ode_tpu.train.train_bc import load_decision_arrays

    obs, act, busy, ep = load_decision_arrays([tiny_h5], stride=2)
    assert obs.shape[0] == act.shape[0] == busy.shape[0] == ep.shape[0]
    assert obs.shape[0] == 4 * 250  # 500-step episodes, stride 2
    assert obs.shape[1] == act.shape[1] == busy.shape[1] == 5  # agents
    assert ep.max() == 3
    # The dispatcher makes real decisions: some idle rows pick racks.
    assert (~busy).any() and (act[~busy] > 0).any()
    # max_episodes caps the episode count.
    obs2, _, _, ep2 = load_decision_arrays([tiny_h5], stride=2,
                                           max_episodes=2)
    assert ep2.max() == 1 and obs2.shape[0] == 2 * 250


def test_bc_trains_and_evaluates(tiny_h5):
    from swarm_ode_tpu.train.train_bc import BCConfig, train_bc

    out = train_bc(
        BCConfig(
            env_id="tarware-tiny-3agvs-2pickers-partialobs-v1",
            files=[tiny_h5],
            net="gnn",
            hidden_dim=16,
            epochs=3,
            batch_size=32,
            step_stride=4,
            seed=0,
            eval_episodes=2,
        ),
        verbose=False,
    )
    h = out["history"]
    # Cloning actually fits the decision record: CE falls and decision
    # accuracy rises well above the ~1/valid-actions floor. (Val-set
    # generalization at 4-episode toy scale is noise — the reference-
    # scale val accuracy lives in runs/bc_*/result.json — so only the
    # fit and the finite val metrics are pinned here.)
    assert h[-1]["train_loss"] < h[0]["train_loss"]
    assert h[-1]["train_acc"] > max(0.3, h[0]["train_acc"])
    assert np.isfinite(h[-1]["val_loss"]) and np.isfinite(h[-1]["val_acc"])
    assert np.isfinite(out["best_val_loss"])
    ev = out["eval"]
    assert ev["episodes"] == 2 and np.isfinite(ev["pick_rate"])
    assert ev["pick_rate"] >= 0


def test_dagger_collect_and_aggregate_retrain(tiny_h5):
    """DAgger round in miniature: collect clone-visited states with
    expert labels (collect_dagger), aggregate with the base arrays, and
    continue training from the current params."""
    import jax

    from swarm_ode_tpu.config import EnvConfig
    from swarm_ode_tpu.env.layout import build_layout
    from swarm_ode_tpu.env.state import make_params
    from swarm_ode_tpu.train import train_bc as bc
    from swarm_ode_tpu.train.run_rl import RLRunConfig, _make_network

    env_id = "tarware-tiny-3agvs-2pickers-partialobs-v1"
    cfg = bc.BCConfig(env_id=env_id, files=[tiny_h5], net="gnn",
                      hidden_dim=16, epochs=1, batch_size=32,
                      step_stride=8)
    out = bc.train_bc(cfg, verbose=False)

    env_cfg = EnvConfig.from_env_id(env_id)
    lay = build_layout(env_cfg)
    params = make_params(env_cfg, lay)
    net = _make_network(
        RLRunConfig(net="gnn", hidden_dim=16),
        params.num_actions, params.num_agvs, params.num_pickers,
        coord_scale=1.0 / float(max(params.grid_h, params.grid_w)),
    )
    E, steps = 2, 40
    o, a, b = bc.collect_dagger(params, lay, net, out["params"], E,
                                jax.random.PRNGKey(5), beta=0.5,
                                steps=steps)
    assert o.shape == (E * steps, params.num_agents,
                       119) and o.dtype == np.float16
    assert a.shape == b.shape == (E * steps, params.num_agents)
    assert a.min() >= 0 and a.max() < params.num_actions
    # Expert labels are real decisions: some idle rows pick racks.
    assert ((a > 0) & ~b).any()

    # Aggregate + continue training from the current params.
    base = bc.load_decision_arrays([tiny_h5], stride=8)
    e_ids = int(base[3].max()) + 1 + np.tile(np.arange(E, dtype=np.int32),
                                             steps)
    agg = (
        np.concatenate([base[0], o]),
        np.concatenate([base[1], a]),
        np.concatenate([base[2], b]),
        np.concatenate([base[3], e_ids]),
    )
    out2 = bc.train_bc(cfg, verbose=False, arrays=agg,
                       init_params=out["params"])
    assert np.isfinite(out2["history"][-1]["train_loss"])


def test_bc_checkpoint_roundtrip(tiny_h5, tmp_path):
    """BC params save under the q_params key and restore into the same
    network — the RL warm-start contract."""
    import jax

    from swarm_ode_tpu.train.train_bc import BCConfig, train_bc
    from swarm_ode_tpu.utils.checkpoint import CheckpointManager

    ck = str(tmp_path / "bc_ck")
    out = train_bc(
        BCConfig(
            env_id="tarware-tiny-3agvs-2pickers-partialobs-v1",
            files=[tiny_h5],
            net="gnn",
            hidden_dim=16,
            epochs=1,
            batch_size=32,
            step_stride=8,
            checkpoint_dir=ck,
        ),
        verbose=False,
    )
    mgr = CheckpointManager(ck)
    template = {"q_params": jax.tree.map(np.asarray, out["params"])}
    restored = mgr.restore(template)
    assert restored is not None
    got = jax.tree.leaves(restored["q_params"])
    want = jax.tree.leaves(template["q_params"])
    assert all(np.allclose(a, b) for a, b in zip(got, want))

    # RL warm start end-to-end: init_q_from loads the cloned params into
    # QMIX and the eval-only mode rolls the warm policy greedily.
    from swarm_ode_tpu.train.run_rl import RLRunConfig, run_marl

    res = run_marl(
        RLRunConfig(
            env_id="tarware-tiny-3agvs-2pickers-partialobs-v1",
            algo="qmix", net="gnn", hidden_dim=16, num_episodes=0,
            buffer_size=64, eval_episodes=2, init_q_from=ck,
            coordinated=True,
        ),
        verbose=False,
    )
    stats = res["history"][0]
    assert np.isfinite(stats["eval_pick_rate"])
    loaded = jax.tree.leaves(res["agent_state"].params["q"])
    assert all(np.allclose(a, b) for a, b in zip(loaded, want))
