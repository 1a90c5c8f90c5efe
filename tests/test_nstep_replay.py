"""n-step replay chains: validity across episode boundaries, dones,
overwrites; discounted aggregation matches a hand-rolled computation."""
import jax
import jax.numpy as jnp
import numpy as np

from swarm_ode_tpu.rl import replay


def _item(t, ep, r, done):
    return {
        "rewards": jnp.full((2,), r, jnp.float32),  # 2 agents
        "next_feats": jnp.full((3,), float(t)),
        "next_global_state": jnp.full((4,), float(t)),
        "done": jnp.bool_(done),
        "_t": jnp.int32(t),
        "_ep": jnp.int32(ep),
        "actions": jnp.zeros(2, jnp.int32),
    }


def test_sample_nstep_chains():
    B = 2  # lockstep envs (stride)
    buf = replay.init(_item(0, 0, 0.0, False), capacity=64)
    # episode 0: steps t=0..4, env0 reward = t, env1 = 10+t; done at t=3 env0
    for t in range(5):
        items = jax.tree.map(
            lambda a, b: jnp.stack([a, b]),
            _item(t, 0, float(t), t == 3),
            _item(t, 0, 10.0 + t, False),
        )
        buf = replay.add_batch(buf, items)
    # episode 1: steps t=5..6
    for t in range(5, 7):
        items = jax.tree.map(
            lambda a, b: jnp.stack([a, b]),
            _item(t, 1, float(t), False),
            _item(t, 1, 10.0 + t, False),
        )
        buf = replay.add_batch(buf, items)

    n = 3
    # Deterministically probe every base slot by monkey-sampling: sample
    # many and index; easier — call the internals directly via a fixed key
    # then verify invariants on every returned row.
    out = replay.sample_nstep(buf, jax.random.PRNGKey(0), 256, n, stride=B)
    t0 = np.asarray(out["_t"])
    ep0 = np.asarray(out["_ep"])
    valid = np.asarray(out["nstep_valid"])
    m = np.asarray(out["nstep_m"])
    rew = np.asarray(out["nstep_rewards"])  # (S, n, 2)
    done_end = np.asarray(out["done"])
    boot = np.asarray(out["next_global_state"])  # filled with t of chain end

    assert valid[:, 0].all() and (m >= 1).all() and (m <= n).all()
    for s in range(len(t0)):
        # chain end bootstrap state comes from t0+m-1
        assert boot[s, 0] == t0[s] + m[s] - 1
        # links never cross episode boundary: all steps of the chain share ep
        # episode 0 has t in [0,5), episode 1 in [5,7)
        hi = 5 if ep0[s] == 0 else 7
        assert t0[s] + m[s] - 1 < hi
        # rewards of valid links are the logged per-step values
        env = 0 if rew[s, 0, 0] < 10 else 1
        for k in range(n):
            if valid[s, k]:
                expect = (t0[s] + k) + (10.0 if env else 0.0)
                assert rew[s, k, 0] == expect
            else:
                assert rew[s, k, 0] == 0.0
        # env0 done at t=3 ends the chain there
        if env == 0 and t0[s] <= 3 <= t0[s] + m[s] - 1:
            assert t0[s] + m[s] - 1 == 3 and done_end[s]
    # discounted aggregation example: base t=1 env0 with n=3 spans t=1,2,3
    sel = (t0 == 1) & (rew[:, 0, 0] < 10)
    if sel.any():
        s = np.nonzero(sel)[0][0]
        g = 0.9
        np.testing.assert_allclose(
            (rew[s, :, 0] * np.array([1, g, g * g]) * valid[s]).sum(),
            1 + 2 * g + 3 * g * g,
        )


def test_sample_recent_only_newest_window():
    buf = replay.init({"v": jnp.int32(0)}, capacity=10)
    for i in range(25):  # wraps the ring twice
        buf = replay.add(buf, {"v": jnp.int32(i)})
    s = replay.sample_recent(buf, jax.random.PRNGKey(0), 64, window=4)
    vals = np.asarray(s["v"])
    # Newest 4 items carry values 21..24 - nothing older may appear.
    assert set(vals.tolist()) <= {21, 22, 23, 24}
    assert len(set(vals.tolist())) > 1  # actually samples a range
