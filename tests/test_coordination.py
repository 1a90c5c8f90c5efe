"""Conflict-masked sequential action selection (rl/coordination.py).

The operator's contract: valid actions only, no same-type double-booking
of rack targets among active agents, confidence-ordered claims, busy
agents never claim, and exact equality with independent argmax when
there is no contention.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swarm_ode_tpu.config import EnvConfig
from swarm_ode_tpu.env import observations, step as step_mod
from swarm_ode_tpu.env.layout import build_layout
from swarm_ode_tpu.env.state import make_params
from swarm_ode_tpu.rl.coordination import (
    busy_from_feats,
    coordinated_argmax,
    coordinated_epsilon_greedy,
    coordinated_sample,
)
from swarm_ode_tpu.train.run_rl import _feats


# Synthetic fixture: 3 AGVs + 2 pickers, 8 actions, racks start at col 3
# (i.e. 1 noop + 2 goals + 5 racks).
NUM_AGVS = 3
RACK_START = 3
N_ACT = 8


def _q(rows):
    return jnp.asarray(rows, jnp.float32)


def _ones_masks(a=5):
    return jnp.ones((a, N_ACT), jnp.float32)


def test_no_conflict_equals_independent_argmax():
    q = _q(np.random.default_rng(0).normal(size=(5, N_ACT)))
    # Force distinct argmaxes: boost a different rack per agent.
    q = q.at[jnp.arange(5), RACK_START + jnp.arange(5)].set(10.0)
    masks = _ones_masks()
    acts = coordinated_argmax(q, masks, NUM_AGVS, RACK_START)
    np.testing.assert_array_equal(
        np.asarray(acts), np.asarray(jnp.argmax(q, axis=-1))
    )


def test_same_type_conflict_resolved_by_confidence():
    # All three AGVs want rack action 5; AGV1 wants it hardest.
    q = jnp.full((5, N_ACT), -1.0)
    q = q.at[0, 5].set(3.0).at[0, 6].set(2.0)
    q = q.at[1, 5].set(9.0).at[1, 6].set(1.0)
    q = q.at[2, 5].set(2.0).at[2, 7].set(1.5)
    # Pickers prefer their own distinct racks.
    q = q.at[3, 4].set(5.0)
    q = q.at[4, 3].set(5.0)
    acts = np.asarray(coordinated_argmax(q, _ones_masks(), NUM_AGVS,
                                         RACK_START))
    assert acts[1] == 5  # highest bid wins the contested rack
    assert acts[0] == 6  # falls back to its second choice
    assert acts[2] == 7
    agv_racks = [a for a in acts[:NUM_AGVS] if a >= RACK_START]
    assert len(set(agv_racks)) == len(agv_racks)


def test_agv_claim_does_not_block_picker():
    # AGV 0 and picker 3 both want rack 5 — pickers service AGV targets,
    # so both must get it.
    q = jnp.full((5, N_ACT), -1.0).at[0, 5].set(9.0).at[3, 5].set(8.0)
    acts = np.asarray(coordinated_argmax(q, _ones_masks(), NUM_AGVS,
                                         RACK_START))
    assert acts[0] == 5 and acts[3] == 5


def test_busy_agent_never_claims():
    # Busy AGV 0 outbids idle AGV 1 on rack 5, but its macro action is
    # ignored by the env — the idle agent must still get the rack.
    q = jnp.full((5, N_ACT), -1.0)
    q = q.at[0, 5].set(9.0).at[1, 5].set(4.0)
    active = jnp.asarray([False, True, True, True, True])
    acts = np.asarray(coordinated_argmax(q, _ones_masks(), NUM_AGVS,
                                         RACK_START, active=active))
    assert acts[1] == 5
    # The busy agent also sees the claimed rack struck: its selection is
    # ignored by the env, and for the TD-target argmax a teammate-claimed
    # rack should not contribute to its bootstrap value.
    assert acts[0] != 5


def test_goal_actions_never_claimed():
    # Both carrying AGVs want goal action 1 (goals are < RACK_START):
    # goals are not exclusive, both keep it.
    q = jnp.full((5, N_ACT), -1.0).at[0, 1].set(9.0).at[1, 1].set(8.0)
    acts = np.asarray(coordinated_argmax(q, _ones_masks(), NUM_AGVS,
                                         RACK_START))
    assert acts[0] == 1 and acts[1] == 1


def test_exhausted_menu_falls_back_to_valid_action():
    # Two AGVs, only rack 5 valid (plus noop col 0): loser takes noop.
    masks = jnp.zeros((5, N_ACT)).at[:, 0].set(1.0).at[:, 5].set(1.0)
    q = jnp.full((5, N_ACT), 0.0).at[0, 5].set(2.0).at[1, 5].set(1.0)
    acts = np.asarray(coordinated_argmax(q, masks, NUM_AGVS, RACK_START))
    assert acts[0] == 5 and acts[1] == 0
    # Validity always holds.
    assert all(np.asarray(masks)[i, a] > 0 for i, a in enumerate(acts))


def test_epsilon_one_explores_without_double_booking():
    key = jax.random.PRNGKey(0)
    masks = _ones_masks()
    for k in jax.random.split(key, 8):
        acts = np.asarray(
            coordinated_epsilon_greedy(
                jnp.zeros((5, N_ACT)), masks, NUM_AGVS, RACK_START,
                epsilon=1.0, key=k,
            )
        )
        assert all(np.asarray(masks)[i, a] > 0 for i, a in enumerate(acts))
        agv_racks = [a for a in acts[:NUM_AGVS] if a >= RACK_START]
        pick_racks = [a for a in acts[NUM_AGVS:] if a >= RACK_START]
        assert len(set(agv_racks)) == len(agv_racks)
        assert len(set(pick_racks)) == len(pick_racks)


def test_coordinated_sample_valid_and_conflict_free():
    key = jax.random.PRNGKey(1)
    logits = jnp.zeros((5, N_ACT))
    masks = _ones_masks().at[:, 2].set(0.0)
    acts = np.asarray(
        coordinated_sample(logits, masks, NUM_AGVS, RACK_START, key)
    )
    assert all(np.asarray(masks)[i, a] > 0 for i, a in enumerate(acts))
    agv_racks = [a for a in acts[:NUM_AGVS] if a >= RACK_START]
    assert len(set(agv_racks)) == len(agv_racks)


def test_sequential_log_prob_matches_independent_when_no_conflicts():
    """With one agent (or disjoint preferences) the sequential density
    reduces to the independent masked softmax."""
    from swarm_ode_tpu.rl.coordination import sequential_log_prob

    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (1, N_ACT))
    masks = jnp.ones((1, N_ACT)).at[0, 2].set(0.0)
    for a in range(N_ACT):
        if a == 2:
            continue
        lp, ent = sequential_log_prob(
            logits, masks, jnp.asarray([a]), 1, RACK_START
        )
        ref = jax.nn.log_softmax(
            jnp.where(masks[0] > 0, logits[0], -1e9)
        )[a]
        np.testing.assert_allclose(float(lp[0]), float(ref), rtol=1e-5)


def test_sequential_log_prob_is_exact_sampling_density():
    """Empirical frequencies of coordinated_sample match
    exp(sum_i sequential_log_prob_i) for every observed joint action —
    the unbiasedness contract of coordinated COMA."""
    from swarm_ode_tpu.rl.coordination import (
        coordinated_sample,
        sequential_log_prob,
    )

    # 2 AGVs + 1 picker, 5 actions, racks from col 2: small enough that
    # the joint support is coverable by 4000 samples.
    num_agvs, rack_start, n = 2, 2, 5
    key = jax.random.PRNGKey(3)
    logits = jax.random.normal(key, (3, n))
    masks = jnp.ones((3, n))
    active = jnp.asarray([True, True, True])

    N = 4000
    keys = jax.random.split(jax.random.PRNGKey(7), N)
    samples = jax.vmap(
        lambda k: coordinated_sample(logits, masks, num_agvs, rack_start,
                                     k, active=active)
    )(keys)
    samples = np.asarray(samples)

    joint, counts = np.unique(samples, axis=0, return_counts=True)
    # Model probability of each observed joint action.
    lps = jax.vmap(
        lambda a: sequential_log_prob(logits, masks, a, num_agvs,
                                      rack_start, active=active)[0].sum()
    )(jnp.asarray(joint))
    probs = np.exp(np.asarray(lps))
    freqs = counts / N
    # Frequencies agree within binomial noise (4 sigma).
    sigma = np.sqrt(probs * (1 - probs) / N)
    assert np.all(np.abs(freqs - probs) < 4 * sigma + 1e-3), (
        list(zip(joint.tolist(), freqs.tolist(), probs.tolist()))
    )
    # And the observed support covers most of the probability mass.
    assert probs.sum() > 0.98


def test_sequential_log_prob_zero_prob_for_double_booked_rack():
    from swarm_ode_tpu.rl.coordination import sequential_log_prob

    # Both AGVs "took" rack 4 — impossible under the auction, so the
    # later-ordered agent's logp must be ~log(0).
    logits = jnp.zeros((2, N_ACT)).at[0, 4].set(5.0).at[1, 4].set(1.0)
    masks = jnp.ones((2, N_ACT))
    lp, _ = sequential_log_prob(
        logits, masks, jnp.asarray([4, 4]), 2, RACK_START
    )
    assert float(lp[0]) > -2.0  # first claimant: high prob
    assert float(lp[1]) < -1e6  # impossible joint action


# ---------------------------------------------------------------- env
@pytest.fixture(scope="module")
def tiny_env():
    cfg = EnvConfig.from_env_id("tarware-tiny-3agvs-2pickers-partialobs-v1")
    lay = build_layout(cfg)
    params = make_params(cfg, lay)
    return params


def test_real_masks_no_same_type_rack_duplicates(tiny_env):
    params = tiny_env
    es = step_mod.reset(params, jax.random.PRNGKey(0))
    masks = observations.compute_valid_action_masks(params, es)
    rack_start = 1 + params.num_goals
    key = jax.random.PRNGKey(2)
    q = jax.random.normal(key, (params.num_agents, params.num_actions))
    acts = np.asarray(
        coordinated_argmax(q, masks, params.num_agvs, rack_start,
                           active=~es.agent_busy)
    )
    m = np.asarray(masks)
    assert all(m[i, a] > 0 for i, a in enumerate(acts))
    nav = params.num_agvs
    active = ~np.asarray(es.agent_busy)
    agv_racks = [a for i, a in enumerate(acts[:nav])
                 if a >= rack_start and active[i]]
    pick_racks = [a for i, a in enumerate(acts[nav:])
                  if a >= rack_start and active[nav + i]]
    assert len(set(agv_racks)) == len(agv_racks)
    assert len(set(pick_racks)) == len(pick_racks)


def test_busy_from_feats_matches_env_busy(tiny_env):
    """busy_from_feats reconstructs agent_busy from stored node features
    (target yx == 0 encodes idle) across a rolled-out episode prefix."""
    params = tiny_env
    key = jax.random.PRNGKey(3)
    es = step_mod.reset(params, key)
    rack_start = 1 + params.num_goals

    @jax.jit
    def roll(es, key):
        def body(carry, k):
            es, = carry
            masks = observations.compute_valid_action_masks(params, es)
            q = jax.random.normal(k, (params.num_agents,
                                      params.num_actions))
            acts = coordinated_argmax(q * masks, masks, params.num_agvs,
                                      rack_start, active=~es.agent_busy)
            es2, _, _, _ = step_mod.step(params, es, acts)
            obs = observations.observe(params, es2)
            return (es2,), (obs, es2.agent_busy)

        (_,), (obs_seq, busy_seq) = jax.lax.scan(
            body, (es,), jax.random.split(key, 30)
        )
        return obs_seq, busy_seq

    obs_seq, busy_seq = roll(es, jax.random.PRNGKey(4))
    mismatches = 0
    for t in range(30):
        feats = _feats(params, obs_seq[t])
        rec = np.asarray(busy_from_feats(feats["agv"], feats["picker"]))
        mismatches += int((rec != np.asarray(busy_seq[t])).sum())
    # The reconstruction is feature-exact except transient same-step
    # arrival edge cases; on this rollout it must be exact.
    assert mismatches == 0
