"""Conflict-masked sequential action selection (greedy claim auction).

The round-3 QMIX plateau analysis (RESULTS.md) pinned the remaining gap
to the hand-written FIFO dispatcher on team-routing constraints that
independent per-agent argmax cannot express: the env's valid-action
masks (semantics of reference warehouse.py:727-752,
block_conflicting_actions) strike racks *already targeted* by a busy
agent, but when several idle agents select in the same macro step
nothing stops them all claiming the same newly-requested shelf. The
reference's own QMIX loop (run_gnode.py:869-883) has exactly this hole;
its hand-crafted dispatcher (heuristic_policy.py) never double-books by
construction — each shelf is assigned to at most one AGV.

This module closes that conflict class at action-selection time:

* agents choose sequentially in descending order of their best masked
  utility ("most confident bids first" — a one-round greedy auction);
* when an *active* (idle) agent commits to a rack action, that rack is
  struck from the menus of later agents of the SAME type. AGV claims do
  not block pickers: pickers are supposed to service AGV targets
  (warehouse.py pickers_to_agvs), and vice versa;
* busy agents never claim — the env ignores their macro action anyway
  (env/step.py Phase 1a keeps the existing target).

Selection stays greedy w.r.t. the same factorized utilities, so this is
a policy-improvement operator over the conflict-constrained joint action
set. The QMIX TD target uses the same operator (rl/qmix.py next_q_one),
so the bootstrap evaluates the joint policy actually executed.

Everything is lax.scan over the (static) agent count — one fused kernel
under jit, no data-dependent Python control flow.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

BIG_NEG = -1e9


def _selection_order(scores: jnp.ndarray, active) -> jnp.ndarray:
    """Deterministic claim order: best score first, busy agents last.
    Shared by selection and density computation — the two MUST agree for
    sequential_log_prob to be the exact density of coordinated_sample."""
    return jnp.argsort(-(scores - jnp.where(active, 0.0, 1e12)))


def coordinated_argmax(
    q: jnp.ndarray,  # (A, num_actions) utilities (Q-values or logits)
    masks: jnp.ndarray,  # (A, num_actions) valid-action masks (>0 = valid)
    num_agvs: int,
    rack_start: int,  # first rack action index == 1 + num_goals
    active=None,  # (A,) bool; False = busy (selects but never claims)
    order_scores=None,  # (A,) claim-order override (default: best bid)
) -> jnp.ndarray:
    """Sequential conflict-masked argmax. Returns (A,) int32 actions.

    Guarantees (tests/test_coordination.py):
    * every returned action is valid under `masks`;
    * no two active same-type agents return the same rack action;
    * an agent whose whole rack menu is claimed falls back to its best
      remaining valid action (NOOP at worst — column 0 is always valid,
      compute_valid_action_masks never zeroes it);
    * when argmaxes are conflict-free the result equals independent
      argmax (the operator is a no-op without contention).
    """
    A, n = q.shape
    masked = jnp.where(masks > 0, q, BIG_NEG)
    if active is None:
        active = jnp.ones((A,), jnp.bool_)
    # Most confident bids first; busy agents last (they never claim, but
    # idle agents must outrank them for the menus to be right).
    if order_scores is None:
        order_scores = jnp.max(masked, axis=-1)
    order = _selection_order(order_scores, active)

    col = jnp.arange(n)

    def body(carry, i):
        claimed_agv, claimed_pick = carry
        is_picker = i >= num_agvs
        claimed = jnp.where(is_picker, claimed_pick, claimed_agv)
        # `claimed` is only ever set on rack columns, so striking the
        # whole claimed set never touches NOOP/goal actions.
        a = jnp.argmax(jnp.where(claimed, BIG_NEG, masked[i]))
        take = active[i] & (a >= rack_start)
        claimed_new = claimed | ((col == a) & take)
        claimed_agv = jnp.where(is_picker, claimed_agv, claimed_new)
        claimed_pick = jnp.where(is_picker, claimed_new, claimed_pick)
        return (claimed_agv, claimed_pick), a

    init = (jnp.zeros(n, jnp.bool_), jnp.zeros(n, jnp.bool_))
    _, acts = jax.lax.scan(body, init, order)
    return jnp.zeros(A, jnp.int32).at[order].set(acts.astype(jnp.int32))


def coordinated_epsilon_greedy(
    q: jnp.ndarray,
    masks: jnp.ndarray,
    num_agvs: int,
    rack_start: int,
    epsilon,
    key,
    active=None,
    training=True,
) -> jnp.ndarray:
    """Epsilon-greedy under the claim auction.

    Exploring agents bid with uniform-random utilities instead of their
    Q row, then every agent goes through the same sequential claim pass —
    so even exploratory actions never double-book a rack. (Replacing the
    row, rather than overriding the final action, keeps the claim
    bookkeeping consistent: a random action claims its rack too.)
    """
    k1, k2 = jax.random.split(key)
    explore = (jax.random.uniform(k1, (q.shape[0],)) < epsilon) & training
    bids = jnp.where(explore[:, None], jax.random.uniform(k2, q.shape), q)
    return coordinated_argmax(bids, masks, num_agvs, rack_start, active)


def coordinated_sample(
    logits: jnp.ndarray,
    masks: jnp.ndarray,
    num_agvs: int,
    rack_start: int,
    key,
    active=None,
) -> jnp.ndarray:
    """Claim-masked sequential categorical sampling via the Gumbel-max
    trick: argmax over a restricted menu of (logits + Gumbel) is an exact
    sample from the softmax renormalized over that menu, so running the
    perturbed logits through the auction samples each agent's action from
    its distribution conditioned on earlier agents' claims.

    The claim ORDER is deterministic (clean masked logits, not the
    perturbed ones — `_selection_order`), which makes the joint density
    tractable: `sequential_log_prob` computes it exactly, so on-policy
    learners (COMA) can differentiate the very distribution they sampled
    from."""
    masked = jnp.where(masks > 0, logits, BIG_NEG)
    noisy = masked + jax.random.gumbel(key, logits.shape)
    if active is None:
        active = jnp.ones((logits.shape[0],), jnp.bool_)
    return coordinated_argmax(
        noisy, masks, num_agvs, rack_start, active,
        order_scores=jnp.max(masked, axis=-1),
    )


def sequential_log_prob(
    logits: jnp.ndarray,  # (A, num_actions)
    masks: jnp.ndarray,  # (A, num_actions)
    actions: jnp.ndarray,  # (A,) taken actions (int)
    num_agvs: int,
    rack_start: int,
    active=None,
) -> tuple:
    """Exact per-agent log-density and entropy of `coordinated_sample`.

    Replays the deterministic claim order and reconstructs each agent's
    restricted menu from the ACTUALLY TAKEN earlier actions, then scores
    the taken action under the renormalized softmax. Returns
    (logp (A,), entropy (A,)) aligned to agent index — entropy is the
    per-agent conditional entropy given the earlier claims.
    """
    A, n = logits.shape
    masked = jnp.where(masks > 0, logits, BIG_NEG)
    if active is None:
        active = jnp.ones((A,), jnp.bool_)
    order = _selection_order(jnp.max(masked, axis=-1), active)
    col = jnp.arange(n)

    def body(carry, i):
        claimed_agv, claimed_pick = carry
        is_picker = i >= num_agvs
        claimed = jnp.where(is_picker, claimed_pick, claimed_agv)
        row = jnp.where(claimed, BIG_NEG, masked[i])
        logp_row = jax.nn.log_softmax(row)
        a = actions[i]
        lp = logp_row[a]
        p = jnp.exp(logp_row)
        ent = -(p * jnp.where(p > 1e-8, logp_row, 0.0)).sum()
        take = active[i] & (a >= rack_start)
        claimed_new = claimed | ((col == a) & take)
        claimed_agv = jnp.where(is_picker, claimed_agv, claimed_new)
        claimed_pick = jnp.where(is_picker, claimed_new, claimed_pick)
        return (claimed_agv, claimed_pick), (lp, ent)

    init = (jnp.zeros(n, jnp.bool_), jnp.zeros(n, jnp.bool_))
    _, (lps, ents) = jax.lax.scan(body, init, order)
    logp = jnp.zeros(A, lps.dtype).at[order].set(lps)
    entropy = jnp.zeros(A, ents.dtype).at[order].set(ents)
    return logp, entropy


def busy_from_feats(agv_feats: jnp.ndarray, picker_feats: jnp.ndarray):
    """(A,) bool: True where the agent already has a target, i.e. the env
    will ignore its macro action (env/step.py Phase 1a). Node features
    encode 'no target' as ty = tx = 0 (see graphs/hetero.py
    masks_from_feats): AGV feats are [carrying, carrying_req, toggling,
    y, x, ty, tx], picker feats [y, x, ty, tx]."""
    at = agv_feats[:, 5:7]
    pt = picker_feats[:, 2:4]
    return jnp.concatenate(
        [
            ~((at[:, 0] == 0) & (at[:, 1] == 0)),
            ~((pt[:, 0] == 0) & (pt[:, 1] == 0)),
        ]
    )
