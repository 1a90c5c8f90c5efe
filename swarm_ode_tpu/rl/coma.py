"""COMA agent: counterfactual multi-agent policy gradient.

Parity: COMAAgent (reference gru.py:407-511) — critic trained on mean-Q TD
targets, per-agent policy gradient with advantage A_i = Q_i - mean(Q)
(the reference's simplified advantage, gru.py:481-497); the full
counterfactual baseline from models/coma.py is also wired in as an option
(reference gru.py:360-404). The reference leaves the graph encoder outside
both optimizers (gru.py:416-418) — a quirk; here the encoder trains with
the actors (working equivalent, noted for parity audits).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from swarm_ode_tpu.env.state import EnvParams
from swarm_ode_tpu.graphs.hetero import build_hetero_graph, masks_from_feats
from swarm_ode_tpu.models.coma import COMAActor, COMACritic
from swarm_ode_tpu.rl import coordination


@dataclasses.dataclass
class COMAConfig:
    lr_actor: float = 1e-3
    lr_critic: float = 1e-3
    gamma: float = 0.99
    # Full counterfactual baseline by default — the whole point of COMA
    # (reference gru.py:360-404 computes it but its loop never ran); the
    # reference's simplified A_i = Q_i - mean(Q) stays as an ablation.
    use_counterfactual: bool = True
    actor_hidden: int = 64
    critic_hidden: int = 128
    # Entropy bonus on the masked policy. Without it the on-policy
    # actor update collapses entropy within ~1k episodes on medium
    # (observed: all-agents-pile-up, 0 deliveries, 2000+ clashes).
    entropy_coef: float = 0.01
    # Multiplicative per-update anneal of the entropy bonus
    # (coef_t = entropy_coef * entropy_decay**update_step). 1.0 = constant.
    # Annealing lets the policy sharpen late in training once the
    # exploration pressure has done its job.
    entropy_decay: float = 1.0
    # Claim-masked sequential sampling (rl/coordination.py). Unlike the
    # value-based agents, on-policy COMA needs the behavior density, and
    # the auction's deterministic claim order makes it tractable:
    # sampling uses coordinated_sample and the actor update scores the
    # taken actions under sequential_log_prob — the EXACT distribution
    # they were drawn from, so the policy gradient stays unbiased.
    coordinated: bool = False


@struct.dataclass
class COMAState:
    actor_params: Any  # {'encoder': ..., 'agv': ..., 'picker': ...}
    critic_params: Any
    actor_opt: Any
    critic_opt: Any
    step: jnp.ndarray


class COMAAgent:
    def __init__(self, encoder, env_params: EnvParams, action_size: int,
                 global_state_dim: int, hidden_dim: int = 64,
                 config: COMAConfig = COMAConfig()):
        """encoder: flax module graph -> (agv_h, picker_h, loc_h)."""
        self.encoder = encoder
        self.env_params = env_params
        self.action_size = action_size
        self.cfg = config
        self.agv_actor = COMAActor(action_size, config.actor_hidden)
        self.picker_actor = COMAActor(action_size, config.actor_hidden)
        self.critic = COMACritic(
            env_params.num_agents, action_size, config.critic_hidden
        )
        self.global_state_dim = global_state_dim
        self.actor_tx = optax.adam(config.lr_actor)
        self.critic_tx = optax.adam(config.lr_critic)

    def init(self, key, example_graph) -> COMAState:
        ks = jax.random.split(key, 4)
        enc_p = self.encoder.init(ks[0], example_graph)
        h_agv, h_pick, _ = self.encoder.apply(enc_p, example_graph)
        actor_params = {
            "encoder": enc_p,
            "agv": self.agv_actor.init(ks[1], h_agv),
            "picker": self.picker_actor.init(ks[2], h_pick),
        }
        critic_params = self.critic.init(
            ks[3],
            jnp.zeros((1, self.global_state_dim)),
            jnp.zeros((1, self.env_params.num_agents), jnp.int32),
        )
        return COMAState(
            actor_params=actor_params,
            critic_params=critic_params,
            actor_opt=self.actor_tx.init(actor_params),
            critic_opt=self.critic_tx.init(critic_params),
            step=jnp.int32(0),
        )

    # ------------------------------------------------------------------
    def _logits(self, actor_params, graph):
        h_agv, h_pick, _ = self.encoder.apply(actor_params["encoder"], graph)
        la = self.agv_actor.apply(actor_params["agv"], h_agv)
        lp = self.picker_actor.apply(actor_params["picker"], h_pick)
        return jnp.concatenate([la, lp], axis=0)  # (A_total, act)

    def act(self, state: COMAState, graph, masks, key, training=True,
            active=None):
        """Sample (training) or argmax (eval) from the masked policy
        (reference gru.py:420-430). With cfg.coordinated, both paths run
        through the claim auction; the actor update then scores actions
        under sequential_log_prob — the exact sampling density — so the
        on-policy gradient stays unbiased."""
        logits = self._logits(state.actor_params, graph)
        if self.cfg.coordinated:
            rack_start = 1 + self.env_params.num_goals
            sampled = coordination.coordinated_sample(
                logits, masks, self.env_params.num_agvs, rack_start, key,
                active=active,
            )
            greedy = coordination.coordinated_argmax(
                logits, masks, self.env_params.num_agvs, rack_start,
                active=active,
            )
            return jnp.where(training, sampled, greedy).astype(jnp.int32)
        logits = jnp.where(masks > 0, logits, -1e9)
        sampled = jax.random.categorical(key, logits, axis=-1)
        greedy = jnp.argmax(logits, axis=-1)
        return jnp.where(training, sampled, greedy).astype(jnp.int32)

    def _graph(self, feats):
        return build_hetero_graph(
            self.env_params, feats["agv"], feats["picker"], feats["loc"]
        )

    def _masked_logits(self, actor_params, feats):
        """Logits with invalid actions at -1e9, masks rebuilt from the
        stored node features (same contract as rl/qmix.py learn)."""
        logits = self._logits(actor_params, self._graph(feats))
        masks = masks_from_feats(
            self.env_params, feats["agv"], feats["picker"], feats["loc"]
        )
        return jnp.where(masks > 0, logits, -1e9)

    def update(self, state: COMAState, batch: Dict):
        """batch: obs_feats, global_state (B,S), actions (B,A), rewards (B,),
        next_global_state (B,S), dones (B,). (reference gru.py:432-511)."""
        cfg = self.cfg

        # ---- critic (gru.py:447-458) ----
        def critic_loss_fn(cp):
            next_q = self.critic.apply(
                state.critic_params, batch["next_global_state"], batch["actions"]
            )
            td = batch["rewards"] + cfg.gamma * next_q.mean(1) * (
                1.0 - batch["dones"].astype(jnp.float32)
            )
            td = jax.lax.stop_gradient(td)
            cur = self.critic.apply(cp, batch["global_state"], batch["actions"])
            return jnp.mean((cur.mean(1) - td) ** 2), cur

        (closs, cur_q), cgrads = jax.value_and_grad(
            critic_loss_fn, has_aux=True
        )(state.critic_params)
        cupd, critic_opt = self.critic_tx.update(cgrads, state.critic_opt)
        critic_params = optax.apply_updates(state.critic_params, cupd)

        # ---- actors (gru.py:460-506) ----
        cur_q = jax.lax.stop_gradient(cur_q)  # (B, A)
        if cfg.use_counterfactual:
            # Full COMA counterfactual baseline (reference gru.py:360-404):
            # A_i = Q(s, u) - sum_a pi_i(a) Q(s, (u_{-i}, a)). Costs
            # A x action_size critic evaluations per sample; the reference
            # loops this in Python (and never wired it in); here it is a
            # vmapped sweep, practical for small action spaces.
            n_agents = self.env_params.num_agents

            def probs_for(feats):
                # Under cfg.coordinated these independent-softmax probs
                # only approximate the sequential policy's marginals, but
                # the sum stays a valid baseline: it depends on the state
                # and u_{-i}, never on agent i's taken action, so the
                # gradient is unbiased for ANY prob vector here.
                logits = self._masked_logits(state.actor_params, feats)
                return jax.nn.softmax(logits, axis=-1)  # (A, act)

            probs = jax.lax.stop_gradient(
                jax.vmap(probs_for)(batch["obs_feats"])
            )  # (B, A, act)

            def cf_baseline(i):
                def q_for(a):
                    cf = batch["actions"].at[:, i].set(a)
                    return self.critic.apply(
                        state.critic_params, batch["global_state"], cf
                    )[:, i]  # (B,)

                cf_q = jax.vmap(q_for)(
                    jnp.arange(self.action_size)
                )  # (act, B)
                return jnp.sum(probs[:, i, :].T * cf_q, axis=0)  # (B,)

            baseline = jax.vmap(cf_baseline)(jnp.arange(n_agents)).T  # (B, A)
            adv = cur_q - jax.lax.stop_gradient(baseline)
        else:
            # Simplified advantage actually used by the reference's update
            # (gru.py:481-497): Q_i minus the per-sample mean.
            adv = cur_q - cur_q.mean(axis=1, keepdims=True)

        ent_coef = cfg.entropy_coef * jnp.power(
            jnp.float32(cfg.entropy_decay), state.step.astype(jnp.float32)
        )

        def actor_loss_fn(ap):
            def one(feats, actions, adv_row):
                # Masked policy: the behavior policy samples from the
                # valid-action distribution (act()), so the update must
                # normalize over the same support — and the entropy bonus
                # keeps that distribution from collapsing.
                if cfg.coordinated:
                    # Score under the EXACT sequential sampling density:
                    # menus reconstructed from the actually-taken earlier
                    # actions, busy flags from the stored features.
                    logits = self._logits(ap, self._graph(feats))
                    masks = masks_from_feats(
                        self.env_params, feats["agv"], feats["picker"],
                        feats["loc"],
                    )
                    taken, entropy = coordination.sequential_log_prob(
                        logits, masks, actions,
                        self.env_params.num_agvs,
                        1 + self.env_params.num_goals,
                        active=~coordination.busy_from_feats(
                            feats["agv"], feats["picker"]
                        ),
                    )
                else:
                    logits = self._masked_logits(ap, feats)
                    logp = jax.nn.log_softmax(logits, axis=-1)
                    taken = jnp.take_along_axis(
                        logp, actions[:, None], -1
                    ).squeeze(-1)
                    probs = jnp.exp(logp)
                    entropy = -(
                        probs * jnp.where(probs > 1e-8, logp, 0.0)
                    ).sum(-1)
                return (
                    -(taken * adv_row).sum()
                    - ent_coef * entropy.sum()
                )

            return jax.vmap(one)(
                batch["obs_feats"], batch["actions"], adv
            ).mean()

        aloss, agrads = jax.value_and_grad(actor_loss_fn)(state.actor_params)
        aupd, actor_opt = self.actor_tx.update(agrads, state.actor_opt)
        actor_params = optax.apply_updates(state.actor_params, aupd)

        new_state = COMAState(
            actor_params=actor_params,
            critic_params=critic_params,
            actor_opt=actor_opt,
            critic_opt=critic_opt,
            step=state.step + 1,
        )
        return new_state, {"critic_loss": closs, "actor_loss": aloss}
