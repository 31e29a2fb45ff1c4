"""Soft Actor-Critic with twin critics, learnable temperature, and a
state-independent learnable log_std (reference model/agent/sac_agent.py).

Everything — actor forward, masked discrete projection, and the full update —
is a jitted pure function over one ``SACState`` pytree; gradients psum
automatically when the batch is sharded over a device mesh.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..config import NetConfig, SACConfig
from ..envs.action_mask import ActionMaskTable, choose_action as mask_choose
from .schedules import lr_schedule
from .state_norm import NormState, normalize, update as norm_update
from ..models import Critic, MultiObsEmbedding


def _img_encoder_mask(params):
    """Bool pytree: True for leaves under an 'embed_img' module (any depth —
    works for the bare actor tree and the (actor, log_std) tuple alike)."""
    def is_img(path):
        return any(getattr(k, "key", None) == "embed_img" for k in path)

    return jax.tree_util.tree_map_with_path(lambda p, _: is_img(p), params)


@flax.struct.dataclass
class SACState:
    actor: dict
    log_std: jnp.ndarray
    critic1: dict
    critic2: dict
    target1: dict
    target2: dict
    log_alpha: jnp.ndarray
    opt_actor: optax.OptState
    opt_critic1: optax.OptState
    opt_critic2: optax.OptState
    opt_alpha: optax.OptState
    norm: NormState
    steps: jnp.ndarray


class SACAgent:
    def __init__(self, actor_cfg: NetConfig, critic_cfg: NetConfig,
                 cfg: SACConfig, obs_shape: dict,
                 mask_table: Optional[ActionMaskTable] = None):
        self.cfg = cfg
        self.actor_cfg = actor_cfg
        self.critic_cfg = critic_cfg
        self.obs_shape = obs_shape
        self.mask_table = mask_table
        self.actor_net = MultiObsEmbedding(actor_cfg)
        self.critic_net = Critic(critic_cfg)
        sched = partial(lr_schedule, decay=cfg.lr_decay,
                        max_steps=cfg.max_train_steps)
        self.tx_actor = optax.adam(sched(cfg.lr_actor), eps=1e-8)
        self.tx_critic = optax.adam(sched(cfg.lr_critic), eps=1e-8)
        self.tx_alpha = optax.adam(sched(cfg.lr_alpha), eps=1e-8)
        if getattr(cfg, "freeze_img_encoder", False):
            # zero every update under an 'embed_img' module: the grafted
            # pretrained encoder stays fixed (reference network.py:158-162)
            def freeze(tx):
                return optax.chain(tx, optax.masked(
                    optax.set_to_zero(), _img_encoder_mask))

            self.tx_actor = freeze(self.tx_actor)
            self.tx_critic = freeze(self.tx_critic)

    # ----------------------------------------------------------------- init

    def _dummy_obs(self, batch=1):
        return {k: jnp.zeros((batch,) + tuple(s)) for k, s in self.obs_shape.items()}

    def init(self, key) -> SACState:
        k1, k2, k3 = jax.random.split(key, 3)
        obs = self._dummy_obs()
        act = jnp.zeros((1, self.cfg.action_dim))
        actor = self.actor_net.init(k1, obs)
        critic1 = self.critic_net.init(k2, obs, act)
        critic2 = self.critic_net.init(k3, obs, act)
        log_std = jnp.zeros((1, self.cfg.action_dim))  # exp(0)=1 (ref :95-99)
        # explicit dtype: a weak-typed scalar here flips strong after one pass
        # through jit, changing the input aval and forcing a full recompile of
        # every step function it feeds (~100 s each over the remote tunnel)
        log_alpha = jnp.asarray(math.log(self.cfg.initial_temperature), jnp.float32)
        return SACState(
            actor=actor, log_std=log_std,
            critic1=critic1, critic2=critic2,
            target1=jax.tree.map(jnp.copy, critic1),
            target2=jax.tree.map(jnp.copy, critic2),
            log_alpha=log_alpha,
            opt_actor=self.tx_actor.init((actor, log_std)),
            opt_critic1=self.tx_critic.init(critic1),
            opt_critic2=self.tx_critic.init(critic2),
            opt_alpha=self.tx_alpha.init(log_alpha),
            norm=NormState.create(self.obs_shape),
            steps=jnp.zeros((), jnp.int32),
        )

    # ---------------------------------------------------------------- acting

    def _dist(self, st: SACState, obs: dict):
        """Policy mean/std after state-norm (reference _actor_forward :137-152)."""
        obs = normalize(obs, st.norm) if self.cfg.state_norm else obs
        mean = jnp.clip(self.actor_net.apply(st.actor, obs), -1.0, 1.0)
        std = jnp.exp(st.log_std)
        return mean, jnp.broadcast_to(std, mean.shape)

    @staticmethod
    def _log_prob(mean, std, action):
        var = std**2
        return -((action - mean) ** 2) / (2 * var) - jnp.log(std) - 0.5 * math.log(2 * math.pi)

    def get_action(self, st: SACState, obs: dict, key):
        """Unmasked gaussian sample, clipped (reference get_action)."""
        mean, std = self._dist(st, obs)
        action = mean + std * jax.random.normal(key, mean.shape)
        action = jnp.clip(action, -1.0, 1.0)
        return action, jnp.sum(self._log_prob(mean, std, action), -1)

    def choose_action(self, st: SACState, obs: dict, key):
        """Mask-projected discrete choice (reference choose_action :169-175)."""
        assert self.mask_table is not None
        mean, std = self._dist(st, obs)

        def one(m, s, mask, k):
            a, _ = mask_choose(k, m, s, mask, self.mask_table)
            return a

        keys = jax.random.split(key, mean.shape[0])
        action = jax.vmap(one)(mean, std, obs["action_mask"], keys)
        return action, jnp.sum(self._log_prob(mean, std, action), -1)

    def log_prob(self, st: SACState, obs: dict, action):
        mean, std = self._dist(st, obs)
        return jnp.sum(self._log_prob(mean, std, action), -1)

    # ---------------------------------------------------------------- update

    def observe_norm(self, st: SACState, next_obs: dict) -> SACState:
        """Fold fresh next-obs into the Welford stats (reference push_memory
        updates on next_obs only — sac_agent.py:217)."""
        if not self.cfg.state_norm:
            return st
        return st.replace(norm=norm_update(st.norm, next_obs))

    def _sample_with_logp(self, params, log_std, obs, key):
        mean = jnp.clip(self.actor_net.apply(params, obs), -1.0, 1.0)
        std = jnp.broadcast_to(jnp.exp(log_std), mean.shape)
        a = mean + std * jax.random.normal(key, mean.shape)
        a = jnp.clip(a, -1.0, 1.0)
        logp = jnp.sum(self._log_prob(mean, std, a), -1, keepdims=True)
        return a, logp

    @partial(jax.jit, static_argnums=0)
    def update(self, st: SACState, batch: dict, key):
        """One SAC step (reference update :263-337). ``batch``: obs/*, action,
        reward, done, next_obs/* — already state-normalized at insert time."""
        cfg = self.cfg
        obs = {k[4:]: v for k, v in batch.items() if k.startswith("obs/")}
        next_obs = {k[9:]: v for k, v in batch.items() if k.startswith("next_obs/")}
        action = batch["action"]
        reward = batch["reward"][:, None]
        done = batch["done"][:, None].astype(jnp.float32)
        k1, k2 = jax.random.split(key)

        alpha = jnp.exp(st.log_alpha)

        # targets
        next_a, next_logp = self._sample_with_logp(st.actor, st.log_std, next_obs, k1)
        q1t = self.critic_net.apply(st.target1, next_obs, next_a)
        q2t = self.critic_net.apply(st.target2, next_obs, next_a)
        q_target = reward + (1 - done) * cfg.gamma * (
            jnp.minimum(q1t, q2t) - alpha * next_logp
        )
        q_target = jax.lax.stop_gradient(q_target)

        def critic_loss(params):
            q = self.critic_net.apply(params, obs, action)
            return jnp.mean((q - q_target) ** 2)

        l1, g1 = jax.value_and_grad(critic_loss)(st.critic1)
        l2, g2 = jax.value_and_grad(critic_loss)(st.critic2)
        u1, opt_c1 = self.tx_critic.update(g1, st.opt_critic1, st.critic1)
        u2, opt_c2 = self.tx_critic.update(g2, st.opt_critic2, st.critic2)
        critic1 = optax.apply_updates(st.critic1, u1)
        critic2 = optax.apply_updates(st.critic2, u2)

        # actor (critics frozen — gradient flows only through the policy)
        def actor_loss(params_and_logstd):
            p, ls = params_and_logstd
            a, logp = self._sample_with_logp(p, ls, obs, k2)
            q1 = self.critic_net.apply(critic1, obs, a)
            q2 = self.critic_net.apply(critic2, obs, a)
            loss = jnp.mean(alpha * logp - jnp.minimum(q1, q2))
            return loss, logp

        (la, logp), ga = jax.value_and_grad(actor_loss, has_aux=True)((st.actor, st.log_std))
        ua, opt_a = self.tx_actor.update(ga, st.opt_actor, (st.actor, st.log_std))
        actor, log_std = optax.apply_updates((st.actor, st.log_std), ua)

        # temperature
        if cfg.learn_temperature:
            ent_err = jax.lax.stop_gradient(-logp - cfg.target_entropy)

            def alpha_loss(log_alpha):
                return jnp.mean(jnp.exp(log_alpha) * ent_err)

            lal, gal = jax.value_and_grad(alpha_loss)(st.log_alpha)
            ual, opt_al = self.tx_alpha.update(gal, st.opt_alpha, st.log_alpha)
            log_alpha = optax.apply_updates(st.log_alpha, ual)
        else:
            log_alpha, opt_al = st.log_alpha, st.opt_alpha

        # Polyak targets (tau=0.005, reference SACConfig :41)
        tau = cfg.tau
        soft = lambda t, c: jax.tree.map(lambda a, b: a * (1 - tau) + b * tau, t, c)  # noqa: E731

        new_st = st.replace(
            actor=actor, log_std=log_std,
            critic1=critic1, critic2=critic2,
            target1=soft(st.target1, critic1), target2=soft(st.target2, critic2),
            log_alpha=log_alpha,
            opt_actor=opt_a, opt_critic1=opt_c1, opt_critic2=opt_c2, opt_alpha=opt_al,
            steps=st.steps + 1,
        )
        metrics = {"actor_loss": la, "critic_loss": l1 + l2,
                   "alpha": jnp.exp(log_alpha), "entropy": -jnp.mean(logp)}
        return new_st, metrics
