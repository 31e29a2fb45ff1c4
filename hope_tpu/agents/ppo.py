"""PPO with clipped surrogate, GAE, and a Polyak critic target
(reference model/agent/ppo_agent.py).

The full-buffer GAE reverse loop (:258-272) becomes a ``lax.scan``; the
10-epoch x 32-minibatch inner loop (:278-341) is a scan over shuffled index
blocks inside one jitted update.  Three policy families (reference
_actor_forward :119-144): gaussian (default), beta, and categorical over the
discrete action set.
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..config import NetConfig, PPOConfig
from ..envs.action_mask import ActionMaskTable
from ..envs.action_mask import choose_action as mask_choose
from ..models import MultiObsEmbedding
from .schedules import lr_schedule
from .state_norm import NormState, normalize, update as norm_update

_BETA_EPS = 1e-5


def _beta_params(raw):
    a, b = jnp.split(raw, 2, axis=-1)
    return jax.nn.softplus(a) + 1.0, jax.nn.softplus(b) + 1.0


def _beta_logpdf(x, a, b):
    from jax.scipy.special import betaln

    x = jnp.clip(x, _BETA_EPS, 1.0 - _BETA_EPS)
    return (a - 1) * jnp.log(x) + (b - 1) * jnp.log1p(-x) - betaln(a, b)


def _beta_entropy(a, b):
    from jax.scipy.special import betaln, digamma

    return (betaln(a, b) - (a - 1) * digamma(a) - (b - 1) * digamma(b)
            + (a + b - 2) * digamma(a + b))


@flax.struct.dataclass
class PPOState:
    actor: dict
    log_std: jnp.ndarray
    critic: dict
    critic_target: dict
    opt_actor: optax.OptState
    opt_critic: optax.OptState
    norm: NormState
    steps: jnp.ndarray


class PPOAgent:
    def __init__(self, actor_cfg: NetConfig, critic_cfg: NetConfig,
                 cfg: PPOConfig, obs_shape: dict,
                 mask_table: ActionMaskTable | None = None):
        assert critic_cfg.action_input_dim == 0, "PPO critic is V(s)"
        assert cfg.dist_type in ("gaussian", "beta", "categorical")
        self.cfg = cfg
        self.obs_shape = obs_shape
        self.mask_table = mask_table
        # actor head width follows the distribution family
        if cfg.dist_type == "beta":
            actor_cfg = dataclasses.replace(actor_cfg,
                                            output_dim=2 * cfg.action_dim,
                                            use_tanh_output=False)
        elif cfg.dist_type == "categorical":
            actor_cfg = dataclasses.replace(actor_cfg,
                                            output_dim=cfg.n_discrete,
                                            use_tanh_output=False)
        self.actor_net = MultiObsEmbedding(actor_cfg)
        self.critic_net = MultiObsEmbedding(critic_cfg)
        sched = partial(lr_schedule, decay=cfg.lr_decay,
                        max_steps=cfg.max_train_steps)
        self.tx_actor = optax.adam(sched(cfg.lr_actor))
        self.tx_critic = optax.adam(sched(cfg.lr_critic), eps=1e-8)

    def _dummy_obs(self, batch=1):
        return {k: jnp.zeros((batch,) + tuple(s)) for k, s in self.obs_shape.items()}

    def init(self, key) -> PPOState:
        k1, k2 = jax.random.split(key)
        obs = self._dummy_obs()
        actor = self.actor_net.init(k1, obs)
        critic = self.critic_net.init(k2, obs)
        return PPOState(
            actor=actor,
            log_std=jnp.zeros((1, self.cfg.action_dim)),
            critic=critic,
            critic_target=jax.tree.map(jnp.copy, critic),
            opt_actor=self.tx_actor.init((actor, jnp.zeros((1, self.cfg.action_dim)))),
            opt_critic=self.tx_critic.init(critic),
            norm=NormState.create(self.obs_shape),
            steps=jnp.zeros((), jnp.int32),
        )

    # ---------------------------------------------------------------- acting

    def _raw(self, params, st_or_norm, obs: dict):
        norm = st_or_norm.norm if hasattr(st_or_norm, "norm") else st_or_norm
        obs = normalize(obs, norm) if self.cfg.state_norm else obs
        return self.actor_net.apply(params, obs)

    @staticmethod
    def _log_prob(mean, std, a):
        return -((a - mean) ** 2) / (2 * std**2) - jnp.log(std) - 0.5 * math.log(2 * math.pi)

    def _moments(self, raw, log_std):
        """Mean/std of the policy in normalized [-1, 1] action units — used by
        the masked discrete projection (reference _post_process_action)."""
        if self.cfg.dist_type == "gaussian":
            mean = jnp.clip(raw, -1.0, 1.0)
            return mean, jnp.broadcast_to(jnp.exp(log_std), mean.shape)
        if self.cfg.dist_type == "beta":
            a, b = _beta_params(raw)
            mu = a / (a + b)
            var = a * b / ((a + b) ** 2 * (a + b + 1))
            return 2 * mu - 1, 2 * jnp.sqrt(var)
        raise ValueError("categorical has no gaussian moments")

    def _logp_of(self, raw, log_std, action):
        """Log-prob of a normalized [-1, 1] action under the policy."""
        if self.cfg.dist_type == "gaussian":
            mean = jnp.clip(raw, -1.0, 1.0)
            std = jnp.broadcast_to(jnp.exp(log_std), mean.shape)
            return jnp.sum(self._log_prob(mean, std, action), -1)
        if self.cfg.dist_type == "beta":
            a, b = _beta_params(raw)
            x = (action + 1.0) / 2.0
            # d(action)/dx = 2 -> subtract log 2 per dim
            return jnp.sum(_beta_logpdf(x, a, b) - math.log(2.0), -1)
        # categorical: snap to the nearest discrete action's index (hybrid RS
        # queue actions are continuous; the reference's categorical path has
        # the same impedance and this is the faithful closure of it)
        table = self.mask_table.actions_norm                 # (A, 2)
        idx = jnp.argmin(
            jnp.sum((action[..., None, :] - table) ** 2, -1), -1)
        logp = jax.nn.log_softmax(raw, axis=-1)
        return jnp.take_along_axis(logp, idx[..., None], -1)[..., 0]

    def _entropy(self, raw, log_std):
        if self.cfg.dist_type == "gaussian":
            std = jnp.broadcast_to(jnp.exp(log_std), raw.shape)
            return jnp.sum(0.5 * jnp.log(2 * math.pi * math.e * std**2), -1)
        if self.cfg.dist_type == "beta":
            a, b = _beta_params(raw)
            return jnp.sum(_beta_entropy(a, b), -1)
        p = jax.nn.softmax(raw, axis=-1)
        return -jnp.sum(p * jnp.log(jnp.maximum(p, 1e-30)), -1)

    def choose_action(self, st: PPOState, obs: dict, key):
        """Masked discrete projection (reference choose_action :146-168)."""
        assert self.mask_table is not None
        raw = self._raw(st.actor, st, obs)
        if self.cfg.dist_type == "categorical":
            logp_all = jax.nn.log_softmax(raw, axis=-1)
            w = jnp.exp(logp_all) * obs["action_mask"]
            p = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-30)
            idx = jax.random.categorical(key, jnp.log(jnp.maximum(p, 1e-30)))
            action = self.mask_table.actions_norm[idx]
            return action, jnp.take_along_axis(logp_all, idx[:, None], -1)[:, 0]
        mean, std = self._moments(raw, st.log_std)
        keys = jax.random.split(key, mean.shape[0])
        action = jax.vmap(
            lambda m, s, mk, k: mask_choose(k, m, s, mk, self.mask_table)[0]
        )(mean, std, obs["action_mask"], keys)
        return action, self._logp_of(raw, st.log_std, action)

    def get_action(self, st: PPOState, obs: dict, key):
        """Unmasked sample from the policy distribution."""
        raw = self._raw(st.actor, st, obs)
        if self.cfg.dist_type == "gaussian":
            mean, std = self._moments(raw, st.log_std)
            a = jnp.clip(mean + std * jax.random.normal(key, mean.shape), -1.0, 1.0)
        elif self.cfg.dist_type == "beta":
            alpha, beta = _beta_params(raw)
            x = jax.random.beta(key, alpha, beta)
            a = 2.0 * x - 1.0
        else:
            idx = jax.random.categorical(key, raw)
            a = self.mask_table.actions_norm[idx]
        return a, self._logp_of(raw, st.log_std, a)

    def log_prob(self, st: PPOState, obs: dict, action):
        raw = self._raw(st.actor, st, obs)
        return self._logp_of(raw, st.log_std, action)

    def observe_norm(self, st: PPOState, next_obs: dict) -> PPOState:
        if not self.cfg.state_norm:
            return st
        return st.replace(norm=norm_update(st.norm, next_obs))

    # ---------------------------------------------------------------- update

    @partial(jax.jit, static_argnums=0)
    def update(self, st: PPOState, batch: dict, key):
        """Full-buffer PPO update.

        ``batch`` fields (already normalized at insert): obs/*, next_obs/*,
        action, reward, done, log_prob.  Leading dims are either (T,) for a
        single time-ordered stream (reference semantics) or (T, B) for B
        lockstep env streams — GAE scans over T per stream, then everything is
        flattened for the minibatch epochs.
        """
        cfg = self.cfg
        obs = {k[4:]: v for k, v in batch.items() if k.startswith("obs/")}
        next_obs = {k[9:]: v for k, v in batch.items() if k.startswith("next_obs/")}
        action = batch["action"]
        reward = batch["reward"]
        done = batch["done"].astype(jnp.float32)
        old_logp = batch["log_prob"]

        time_major = reward.ndim == 2
        if not time_major:
            reward = reward[:, None]
            done = done[:, None]
            old_logp_tb = old_logp[:, None]
        else:
            old_logp_tb = old_logp
        T, B = reward.shape

        def flat(x):
            return x.reshape((T * B,) + x.shape[2:]) if time_major else x

        obs_f = {k: flat(v) for k, v in obs.items()}
        next_obs_f = {k: flat(v) for k, v in next_obs.items()}
        value = self.critic_net.apply(st.critic, obs_f).reshape(T, B)
        next_value = self.critic_net.apply(st.critic, next_obs_f).reshape(T, B)
        deltas = reward + cfg.gamma * (1 - done) * next_value - value

        if cfg.use_gae:
            def gae_step(carry, x):
                d, dn = x
                g = d + cfg.gamma * cfg.gae_lambda * carry * (1.0 - dn)
                return g, g

            _, adv_rev = jax.lax.scan(
                gae_step, jnp.zeros(B), (deltas[::-1], done[::-1])
            )
            adv = adv_rev[::-1]
        else:
            adv = deltas
        v_target = adv + self.critic_net.apply(st.critic_target, obs_f).reshape(T, B)
        v_target = jax.lax.stop_gradient(v_target)
        if cfg.adv_norm:
            adv = (adv - adv.mean()) / (adv.std() + 1e-5)
        adv = jax.lax.stop_gradient(adv)

        # flatten time x stream for the shuffled minibatch epochs
        N = T * B
        adv = adv.reshape(N, 1)
        v_target = v_target.reshape(N, 1)
        obs = obs_f
        action = flat(action)
        old_logp = old_logp_tb.reshape(N, 1)

        mb = cfg.mini_batch
        n_mb = N // mb

        def clip_gn(g, max_norm=0.5):
            # global-norm clip at 0.5, the reference's gradient_clip semantics
            # (ppo_agent.py:334-336, nn.utils.clip_grad_norm_(..., 0.5))
            gn = optax.global_norm(g)
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(gn, 1e-9))
            return jax.tree.map(lambda x: x * scale, g)

        def minibatch_step(carry, idx):
            actor, log_std, critic, opt_a, opt_c, stop = carry
            o = {k: v[idx] for k, v in obs.items()}

            def a_loss(p):
                params, ls = p
                raw = self.actor_net.apply(params, o)
                logp = self._logp_of(raw, ls, action[idx])[:, None]
                ratio = jnp.exp(logp - old_logp[idx])
                s1 = ratio * adv[idx]
                s2 = jnp.clip(ratio, 1 - cfg.clip_epsilon, 1 + cfg.clip_epsilon) * adv[idx]
                loss = -jnp.minimum(s1, s2)
                if cfg.policy_entropy:
                    loss = loss - cfg.entropy_coef * self._entropy(raw, ls)[:, None]
                kl = jnp.mean(old_logp[idx] - logp)
                return jnp.mean(loss), kl

            def c_loss(params):
                v = self.critic_net.apply(params, o)
                return jnp.mean((v_target[idx] - v) ** 2)

            (la, kl), ga = jax.value_and_grad(a_loss, has_aux=True)((actor, log_std))
            lc, gc = jax.value_and_grad(c_loss)(critic)
            if cfg.gradient_clip:
                ga = clip_gn(ga)
                gc = clip_gn(gc)
            if cfg.target_kl is not None:
                # KL early stop: once a minibatch's approx KL overshoots, this
                # and every later minibatch of the pass leaves params AND
                # optimizer state untouched (zeroing grads alone would still
                # move params through Adam's momentum)
                stop = stop | (kl > cfg.target_kl)
            ua, opt_a_n = self.tx_actor.update(ga, opt_a, (actor, log_std))
            actor_n, log_std_n = optax.apply_updates((actor, log_std), ua)
            uc, opt_c_n = self.tx_critic.update(gc, opt_c, critic)
            critic_n = optax.apply_updates(critic, uc)
            if cfg.target_kl is not None:
                keep = lambda old, new: jax.tree.map(  # noqa: E731
                    lambda a, b: jnp.where(stop, a, b), old, new)
                actor_n = keep(actor, actor_n)
                log_std_n = keep(log_std, log_std_n)
                critic_n = keep(critic, critic_n)
                opt_a_n = keep(opt_a, opt_a_n)
                opt_c_n = keep(opt_c, opt_c_n)
            return (actor_n, log_std_n, critic_n, opt_a_n, opt_c_n, stop), (la, lc, kl)

        carry = (st.actor, st.log_std, st.critic, st.opt_actor, st.opt_critic,
                 jnp.asarray(False))
        target = st.critic_target
        losses = []
        for e in range(cfg.mini_epoch):
            perm = jax.random.permutation(jax.random.fold_in(key, e), N)
            idxs = perm[: n_mb * mb].reshape(n_mb, mb)
            carry, (la, lc, kl) = jax.lax.scan(minibatch_step, carry, idxs)
            # per-epoch Polyak target update (reference :340, tau from ConfigBase=0.1)
            target = jax.tree.map(
                lambda t, c: t * (1 - cfg.tau) + c * cfg.tau, target, carry[2]
            )
            losses.append((la[-1], lc[-1], kl[-1]))

        actor, log_std, critic, opt_a, opt_c, stopped = carry
        new_st = st.replace(actor=actor, log_std=log_std, critic=critic,
                            critic_target=target, opt_actor=opt_a,
                            opt_critic=opt_c, steps=st.steps + 1)
        metrics = {"actor_loss": losses[-1][0], "critic_loss": losses[-1][1],
                   "approx_kl": losses[-1][2],
                   "kl_stopped": stopped.astype(jnp.float32)}
        return new_st, metrics
