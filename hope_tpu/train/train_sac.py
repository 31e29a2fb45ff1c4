"""SAC training driver: lockstep batched rollouts + hybrid RS takeover +
curriculum (TPU-native redesign of reference train/train_HOPE_sac.py).

The reference steps ONE env and updates every 10 env steps; here B envs step in
lockstep per device call, so the data:update ratio is kept comparable via
``updates_per_step`` (B transitions/step at batch_size ~ B/10 x 32 equivalent).

Usage: python -m hope_tpu.train.train_sac --episodes 2000 --batch-envs 256
       python -m hope_tpu.train.train_sac --smoke     (tiny smoke run)
"""
from __future__ import annotations

import argparse
import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    EnvConfig,
    SACConfig,
    actor_net_config,
    critic_net_config,
)
from ..agents import (
    HybridState,
    SACAgent,
    hybrid_act,
    hybrid_reset_done,
    latch,
    normalize,
    norm_update,
    push_batch,
    replay_create,
    replay_sample,
)
from ..envs import ARRIVED, ParkingEnv
from ..utils.checkpoint import save_checkpoint
from .curriculum import LEVELS, DlpCaseChoose, SceneChoose
from .scene_pool import ScenePool


def build_trainer(env: ParkingEnv, agent: SACAgent, step_ratio: float,
                  updates_per_step: int, sgd_batch: int):
    """Returns one jitted collect(+update) step over the whole env batch."""

    @partial(jax.jit, static_argnames=("warmup", "do_update"))
    def train_step(sac_state, env_state, hybrid, obs, replay, key,
                   warmup: bool, do_update: bool):
        k_act, k_rand, k_upd = jax.random.split(key, 3)
        B = obs["target"].shape[0]

        if warmup:
            policy_action = jax.random.uniform(k_rand, (B, 2), minval=-1.0, maxval=1.0)
            policy_logp = agent.log_prob(sac_state, obs, policy_action)
        else:
            policy_action, policy_logp = agent.get_action(sac_state, obs, k_act)

        queued = hybrid.queue[jnp.arange(B), jnp.clip(hybrid.cursor, 0, hybrid.queue.shape[1] - 1)]
        queued_logp = agent.log_prob(sac_state, obs, queued)
        action, logp, hybrid = hybrid_act(hybrid, policy_action, policy_logp, queued_logp)

        phys = env.rescale_action(action)
        env_state, next_obs, reward, done, info = env.batch_step(env_state, phys)

        # normalized push (reference push_memory: obs with current stats,
        # stats updated on next_obs — sac_agent.py:209-219)
        obs_n = normalize(obs, sac_state.norm)
        new_norm = norm_update(sac_state.norm, next_obs)
        sac_state = sac_state.replace(norm=new_norm)
        next_obs_n = normalize(next_obs, new_norm)
        batch = {}
        for k, v in obs_n.items():
            batch[f"obs/{k}"] = v
        for k, v in next_obs_n.items():
            batch[f"next_obs/{k}"] = v
        batch["action"] = action
        batch["reward"] = reward
        batch["done"] = done
        batch["log_prob"] = logp
        replay = push_batch(replay, batch)

        hybrid = latch(hybrid, info["rs"], step_ratio)
        hybrid = hybrid_reset_done(hybrid, done)

        metrics = {}
        if do_update:
            def upd(carry, k):
                st = carry
                mb = replay_sample(replay, k, sgd_batch)
                st, m = agent.update(st, mb, jax.random.fold_in(k, 1))
                return st, m

            sac_state, ms = jax.lax.scan(
                upd, sac_state, jax.random.split(k_upd, updates_per_step)
            )
            metrics = jax.tree.map(lambda x: x[-1], ms)

        return sac_state, env_state, hybrid, next_obs, replay, done, reward, info, metrics

    return train_step


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=100000)
    ap.add_argument("--batch-envs", type=int, default=256)
    ap.add_argument("--warmup-steps", type=int, default=40)
    ap.add_argument("--updates-per-step", type=int, default=4)
    ap.add_argument("--sgd-batch", type=int, default=256)
    ap.add_argument("--memory", type=int, default=100_000)
    ap.add_argument("--pool-per-level", type=int, default=256)
    ap.add_argument("--pool-refresh", type=int, default=200, help="refresh pool every N waves")
    ap.add_argument("--no-img", action="store_true")
    ap.add_argument("--no-dlp", action="store_true")
    ap.add_argument("--save-every", type=int, default=2000)
    ap.add_argument("--log-dir", type=str, default="log/sac")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--profile-waves", type=int, default=0,
                    help="capture a jax.profiler trace of waves 5..5+N")
    ap.add_argument("--no-tensorboard", action="store_true")
    args = ap.parse_args(argv)

    if args.smoke:
        args.episodes = 8
        args.batch_envs = 4
        args.warmup_steps = 2
        args.updates_per_step = 1
        args.sgd_batch = 8
        args.memory = 512
        args.pool_per_level = 4
        args.no_img = True
        args.no_dlp = True

    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from ..config import ObsConfig

    obs_cfg = ObsConfig(use_img=not args.no_img)
    env_cfg = EnvConfig(obs=obs_cfg, max_edges=96 if args.no_dlp else 512,
                        max_obstacles=32 if args.no_dlp else 128)
    env = ParkingEnv(env_cfg)
    sac_cfg = SACConfig(memory_size=args.memory, batch_size=args.sgd_batch)
    agent = SACAgent(actor_net_config(obs_cfg), critic_net_config(obs_cfg, action_input=True),
                     sac_cfg, env.observation_shape, env.mask_table)

    key = jax.random.PRNGKey(args.seed)
    key, k_init = jax.random.split(key)
    sac_state = agent.init(k_init)

    pool = ScenePool(env_cfg, per_level=args.pool_per_level, include_dlp=not args.no_dlp)
    scene_chooser = SceneChoose(rng=np.random.default_rng(args.seed))
    dlp_chooser = DlpCaseChoose(rng=np.random.default_rng(args.seed + 1))

    B = args.batch_envs
    n_levels = pool.n_levels
    rng = np.random.default_rng(args.seed + 2)
    level_ids = scene_chooser.choose_batch(B) % n_levels
    env_levels = level_ids.copy()
    slots = rng.integers(0, args.pool_per_level, B)
    scenes = pool.gather(pool.flat_index(level_ids, slots))
    env_state, obs = env.batch_reset(scenes)
    hybrid = HybridState.create(B, env_cfg.rs_queue_len)

    example = {k: v[0] for k, v in obs.items()}
    transition = {}
    for k, v in example.items():
        transition[f"obs/{k}"] = v
        transition[f"next_obs/{k}"] = v
    transition["action"] = jnp.zeros(2)
    transition["reward"] = jnp.zeros(())
    transition["done"] = jnp.zeros((), bool)
    transition["log_prob"] = jnp.zeros(())
    replay = replay_create(args.memory, transition)

    train_step = build_trainer(env, agent, env_cfg.step_ratio,
                               args.updates_per_step, args.sgd_batch)

    from ..utils.profiling import MetricsWriter, StepTimer

    os.makedirs(args.log_dir, exist_ok=True)
    writer = MetricsWriter(args.log_dir, tensorboard=not args.no_tensorboard)
    timer = StepTimer(unit="env-steps")

    episodes_done = 0
    total_steps = 0
    wave = 0
    reward_hist: list[float] = []
    t_start = time.time()

    while episodes_done < args.episodes:
        wave += 1
        if args.profile_waves and wave == 5:
            jax.profiler.start_trace(os.path.join(args.log_dir, "trace"))
        if args.profile_waves and wave == 5 + args.profile_waves:
            jax.profiler.stop_trace()
        warmup = total_steps < args.warmup_steps * B
        do_update = not warmup
        key, k = jax.random.split(key)
        (sac_state, env_state, hybrid, obs, replay, done, reward, info,
         metrics) = train_step(sac_state, env_state, hybrid, obs, replay, k,
                               warmup=warmup, do_update=do_update)
        total_steps += B
        timer.tick(B)

        done_np = np.asarray(done)
        if done_np.any():
            statuses = np.asarray(info["status"])
            idx = np.nonzero(done_np)[0]
            for i in idx:
                success = int(statuses[i] == ARRIVED)
                scene_chooser.update_success_record(success, int(env_levels[i]))
                if LEVELS[env_levels[i]] == "dlp" and pool.dlp_case_ids is not None:
                    dlp_chooser.update_success_record(success, int(pool.dlp_case_ids[slots[i]]))
            episodes_done += len(idx)

            # curriculum refill
            new_levels = np.array([scene_chooser.choose_case() % n_levels for _ in idx])
            new_slots = rng.integers(0, args.pool_per_level, len(idx))
            env_levels[idx] = new_levels
            slots[idx] = new_slots
            fresh = pool.gather(pool.flat_index(new_levels, new_slots))
            fresh_state, fresh_obs = env.batch_reset(fresh)
            done_dev = jnp.asarray(done_np)
            full_levels = jnp.asarray(env_levels)
            # merge fresh into running state (only where done)
            idx_map = np.zeros(B, np.int32)
            idx_map[idx] = np.arange(len(idx))
            expand = lambda t: jax.tree.map(lambda x: x[jnp.asarray(idx_map)], t)  # noqa: E731
            env_state = ParkingEnv.reset_where(env_state, expand(fresh_state), done_dev)
            obs = jax.tree.map(
                lambda a, b: jnp.where(
                    done_dev.reshape((B,) + (1,) * (a.ndim - 1)), a, b),
                expand(fresh_obs), obs)

        reward_hist.append(float(jnp.mean(reward)))

        if wave % args.pool_refresh == 0:
            dlp_ids = np.array([dlp_chooser.choose_case() for _ in range(args.pool_per_level)])
            pool.refresh(dlp_case_ids=None if args.no_dlp else dlp_ids)

        if wave % 10 == 0:
            sr = scene_chooser.recent_success()
            line = {
                "wave": wave, "episodes": episodes_done, "steps": total_steps,
                "reward": float(np.mean(reward_hist[-50:])),
                "success": {LEVELS[i]: float(sr[i]) for i in range(4)},
                "alpha": float(jnp.exp(sac_state.log_alpha)),
                "elapsed": time.time() - t_start,
            }
            if metrics:
                line["actor_loss"] = float(metrics["actor_loss"])
                line["critic_loss"] = float(metrics["critic_loss"])
            rate = timer.report()
            if rate and rate["unit_per_sec"]:
                line["env_steps_per_sec"] = round(rate["unit_per_sec"], 1)
            print(json.dumps(line), flush=True)
            flat = {k: v for k, v in line.items() if isinstance(v, (int, float))}
            flat.update({f"success/{k}": v for k, v in line["success"].items()})
            writer.write(wave, flat)

        if args.save_every and wave % args.save_every == 0:
            save_checkpoint(os.path.join(args.log_dir, "ckpt"), sac_state, wave)

    save_checkpoint(os.path.join(args.log_dir, "ckpt"), sac_state, wave)
    print(json.dumps({"final_episodes": episodes_done,
                      "steps_per_sec": total_steps / (time.time() - t_start)}))


if __name__ == "__main__":
    main()
