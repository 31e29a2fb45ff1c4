"""BEV autoencoder pretraining (the reference ships a pretrained
``autoencoder.pt`` consumed by load_img_encoder — train_HOPE_sac.py:104,160-162;
its trainer script is not in the snapshot, so this is the reconstruction-loss
equivalent): random scenario BEV renders -> AE reconstruction -> encoder params
saved for grafting into the policy.

Usage: python -m hope_tpu.train.pretrain_autoencoder --steps 2000
       python -m hope_tpu.train.pretrain_autoencoder --smoke
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import optax

from ..config import EnvConfig, ObsConfig, actor_net_config
from ..envs import ParkingEnv
from ..envs.scenario_gen import generate_bank
from ..models.autoencoder import AEConv, ae_loss
from ..utils.checkpoint import save_checkpoint


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--log-dir", type=str, default="log/ae")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args(argv)
    if args.smoke:
        args.steps, args.batch = 3, 8

    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()

    env_cfg = EnvConfig(obs=ObsConfig(use_img=True), max_edges=96, max_obstacles=32)
    env = ParkingEnv(env_cfg)
    net_cfg = actor_net_config(env_cfg.obs)
    model = AEConv(net_cfg)

    key = jax.random.PRNGKey(args.seed)
    key, k1, k2 = jax.random.split(key, 3)
    params = model.init(k1, jnp.zeros((1, 3, env_cfg.obs.img_size, env_cfg.obs.img_size)))
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def render_batch(scenes):
        _, obs = env.batch_reset(scenes)
        return obs["img"]

    @jax.jit
    def train_step(params, opt, imgs):
        loss, g = jax.value_and_grad(ae_loss)(params, model, imgs)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, loss

    os.makedirs(args.log_dir, exist_ok=True)
    t0 = time.time()
    for step in range(args.steps):
        if step % 50 == 0:
            key, kg = jax.random.split(key)
            scenes, _ = generate_bank(kg, level="Normal", n=args.batch)
            imgs = render_batch(scenes)
        params, opt, loss = train_step(params, opt, imgs)
        if step % 100 == 0 or step == args.steps - 1:
            print(json.dumps({"step": step, "loss": float(loss),
                              "elapsed": time.time() - t0}), flush=True)

    save_checkpoint(os.path.join(args.log_dir, "ckpt"), params, args.steps)
    print(json.dumps({"saved": args.log_dir}))


if __name__ == "__main__":
    main()
