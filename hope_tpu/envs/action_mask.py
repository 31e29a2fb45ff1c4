"""Collision-horizon action mask over the 42-action discrete set.

TPU-native port of reference ``model/action_mask.py``: the precomputed
``dist_star`` table (lidar ray x action x future-substep clearance thresholds)
is built once with the batched segment kernel; the runtime ``get_steps`` is pure
elementwise/reduction work that fuses into the observation pipeline, and
``choose_action`` is a masked categorical over discrete actions.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ActionMaskConfig, LidarConfig, VehicleConfig
from ..geometry import segment_intersection_points
from .lidar import beam_angles, vehicle_boundary


def discrete_actions(cfg: ActionMaskConfig, vcfg: VehicleConfig) -> np.ndarray:
    """The 42-entry [steer, speed] set (reference configs.py:108-115): steer
    sweeps +max..-max in 2*precision+1 bins, first with speed +1 then -1."""
    p = cfg.precision
    steers = vcfg.max_steer - np.arange(2 * p + 1) * (vcfg.max_steer / p)
    fwd = np.stack([steers, np.full_like(steers, cfg.step_speed)], axis=1)
    bwd = np.stack([steers, np.full_like(steers, -cfg.step_speed)], axis=1)
    return np.concatenate([fwd, bwd]).astype(np.float32)  # (42, 2)


def future_boxes(cfg: ActionMaskConfig, vcfg: VehicleConfig) -> np.ndarray:
    """Swept footprints per action: (n_action, n_iter, 4, 2) corner coords of
    the vehicle after k+1 arc sub-steps of each action from the ego origin
    (reference init_vehicle_box :84-112, which uses the exact arc about the
    turn centre — equivalent closed form here, stable at steer ~ 0)."""
    acts = discrete_actions(cfg, vcfg)
    steer, speed = acts[:, 0], acts[:, 1]
    ds = 0.5 * speed / cfg.n_iter                      # metres per sub-step
    curv = np.tan(steer) / vcfg.wheel_base
    k = np.arange(1, cfg.n_iter + 1)
    phi = np.outer(curv * ds, k)                       # (A, n_iter) headings
    small = np.abs(curv) < 1e-9
    curv_safe = np.where(small, 1.0, curv)
    # chord from origin after k sub-steps along a constant-curvature arc
    px = np.where(small[:, None], np.outer(ds, k),
                  np.sin(phi) / curv_safe[:, None])
    py = np.where(small[:, None], 0.0,
                  (1.0 - np.cos(phi)) / curv_safe[:, None])

    corners = vcfg.box_corners()                       # (4, 2)
    c, s = np.cos(phi), np.sin(phi)
    wx = c[..., None] * corners[:, 0] - s[..., None] * corners[:, 1] + px[..., None]
    wy = s[..., None] * corners[:, 0] + c[..., None] * corners[:, 1] + py[..., None]
    return np.stack([wx, wy], axis=-1).astype(np.float32)  # (A, n_iter, 4, 2)


def _linear_upsample_circular(x, rate: int):
    """Circular linear interpolation along axis 0 (reference _linear_interpolate
    :145-163): y[j] = x[j//r]*(1-f) + x[j//r+1]*f with x wrapped."""
    n = x.shape[0]
    j = jnp.arange(n * rate)
    base = j // rate
    frac = (j % rate) / rate
    x_wrap = jnp.concatenate([x, x[:1]], axis=0)
    shape = (n * rate,) + (1,) * (x.ndim - 1)
    f = frac.reshape(shape)
    return x_wrap[base] * (1 - f) + x_wrap[base + 1] * f


class ActionMaskTable(NamedTuple):
    """Precomputed constants; build once via :func:`build_table`."""

    dist_star: jnp.ndarray       # (R*up, A, n_iter)
    hull_base: jnp.ndarray       # (R,) vehicle hull distance per beam
    actions: jnp.ndarray         # (A, 2) physical [steer, speed]
    actions_norm: jnp.ndarray    # (A, 2) normalized to model units


def build_table(mask_cfg: ActionMaskConfig = ActionMaskConfig(),
                lidar_cfg: LidarConfig = LidarConfig(),
                vcfg: VehicleConfig = VehicleConfig()) -> ActionMaskTable:
    """Build dist_star (reference precompute :114-143)."""
    R = lidar_cfg.n_beams
    far = lidar_cfg.max_range * 10.0
    ang = np.arange(R) / R * 2 * math.pi
    ray_edges = np.zeros((R, 4), np.float32)
    ray_edges[:, 2] = np.cos(ang) * far
    ray_edges[:, 3] = np.sin(ang) * far

    boxes = future_boxes(mask_cfg, vcfg)               # (A, n_iter, 4, 2)
    nxt = np.roll(boxes, -1, axis=2)
    box_edges = np.concatenate([nxt, boxes], axis=-1).reshape(-1, 4)  # (A*I*4, 4)

    pts = segment_intersection_points(
        jnp.asarray(ray_edges), jnp.asarray(box_edges), tol=1e-8
    )                                                   # (R, A*I*4, 2)
    d = jnp.linalg.norm(pts, axis=-1)
    d = jnp.where(jnp.isinf(d), 0.0, d)
    A = mask_cfg.n_actions
    d = d.reshape(R, A, mask_cfg.n_iter, 4)
    dist_star = jnp.max(d, axis=-1)                    # farthest box-outline hit
    dist_star = _linear_upsample_circular(dist_star, mask_cfg.upsample)

    return ActionMaskTable(
        dist_star=dist_star,
        hull_base=vehicle_boundary(lidar_cfg, vcfg),
        actions=jnp.asarray(discrete_actions(mask_cfg, vcfg)),
        actions_norm=jnp.asarray(
            discrete_actions(mask_cfg, vcfg)
            / np.array([vcfg.max_steer, 1.0], np.float32)
        ),
    )


def _min_filter5_reflect(x):
    """scipy minimum_filter1d(size=5, mode='reflect') equivalent."""
    p = jnp.concatenate([x[1::-1], x, x[:-3:-1]])
    return jnp.min(jnp.stack([p[i : i + x.shape[0]] for i in range(5)]), axis=0)


def step_lengths(raw_lidar, table: ActionMaskTable, cfg: ActionMaskConfig,
                 lidar_cfg: LidarConfig = LidarConfig()):
    """Per-action collision-free sub-step counts (pre-post-process), one env.

    Per (ray, action): first blocked sub-step index, n_iter when all safe;
    then min over rays.  First-blocked + min-over-rays collapses into ONE
    joint min over (ray, k) of (blocked ? k : n_iter): for every k' < the
    first blocked k the entry is n_iter >= k, so the joint min equals the
    per-ray first-block min — a single fused compare+reduce on the VPU
    instead of the reference's argmin/any/where cascade (action_mask.py:173).
    ``hope_tpu.ops.mask_step_lengths`` is the batched Pallas form of the same
    reduction.
    """
    obs = jnp.clip(raw_lidar, 0.0, lidar_cfg.max_range) + table.hull_base
    dist_obs = _linear_upsample_circular(obs, cfg.upsample)[:, None, None]
    k_idx = jnp.arange(cfg.n_iter, dtype=jnp.float32)
    w = jnp.where(table.dist_star > dist_obs, k_idx, float(cfg.n_iter))
    return jnp.min(w, axis=(0, 2))                     # (A,)


def postprocess(step_len, cfg: ActionMaskConfig):
    """Edge penalty + 5-wide erosion + normalization (reference post_process
    :176-196), one env."""
    half = cfg.n_actions // 2
    fwd, bwd = step_len[:half], step_len[half:]
    edge = jnp.zeros(half).at[0].set(1.0).at[half - 1].set(1.0)
    fwd = _min_filter5_reflect(fwd - edge)
    bwd = _min_filter5_reflect(bwd - edge)
    mask = jnp.clip(jnp.concatenate([fwd, bwd]), 0.0, cfg.n_iter) / cfg.n_iter
    # degenerate all-blocked mask: tiny uniform floor (reference :182-183)
    return jnp.where(jnp.sum(mask) == 0.0, jnp.clip(mask, 0.01, 1.0), mask)


def get_steps(raw_lidar, table: ActionMaskTable, cfg: ActionMaskConfig,
              lidar_cfg: LidarConfig = LidarConfig()):
    """Mask in [0, 1]^A: fraction of the horizon each discrete action can run
    collision-free (reference get_steps :166-196 incl. post_process)."""
    return postprocess(step_lengths(raw_lidar, table, cfg, lidar_cfg), cfg)


def choose_action(key, mean, std, mask, table: ActionMaskTable):
    """Sample a discrete action by Gaussian log-prob x mask softmax
    (reference choose_action :199-227).

    Returns (action_norm (2,), index ()).
    """
    z = (table.actions_norm - mean) / std
    logp = -0.5 * z**2 - jnp.log(jnp.sqrt(2 * math.pi) * std)
    logp = jnp.sum(jnp.clip(logp, -10.0, 10.0), axis=-1)   # (A,)
    w = jnp.exp(logp) * mask
    p = w / jnp.maximum(jnp.sum(w), 1e-30)
    idx = jax.random.categorical(key, jnp.log(jnp.maximum(p, 1e-30)))
    return table.actions_norm[idx], idx
