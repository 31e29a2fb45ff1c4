"""Reward terms (reference env/car_parking_base.py:186-233 + env/env_wrapper.py:8-33)."""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..config import EnvConfig
from ..geometry import convex_clip_area, polygon_area

# status codes (reference env/vehicle.py:13-18)
CONTINUE, ARRIVED, COLLIDED, OUTBOUND, OUTTIME = 0, 1, 2, 3, 4


def angle_diff(a, b):
    """Heading difference folded to [0, pi/2] (reference get_angle_diff :203-206)."""
    d = jnp.arccos(jnp.clip(jnp.cos(a - b), -1.0, 1.0))
    return jnp.where(d < math.pi / 2, d, math.pi - d)


def step_reward_terms(prev_pose, cur_pose, t, vehicle_box, scene_dest, scene_start,
                      dest_box, accum_arrive, cfg: EnvConfig):
    """Per-step shaped reward terms for one env (vmap for batches).

    Returns (terms (5,), new_accum): [time, rs_dist, dist, angle, box_union],
    mirroring _get_reward; rs_dist is 0 unless enabled (its weight is 0 in the
    reference config — configs.py:183-187).
    """
    time_cost = -jnp.tanh(t / (10.0 * cfg.tolerant_time))

    if cfg.reward.w_rs_dist != 0.0:
        from ..planning import reeds_shepp as rs

        maxc = cfg.vehicle.max_curvature
        cur = rs.optimal_length(cur_pose, scene_dest, maxc)
        prev = rs.optimal_length(prev_pose, scene_dest, maxc)
        norm = rs.optimal_length(scene_start, scene_dest, maxc)
        rs_reward = jnp.exp(-cur / norm) - jnp.exp(-prev / norm)
    else:
        rs_reward = jnp.zeros(())

    dist_norm = jnp.maximum(
        jnp.hypot(scene_dest[0] - scene_start[0], scene_dest[1] - scene_start[1]), 10.0
    )
    d_cur = jnp.hypot(cur_pose[0] - scene_dest[0], cur_pose[1] - scene_dest[1])
    d_prev = jnp.hypot(prev_pose[0] - scene_dest[0], prev_pose[1] - scene_dest[1])
    dist_reward = (d_prev - d_cur) / dist_norm

    a_cur = angle_diff(cur_pose[2], scene_dest[2])
    a_prev = angle_diff(prev_pose[2], scene_dest[2])
    angle_reward = (a_prev - a_cur) / math.pi

    inter = convex_clip_area(vehicle_box, dest_box)
    dest_area = polygon_area(dest_box)
    ratio = inter / (2.0 * dest_area - inter)
    # monotonic accumulator (reference :221-226)
    grew = ratio >= accum_arrive
    box_union = jnp.where(grew, ratio - accum_arrive, 0.0)
    new_accum = jnp.where(grew, ratio, accum_arrive)

    terms = jnp.stack([time_cost, rs_reward, dist_reward, angle_reward, box_union])
    return terms, new_accum


def shaped_reward(terms, status, cfg: EnvConfig):
    """Scalar training reward (reference env_wrapper.reward_shaping :8-33)."""
    w = jnp.asarray([cfg.reward.w_time, cfg.reward.w_rs_dist, cfg.reward.w_dist,
                     cfg.reward.w_angle, cfg.reward.w_box_union])
    cont = jnp.sum(w * terms)
    r = jnp.select(
        [status == ARRIVED, status == COLLIDED, status == OUTBOUND, status == OUTTIME],
        [cfg.reward.r_arrived, cfg.reward.r_collided, cfg.reward.r_outbound,
         cfg.reward.r_outtime],
        cont,
    )
    return r * cfg.reward.ratio
