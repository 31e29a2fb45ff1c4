"""Batched parking environment: one jitted pure step, vmapped over scenarios.

TPU-native redesign of the reference simulator (``env/car_parking_base.py`` +
``env/env_wrapper.py``): the per-substep arrival/collision/rollback loop
(:235-276) becomes a ``lax.scan`` with freeze masks, rendering becomes the
on-device BEV rasterizer, and the Reeds-Shepp endgame search (:293-297,
413-450) is the masked argmin cascade from ``planning.rs_select`` — all of it
one fused computation per control step for the whole scenario batch.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp

from ..config import EnvConfig
from ..dynamics import VehicleState, substep_trajectory
from ..geometry import (
    box_to_edges,
    convex_clip_area,
    polygon_area,
    pose_to_box,
    segments_intersect,
)
from ..geometry.raster import prefilter_polys, render_bev, render_bev_exact
from ..planning import RSPath, find_path, find_path_batch
from .action_mask import ActionMaskTable, build_table, get_steps, postprocess
from .lidar import beam_angles, lidar_observation, vehicle_boundary
from .rewards import ARRIVED, COLLIDED, CONTINUE, OUTBOUND, OUTTIME, shaped_reward, step_reward_terms
from .scene import Scene


@flax.struct.dataclass
class EnvState:
    vehicle: VehicleState
    t: jnp.ndarray              # int32 step counter (starts at 1 post-reset)
    accum_arrive: jnp.ndarray   # monotonic box-union accumulator
    status: jnp.ndarray         # int32 status code
    scene: Scene


class ParkingEnv:
    """Holds static config + precomputed tables; all methods are pure and
    jit/vmap-compatible (single-scenario semantics — use the ``batch_*``
    wrappers or vmap yourself)."""

    def __init__(self, cfg: EnvConfig = EnvConfig()):
        self.cfg = cfg
        self.corners = jnp.asarray(cfg.vehicle.box_corners(), jnp.float32)
        self.angles = beam_angles(cfg.lidar)
        self.hull_base = vehicle_boundary(cfg.lidar, cfg.vehicle)
        self.mask_table: ActionMaskTable = build_table(cfg.mask, cfg.lidar, cfg.vehicle)
        backend = cfg.obs.mask_backend
        self._pallas_mask = (backend == "pallas" or
                             (backend == "auto"
                              and jax.default_backend() == "tpu"))
        rbackend = cfg.obs.raster_backend
        self._pallas_raster = (rbackend == "pallas" or
                               (rbackend == "auto"
                                and jax.default_backend() == "tpu"))

    # ------------------------------------------------------------------ obs

    def _target_repr(self, pose, dest):
        """(5,) target representation (reference _get_targt_repr :372-381),
        reproducing the duplicated-cos bug by default."""
        dx = dest[0] - pose[0]
        dy = dest[1] - pose[1]
        rel_dist = jnp.hypot(dx, dy)
        rel_angle = jnp.arctan2(dy, dx) - pose[2]
        rel_heading = dest[2] - pose[2]
        fifth = (jnp.cos(rel_heading) if self.cfg.obs.reproduce_target_repr_bug
                 else jnp.sin(rel_heading))
        return jnp.stack([rel_dist, jnp.cos(rel_angle), jnp.sin(rel_angle),
                          jnp.cos(rel_heading), fifth])

    def _raster_edges(self, pose, scene: Scene):
        """Edge set fed to the rasterizer: the full scene set, or (when
        ``obs.raster_edge_budget`` > 0) the polygon-level prefiltered subset —
        only whole polygons within the image radius, parity-safe
        (``geometry.raster.prefilter_polys``)."""
        cfg = self.cfg
        budget = cfg.obs.raster_edge_budget
        if not budget:
            return scene.edges, scene.edge_mask, scene.edge_poly
        cx_off = (cfg.vehicle.front_hang + cfg.vehicle.wheel_base
                  - cfg.vehicle.rear_hang) / 2.0
        center = pose[:2] + cx_off * jnp.stack(
            [jnp.cos(pose[2]), jnp.sin(pose[2])])
        radius = cfg.obs.img_size * cfg.obs.img_res * math.sqrt(2) / 2 + 1.0
        return prefilter_polys(center, scene.edges, scene.edge_mask,
                               scene.edge_poly, budget, radius,
                               cfg.max_obstacles)

    def observe(self, state: EnvState) -> dict:
        """Observation dict for one env (reference render :383-411)."""
        cfg = self.cfg
        pose = state.vehicle.pose
        scene = state.scene
        obs = {}
        lidar = lidar_observation(pose, scene.edges, scene.edge_mask,
                                  self.angles, self.hull_base, cfg.lidar)
        if cfg.obs.use_lidar:
            obs["lidar"] = lidar
        if cfg.obs.use_action_mask:
            obs["action_mask"] = get_steps(lidar, self.mask_table, cfg.mask, cfg.lidar)
        if cfg.obs.use_img:
            vbox = pose_to_box(pose, self.corners)
            render = (render_bev if cfg.obs.raster_parity == "global"
                      else render_bev_exact)
            re, rm, rp = self._raster_edges(pose, scene)
            obs["img"] = render(
                pose, vbox, scene.dest_box, re, rm, rp,
                cfg.obs, cfg.vehicle, cfg.max_obstacles,
            ).transpose(2, 0, 1)  # CHW (reference observation_rescale)
        obs["target"] = self._target_repr(pose, scene.dest)
        return obs

    def observe_batch(self, state: EnvState) -> dict:
        """Batched observation for a whole env batch (leading dim B).

        Same semantics as ``vmap(observe)`` but the action-mask reduction runs
        through the batched Pallas kernel on TPU (``ops.mask_step_lengths``);
        used by ``batch_step``/``batch_reset``.
        """
        cfg = self.cfg
        pose = state.vehicle.pose                      # (B, 3)
        scene = state.scene
        obs = {}
        lidar = jax.vmap(
            lambda p, e, m: lidar_observation(p, e, m, self.angles,
                                              self.hull_base, cfg.lidar)
        )(pose, scene.edges, scene.edge_mask)
        if cfg.obs.use_lidar:
            obs["lidar"] = lidar
        if cfg.obs.use_action_mask:
            if self._pallas_mask:
                from ..ops import mask_step_lengths

                ext = (jnp.clip(lidar, 0.0, cfg.lidar.max_range)
                       + self.mask_table.hull_base)
                sl = mask_step_lengths(ext, self.mask_table.dist_star,
                                       cfg.mask.n_iter, cfg.mask.upsample)
                obs["action_mask"] = jax.vmap(
                    lambda s: postprocess(s, cfg.mask))(sl)
            else:
                obs["action_mask"] = jax.vmap(
                    lambda l: get_steps(l, self.mask_table, cfg.mask,
                                        cfg.lidar))(lidar)
        if cfg.obs.use_img:
            vbox = pose_to_box(pose, self.corners)
            if self._pallas_raster:
                from ..ops.raster_bev import render_bev_batch

                obs["img"] = render_bev_batch(
                    pose, vbox, scene.dest_box, scene.edges, scene.edge_mask,
                    scene.edge_poly, cfg.obs, cfg.vehicle,
                ).transpose(0, 3, 1, 2)
            else:
                render = (render_bev if cfg.obs.raster_parity == "global"
                          else render_bev_exact)
                obs["img"] = jax.vmap(
                    lambda p, vb, db, sc: render(
                        p, vb, db, *self._raster_edges(p, sc),
                        cfg.obs, cfg.vehicle, cfg.max_obstacles,
                    ).transpose(2, 0, 1)
                )(pose, vbox, scene.dest_box, scene)
        obs["target"] = jax.vmap(self._target_repr)(pose, scene.dest)
        return obs

    # ----------------------------------------------------------------- reset

    def _init_state(self, scene: Scene) -> EnvState:
        return EnvState(
            vehicle=VehicleState.from_pose(scene.start),
            t=jnp.asarray(1, jnp.int32),
            accum_arrive=jnp.zeros(()),
            status=jnp.asarray(CONTINUE, jnp.int32),
            scene=scene,
        )

    def reset(self, scene: Scene):
        """Fresh state for one scenario; obs as after the reference's no-action
        step (car_parking_base.py:127-138 — t ends at 1)."""
        state = self._init_state(scene)
        return state, self.observe(state)

    # ------------------------------------------------------------------ step

    def _arrived(self, vbox, scene: Scene):
        inter = convex_clip_area(vbox, scene.dest_box)
        return inter / polygon_area(scene.dest_box) > self.cfg.arrive_overlap

    def _collided(self, vbox, scene: Scene):
        hits = segments_intersect(box_to_edges(vbox), scene.edges)
        return jnp.any(hits & scene.edge_mask[None, :])

    def _outbound(self, pose, scene: Scene):
        b = scene.bounds
        return (pose[0] < b[0]) | (pose[0] > b[1]) | (pose[1] < b[2]) | (pose[1] > b[3])

    def _transition(self, state: EnvState, action, search_rs: bool = True):
        """One control step minus observation rendering: dynamics, termination,
        reward, RS endgame search.  Single-env; ``batch_step`` vmaps this and
        renders observations batched."""
        cfg = self.cfg
        scene = state.scene
        prev_pose = state.vehicle.pose

        # All candidate sub-step poses are the same closed-form arc evaluated
        # at k*dt (action constant within a control step), so the reference's
        # sequential accept/rollback loop (:259-271) becomes one parallel
        # evaluation plus a first-event selection: freeze at the first sub-step
        # k* with arrival or collision; arrival accepts pose k*, collision
        # rolls back to pose k*-1 (the pre-step state when k* == 1).
        n = cfg.vehicle.n_substep
        traj = substep_trajectory(state.vehicle, action, cfg.vehicle, n)
        boxes = pose_to_box(traj.pose, self.corners)           # (n, 4, 2)
        arr = jax.vmap(lambda b: self._arrived(b, scene))(boxes)
        col = jax.vmap(lambda b: self._collided(b, scene))(boxes)

        event = arr | col
        has_event = jnp.any(event)
        f0 = jnp.argmax(event)                                 # first event idx
        arrived = has_event & arr[f0]
        coll_first = col[0] & ~arr[0]                          # substep-1 collision
        final_idx = jnp.where(~has_event, n - 1,
                              jnp.where(arr[f0], f0, f0 - 1))
        vehicle = jax.tree.map(
            lambda t, s0: jnp.where(final_idx >= 0,
                                    t[jnp.maximum(final_idx, 0)], s0),
            traj, state.vehicle,
        )

        t = state.t + 1
        pose = vehicle.pose
        vbox = pose_to_box(pose, self.corners)
        collided_status = coll_first & cfg.env_collide
        status = jnp.where(
            arrived,
            ARRIVED,
            jnp.where(
                collided_status,
                COLLIDED,
                jnp.where(
                    self._outbound(pose, scene),
                    OUTBOUND,
                    jnp.where(t > cfg.tolerant_time, OUTTIME, CONTINUE),
                ),
            ),
        ).astype(jnp.int32)

        terms, accum = step_reward_terms(
            prev_pose, pose, t.astype(jnp.float32), vbox, scene.dest, scene.start,
            scene.dest_box, state.accum_arrive, cfg,
        )
        cont = status == CONTINUE
        terms = jnp.where(cont, terms, jnp.zeros_like(terms))
        accum = jnp.where(cont, accum, state.accum_arrive)

        new_state = EnvState(vehicle=vehicle, t=t, accum_arrive=accum,
                             status=status, scene=scene)
        reward = shaped_reward(terms, status, cfg)
        done = status != CONTINUE

        info = {"status": status, "reward_terms": terms}
        if search_rs:
            near = jnp.hypot(pose[0] - scene.dest[0], pose[1] - scene.dest[1]) < cfg.rs_max_dist
            want = (t > 1) & cont & near
            rs = find_path(
                pose, scene.dest, cfg.vehicle.max_curvature, self.corners,
                scene.edges, scene.edge_mask, scene.bounds,
                n_points=cfg.rs_max_points, step_m=cfg.rs_step_size,
            )
            info["rs"] = RSPath(found=rs.found & want, lengths=rs.lengths,
                                steers=rs.steers, L=rs.L)
        return new_state, reward, done, info

    def step(self, state: EnvState, action, search_rs: bool = True):
        """One control step for one env with a physical [steer, speed] action.

        Returns (state, obs, reward, done, info); info carries the raw reward
        terms, status, and (when ``search_rs``) the RS path found this step.
        """
        new_state, reward, done, info = self._transition(state, action, search_rs)
        return new_state, self.observe(new_state), reward, done, info

    def rescale_action(self, model_action):
        """Model output [-1,1]^2 -> physical [steer, speed]
        (reference env_wrapper.action_rescale :37-50)."""
        a = jnp.clip(model_action, -1.0, 1.0)
        return a * jnp.asarray([self.cfg.vehicle.max_steer, self.cfg.vehicle.max_speed])

    # --------------------------------------------------------------- batching

    def batch_reset(self, scenes: Scene):
        state = jax.vmap(self._init_state)(scenes)
        return state, self.observe_batch(state)

    def batch_step(self, state: EnvState, actions, search_rs: bool = True):
        new_state, reward, done, info = jax.vmap(
            partial(self._transition, search_rs=False))(state, actions)
        if search_rs:
            info["rs"] = self._batch_rs(new_state)
        return new_state, self.observe_batch(new_state), reward, done, info

    def _batch_rs(self, state: EnvState) -> RSPath:
        """Batch-level RS endgame search (semantics of _transition's per-env
        search); the swept-trajectory collision check runs through the Pallas
        kernel on TPU."""
        cfg = self.cfg
        scene = state.scene
        pose = state.vehicle.pose                          # (B, 3)
        near = jnp.hypot(pose[:, 0] - scene.dest[:, 0],
                         pose[:, 1] - scene.dest[:, 1]) < cfg.rs_max_dist
        want = (state.t > 1) & (state.status == CONTINUE) & near
        rs = find_path_batch(
            pose, scene.dest, cfg.vehicle.max_curvature, self.corners,
            scene.edges, scene.edge_mask, scene.bounds,
            n_points=cfg.rs_max_points, step_m=cfg.rs_step_size,
            max_tries=cfg.rs_max_tries, use_pallas=self._pallas_mask,
        )
        return RSPath(found=rs.found & want, lengths=rs.lengths,
                      steers=rs.steers, L=rs.L)

    @staticmethod
    def reset_where(state: EnvState, fresh: EnvState, done):
        """Lockstep auto-reset: where ``done``, adopt the fresh per-env state
        (scenario swap included) — finished scenarios never stall the batch."""
        def sel(a, b):
            d = done.reshape(done.shape + (1,) * (a.ndim - done.ndim))
            return jnp.where(d, a, b)

        return jax.tree.map(sel, fresh, state)

    @property
    def observation_shape(self) -> dict:
        cfg = self.cfg
        shape = {}
        if cfg.obs.use_lidar:
            shape["lidar"] = (cfg.lidar.n_beams,)
        if cfg.obs.use_action_mask:
            shape["action_mask"] = (cfg.mask.n_actions,)
        if cfg.obs.use_img:
            shape["img"] = (3, cfg.obs.img_size, cfg.obs.img_size)
        shape["target"] = (cfg.obs.target_dim,)
        return shape
