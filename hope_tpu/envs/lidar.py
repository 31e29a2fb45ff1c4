"""Vmapped 2-D lidar (TPU-native form of reference env/lidar_simulator.py).

The reference solves beam-line vs edge-line intersections with index-range
quadrant masking (:85-134); here the along-ray parameter is solved directly
(t >= 0 keeps forward hits only), which is branch-free and mask-safe for padded
edges.  The returned observation subtracts the vehicle-hull base distance per
beam, matching ``LidarSimlator.get_observation`` (:31-46).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..config import LidarConfig, VehicleConfig
from ..geometry import box_to_edges, edges_to_ego, ray_hits


def beam_angles(cfg: LidarConfig):
    """Beam i points at angle 2*pi*i/n in the ego frame (beam 0 = forward)."""
    return jnp.asarray(np.arange(cfg.n_beams) / cfg.n_beams * 2 * math.pi, jnp.float32)


def vehicle_boundary(cfg: LidarConfig, vcfg: VehicleConfig):
    """Distance from the rear-axle origin to the vehicle hull along each beam
    (reference get_vehicle_boundary :48-53).  Computed once, host-side."""
    corners = jnp.asarray(vcfg.box_corners(), jnp.float32)
    edges = box_to_edges(corners)
    return ray_hits(beam_angles(cfg), edges, cfg.max_range)


def lidar_observation(pose, edges, edge_mask, angles, boundary, cfg: LidarConfig):
    """Lidar reading for one pose (vmap for batches).

    Args:
      pose: (3,) ego pose.
      edges: (E, 4) world obstacle segments.
      edge_mask: (E,) live mask.
      angles: (R,) beam angles from :func:`beam_angles`.
      boundary: (R,) vehicle-hull base from :func:`vehicle_boundary`.

    Returns:
      (R,) obstacle distance minus hull base, in [ -hull, range ].
    """
    ego = edges_to_ego(edges, pose)
    # collapse masked edges to degenerate points so they never reflect
    ego = jnp.where(edge_mask[:, None], ego, 0.0)
    dist = ray_hits(angles, ego, cfg.max_range)
    return dist - boundary
