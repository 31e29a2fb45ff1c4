"""Procedural bay / parallel parking scenario generation, on device.

JAX-random redesign of reference ``env/parking_map_normal.py``: the unbounded
recursive rejection loop (:242-246, :454-457) becomes a fixed-budget masked
retry scan, and every obstacle lives in a fixed polygon slot so generated
scenes are stack-ready ``Scene`` pytrees.  ``vmap`` produces banks of thousands
of scenarios in one call.

Polygon slots: 0 back wall, 1 left critical, 2 right critical, 3-8 non-critical
cars, 9 far wall, 10-17 clutter — 18 polys x 4 edges = 72 live edges max.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..config import EnvConfig, ScenarioConfig, VehicleConfig
from ..geometry import point_segment_distance, pose_to_box, box_to_edges, segments_intersect
from .scene import LEVEL_COMPLEX, LEVEL_EXTREM, LEVEL_NORMAL, Scene

PI = math.pi
N_POLYS = 18
N_EDGES = N_POLYS * 4


def _gauss_clip(key, mean, std, lo, hi):
    """clipped gaussian (reference random_gaussian_num :25-27)."""
    return jnp.clip(jax.random.normal(key) * std + mean, lo, hi)


def _uniform(key, lo, hi):
    return jax.random.uniform(key, minval=lo, maxval=hi)


def _rand_pos(key, ox, oy, a_min, a_max, r_min, r_max):
    """reference get_rand_pos :33-38."""
    k1, k2 = jax.random.split(key)
    a = _gauss_clip(k1, (a_max + a_min) / 2, (a_max - a_min) / 4, a_min, a_max)
    r = _gauss_clip(k2, (r_min + r_max) / 2, (r_max - r_min) / 4, r_min, r_max)
    return ox + jnp.cos(a) * r, oy + jnp.sin(a) * r


def _box(corners_ref, pose):
    return pose_to_box(pose, corners_ref)


def _quad_dist(a, b):
    """Min distance between two quads (0 when edges cross)."""
    ea, eb = box_to_edges(a), box_to_edges(b)
    d1 = jnp.min(point_segment_distance(a, eb))
    d2 = jnp.min(point_segment_distance(b, ea))
    cross = jnp.any(segments_intersect(ea, eb))
    return jnp.where(cross, 0.0, jnp.minimum(d1, d2))


def _quads_cross(a, b):
    return jnp.any(segments_intersect(box_to_edges(a), box_to_edges(b)))


def _min_corner_y(corners_ref, x, yaw, idx0, idx1):
    """-min(corner_a.y, corner_b.y) + MIN_DIST for the slot-floor formula
    (reference :77-80, :285-288)."""
    b = _box(corners_ref, jnp.stack([x, jnp.zeros(()), yaw]))
    return -jnp.minimum(b[idx0, 1], b[idx1, 1])


def _attempt(key, cfg: ScenarioConfig, vcfg: VehicleConfig, bay: bool):
    """One generation attempt. Returns (ok, polys (18,4,2), active (18,),
    start (3,), dest (3,))."""
    corners = jnp.asarray(vcfg.box_corners(), jnp.float32)
    W, L = vcfg.width, vcfg.length
    half_len = cfg.bay_half_len if bay else cfg.para_half_len
    wall_dist = cfg.bay_wall_dist if bay else cfg.para_wall_dist
    if bay:
        max_space = cfg.max_lot_width - W
        min_space = cfg.min_lot_width - W
        crit_span = W       # spacing unit between parked cars
        yaw_mean = PI / 2
        # corners straddling the slot floor: rear-right(0) & rear-left(3) for bay
        floor_idx = (0, 3)
    else:
        max_space = cfg.max_lot_len - L
        min_space = cfg.min_lot_len - L
        crit_span = L
        yaw_mean = 0.0
        # rear-right(0) & front-right(1) for parallel
        floor_idx = (0, 1)

    keys = jax.random.split(key, 24)
    polys = jnp.zeros((N_POLYS, 4, 2))
    active = jnp.zeros(N_POLYS, bool)

    # slot 0: back wall (reference :62-66)
    back = jnp.asarray([[half_len, 0.0], [half_len, -1.0],
                        [-half_len, -1.0], [-half_len, 0.0]])
    polys = polys.at[0].set(back)
    active = active.at[0].set(True)

    # destination (reference :76-82, :284-290)
    dest_yaw = _gauss_clip(keys[0], yaw_mean, PI / 36,
                           yaw_mean - PI / 12, yaw_mean + PI / 12)
    min_dest_y = _min_corner_y(corners, jnp.zeros(()), dest_yaw, *floor_idx) + cfg.min_dist_to_obst
    dest_y = _gauss_clip(keys[1], min_dest_y + 0.4, 0.2, min_dest_y, min_dest_y + 0.8)
    dest = jnp.stack([jnp.zeros(()), dest_y, dest_yaw])
    dest_box = _box(corners, dest)
    rb, rf, lf, lb = dest_box[0], dest_box[1], dest_box[2], dest_box[3]

    min_d0 = max_space / 5.0
    max_d0 = max_space * 4.0 / 5.0
    # NOTE(parallel): reference uses min_longitude_space/5 for the lower bound
    min_d0 = jnp.where(bay, min_d0, min_space / 5.0)

    # ---- left critical obstacle (slot 1): huge wall-block or parked car ----
    huge_l = jax.random.uniform(keys[2]) < cfg.prob_huge_obst
    if bay:
        anchor_f, anchor_b = lf, lb          # left side of the slot
    else:
        anchor_f, anchor_b = lb, rb          # behind the slot (reference :301-302)
    lf_x, lf_y = _rand_pos(keys[3], anchor_f[0], anchor_f[1], PI * 11 / 12, PI * 13 / 12, min_d0, max_d0)
    lb_x, lb_y = _rand_pos(keys[4], anchor_b[0], anchor_b[1], PI * 11 / 12, PI * 13 / 12, min_d0, max_d0)
    huge_left = jnp.stack([
        jnp.stack([lf_x, lf_y]),
        jnp.stack([lb_x, lb_y]),
        jnp.asarray([-half_len, 0.0]),
        jnp.stack([jnp.asarray(-half_len), lf_y]),
    ])

    car_lx = -(crit_span + _uniform(keys[5], min_d0, max_d0))
    car_lyaw = _gauss_clip(keys[6], yaw_mean, PI / 36, yaw_mean - PI / 12, yaw_mean + PI / 12)
    car_lymin = _min_corner_y(corners, car_lx, car_lyaw, *floor_idx) + cfg.min_dist_to_obst
    car_ly = _gauss_clip(keys[7], car_lymin + 0.4, 0.2, car_lymin, car_lymin + 0.8)
    car_left = _box(corners, jnp.stack([car_lx, car_ly, car_lyaw]))

    left = jnp.where(huge_l, huge_left, car_left)
    polys = polys.at[1].set(left)
    active = active.at[1].set(True)

    # non-critical cars further left (slots 3-5; reference :111-117)
    nkeys = jax.random.split(keys[8], 9)
    x_cur = car_lx
    y_cur = car_ly
    for i in range(3):
        x_cur = x_cur - (crit_span + cfg.min_dist_to_obst + _uniform(nkeys[3 * i], min_d0, max_d0))
        y_cur = y_cur + _gauss_clip(nkeys[3 * i + 1], 0.0, 0.05, -0.1, 0.1)
        yaw_i = _gauss_clip(nkeys[3 * i + 2], yaw_mean, PI / 36, yaw_mean - PI / 12, yaw_mean + PI / 12)
        on = (~huge_l) & (jax.random.uniform(jax.random.fold_in(keys[8], 100 + i)) < cfg.prob_non_critical_car)
        polys = polys.at[3 + i].set(_box(corners, jnp.stack([x_cur, y_cur, yaw_i])))
        active = active.at[3 + i].set(on)

    # ---- right critical obstacle (slot 2) -------------------------------
    d_left = _quad_dist(dest_box, left)
    min_d1 = jnp.maximum(min_space - d_left, 0.0) + cfg.min_dist_to_obst
    max_d1 = jnp.maximum(max_space - d_left, 0.0) + cfg.min_dist_to_obst
    huge_r = jax.random.uniform(keys[9]) < (cfg.prob_huge_obst if bay else 0.5)
    if bay:
        anchor_f, anchor_b = rf, rb
    else:
        anchor_f, anchor_b = lf, rf          # in front of the slot (reference :332-333)
    rf_x, rf_y = _rand_pos(keys[10], anchor_f[0], anchor_f[1], -PI / 12, PI / 12, min_d1, max_d1)
    rb_x, rb_y = _rand_pos(keys[11], anchor_b[0], anchor_b[1], -PI / 12, PI / 12, min_d1, max_d1)
    huge_right = jnp.stack([
        jnp.stack([jnp.asarray(half_len), rf_y]),
        jnp.asarray([half_len, 0.0]),
        jnp.stack([rb_x, rb_y]),
        jnp.stack([rf_x, rf_y]),
    ])
    car_rx = crit_span + _uniform(keys[12], min_d1, max_d1)
    car_ryaw = _gauss_clip(keys[13], yaw_mean, PI / 36, yaw_mean - PI / 12, yaw_mean + PI / 12)
    car_rymin = _min_corner_y(corners, car_rx, car_ryaw, *floor_idx) + cfg.min_dist_to_obst
    car_ry = _gauss_clip(keys[14], car_rymin + 0.4, 0.2, car_rymin, car_rymin + 0.8)
    car_right = _box(corners, jnp.stack([car_rx, car_ry, car_ryaw]))
    right = jnp.where(huge_r, huge_right, car_right)
    polys = polys.at[2].set(right)
    active = active.at[2].set(True)

    # non-critical cars further right (slots 6-8)
    mkeys = jax.random.split(keys[15], 9)
    x_cur = car_rx
    y_cur = car_ry
    for i in range(3):
        x_cur = x_cur + (crit_span + cfg.min_dist_to_obst + _uniform(mkeys[3 * i], min_d1, max_d1))
        y_cur = y_cur + _gauss_clip(mkeys[3 * i + 1], 0.0, 0.05, -0.1, 0.1)
        yaw_i = _gauss_clip(mkeys[3 * i + 2], yaw_mean, PI / 36, yaw_mean - PI / 12, yaw_mean + PI / 12)
        on = (~huge_r) & (jax.random.uniform(jax.random.fold_in(keys[15], 100 + i)) < cfg.prob_non_critical_car)
        polys = polys.at[6 + i].set(_box(corners, jnp.stack([x_cur, y_cur, yaw_i])))
        active = active.at[6 + i].set(on)

    # ---- feasibility (reference :149-160) -------------------------------
    d_right = _quad_dist(dest_box, right)
    gap = d_left + d_right
    ok = (gap >= min_space) & (gap <= max_space) \
        & (d_left >= cfg.min_dist_to_obst) & (d_right >= cfg.min_dist_to_obst)
    for s in range(9):
        ok = ok & ~(active[s] & _quads_cross(polys[s], dest_box))

    # ---- far wall or clutter (slots 9-17; reference :162-197) ------------
    ys = jnp.where(active[:9, None], polys[:9, :, 1], -jnp.inf)
    max_obst_y = jnp.max(ys) + cfg.min_dist_to_obst
    wall_y = wall_dist + max_obst_y
    use_wall = jax.random.uniform(keys[16]) < 0.2
    wall = jnp.stack([
        jnp.stack([jnp.asarray(-half_len), wall_y + cfg.min_dist_to_obst]),
        jnp.stack([jnp.asarray(half_len), wall_y + cfg.min_dist_to_obst]),
        jnp.stack([jnp.asarray(half_len), wall_y + cfg.min_dist_to_obst + 0.1]),
        jnp.stack([jnp.asarray(-half_len), wall_y + cfg.min_dist_to_obst + 0.1]),
    ])
    polys = polys.at[9].set(wall)
    active = active.at[9].set(use_wall)

    range_box = jnp.stack([
        jnp.stack([jnp.asarray(-half_len), wall_y]),
        jnp.stack([jnp.asarray(half_len), wall_y]),
        jnp.stack([jnp.asarray(half_len), wall_y + 8.0]),
        jnp.stack([jnp.asarray(-half_len), wall_y + 8.0]),
    ])
    ckeys = jax.random.split(keys[17], 8 * 4)
    clutter_boxes = []
    clutter_on = []
    for i in range(8):
        kx, ky, kyaw, kj = ckeys[4 * i: 4 * i + 4]
        cx = _uniform(kx, -half_len + 2.0, half_len - 2.0)
        cy = _uniform(ky, wall_y + 2.0, wall_y + 6.0)
        cyaw = jax.random.uniform(kyaw) * 2 * PI
        cb = _box(corners, jnp.stack([cx, cy, cyaw]))
        cb = cb + 0.5 * jax.random.uniform(kj, (4, 2))       # vertex jitter (:184)
        on = (~use_wall) & (i < cfg.n_extra_obstacles) & ~_quads_cross(cb, range_box)
        clutter_boxes.append(cb)
        clutter_on.append(on)
    for i in range(8):
        polys = polys.at[10 + i].set(clutter_boxes[i])
        active = active.at[10 + i].set(clutter_on[i])

    # ---- start pose: first collision-free of S samples (reference :204-226)
    skeys = jax.random.split(keys[18], cfg.start_attempts * 4)
    all_edges = box_to_edges(polys).reshape(-1, 4)
    edge_act = jnp.repeat(active, 4)

    def try_start(i):
        kx, ky, kyaw, kflip = (skeys[4 * i], skeys[4 * i + 1],
                               skeys[4 * i + 2], skeys[4 * i + 3])
        sx = _uniform(kx, -half_len / 2, half_len / 2)
        sy = _uniform(ky, max_obst_y + 1.0, wall_y - 1.0)
        syaw = _gauss_clip(kyaw, 0.0, PI / 6, -PI / 2, PI / 2)
        syaw = jnp.where(jax.random.uniform(kflip) < 0.5, syaw + PI, syaw)
        sbox = _box(corners, jnp.stack([sx, sy, syaw]))
        sedges = box_to_edges(sbox)
        hit = jnp.any(segments_intersect(sedges, all_edges) & edge_act[None, :])
        hit = hit | _quads_cross(sbox, dest_box)
        return jnp.stack([sx, sy, syaw]), ~hit

    starts, valid = jax.vmap(try_start)(jnp.arange(cfg.start_attempts))
    any_valid = jnp.any(valid)
    first = jnp.argmax(valid)
    start = starts[first]
    ok = ok & any_valid

    # parallel: flip dest to match start direction (reference :437-442)
    if not bay:
        center = jnp.mean(dest_box, axis=0)
        flipped = jnp.stack([2 * center[0] - dest[0], 2 * center[1] - dest[1], dest[2] + PI])
        dest = jnp.where(jnp.cos(start[2]) < 0, flipped, dest)

    return ok, polys, active, start, dest


def generate_case(key, cfg: ScenarioConfig, vcfg: VehicleConfig = VehicleConfig(),
                  env_cfg: EnvConfig = EnvConfig(), bay: bool = True):
    """One scenario with a bounded retry budget; returns (Scene, ok).

    ``ok=False`` (rare, < 1e-3 with default budget) flags an infeasible draw —
    bank builders should regenerate those with fresh keys.
    """
    corners = jnp.asarray(vcfg.box_corners(), jnp.float32)

    def body(carry, k):
        done, best = carry
        out = _attempt(k, cfg, vcfg, bay)
        take = out[0] & ~done
        best = jax.tree.map(lambda a, b: jnp.where(take, a, b), out, best)
        return (done | out[0], best), None

    keys = jax.random.split(key, cfg.gen_attempts)
    zero = _attempt(keys[0], cfg, vcfg, bay)
    (found, (ok, polys, active, start, dest)), _ = jax.lax.scan(
        body, (jnp.asarray(False), zero), keys
    )

    dest_box = pose_to_box(dest, corners)
    edges = box_to_edges(polys).reshape(N_EDGES, 4)
    edge_mask = jnp.repeat(active, 4)
    edge_poly = jnp.repeat(jnp.arange(N_POLYS, dtype=jnp.int32), 4)
    bounds = jnp.stack([
        jnp.floor(jnp.minimum(start[0], dest[0]) - 10.0),
        jnp.ceil(jnp.maximum(start[0], dest[0]) + 10.0),
        jnp.floor(jnp.minimum(start[1], dest[1]) - 10.0),
        jnp.ceil(jnp.maximum(start[1], dest[1]) + 10.0),
    ])
    level = {"Normal": LEVEL_NORMAL, "Complex": LEVEL_COMPLEX,
             "Extrem": LEVEL_EXTREM}[cfg.level]

    E = env_cfg.max_edges
    P = env_cfg.max_obstacles
    scene = Scene(
        edges=jnp.zeros((E, 4)).at[:N_EDGES].set(edges),
        edge_mask=jnp.zeros(E, bool).at[:N_EDGES].set(edge_mask),
        edge_poly=jnp.zeros(E, jnp.int32).at[:N_EDGES].set(edge_poly % P),
        n_polys=jnp.asarray(N_POLYS, jnp.int32),
        start=start.astype(jnp.float32),
        dest=dest.astype(jnp.float32),
        dest_box=dest_box.astype(jnp.float32),
        bounds=bounds.astype(jnp.float32),
        level=jnp.asarray(level, jnp.int32),
        case_id=jnp.asarray(0 if bay else 1, jnp.int32),
    )
    return scene, found


@partial(jax.jit, static_argnames=("level", "n", "bay_ratio"))
def generate_bank(key, level: str = "Normal", n: int = 1024, bay_ratio: float = 0.5):
    """A bank of n scenarios; bay vs parallel chosen per scenario
    (reference ParkingMapNormal.reset :474-480 — bay only for Normal/Complex)."""
    cfg = ScenarioConfig.for_level(level)
    if level == "Extrem":
        bay_ratio = 0.0
    k1, k2, k3 = jax.random.split(key, 3)
    bay_scene, bay_ok = jax.vmap(lambda k: generate_case(k, cfg, bay=True))(
        jax.random.split(k2, n))
    par_scene, par_ok = jax.vmap(lambda k: generate_case(k, cfg, bay=False))(
        jax.random.split(k3, n))
    pick_bay = jax.random.uniform(k1, (n,)) < bay_ratio

    def sel(a, b):
        m = pick_bay.reshape((n,) + (1,) * (a.ndim - 1))
        return jnp.where(m, a, b)

    scene = jax.tree.map(sel, bay_scene, par_scene)
    ok = jnp.where(pick_bay, bay_ok, par_ok)
    return scene, ok
