"""Multi-cusp parallel-parking maneuver templates.

Why this exists (round-5 diagnosis, log/mpc_r5_extrem): Extrem procedural
scenes are parallel-parking ONLY (slot length = car + 0.6-0.9 m), and the
Reeds-Shepp validity manifold there is empirically just the parked pose
itself — a dense probe of poses around the slot found RS(pose -> dest)
validating almost nowhere but (0, 0, 0).  A single RS word carries at most
two cusps; threading a car into a slot 0.6 m longer than itself takes MANY
alternating full-lock arcs (what every human driver does).  The trained RL
agent wiggles implicitly, step by step; the pure-MPC mode needs the maneuver
synthesized explicitly.

Approach: build a small library of SCENE-INDEPENDENT wiggle templates in the
slot frame (x along the slot axis, y toward the aisle, destination pose at
the origin), by simulating the EXIT maneuver from the parked pose — repeated
(forward-left, reverse-right) full-lock arc pairs that rotate the car toward
the aisle while its longitudinal excursion stays inside a margin budget —
then un-straighten into the aisle and time-reverse the whole thing, giving an
ENTRY plan that terminates exactly at the destination pose.  Each template is
a fixed-length list of constant-steer arc segments — the same (lengths,
steers) representation as RS paths — so the existing machinery discretizes
(``reeds_shepp.sample_path``), sweep-collision-checks (``rs_select``), and
executes (``build_action_queue``) it unchanged.  Per scene, every template is
placed at the slot and swept against the actual obstacles; valid templates
become extra staging candidates whose completion is the wiggle plan
(``staging.compute_staging`` appends them).

Template parameters are swept (margin budget, per-arc angle cap, exit
heading) rather than derived from per-scene clearances: the swept-car
collision check is the exact arbiter, the sweep just has to contain one
workable schedule per geometry.
"""
from __future__ import annotations

import math

import numpy as np

N_WIGGLE_SEG = 40          # fixed segment slots per template (zero-padded)


def _arc(x, y, th, sigma, length):
    """Exact unit-curvature arc update (matches reeds_shepp.sample_path)."""
    if sigma == 0.0:
        return x + length * math.cos(th), y + length * math.sin(th), th
    nx = x + sigma * (math.sin(th + sigma * length) - math.sin(th))
    ny = y - sigma * (math.cos(th + sigma * length) - math.cos(th))
    return nx, ny, th + sigma * length


def _exit_template(margin_n, phi_cap, th_exit, aisle_y_n, back_to_n=None,
                   max_pairs=12):
    """One EXIT maneuver in the normalized (unit-curvature) slot frame.

    Returns (segments [(signed_len, steer)], end_pose) or None if the wiggle
    budget can't reach ``th_exit``.  ``margin_n``/``aisle_y_n`` are normalized
    (multiply metres by max curvature).
    """
    segs = []
    x = y = th = 0.0
    for _ in range(max_pairs):
        if th >= th_exit:
            break
        # forward-left arc, longitudinal excursion capped at +margin
        room = math.sin(th) + max(0.0, margin_n - x)
        phi = max(0.0, math.asin(min(1.0, room)) - th)
        phi = min(phi, phi_cap, th_exit - th)
        if phi > 1e-4:
            x, y, th = _arc(x, y, th, +1.0, phi)
            segs.append((phi, +1.0))
        if th >= th_exit:
            break
        # reverse-right arc (heading still increases), excursion >= -margin
        room = math.sin(th) + max(0.0, margin_n + x)
        phi = max(0.0, math.asin(min(1.0, room)) - th)
        phi = min(phi, phi_cap, th_exit - th)
        if phi <= 1e-4:
            if not segs:
                return None
            break
        x, y, th = _arc(x, y, th, -1.0, -phi)
        segs.append((-phi, -1.0))
    if th < th_exit - 1e-3:
        return None
    # swing out into the aisle: forward-left until the lateral rise plus the
    # straightening forward-right arc (y gain 1 - cos(th)) reaches aisle_y
    while y + (1.0 - math.cos(th)) < aisle_y_n and th < 1.25:
        phi = min(0.15, 1.25 - th)
        x, y, th = _arc(x, y, th, +1.0, phi)
        segs.append((phi, +1.0))
    # forward-right arc back to heading 0; its length equals the heading
    th_pre = th
    x, y, th = _arc(x, y, th, -1.0, th_pre)
    segs.append((th_pre, -1.0))
    if back_to_n is not None and x > back_to_n:
        # straight reverse along the aisle, so the ENTRY (time-reversed)
        # starts BESIDE the slot instead of over the front neighbour — the
        # dominant start-pose collision mode on cluttered scenes
        segs.append((-(x - back_to_n), 0.0))
        x = back_to_n
    return segs, (x, y, th)


def _exit_template_arcstraight(margin_n, phi_cap, th_exit, aisle_y_n,
                               back_to_n=None, max_pairs=16):
    """Second wiggle family: (forward-left arc, reverse-STRAIGHT) pairs.

    The first family's reverse-right arcs rotate the car while backing up,
    swinging the rear corner toward the curb — the binding constraint on the
    narrowest slots.  Here heading only grows on forward arcs and the reverse
    legs are straight (no rotation), trading ~2x the cusps for zero
    rear-swing.  Same return contract as :func:`_exit_template`."""
    segs = []
    x = y = th = 0.0
    for _ in range(max_pairs):
        if th >= th_exit:
            break
        room = math.sin(th) + max(0.0, margin_n - x)
        phi = max(0.0, math.asin(min(1.0, room)) - th)
        phi = min(phi, phi_cap, th_exit - th)
        if phi > 1e-4:
            x, y, th = _arc(x, y, th, +1.0, phi)
            segs.append((phi, +1.0))
        if th >= th_exit:
            break
        d = max(0.0, (x + margin_n) / max(math.cos(th), 0.3))
        if d <= 1e-4:
            if not segs:
                return None
            break
        x, y, th = _arc(x, y, th, 0.0, -d)
        segs.append((-d, 0.0))
    if th < th_exit - 1e-3:
        return None
    while y + (1.0 - math.cos(th)) < aisle_y_n and th < 1.25:
        phi = min(0.15, 1.25 - th)
        x, y, th = _arc(x, y, th, +1.0, phi)
        segs.append((phi, +1.0))
    th_pre = th
    x, y, th = _arc(x, y, th, -1.0, th_pre)
    segs.append((th_pre, -1.0))
    if back_to_n is not None and x > back_to_n:
        segs.append((-(x - back_to_n), 0.0))
        x = back_to_n
    return segs, (x, y, th)


def build_templates(maxc: float,
                    margins_m=(0.15, 0.22, 0.32, 0.45),
                    phi_caps=(0.06, 0.10, 0.16, 0.26),
                    th_exits=(0.3, 0.4, 0.5, 0.65, 0.8),
                    aisle_y_m=(2.0, 2.4, 2.8),
                    back_to_m=(None, 0.8)):
    """Static template library.

    Returns:
      lengths: (T, N_WIGGLE_SEG) signed segment lengths in METRES (entry
        order — executing them from the start pose ends exactly at the slot).
      steers: (T, N_WIGGLE_SEG) in {-1, 0, 1}.
      starts: (T, 3) entry start pose in the slot frame, METRES (x along
        slot axis, y toward aisle, theta relative to slot heading).
    """
    R = 1.0 / maxc
    out_l, out_s, out_p = [], [], []
    seen = set()
    for m in margins_m:
        for cap in phi_caps:
            for te in th_exits:
                for ay in aisle_y_m:
                  for bk in back_to_m:
                   for fam in (_exit_template, _exit_template_arcstraight):
                    t = fam(m * maxc, cap, te, ay * maxc,
                            None if bk is None else bk * maxc)
                    if t is None:
                        continue
                    segs, end = t
                    if len(segs) > N_WIGGLE_SEG:
                        continue
                    # ENTRY = time-reversed exit: reverse order, flip travel
                    # direction, same steer per arc
                    entry = [(-l, s) for (l, s) in reversed(segs)]
                    key = tuple(round(l, 5) for l, _ in entry)
                    if key in seen:
                        continue
                    seen.add(key)
                    L = np.zeros(N_WIGGLE_SEG, np.float32)
                    S = np.zeros(N_WIGGLE_SEG, np.float32)
                    for i, (l, s) in enumerate(entry):
                        L[i] = l * R          # normalized -> metres
                        S[i] = s
                    out_l.append(L)
                    out_s.append(S)
                    # entry starts where the exit ended; mirror for the
                    # opposite approach side is NOT needed: slot frame y
                    # always points toward the aisle by construction of the
                    # generator (aisle side = +normal); heading 0 start
                    out_p.append(np.asarray([end[0] * R, end[1] * R, 0.0],
                                            np.float32))
    return (np.stack(out_l), np.stack(out_s), np.stack(out_p))
