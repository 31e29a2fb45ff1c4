"""Branch-free, vmappable Reeds-Shepp curve expansion.

TPU-native redesign of the reference analytic planner (``env/reeds_shepp.py``):
instead of Python loops appending PATH objects per word (reference
``generate_path`` :540-557), all 46 word variants are evaluated in parallel as
masked fixed-shape arrays — per scenario this is pure scalar math, so vmapping
over thousands of scenarios is free.  Discretization (reference
``generate_local_course`` :452-537) becomes uniform arc-length sampling into a
fixed (N, 3) pose buffer with a validity mask, and the cost-ordered
collision-checked selection (reference ``car_parking_base.py:413-450``) becomes
a masked argmin cascade (see ``rs_select.py``).

Candidate layout: ``lengths (46, 5)`` signed segment lengths (curvature-
normalized), ``steers (46, 5)`` in {-1 (R), 0 (S), +1 (L)}, ``valid (46,)``.
Segments beyond a word's arity are zero-length with steer 0.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

PI = math.pi
MAX_LENGTH = 1000.0
N_WORDS = 46
N_SEG = 5


def wrap_pi(theta):
    """Regulate angle to (-pi, pi], matching reference ``M`` (reeds_shepp.py:581-592)."""
    phi = jnp.mod(theta, 2.0 * PI)         # [0, 2pi)
    return jnp.where(phi > PI, phi - 2.0 * PI, phi)


def _polar(x, y):
    return jnp.hypot(x, y), jnp.arctan2(y, x)


# ---------------------------------------------------------------------------
# base word formulas — each returns (valid, t, u, v); invalid slots hold zeros.
# Math follows the canonical Reeds-Shepp equations (reference reeds_shepp.py:79-449).
# ---------------------------------------------------------------------------


def _lsl(x, y, phi):
    u, t = _polar(x - jnp.sin(phi), y - 1.0 + jnp.cos(phi))
    v = wrap_pi(phi - t)
    valid = (t >= 0.0) & (v >= 0.0)
    return valid, t, u, v


def _lsr(x, y, phi):
    u1, t1 = _polar(x + jnp.sin(phi), y - 1.0 - jnp.cos(phi))
    u1sq = u1 * u1
    ok = u1sq >= 4.0
    u = jnp.sqrt(jnp.maximum(u1sq - 4.0, 0.0))
    theta = jnp.arctan2(2.0, jnp.where(u == 0.0, 1e-30, u))
    t = wrap_pi(t1 + theta)
    v = wrap_pi(t - phi)
    valid = ok & (t >= 0.0) & (v >= 0.0)
    return valid, t, u, v


def _lrl(x, y, phi):
    u1, t1 = _polar(x - jnp.sin(phi), y - 1.0 + jnp.cos(phi))
    ok = u1 <= 4.0
    u = -2.0 * jnp.arcsin(jnp.clip(0.25 * u1, -1.0, 1.0))
    t = wrap_pi(t1 + 0.5 * u + PI)
    v = wrap_pi(phi - t + u)
    valid = ok & (t >= 0.0) & (u <= 0.0)
    return valid, t, u, v


def _sls(x, y, phi):
    phi = wrap_pi(phi)
    ok_ang = (phi > 0.0) & (phi < PI * 0.99)
    tan_phi = jnp.tan(jnp.where(ok_ang, phi, 0.5))  # guarded
    xd = -y / tan_phi + x
    t = xd - jnp.tan(phi / 2.0)
    u = phi
    r = jnp.sqrt((x - xd) ** 2 + y ** 2)
    v_pos = r - jnp.tan(phi / 2.0)
    v_neg = -r - jnp.tan(phi / 2.0)
    v = jnp.where(y > 0.0, v_pos, v_neg)
    valid = ok_ang & (y != 0.0)
    return valid, t, u, v


def _tau_omega(u, v, xi, eta, phi):
    delta = wrap_pi(u - v)
    A = jnp.sin(u) - jnp.sin(delta)
    B = jnp.cos(u) - jnp.cos(delta) - 1.0
    t1 = jnp.arctan2(eta * A - xi * B, xi * A + eta * B)
    t2 = 2.0 * (jnp.cos(delta) - jnp.cos(v) - jnp.cos(u)) + 3.0
    tau = jnp.where(t2 < 0.0, wrap_pi(t1 + PI), wrap_pi(t1))
    omega = wrap_pi(tau - u + v - phi)
    return tau, omega


def _lrlrn(x, y, phi):
    xi = x + jnp.sin(phi)
    eta = y - 1.0 - jnp.cos(phi)
    rho = 0.25 * (2.0 + jnp.sqrt(xi * xi + eta * eta))
    ok = rho <= 1.0
    u = jnp.arccos(jnp.clip(rho, -1.0, 1.0))
    t, v = _tau_omega(u, -u, xi, eta, phi)
    valid = ok & (t >= 0.0) & (v <= 0.0)
    return valid, t, u, v


def _lrlrp(x, y, phi):
    xi = x + jnp.sin(phi)
    eta = y - 1.0 - jnp.cos(phi)
    rho = (20.0 - xi * xi - eta * eta) / 16.0
    ok = (rho >= 0.0) & (rho <= 1.0)
    u = -jnp.arccos(jnp.clip(rho, -1.0, 1.0))
    ok = ok & (u >= -0.5 * PI)
    t, v = _tau_omega(u, u, xi, eta, phi)
    valid = ok & (t >= 0.0) & (v >= 0.0)
    return valid, t, u, v


def _lrsl(x, y, phi):
    xi = x - jnp.sin(phi)
    eta = y - 1.0 + jnp.cos(phi)
    rho, theta = _polar(xi, eta)
    ok = rho >= 2.0
    r = jnp.sqrt(jnp.maximum(rho * rho - 4.0, 0.0))
    u = 2.0 - r
    t = wrap_pi(theta + jnp.arctan2(r, -2.0))
    v = wrap_pi(phi - 0.5 * PI - t)
    valid = ok & (t >= 0.0) & (u <= 0.0) & (v <= 0.0)
    return valid, t, u, v


def _lrsr(x, y, phi):
    xi = x + jnp.sin(phi)
    eta = y - 1.0 - jnp.cos(phi)
    rho, theta = _polar(-eta, xi)
    ok = rho >= 2.0
    t = theta
    u = 2.0 - rho
    v = wrap_pi(t + 0.5 * PI - phi)
    valid = ok & (t >= 0.0) & (u <= 0.0) & (v <= 0.0)
    return valid, t, u, v


def _lrslr(x, y, phi):
    xi = x + jnp.sin(phi)
    eta = y - 1.0 - jnp.cos(phi)
    rho, _ = _polar(xi, eta)
    ok = rho >= 2.0
    u = 4.0 - jnp.sqrt(jnp.maximum(rho * rho - 4.0, 0.0))
    ok = ok & (u <= 0.0)
    t = wrap_pi(jnp.arctan2((4.0 - u) * xi - 2.0 * eta, -2.0 * xi + (u - 4.0) * eta))
    v = wrap_pi(t - phi)
    valid = ok & (t >= 0.0) & (v >= 0.0)
    return valid, t, u, v


# ---------------------------------------------------------------------------
# the word table: (base_fn, input variant, segment arrangement)
# ---------------------------------------------------------------------------

L, S, R = 1, 0, -1

# input variants: (sx, sy, sphi, backwards)
_ID = (1, 1, 1, False)
_TIME = (-1, 1, -1, False)     # timeflip: negate x, phi; negate output lengths
_REFL = (1, -1, -1, False)     # reflect: negate y, phi; swap L<->R
_BOTH = (-1, -1, 1, False)
_ID_B = (1, 1, 1, True)        # backwards: (xb, yb) input, reversed segment order
_TIME_B = (-1, 1, -1, True)
_REFL_B = (1, -1, -1, True)
_BOTH_B = (-1, -1, 1, True)


def _build_table():
    """Static word table. Each entry:
    (fn, variant, seg_pattern, steer_pattern)
    seg_pattern: tuple of ('t'|'u'|'v'|float, sign) per segment — floats are the
    fixed ±pi/2 arcs of the CCSC/CCSCC families.
    steer_pattern: tuple of steers for the *un-reflected* word; reflection and
    timeflip signs are applied at build time.
    """
    T = []

    def add(fn, variant, segs, steers):
        sx, sy, sphi, backwards = variant
        neg = (sx == -1 and sphi == -1) or (sx == -1 and sy == -1 and sphi == 1)
        # timeflip (x,phi negated, or both-flip) negates lengths
        negate = sx == -1
        refl = sy == -1
        st = tuple((-s if refl else s) for s in steers)
        sg = tuple((sym, -sgn if negate else sgn) for (sym, sgn) in segs)
        if backwards:
            sg = tuple(reversed(sg))
            st = tuple(reversed(st))
        T.append((fn, (sx, sy, sphi, backwards), sg, st))
        del neg

    # SCS (reference reeds_shepp.py:120-130)
    add(_sls, _ID, (("t", 1), ("u", 1), ("v", 1)), (S, L, S))
    add(_sls, _REFL, (("t", 1), ("u", 1), ("v", 1)), (S, L, S))

    # CSC (:152-185) — LSL/LSR x 4 variants
    for fn, steers in ((_lsl, (L, S, L)), (_lsr, (L, S, R))):
        for var in (_ID, _TIME, _REFL, _BOTH):
            add(fn, var, (("t", 1), ("u", 1), ("v", 1)), steers)

    # CCC (:188-225) — LRL x 4 + backwards x 4
    for var in (_ID, _TIME, _REFL, _BOTH):
        add(_lrl, var, (("t", 1), ("u", 1), ("v", 1)), (L, R, L))
    for var in (_ID_B, _TIME_B, _REFL_B, _BOTH_B):
        add(_lrl, var, (("t", 1), ("u", 1), ("v", 1)), (L, R, L))

    # CCCC (:275-308) — LRLRn [t,u,-u,v], LRLRp [t,u,u,v], x4 each
    for var in (_ID, _TIME, _REFL, _BOTH):
        add(_lrlrn, var, (("t", 1), ("u", 1), ("u", -1), ("v", 1)), (L, R, L, R))
    for var in (_ID, _TIME, _REFL, _BOTH):
        add(_lrlrp, var, (("t", 1), ("u", 1), ("u", 1), ("v", 1)), (L, R, L, R))

    # CCSC (:342-411) — LRSL [t,-pi/2,u,v] LRSR likewise, x4, + backwards x8
    half = 0.5 * PI
    for fn, steers in ((_lrsl, (L, R, S, L)), (_lrsr, (L, R, S, R))):
        for var in (_ID, _TIME, _REFL, _BOTH):
            add(fn, var, (("t", 1), (-half, 1), ("u", 1), ("v", 1)), steers)
    for fn, steers in ((_lrsl, (L, R, S, L)), (_lrsr, (L, R, S, R))):
        for var in (_ID_B, _TIME_B, _REFL_B, _BOTH_B):
            add(fn, var, (("t", 1), (-half, 1), ("u", 1), ("v", 1)), steers)

    # CCSCC (:432-449) — LRSLR [t,-pi/2,u,-pi/2,v] x4
    for var in (_ID, _TIME, _REFL, _BOTH):
        add(_lrslr, var, (("t", 1), (-half, 1), ("u", 1), (-half, 1), ("v", 1)),
            (L, R, S, L, R))

    assert len(T) == N_WORDS, len(T)
    return T


_TABLE = _build_table()

# static steer matrix (46, 5)
import numpy as _np

_STEERS = _np.zeros((N_WORDS, N_SEG), _np.float32)
for _i, (_, _, _sg, _st) in enumerate(_TABLE):
    for _j, _s in enumerate(_st):
        _STEERS[_i, _j] = _s


class RSCandidates(NamedTuple):
    lengths: jnp.ndarray   # (46, 5) signed, curvature-normalized
    steers: jnp.ndarray    # (46, 5) in {-1, 0, 1}
    valid: jnp.ndarray     # (46,) bool
    L: jnp.ndarray         # (46,) total normalized length


def all_words(x, y, phi) -> RSCandidates:
    """Evaluate every RS word for one normalized goal (x, y, phi).

    The python loop over the static 46-entry table unrolls at trace time into
    one fused computation; vmap over scenarios for batching.
    """
    lengths = []
    valids = []
    backwards_xy = (x * jnp.cos(phi) + y * jnp.sin(phi),
                    x * jnp.sin(phi) - y * jnp.cos(phi))
    for fn, (sx, sy, sphi, backwards) in [(e[0], e[1]) for e in _TABLE]:
        bx, by = backwards_xy if backwards else (x, y)
        ok, t, u, v = fn(sx * bx, sy * by, sphi * phi)
        valids.append(ok)
        lengths.append((t, u, v))

    out_len = []
    for i, (fn, variant, segs, steers) in enumerate(_TABLE):
        t, u, v = lengths[i]
        row = []
        for sym, sgn in segs:
            if sym == "t":
                row.append(sgn * t)
            elif sym == "u":
                row.append(sgn * u)
            elif sym == "v":
                row.append(sgn * v)
            else:
                row.append(jnp.full_like(t, sgn * sym))
        while len(row) < N_SEG:
            row.append(jnp.zeros_like(t))
        out_len.append(jnp.stack(row))

    lengths_arr = jnp.stack(out_len)                    # (46, 5)
    valid = jnp.stack(valids)                           # (46,)
    Ltot = jnp.sum(jnp.abs(lengths_arr), axis=-1)
    # zero-length / overlong candidates are invalid (reference set_path:68-73)
    valid = valid & (Ltot >= 0.001) & (Ltot < MAX_LENGTH)
    lengths_arr = jnp.where(valid[:, None], lengths_arr, 0.0)
    return RSCandidates(lengths_arr, jnp.asarray(_STEERS), valid,
                        jnp.where(valid, Ltot, jnp.inf))


def goal_to_local(start, goal, maxc):
    """Normalize the goal into the start frame scaled by max curvature
    (reference generate_path :540-548)."""
    dx = goal[0] - start[0]
    dy = goal[1] - start[1]
    dth = goal[2] - start[2]
    c = jnp.cos(start[2])
    s = jnp.sin(start[2])
    return (c * dx + s * dy) * maxc, (-s * dx + c * dy) * maxc, dth


def candidates(start, goal, maxc) -> RSCandidates:
    """All word candidates for one (start, goal) pair; lengths stay normalized."""
    x, y, phi = goal_to_local(start, goal, maxc)
    return all_words(x, y, phi)


def optimal_length(start, goal, maxc):
    """Length (metres) of the shortest RS path — the ``calc_optimal_path(...).L``
    quantity used by the rs_dist reward (reference car_parking_base.py:192-198)."""
    cand = candidates(start, goal, maxc)
    return jnp.min(cand.L) / maxc


def sample_path(lengths, steers, start, maxc, n_points, step_m):
    """Discretize one candidate into a fixed (N, 3) pose buffer + mask.

    Uniform arc-length sampling at ``step_m`` metres (reference uses
    0.1 m — generate_local_course with step_size*maxc), with the exact path
    endpoint always included as the last live sample.

    Args:
      lengths: (5,) signed normalized segment lengths.
      steers: (5,) in {-1, 0, 1}.
      start: (3,) world start pose.
      maxc: max curvature scalar.
      n_points: static sample budget N.
      step_m: metres between samples.

    Returns:
      poses: (N, 3) world poses; dead samples clamp to the path end.
      mask: (N,) bool live samples.
      dirs: (N,) float — +1 forward / -1 backward per sample.
    """
    n_seg = lengths.shape[0]          # 5 for RS words; larger for wiggle plans
    abs_len = jnp.abs(lengths)
    cum = jnp.cumsum(abs_len)
    total = cum[-1]
    starts_cum = jnp.concatenate([jnp.zeros(1), cum[:-1]])

    # segment start poses in the normalized local frame (unit curvature);
    # unrolled over the segments (no scan: tiny fixed trip count)
    seg_starts = []
    x0 = y0 = th0 = jnp.zeros(())
    for i in range(n_seg):
        seg_starts.append(jnp.stack([x0, y0, th0]))
        l, sig_i = lengths[i], steers[i]
        straight = sig_i == 0.0
        x0 = jnp.where(straight, x0 + l * jnp.cos(th0),
                       x0 + sig_i * (jnp.sin(th0 + sig_i * l) - jnp.sin(th0)))
        y0 = jnp.where(straight, y0 + l * jnp.sin(th0),
                       y0 - sig_i * (jnp.cos(th0 + sig_i * l) - jnp.cos(th0)))
        th0 = th0 + sig_i * l
    seg_start_poses = jnp.stack(seg_starts)            # (N_SEG, 3)

    step_n = step_m * maxc  # normalized step
    s = jnp.arange(n_points) * step_n
    mask = s <= total + 0.5 * step_n
    s = jnp.minimum(s, total)
    # force last live sample onto the exact endpoint
    live_cnt = jnp.sum(mask)
    s = jnp.where(jnp.arange(n_points) == live_cnt - 1, total, s)

    # segment lookup as compare-sum + one-hot contraction instead of
    # searchsorted + gathers: gathers serialize badly on TPU under vmap,
    # while these (N, N_SEG) contractions fuse on the VPU
    seg_idx = jnp.clip(
        jnp.sum(cum[None, :] <= s[:, None], axis=1), 0, n_seg - 1
    )
    onehot = (seg_idx[:, None] == jnp.arange(n_seg)[None, :]).astype(s.dtype)
    base = onehot @ seg_start_poses                    # (N, 3)
    l_seg = onehot @ lengths
    sig = onehot @ steers
    p = jnp.clip(s - onehot @ starts_cum, 0.0, None)
    ps = jnp.sign(l_seg) * p                           # signed arc progress

    th0 = base[:, 2]
    straight = sig == 0.0
    x = jnp.where(straight, base[:, 0] + ps * jnp.cos(th0),
                  base[:, 0] + sig * (jnp.sin(th0 + sig * ps) - jnp.sin(th0)))
    y = jnp.where(straight, base[:, 1] + ps * jnp.sin(th0),
                  base[:, 1] - sig * (jnp.cos(th0 + sig * ps) - jnp.cos(th0)))
    th = th0 + sig * ps

    # local normalized -> world (reference calc_all_paths :47-52)
    c0, s0 = jnp.cos(start[2]), jnp.sin(start[2])
    wx = (c0 * x - s0 * y) / maxc + start[0]
    wy = (s0 * x + c0 * y) / maxc + start[1]
    wth = wrap_pi(th + start[2])

    dirs = jnp.where(jnp.sign(l_seg) >= 0, 1.0, -1.0)
    return jnp.stack([wx, wy, wth], axis=-1), mask, dirs
