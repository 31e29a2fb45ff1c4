"""Slow, loop-based numpy oracles for differential testing of the JAX kernels.

Written independently of the JAX implementations (scalar math, python loops) so
that agreement is evidence of correctness, not shared bugs. Shapely is not
available in this image, so polygon predicates are implemented from first
principles here and cross-checked against hand-computed cases in the tests.
"""
from __future__ import annotations

import math

import numpy as np


def seg_intersect(p1, p2, p3, p4, tol=0.0):
    """Do segments p1-p2 and p3-p4 intersect (parallel pairs -> False)?"""
    r = (p2[0] - p1[0], p2[1] - p1[1])
    s = (p4[0] - p3[0], p4[1] - p3[1])
    rxs = r[0] * s[1] - r[1] * s[0]
    if rxs == 0:
        return False
    qp = (p3[0] - p1[0], p3[1] - p1[1])
    t = (qp[0] * s[1] - qp[1] * s[0]) / rxs
    u = (qp[0] * r[1] - qp[1] * r[0]) / rxs
    return -tol <= t <= 1 + tol and -tol <= u <= 1 + tol


def ray_segment_distance(angle, p1, p2):
    """Distance from origin along direction `angle` to segment p1-p2 (inf if miss)."""
    c, s = math.cos(angle), math.sin(angle)
    ex, ey = p2[0] - p1[0], p2[1] - p1[1]
    denom = c * ey - s * ex
    if denom == 0:
        return math.inf
    t = (p1[0] * ey - p1[1] * ex) / denom
    u = (p1[0] * s - p1[1] * c) / denom
    if t >= 0 and 0 <= u <= 1:
        return t
    return math.inf


def point_seg_dist(p, a, b):
    ax, ay = a
    bx, by = b
    px, py = p
    abx, aby = bx - ax, by - ay
    denom = abx * abx + aby * aby
    if denom == 0:
        return math.hypot(px - ax, py - ay)
    t = max(0.0, min(1.0, ((px - ax) * abx + (py - ay) * aby) / denom))
    cx, cy = ax + t * abx, ay + t * aby
    return math.hypot(px - cx, py - cy)


def poly_area(verts):
    n = len(verts)
    a = 0.0
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        a += x1 * y2 - x2 * y1
    return abs(a) / 2.0


def convex_poly_intersection_area(subject, clip):
    """Sutherland-Hodgman with python lists (arbitrary precision flow)."""
    def clip_edge(poly, a, b):
        ex, ey = b[0] - a[0], b[1] - a[1]
        out = []
        n = len(poly)
        for i in range(n):
            cur, nxt = poly[i], poly[(i + 1) % n]
            dc = ex * (cur[1] - a[1]) - ey * (cur[0] - a[0])
            dn = ex * (nxt[1] - a[1]) - ey * (nxt[0] - a[0])
            if dc >= 0:
                out.append(cur)
            if (dc >= 0) != (dn >= 0):
                t = dc / (dc - dn)
                out.append((cur[0] + t * (nxt[0] - cur[0]), cur[1] + t * (nxt[1] - cur[1])))
        return out

    poly = [tuple(v) for v in subject]
    for i in range(len(clip)):
        if len(poly) < 3:
            return 0.0
        poly = clip_edge(poly, tuple(clip[i]), tuple(clip[(i + 1) % len(clip)]))
    if len(poly) < 3:
        return 0.0
    return poly_area(poly)


def euler_bicycle_step(x, y, heading, steer, speed, wheel_base, dt, n_iter, n_substeps):
    """Literal reference integrator (env/vehicle.py:88-93) in float64 scalars."""
    h = dt / n_iter
    for _ in range(n_substeps):
        for _ in range(n_iter):
            x += speed * math.cos(heading) * h
            y += speed * math.sin(heading) * h
            heading += speed * math.tan(steer) / wheel_base * h
    return x, y, heading


def random_convex_quad(rng, scale=3.0):
    """Random convex CCW quadrilateral."""
    while True:
        pts = rng.standard_normal((4, 2)) * scale
        c = pts.mean(axis=0)
        ang = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
        order = np.argsort(ang)
        quad = pts[order]
        # ensure strict convexity
        ok = True
        for i in range(4):
            a, b, d = quad[i], quad[(i + 1) % 4], quad[(i + 2) % 4]
            cross = (b[0] - a[0]) * (d[1] - b[1]) - (b[1] - a[1]) * (d[0] - b[0])
            if cross <= 1e-6:
                ok = False
                break
        if ok:
            return quad
