"""Array-native scene representation.

The reference keeps scenes as lists of shapely LinearRings
(``env/parking_map_normal.py``, ``env/parking_map_dlp.py``); here a scene is a
fixed-shape pytree of padded edge tensors so thousands of scenarios batch into
lockstep device arrays.
"""
from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

# difficulty levels (reference env/map_level.py)
LEVEL_NORMAL = 0
LEVEL_COMPLEX = 1
LEVEL_EXTREM = 2
LEVEL_DLP = 3
LEVEL_NAMES = {LEVEL_NORMAL: "Normal", LEVEL_COMPLEX: "Complex",
               LEVEL_EXTREM: "Extrem", LEVEL_DLP: "dlp"}


@flax.struct.dataclass
class Scene:
    """One parking scenario (or a batch, with leading dims).

    Attributes:
      edges: (E, 4) obstacle segments [x1, y1, x2, y2]; padded rows are zeros.
      edge_mask: (E,) live-edge mask.
      edge_poly: (E,) int32 polygon id per edge (for the BEV rasterizer).
      n_polys: () int32 number of live polygons.
      start: (3,) start pose.
      dest: (3,) destination pose.
      dest_box: (4, 2) destination box corners (CCW, reference corner order).
      bounds: (4,) [xmin, xmax, ymin, ymax].
      level: () int32 difficulty id.
      case_id: () int32 scenario id (procedural: 0 bay / 1 parallel; DLP: case).
    """

    edges: jnp.ndarray
    edge_mask: jnp.ndarray
    edge_poly: jnp.ndarray
    n_polys: jnp.ndarray
    start: jnp.ndarray
    dest: jnp.ndarray
    dest_box: jnp.ndarray
    bounds: jnp.ndarray
    level: jnp.ndarray
    case_id: jnp.ndarray


def pack_polygons(rings, max_edges: int, max_polys: int):
    """Pack a list of polygon rings (each (V, 2) ndarray, closure implied) into
    padded edge arrays.  Host-side helper (numpy)."""
    edges = np.zeros((max_edges, 4), np.float32)
    mask = np.zeros(max_edges, bool)
    poly = np.zeros(max_edges, np.int32)
    k = 0
    n_polys = 0
    for ring in rings[:max_polys]:
        ring = np.asarray(ring, np.float64)
        # drop an explicitly repeated closing vertex
        if len(ring) > 1 and np.allclose(ring[0], ring[-1]):
            ring = ring[:-1]
        v = len(ring)
        if v < 2:
            continue
        for i in range(v):
            if k >= max_edges:
                break
            a, b = ring[i], ring[(i + 1) % v]
            edges[k] = [a[0], a[1], b[0], b[1]]
            mask[k] = True
            poly[k] = n_polys
            k += 1
        n_polys += 1
    return edges, mask, poly, n_polys


def make_scene(rings, start, dest, bounds, level, case_id, dest_box,
               max_edges: int = 256, max_polys: int = 64) -> Scene:
    """Host-side scene constructor from numpy polygon rings."""
    edges, mask, poly, n_polys = pack_polygons(rings, max_edges, max_polys)
    return Scene(
        edges=jnp.asarray(edges),
        edge_mask=jnp.asarray(mask),
        edge_poly=jnp.asarray(poly),
        n_polys=jnp.asarray(n_polys, jnp.int32),
        start=jnp.asarray(np.asarray(start, np.float32)),
        dest=jnp.asarray(np.asarray(dest, np.float32)),
        dest_box=jnp.asarray(np.asarray(dest_box, np.float32)),
        bounds=jnp.asarray(np.asarray(bounds, np.float32)),
        level=jnp.asarray(level, jnp.int32),
        case_id=jnp.asarray(case_id, jnp.int32),
    )


def stack_scenes(scenes) -> Scene:
    """Stack host-built scenes into one batched Scene pytree."""
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
