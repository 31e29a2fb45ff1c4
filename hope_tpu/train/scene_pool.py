"""Device-resident scenario pools.

Pre-generates banks of procedural scenes per level (device-side generation,
envs/scenario_gen.py) and samples DLP resets, all padded to one unified Scene
shape so mixed-level lockstep batches gather fresh scenarios with one device
op per reset wave.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EnvConfig
from ..envs.dlp import DLPDataset
from ..envs.scenario_gen import generate_bank
from ..envs.scene import Scene

LEVEL_ORDER = ["Normal", "Complex", "Extrem", "dlp"]


def pad_scene_batch(scene: Scene, max_edges: int, max_polys: int) -> Scene:
    """Pad (or truncate) a batched Scene's edge arrays to a unified budget.

    Truncation is only safe when the dropped tail is all padding — procedural
    scenes use 72 fixed slots and DLP scenes compact live edges to the front.
    """
    e = scene.edges.shape[-2]
    if e == max_edges:
        return scene
    if e > max_edges:
        dropped = scene.edge_mask[..., max_edges:]
        if bool(jnp.any(dropped)):
            raise ValueError(
                f"cannot truncate scene batch from {e} to {max_edges} edges: live edges in tail"
            )
        return scene.replace(
            edges=scene.edges[..., :max_edges, :],
            edge_mask=scene.edge_mask[..., :max_edges],
            edge_poly=scene.edge_poly[..., :max_edges],
        )
    pad = max_edges - e
    return scene.replace(
        edges=jnp.pad(scene.edges, ((0, 0), (0, pad), (0, 0))),
        edge_mask=jnp.pad(scene.edge_mask, ((0, 0), (0, pad))),
        edge_poly=jnp.pad(scene.edge_poly, ((0, 0), (0, pad))),
    )


class ScenePool:
    """Unified pool: [Normal | Complex | Extrem | dlp] segments of size
    ``per_level`` each; ``index(level_id, slot)`` -> flat pool index."""

    def __init__(self, env_cfg: EnvConfig, per_level: int = 256,
                 dlp: DLPDataset | None = None, seed: int = 0,
                 include_dlp: bool = True, stream_dlp: bool = False):
        """``stream_dlp``: keep the DLP bank off-device — each refresh's case
        batch is host-gathered by the native mmap'd SceneBank, and the NEXT
        refresh's gather runs as an async prefetch overlapping device compute
        (the scalable path for banks that outgrow HBM).  Curriculum case ids
        then take effect one refresh late (the prefetch was issued with the
        previous refresh's choices — same one-step lag as the reset queue)."""
        self.env_cfg = env_cfg
        self.per_level = per_level
        self.include_dlp = include_dlp
        self.stream: "StreamingDLP | None" = None
        if include_dlp and stream_dlp and dlp is None:
            from ..envs.dlp import StreamingDLP

            self.stream = StreamingDLP(env_cfg=env_cfg)
            self.dlp = None
        else:
            self.dlp = dlp if dlp is not None else (
                DLPDataset(env_cfg=env_cfg) if include_dlp else None)
        self.key = jax.random.PRNGKey(seed)
        self.pool: Scene | None = None
        self.dlp_case_ids: np.ndarray | None = None
        self.refresh()

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def refresh(self, dlp_case_ids: np.ndarray | None = None):
        """Regenerate all procedural segments + resample DLP scenes.

        dlp_case_ids: optional (per_level,) case ids from the curriculum;
        random when omitted.
        """
        cfg = self.env_cfg
        parts = []
        for level in ["Normal", "Complex", "Extrem"]:
            scenes, ok = generate_bank(self._next_key(), level=level, n=self.per_level)
            # regenerate rare failures by swapping in a clone of a valid scene
            ok = np.asarray(ok)
            if not ok.all():
                good = int(np.argmax(ok))
                idx = np.where(ok, np.arange(len(ok)), good)
                scenes = jax.tree.map(lambda x: x[jnp.asarray(idx)], scenes)
            parts.append(pad_scene_batch(scenes, cfg.max_edges, cfg.max_obstacles))
        if self.include_dlp:
            src = self.stream if self.stream is not None else self.dlp
            ids = (np.random.default_rng(int(jax.random.randint(self._next_key(), (), 0, 2**31 - 1)))
                   .integers(0, src.n_cases, self.per_level)
                   if dlp_case_ids is None else np.asarray(dlp_case_ids))
            keys = jax.random.split(self._next_key(), self.per_level)
            if self.stream is not None:
                if self.stream._pending_ids is None:      # cold start
                    self.stream.prefetch(ids)
                dlp_scenes, used = self.stream.take_scenes(keys)
                self.stream.prefetch(ids)                 # overlap next refresh
                self.dlp_case_ids = used
            else:
                self.dlp_case_ids = ids
                dlp_scenes = self.dlp.batch_reset(keys, jnp.asarray(ids))
            parts.append(pad_scene_batch(dlp_scenes, cfg.max_edges, cfg.max_obstacles))
        self.pool = jax.tree.map(lambda *xs: jnp.concatenate(xs), *parts)

    def flat_index(self, level_ids: np.ndarray, slots: np.ndarray) -> np.ndarray:
        return level_ids * self.per_level + slots

    def gather(self, flat_idx) -> Scene:
        idx = jnp.asarray(flat_idx)
        return jax.tree.map(lambda x: x[idx], self.pool)

    @property
    def n_levels(self) -> int:
        return 4 if self.include_dlp else 3
