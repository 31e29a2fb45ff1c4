"""Human visualization (reference: pygame render, env/car_parking_base.py:301-411,
and the eval success-CDF plot, evaluation/eval_utils.py:109-148).

The training/eval compute path renders observations on device
(``geometry/raster.py``); this module is only for humans — matplotlib drawings
of scenes, trajectories, and evaluation summaries, written as PNG/GIF files.
"""
from __future__ import annotations

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


# colors matched to the reference's pygame palette (car_parking_base.py:31-38)
OBSTACLE_COLOR = "#969696"   # gray obstacles
DEST_COLOR = "#6496fa"       # blue destination slot
VEHICLE_COLOR = "#1e6432"    # green vehicle
TRAJ_COLOR = "#28a044"


def draw_scene(ax, scene, vehicle_boxes=None, title: str | None = None):
    """Draw one scene: obstacle edges, destination box, start pose, and an
    optional sequence of vehicle footprint boxes (T, 4, 2).

    ``scene`` is a single (unbatched) Scene pytree (numpy or jax arrays).
    """
    edges = np.asarray(scene.edges)
    mask = np.asarray(scene.edge_mask).astype(bool)
    for (x1, y1, x2, y2) in edges[mask]:
        ax.plot([x1, x2], [y1, y2], color=OBSTACLE_COLOR, lw=1.5)

    dest_box = np.asarray(scene.dest_box)
    ax.fill(*np.vstack([dest_box, dest_box[:1]]).T, color=DEST_COLOR, alpha=0.35)
    dest = np.asarray(scene.dest)
    ax.annotate("", xy=(dest[0] + 1.2 * np.cos(dest[2]), dest[1] + 1.2 * np.sin(dest[2])),
                xytext=(dest[0], dest[1]),
                arrowprops=dict(arrowstyle="->", color=DEST_COLOR))

    start = np.asarray(scene.start)
    ax.plot(start[0], start[1], "o", color=VEHICLE_COLOR, ms=4)

    if vehicle_boxes is not None:
        boxes = np.asarray(vehicle_boxes)
        n = len(boxes)
        for i, b in enumerate(boxes):
            alpha = 0.15 + 0.75 * (i + 1) / n
            closed = np.vstack([b, b[:1]])
            ax.plot(closed[:, 0], closed[:, 1], color=VEHICLE_COLOR,
                    alpha=alpha, lw=1.0)
        centers = boxes.mean(axis=1)
        ax.plot(centers[:, 0], centers[:, 1], "-", color=TRAJ_COLOR, lw=1.0,
                alpha=0.8)

    b = np.asarray(scene.bounds)
    ax.set_xlim(b[0], b[1])
    ax.set_ylim(b[2], b[3])
    ax.set_aspect("equal")
    if title:
        ax.set_title(title, fontsize=9)


def save_episode_png(path: str, scene, poses, corners, every: int = 4,
                     title: str | None = None):
    """Render one episode's swept trajectory to a PNG.

    poses: (T, 3) world poses; corners: (4, 2) vehicle footprint corners.
    """
    plt = _mpl()
    poses = np.asarray(poses)
    corners = np.asarray(corners)
    c, s = np.cos(poses[:, 2]), np.sin(poses[:, 2])
    R = np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], -2)  # (T,2,2)
    boxes = poses[:, None, :2] + corners[None] @ np.swapaxes(R, -1, -2)
    fig, ax = plt.subplots(figsize=(6, 6))
    draw_scene(ax, scene, vehicle_boxes=boxes[::every], title=title)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def save_success_cdf(path: str, steps, success, max_steps: int = 200):
    """Cumulative success-vs-steps plot (reference eval_utils.py:109-127)."""
    plt = _mpl()
    steps = np.asarray(steps)
    success = np.asarray(success).astype(bool)
    xs = np.arange(max_steps + 1)
    cdf = [(success & (steps <= x)).mean() for x in xs]
    fig, ax = plt.subplots(figsize=(5, 3.5))
    ax.plot(xs, cdf)
    ax.set_xlabel("episode steps")
    ax.set_ylabel("cumulative success rate")
    ax.set_ylim(0, 1)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def save_reward_curve(path: str, rewards, window: int = 50):
    """Smoothed reward curve (reference train_HOPE_sac.py:272-281)."""
    plt = _mpl()
    r = np.asarray(rewards, dtype=np.float64)
    if len(r) == 0:
        return
    k = min(window, max(1, len(r) // 5))
    smooth = np.convolve(r, np.ones(k) / k, mode="valid")
    fig, ax = plt.subplots(figsize=(5, 3.5))
    ax.plot(r, alpha=0.25, lw=0.7, label="chunk mean")
    ax.plot(np.arange(k - 1, len(r)), smooth, lw=1.5, label=f"smoothed ({k})")
    ax.set_xlabel("chunk")
    ax.set_ylabel("reward")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def save_record(path: str, metrics: dict):
    """Persist per-episode eval arrays (reference record.data pickle —
    eval_utils.py:129-137) as a portable .npz."""
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in metrics.items()})


def animate_episode(path: str, scene, poses, corners, fps: int = 10,
                    live: bool = False):
    """Frame-by-frame episode playback — the live-rendering equivalent of the
    reference's pygame window loop (``env/car_parking_base.py:383-411``).

    Writes an animated GIF at ``path`` (always — headless containers have no
    display); with ``live`` additionally tries to open an interactive window
    and play the episode in real time, silently falling back to file-only when
    no display is available.

    Args:
      scene: single Scene pytree.  poses: (T, 3).  corners: (4, 2) footprint.
    """
    import matplotlib

    if live:
        try:  # pragma: no cover - needs a display
            matplotlib.use("TkAgg")
        except Exception:
            matplotlib.use("Agg")
            live = False
    else:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    poses = np.asarray(poses)
    c, s = np.cos(poses[:, 2]), np.sin(poses[:, 2])
    rot = np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], -2)
    boxes = np.einsum("tij,kj->tki", rot, np.asarray(corners)) \
        + poses[:, None, :2]

    fig, ax = plt.subplots(figsize=(6, 6))
    draw_scene(ax, scene)
    (outline,) = ax.plot([], [], color=VEHICLE_COLOR, lw=1.6)
    (trail,) = ax.plot([], [], "-", color=TRAJ_COLOR, lw=1.0, alpha=0.8)

    def frame(t):
        closed = np.vstack([boxes[t], boxes[t][:1]])
        outline.set_data(closed[:, 0], closed[:, 1])
        centers = boxes[: t + 1].mean(axis=1)
        trail.set_data(centers[:, 0], centers[:, 1])
        return outline, trail

    anim = animation.FuncAnimation(fig, frame, frames=len(poses),
                                   interval=1000 // fps, blit=True)
    anim.save(path, writer=animation.PillowWriter(fps=fps))
    if live:  # pragma: no cover - needs a display
        plt.show()
    plt.close(fig)
