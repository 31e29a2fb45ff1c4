from . import reeds_shepp
from .rs_select import RSPath, find_path, build_action_queue, traj_collides

__all__ = ["reeds_shepp", "RSPath", "find_path", "build_action_queue", "traj_collides"]
