from . import reeds_shepp
from .rs_select import (
    RSPath,
    build_action_queue,
    find_path,
    find_path_batch,
    traj_collides,
)
from .ilqr import ILQRConfig, ILQRResult, solve as ilqr_solve, solve_batch as ilqr_solve_batch
from .staging import (
    StagingSet,
    compute_staging,
    pick_goal,
    staging_candidates,
    waypoint_latch,
)

__all__ = ["reeds_shepp", "RSPath", "find_path", "find_path_batch",
           "build_action_queue", "traj_collides", "ILQRConfig", "ILQRResult",
           "ilqr_solve", "ilqr_solve_batch", "StagingSet", "compute_staging",
           "pick_goal", "staging_candidates", "waypoint_latch"]
