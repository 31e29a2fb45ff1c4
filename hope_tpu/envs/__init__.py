from .scene import Scene, make_scene, stack_scenes, LEVEL_NAMES, LEVEL_NORMAL, LEVEL_COMPLEX, LEVEL_EXTREM, LEVEL_DLP
from .env import EnvState, ParkingEnv
from .rewards import CONTINUE, ARRIVED, COLLIDED, OUTBOUND, OUTTIME
from .action_mask import ActionMaskTable, build_table, get_steps, choose_action, discrete_actions
from .lidar import beam_angles, vehicle_boundary, lidar_observation
from .map_level import get_map_level, classify_cases

__all__ = [
    "Scene", "make_scene", "stack_scenes", "EnvState", "ParkingEnv",
    "CONTINUE", "ARRIVED", "COLLIDED", "OUTBOUND", "OUTTIME",
    "ActionMaskTable", "build_table", "get_steps", "choose_action",
    "discrete_actions", "beam_angles", "vehicle_boundary", "lidar_observation",
    "LEVEL_NAMES", "LEVEL_NORMAL", "LEVEL_COMPLEX", "LEVEL_EXTREM", "LEVEL_DLP",
    "get_map_level", "classify_cases",
]
