from .bicycle import VehicleState, clip_action, substep_closed_form, substep_euler, step

__all__ = ["VehicleState", "clip_action", "substep_closed_form", "substep_euler", "step"]
