from .circle import (
    circle_trajectory_accelerating,
    circle_trajectory_constant,
    circle_trajectory_acc_dec,
    square_trajectory,
)
from .waypoints import random_waypoints, line_waypoints
from .polynomial import PiecewisePolynomial4D, sample_polynomial_trajectory
from .minsnap import min_snap_trajectory
from .io import save_sampled_csv, load_sampled_csv, states_from_flat_outputs

__all__ = [
    "circle_trajectory_accelerating",
    "circle_trajectory_constant",
    "circle_trajectory_acc_dec",
    "square_trajectory",
    "random_waypoints",
    "line_waypoints",
    "PiecewisePolynomial4D",
    "sample_polynomial_trajectory",
    "min_snap_trajectory",
    "save_sampled_csv",
    "load_sampled_csv",
    "states_from_flat_outputs",
]
