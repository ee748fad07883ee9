from .params import QuadParams
from .dynamics import (
    f_nominal,
    f_with_drag,
    a_drag_body,
    rk4_step,
    plant_step,
    plant_substeps,
    compute_a_drag_target,
)
from .rgp import RGPState, rgp_init, rgp_kernel_matrix, rgp_predict, rgp_predict_using_y, rgp_regress, rgp_learn
from .gp import GPState, gp_init, gp_predict, gp_nll, gp_fit
from .ensemble import GPEnsemble
from .selection import (
    prune_dataset,
    distance_maximizing_points,
    sample_random_points,
)

__all__ = [
    "QuadParams",
    "f_nominal",
    "f_with_drag",
    "a_drag_body",
    "rk4_step",
    "plant_step",
    "plant_substeps",
    "compute_a_drag_target",
    "RGPState",
    "rgp_init",
    "rgp_kernel_matrix",
    "rgp_predict",
    "rgp_predict_using_y",
    "rgp_regress",
    "rgp_learn",
    "GPState",
    "gp_init",
    "gp_predict",
    "gp_nll",
    "gp_fit",
    "GPEnsemble",
    "prune_dataset",
    "distance_maximizing_points",
    "sample_random_points",
]
