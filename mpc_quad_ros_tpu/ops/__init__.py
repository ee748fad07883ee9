from .qp import solve_box_qp_pdip, solve_box_qp_projected_newton
from .sqp import MPCConfig, SQPSolver, SolverCarry

__all__ = [
    "solve_box_qp_pdip",
    "solve_box_qp_projected_newton",
    "MPCConfig",
    "SQPSolver",
    "SolverCarry",
]
