from .transforms import (
    T23,
    T32,
    abc_to_alphabeta,
    alphabeta_to_abc,
    abc_to_dq,
    dq_to_abc,
    alphabeta_to_dq,
    dq_to_alphabeta,
    rotate,
    wrap_angle,
)
from .integrators import make_integrator, euler_step, heun_step, rk4_step

__all__ = [
    "T23",
    "T32",
    "abc_to_alphabeta",
    "alphabeta_to_abc",
    "abc_to_dq",
    "dq_to_abc",
    "alphabeta_to_dq",
    "dq_to_alphabeta",
    "rotate",
    "wrap_angle",
    "make_integrator",
    "euler_step",
    "heun_step",
    "rk4_step",
]
