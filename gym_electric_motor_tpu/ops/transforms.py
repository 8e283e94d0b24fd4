"""Clarke / Park reference-frame transforms as branch-free JAX ops.

Semantics match the reference's static transforms
(``/root/reference/src/gym_electric_motor/physical_systems/electric_motors/three_phase_motor.py:16-118``):

* ``t_23`` (Clarke, amplitude-invariant): abc -> alpha/beta
* ``t_32`` (inverse Clarke): alpha/beta -> abc
* ``q`` (Park): dq -> alpha/beta rotation by the electrical angle epsilon
* ``q_inv``: alpha/beta -> dq (rotation by -epsilon)

All functions operate on the *last* axis so they vmap/batch trivially; the
2x2 rotation is written as fused elementwise math (VPU-friendly) rather than a
tiny matmul.
"""

from __future__ import annotations

import jax.numpy as jnp

_SQRT3_2 = 0.8660254037844386  # sqrt(3) / 2

# Amplitude-invariant Clarke transform matrices (as constants; used by tests
# and by code that prefers the matrix form).
T23 = (2.0 / 3.0) * jnp.array([[1.0, -0.5, -0.5], [0.0, _SQRT3_2, -_SQRT3_2]])
T32 = jnp.array([[1.0, 0.0], [-0.5, _SQRT3_2], [-0.5, -_SQRT3_2]])


def abc_to_alphabeta(abc):
    """Clarke transform. ``abc``: (..., 3) -> (..., 2)."""
    a, b, c = abc[..., 0], abc[..., 1], abc[..., 2]
    alpha = (2.0 / 3.0) * (a - 0.5 * b - 0.5 * c)
    beta = (2.0 / 3.0) * _SQRT3_2 * (b - c)
    return jnp.stack([alpha, beta], axis=-1)


def alphabeta_to_abc(alphabeta):
    """Inverse Clarke transform. ``alphabeta``: (..., 2) -> (..., 3)."""
    alpha, beta = alphabeta[..., 0], alphabeta[..., 1]
    a = alpha
    b = -0.5 * alpha + _SQRT3_2 * beta
    c = -0.5 * alpha - _SQRT3_2 * beta
    return jnp.stack([a, b, c], axis=-1)


def rotate(xy, epsilon):
    """Rotate the (..., 2) vector ``xy`` by angle ``epsilon`` (Park ``q``)."""
    cos = jnp.cos(epsilon)
    sin = jnp.sin(epsilon)
    x, y = xy[..., 0], xy[..., 1]
    return jnp.stack([cos * x - sin * y, sin * x + cos * y], axis=-1)


def dq_to_alphabeta(dq, epsilon):
    """Park ``q``: dq -> alpha/beta using the electrical angle."""
    return rotate(dq, epsilon)


def alphabeta_to_dq(alphabeta, epsilon):
    """Park ``q_inv``: alpha/beta -> dq (rotation by -epsilon)."""
    return rotate(alphabeta, -epsilon)


def dq_to_abc(dq, epsilon):
    """dq -> abc (Park then inverse Clarke)."""
    return alphabeta_to_abc(rotate(dq, epsilon))


def abc_to_dq(abc, epsilon):
    """abc -> dq (Clarke then inverse Park)."""
    return rotate(abc_to_alphabeta(abc), -epsilon)


def wrap_angle(epsilon):
    """Wrap an angle to (-pi, pi].

    Matches the reference's ``eps % 2pi; if eps > pi: eps -= 2pi`` logic
    (``physical_systems.py:520-522``) without data-dependent branching.
    """
    two_pi = 2.0 * jnp.pi
    eps = jnp.mod(epsilon, two_pi)
    return jnp.where(eps > jnp.pi, eps - two_pi, eps)
