"""Fixed-step integrator tests against the exact solution of a linear system,
mirroring the reference's solver tests which integrate a known system
(``/root/reference/tests/test_physical_systems/test_solvers.py:18-50``)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import expm

from gym_electric_motor_tpu.ops.integrators import make_integrator

A = np.array([[-12.0, 4.0], [2.0, -9.0]])
B = np.array([1.5, -2.0])
U = 3.0


def rhs(t, y, u):
    return jnp.asarray(A) @ y + jnp.asarray(B) * u


def exact(y0, t):
    # y' = A y + B u  ->  y(t) = e^{At} y0 + A^{-1}(e^{At} - I) B u
    eAt = expm(A * t)
    return eAt @ y0 + np.linalg.solve(A, (eAt - np.eye(2)) @ (B * U))


@pytest.mark.parametrize("kind,tol", [("euler", 2e-2), ("heun", 2e-4), ("rk4", 1e-7),
                                      ("rk45", 1e-7), ("dopri5", 1e-7)])
def test_accuracy(kind, tol):
    integrate = make_integrator(kind, substeps=1)
    y = jnp.array([1.0, -0.5], dtype=jnp.float64 if False else jnp.float32)
    t, dt = 0.0, 1e-3
    for k in range(100):
        y = integrate(rhs, y, t, dt, U)
        t += dt
    ref = exact(np.array([1.0, -0.5]), t)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=tol, atol=tol)


def test_substeps_refine_euler():
    y0 = jnp.array([1.0, -0.5])
    ref = exact(np.array([1.0, -0.5]), 1e-2)
    errs = []
    for n in (1, 4, 16):
        integrate = make_integrator("euler", substeps=n)
        y = integrate(rhs, y0, 0.0, 1e-2, U)
        errs.append(np.max(np.abs(np.asarray(y) - ref)))
    assert errs[2] < errs[1] < errs[0]


def test_rk4_convergence_order():
    # Horizon long enough that truncation error dominates f32 rounding.
    y0 = jnp.array([1.0, -0.5])
    T = 0.2
    ref = exact(np.array([1.0, -0.5]), T)

    def err(n):
        integrate = make_integrator("rk4", substeps=n)
        y = integrate(rhs, y0.astype(jnp.float32), 0.0, T, U)
        return float(np.max(np.abs(np.asarray(y, dtype=np.float64) - ref)))

    e1, e2 = err(2), err(4)
    # 4th order: halving dt should reduce error by ~16x (allow slack for f32)
    assert e2 < e1 / 6
