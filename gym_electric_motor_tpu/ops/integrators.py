"""Fixed-step ODE integrators for the per-control-cycle hot loop.

The reference integrates each sub-interval with scipy solvers whose RHS calls
back into Python (``/root/reference/src/gym_electric_motor/physical_systems/solvers.py``).
On TPU the integration must be a pure traced function so XLA can fuse the
whole env step into one kernel.  We therefore provide fixed-step explicit
schemes:

* ``euler``  - matches the reference's ``EulerSolver`` (``solvers.py:79-136``)
  including the ``nsteps`` sub-cycling, used for bit-parity testing.
* ``heun``   - 2nd-order, one extra RHS evaluation.
* ``rk4``    - classic 4th order; the default replacement for the reference's
  adaptive dopri5 (``solvers.py:139-184``) at the small control periods
  (tau = 1e-5 .. 1e-4 s) used by all 54 environments.

Each integrator has signature ``(f, y, t, dt, *args) -> y'`` where ``f(t, y,
*args)`` returns dy/dt.  ``substeps`` cuts ``dt`` into equal sub-cycles (a
static Python int, unrolled at trace time; the loop count is <= 4 in
practice).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def euler_step(f, y, t, dt, *args):
    return y + dt * f(t, y, *args)


def heun_step(f, y, t, dt, *args):
    k1 = f(t, y, *args)
    k2 = f(t + dt, y + dt * k1, *args)
    return y + 0.5 * dt * (k1 + k2)


def rk4_step(f, y, t, dt, *args):
    half = 0.5 * dt
    k1 = f(t, y, *args)
    k2 = f(t + half, y + half * k1, *args)
    k3 = f(t + half, y + half * k2, *args)
    k4 = f(t + dt, y + dt * k3, *args)
    return y + (dt / 6.0) * (k1 + 2.0 * (k2 + k3) + k4)


# Dormand-Prince 5(4) coefficients — the tableau behind the reference's
# default ``ScipyOdeSolver(integrator='dopri5')`` (solvers.py:139-184).  At
# the fixed control periods (tau <= 1e-4 s) the adaptive step control is
# unnecessary, so the 5th-order solution is evaluated at fixed dt; XLA
# unrolls the 6 RHS evaluations into one fused kernel.
_DP_A = (
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
)
_DP_C = (1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0)
_DP_B = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84)


def rk45_step(f, y, t, dt, *args):
    ks = [f(t, y, *args)]
    for ci, ai in zip(_DP_C, _DP_A):
        y_stage = y
        for a, k in zip(ai, ks):
            y_stage = y_stage + dt * a * k
        ks.append(f(t + ci * dt, y_stage, *args))
    out = y
    for b, k in zip(_DP_B, ks):
        out = out + dt * b * k
    return out


# 4th-order embedded solution weights of the Dormand-Prince pair — the
# difference to _DP_B is the local error estimate driving the adaptive
# substep controller below (same pair scipy's dopri5 uses internally).
_DP_B4 = (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
          187 / 2100, 1 / 40)


def rk45_adaptive_step(f, y, t, dt, *args, rtol=1e-4, atol=1e-5,
                       max_sub=256):
    """Error-monitored Dormand-Prince over ONE fixed control period: the
    outer ``dt`` stays the env's tau (static shapes, one call per cycle)
    while the INNER step size adapts via the embedded 4(5) error estimate
    — the escape hatch for stiff user motor parameterizations where
    single-step rk4 at tau degrades or blows up.  This matches the
    robustness role of the reference's default adaptive
    ``ScipyOdeSolver('dopri5')`` (solvers.py:139-184) without giving up
    XLA compilation: the substep loop is a ``lax.while_loop`` with a
    standard 0.9 err^-1/5 controller, bounded by ``max_sub`` substeps
    (beyond the bound the last 5th-order solution is accepted — a loud
    NaN beats a silent hang on truly pathological systems).  The default
    tolerances sit above the float32 noise floor of the embedded error
    estimate (the (b5 - b4) cancellation sum rounds at ~1e-6 relative;
    tighter rtol makes the controller chase rounding noise and grind the
    step size to nothing).

    Works under jit/vmap/scan (vmapped instances mask until all lanes
    finish).  Select with ``solver='rk45_adaptive'``; the fused Pallas
    kernels keep their hand-rolled fixed-step RK4 (sequential
    while_loops do not vectorize across the VPU lanes there).
    """
    dt = jnp.asarray(dt, y.dtype)

    def embedded(y0, t0, h):
        ks = [f(t0, y0, *args)]
        for ci, ai in zip(_DP_C, _DP_A):
            y_stage = y0
            for a, k in zip(ai, ks):
                y_stage = y_stage + h * a * k
            ks.append(f(t0 + ci * h, y_stage, *args))
        y5 = y0
        for b, k in zip(_DP_B, ks):
            y5 = y5 + h * b * k
        # 7th (FSAL) stage: b5_7 = 0 but the 4th-order weight b4_7 = 1/40
        # is nonzero — dropping it injects a phantom error ~ h|k|/40 that
        # makes the controller grind h to the stability scale
        ks.append(f(t0 + h, y5, *args))
        err = jnp.zeros_like(y0)
        for b5, b4, k in zip(_DP_B + (0.0,), _DP_B4, ks):
            err = err + h * (b5 - b4) * k
        scale = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y5))
        err_norm = jnp.sqrt(jnp.mean((err / scale) ** 2))
        return y5, err_norm

    def cond(carry):
        tl, _y, _h, n = carry
        return (tl < dt) & (n < max_sub)

    def body(carry):
        tl, yc, h, n = carry
        h_eff = jnp.minimum(h, dt - tl)
        y5, err_norm = embedded(yc, t + tl, h_eff)
        accept = err_norm <= 1.0
        yc = jnp.where(accept, y5, yc)
        tl = jnp.where(accept, tl + h_eff, tl)
        # standard step-size controller, clamped growth/shrink
        fac = jnp.clip(0.9 * (jnp.maximum(err_norm, 1e-12) ** -0.2),
                       0.2, 5.0)
        return tl, yc, h_eff * fac, n + 1

    zero = jnp.zeros((), y.dtype)
    _tl, y_out, _h, _n = jax.lax.while_loop(
        cond, body, (zero, y, dt, jnp.zeros((), jnp.int32)))
    return y_out


def semi_implicit_euler_step(f, y, t, dt, *args):
    """Linearly-implicit (Rosenbrock-style) Euler step for stiff systems —
    the role of the reference's jacobian-consuming implicit integrators
    (``ScipySolveIvpSolver`` with Radau/BDF/LSODA, solvers.py:187-249).

    Solves ``(I - dt J) dy = dt f(y)`` with the exact jacobian from forward
    autodiff — the TPU-native replacement for the reference's hand-written
    ``electrical_jacobian`` methods (electric_motors/*.py).  The state
    dimension is 1-23, so the dense solve is a tiny fused kernel.
    """
    fy = f(t, y, *args)
    J = jax.jacfwd(lambda yy: f(t, yy, *args))(y)
    n = y.shape[0]
    A = jnp.eye(n, dtype=y.dtype) - dt * J
    return y + jnp.linalg.solve(A, dt * fy)


_STEPPERS = {
    "euler": euler_step,
    "heun": heun_step,
    "rk4": rk4_step,
    "rk45": rk45_step,
    "dopri5": rk45_step,
    "rk45_adaptive": rk45_adaptive_step,
    "implicit_euler": semi_implicit_euler_step,
}


def make_integrator(kind: str = "rk4", substeps: int = 1) -> Callable:
    """Return ``integrate(f, y, t, dt, *args) -> y_next``.

    ``kind`` and ``substeps`` are static configuration; the sub-step loop is
    unrolled at trace time (substeps is small).

    Note: the reference's EulerSolver nsteps-variant evaluates the RHS at
    ``t + dt_sub`` (the *end* of each sub step, ``solvers.py:840-843``) while
    its 1-step variant evaluates at ``t`` — we mirror the 1-step convention
    for every sub step, which matches ``EulerSolver(nsteps=1)`` exactly.
    """
    stepper = _STEPPERS[kind]
    if substeps == 1:
        return stepper

    inv = 1.0 / substeps

    def integrate(f, y, t, dt, *args):
        dt_sub = dt * inv
        for i in range(substeps):
            y = stepper(f, y, t + i * dt_sub, dt_sub, *args)
        return y

    return integrate
