"""Fixed-step integrator tests against the exact solution of a linear system,
mirroring the reference's solver tests which integrate a known system
(``/root/reference/tests/test_physical_systems/test_solvers.py:18-50``)."""

import jax
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


def test_semi_implicit_euler_stiff_stability():
    """On a stiff linear system the explicit Euler step diverges at dt
    beyond 2/|lambda_max| while the linearly-implicit step stays stable and
    accurate."""
    A_stiff = np.array([[-4000.0, 0.0], [1.0, -1.0]])

    def rhs_stiff(t, y, u):
        return jnp.asarray(A_stiff) @ y + jnp.asarray([1.0, 0.0]) * u

    dt = 1e-3  # explicit euler: |1 + dt*(-4000)| = 3 > 1 -> divergence
    y_exp = jnp.array([1.0, 1.0])
    y_imp = jnp.array([1.0, 1.0])
    exp_step = make_integrator("euler")
    imp_step = make_integrator("implicit_euler")
    for k in range(50):
        y_exp = exp_step(rhs_stiff, y_exp, k * dt, dt, 1.0)
        y_imp = imp_step(rhs_stiff, y_imp, k * dt, dt, 1.0)
    assert not np.all(np.isfinite(np.asarray(y_exp))) or np.max(np.abs(np.asarray(y_exp))) > 1e10
    ref = exact_of(A_stiff, np.array([1.0, 1.0]), np.array([1.0, 0.0]), 1.0, 50 * dt)
    np.testing.assert_allclose(np.asarray(y_imp), ref, rtol=0.1)


def exact_of(A_, y0, B_, u, t):
    eAt = expm(A_ * t)
    return eAt @ y0 + np.linalg.solve(A_, (eAt - np.eye(len(y0))) @ (B_ * u))


def test_implicit_euler_in_env():
    """The implicit solver drops into the env builder like any other."""
    import gym_electric_motor_tpu as gemx

    env = gemx.make_functional("Cont-CC-PermExDc-v0", solver="implicit_euler")
    state, obs = env.reset(jax.random.PRNGKey(0))
    for _ in range(5):
        state, (s, r), rew, term = env.step(state, jnp.asarray([0.4]))
    assert np.all(np.isfinite(np.asarray(s)))


def test_rk45_adaptive_holds_tolerance_where_rk4_blows_up():
    """The stiff escape hatch (solver='rk45_adaptive'): a linear system
    with k*dt = 50 (electrical time constant 1/50th of the control
    period).  Single-step rk4 is unstable at this stiffness (|R(z)| > 1
    for |z| > ~2.78) and diverges within a few cycles; the adaptive
    Dormand-Prince substep controller holds the float64-exact decay to
    ~1e-5 — the robustness role of the reference's default adaptive
    ScipyOdeSolver('dopri5') (solvers.py:139-184)."""
    import jax

    from gym_electric_motor_tpu.ops.integrators import make_integrator

    k, dt = 2000.0, 1e-2  # k*dt = 20 (rk4 stability bound is ~2.78)

    def f(t, y):
        return -k * (y - 1.0)   # relaxation toward 1 (O(1) answer, so
                                # the rtol check is meaningful)

    y0 = jnp.zeros((3,))
    rk4 = make_integrator("rk4")
    ada = make_integrator("rk45_adaptive")

    y_rk4 = np.asarray(jax.jit(lambda: rk4(f, y0, 0.0, dt))())
    assert np.abs(y_rk4).max() > 10.0, y_rk4   # unstable: blows up

    y_ada = np.asarray(jax.jit(lambda: ada(f, y0, 0.0, dt))())
    truth = 1.0 - np.exp(-k * dt)
    np.testing.assert_allclose(y_ada, truth, rtol=1e-3)


def test_rk45_adaptive_env_runs_stiff_motor():
    """End-to-end: a PermExDc with a 100x smaller inductance (electrical
    time constant ~ tau/40) steps stably under solver='rk45_adaptive'
    where the default rk4 env produces non-finite currents."""
    import jax

    import gym_electric_motor_tpu as gemx
    from gym_electric_motor_tpu.models.motors import permex_dc

    stiff = permex_dc(motor_parameter={
        "r_a": 16e-3, "l_a": 19e-8, "psi_e": 0.165, "j_rotor": 0.025})

    def rollout(env, n=50):
        state, _ = env.reset(jax.random.PRNGKey(0))

        def body(st, i):
            st, _obs, _r, _t = env.step(st, jnp.ones((1,)))
            return st, st.phys.ode_state
        _, traj = jax.lax.scan(body, state, jnp.arange(n))
        return np.asarray(traj)

    env_rk4 = gemx.make_functional("Cont-CC-PermExDc-v0", motor=stiff)
    env_ada = gemx.make_functional("Cont-CC-PermExDc-v0", motor=stiff,
                                   solver="rk45_adaptive")
    t_rk4 = rollout(env_rk4)
    t_ada = rollout(env_ada)
    assert not np.isfinite(t_rk4).all() or np.abs(t_rk4).max() > 1e6
    assert np.isfinite(t_ada).all()
    assert np.abs(t_ada[:, 1]).max() < 1e6
