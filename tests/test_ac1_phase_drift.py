"""AC1 supply float32 phase accuracy over very long launches.

The fused kernels carry the AC1 supply as (theta, theta_lo) planes — the
full sine phase in double-float32 (TwoSum accumulation of split-constant
increments, wrapped at 2 pi).  Round 3 left a documented drift: a plain
float32 time accumulator loses ~ulp/2 per step with a systematic
component, corrupting the sine phase by whole radians within a few
million steps (a period-wrapped time plane still measured ~0.08 rad and
Kahan summation ~4.8e-3 rad at 2M steps — Kahan only bounds the error
relative to the linearly-growing sum of |increments|).  The TwoSum
double-float accumulator keeps the residual at ~1e-9 rad indefinitely.

The test exercises the SAME ``supply_u`` closure the kernels trace (pure
jnp — one definition, pallas_common._make_fused_supply) through a float32
lax.scan for 2M steps and checks the emitted voltage against the float64
closed form u = sin(2 pi f (n tau) + phi); the legacy unwrapped
recurrence, run side by side, diverges by orders of magnitude more.
Reference semantics: voltage_supplies.py:126-166.
"""

import jax
import jax.numpy as jnp
import numpy as np

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.models.supplies import ac_1_phase_supply
from gym_electric_motor_tpu.ops.pallas_common import _make_fused_supply

N_STEPS = 2_000_000
TAU = 1e-4
F = 50.0


def _make_sup():
    env = gemx.make_functional(
        "Finite-CC-PermExDc-v0",
        supply=ac_1_phase_supply(
            u_nominal=230.0,
            supply_parameter={"frequency": F, "phase": 0.0}))
    sup = _make_fused_supply(env.physical_system, (1, 128), TAU)
    assert sup.mode == "ac1"
    amp = float(env.physical_system.supply.parameter["max_amp"])
    return sup, amp


def _run(supply_u, n_steps=N_STEPS):
    def body(carry, _):
        u, new = supply_u(carry, None)
        return new, u

    _, us = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)),
        None, length=n_steps)
    return us


def test_double_float_ac1_matches_float64_over_2m_steps():
    sup, amp = _make_sup()
    us = np.asarray(jax.jit(lambda: _run(sup.supply_u))())

    idx = np.arange(0, N_STEPS, 997)   # subsample to keep the check fast
    truth = amp * np.sin(2.0 * np.pi * F * (idx.astype(np.float64) * TAU))
    err = np.abs(us[idx] - truth) / amp
    # double-float phase: residual is sin()'s own float32 input rounding
    assert err.max() < 1e-5, err.max()

    # the legacy unwrapped float32-time recurrence degrades by orders of
    # magnitude across the same launch (documents WHY the scheme exists)
    def unwrapped_u(sup_state, _i):
        phi, t_c = sup_state
        u = amp * jnp.sin(np.float32(2.0 * np.pi * F) * t_c + phi)
        return u, (phi, t_c + np.float32(TAU))

    us_old = np.asarray(jax.jit(lambda: _run(unwrapped_u))())
    err_old = np.abs(us_old[idx] - truth) / amp
    tail = idx > N_STEPS // 2
    assert err_old[tail].max() > 100.0 * err[tail].max(), (
        err_old[tail].max(), err[tail].max())


def test_theta_plane_stays_wrapped():
    sup, _amp = _make_sup()

    def body(carry, _):
        _u, new = sup.supply_u(carry, None)
        return new, new[0]

    _, thetas = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)),
        None, length=5000)
    thetas = np.asarray(thetas)
    assert thetas.max() < 2.0 * np.pi + 0.1
    assert thetas.min() >= -1e-6
    # it does wrap (5000 steps = 25 periods at tau=1e-4, f=50)
    assert (np.diff(thetas) < 0).sum() >= 20
