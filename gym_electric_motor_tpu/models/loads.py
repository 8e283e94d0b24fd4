"""Mechanical load models.

Counterpart of ``/root/reference/src/gym_electric_motor/physical_systems/mechanical_loads/``.
A load spec provides the mechanical ODE ``d omega / dt`` given the motor
torque plus its initialization distribution.  The OU load consumes one normal
sample per RHS evaluation from a per-step key.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..utils.params import update_parameter_dict


@dataclasses.dataclass
class LoadSpec:
    kind: str
    state_names: tuple
    j_load: float
    parameter: dict
    limits: dict
    nominal: dict
    initializer: dict
    # mechanical_ode(lp, t, mech_state, torque, noise) -> d/dt mech_state
    ode: Callable = None
    jacobian: Callable = None
    has_jacobian: bool = True
    omega_fixed: Optional[float] = None
    speed_profile: Optional[Callable] = None
    speed_profile_kwargs: Optional[dict] = None
    needs_noise: bool = False

    def lp(self, j_rotor: float, dtype=jnp.float32) -> dict:
        """Load parameters incl. the total inertia (load + rotor)."""
        # host numpy (not jnp): closed over by jitted fns, see MotorSpec.mp
        out = {k: np.asarray(v, dtype=dtype) for k, v in self.parameter.items()}
        out["j_total"] = np.asarray(self.j_load + j_rotor, dtype=dtype)
        return out


def constant_speed_load(omega_fixed=0.0, load_initializer=None) -> LoadSpec:
    """d omega/dt = 0 (constant_speed_load.py)."""

    def ode(lp, t, mech_state, torque, noise=None):
        return jnp.zeros_like(mech_state)

    def jacobian(lp, t, mech_state, torque):
        return jnp.zeros((1, 1)), jnp.zeros((1,))

    initializer = {"states": {"omega": float(omega_fixed)}, "interval": None,
                   "random_init": None, "random_params": (None, None)}
    initializer.update(load_initializer or {})
    return LoadSpec(
        kind="ConstantSpeedLoad",
        state_names=("omega",),
        j_load=0.0,
        parameter={},
        limits={},
        nominal={},
        initializer=initializer,
        ode=ode,
        jacobian=jacobian,
        omega_fixed=float(omega_fixed),
    )


def polynomial_static_load(load_parameter=None, limits=None, load_initializer=None) -> LoadSpec:
    """T_L = sign(w) c w^2 + b w + a sign(w), with the constant term linearized
    around zero speed for integrator stability (polynomial_static_load.py:87-107)."""
    params = update_parameter_dict(dict(a=0.0, b=0.0, c=0.0, j_load=1e-5), load_parameter or {})
    tau_decay = 1e-3

    def ode(lp, t, mech_state, torque, noise=None):
        omega = mech_state[0]
        sign = jnp.sign(omega)
        omega_lim = lp["a"] / lp["j_total"] * tau_decay
        a_term = jnp.where(
            jnp.abs(omega) > omega_lim,
            sign * lp["a"],
            lp["j_total"] / tau_decay * omega,
        )
        static_torque = sign * lp["c"] * omega * omega + lp["b"] * omega + a_term
        return jnp.stack([(torque - static_torque) / lp["j_total"]])

    def jacobian(lp, t, mech_state, torque):
        omega = mech_state[0]
        sign = jnp.sign(omega)
        a = jnp.where(
            jnp.abs(omega) > lp["a"] * tau_decay / lp["j_total"],
            0.0,
            lp["j_total"] / tau_decay,
        )
        d_omega = (-lp["b"] - 2.0 * sign * lp["c"] * omega - a) / lp["j_total"]
        return d_omega.reshape(1, 1), jnp.stack([1.0 / lp["j_total"]])

    initializer = {"states": {"omega": 0.0}, "interval": None, "random_init": None,
                   "random_params": (None, None)}
    initializer.update(load_initializer or {})
    return LoadSpec(
        kind="PolynomialStaticLoad",
        state_names=("omega",),
        j_load=params["j_load"],
        parameter={k: params[k] for k in ("a", "b", "c")},
        limits=dict(limits or {}),
        nominal={},
        initializer=initializer,
        ode=ode,
        jacobian=jacobian,
    )


def external_speed_load(speed_profile, tau=1e-4, speed_profile_kwargs=None,
                        load_initializer=None) -> LoadSpec:
    """Forces omega onto a speed profile via forward-Euler forcing
    (external_speed_load.py:113-119). ``speed_profile(t, **kwargs)`` must be
    jax-traceable."""
    kwargs = speed_profile_kwargs or {}

    def ode(lp, t, mech_state, torque, noise=None):
        omega_next = speed_profile(t=t + tau, **kwargs)
        return jnp.stack([(omega_next - mech_state[0]) / tau])

    omega0 = float(speed_profile(t=0.0, **kwargs))
    return LoadSpec(
        kind="ExternalSpeedLoad",
        state_names=("omega",),
        j_load=0.0,
        parameter={"tau": float(tau)},
        limits={},
        nominal={},
        initializer={"states": {"omega": omega0}, "interval": None, "random_init": None,
                     "random_params": (None, None)},
        ode=ode,
        jacobian=None,
        has_jacobian=False,
        speed_profile=speed_profile,
        speed_profile_kwargs=kwargs,
    )


def ornstein_uhlenbeck_load(mu=0.0, sigma=1e-4, theta=1.0, tau=1e-4,
                            omega_range=(-200.0, 200.0), load_initializer=None) -> LoadSpec:
    """OU-process speed load (ornstein_uhlenbeck_load.py).  ``noise`` is a
    standard-normal sample drawn once per env step from the env's key tree."""
    lo, hi = omega_range

    def ode(lp, t, mech_state, torque, noise=None):
        omega = mech_state[0]
        diff = theta * (mu - omega) * tau + sigma * jnp.sqrt(jnp.asarray(tau)) * noise
        diff = jnp.clip(diff, (lo - omega) / tau, (hi - omega) / tau)
        return jnp.stack([diff])

    initializer = {"states": {"omega": 0.0}, "interval": [[lo, hi]],
                   "random_init": "uniform", "random_params": (None, None)}
    return LoadSpec(
        kind="OrnsteinUhlenbeckLoad",
        state_names=("omega",),
        j_load=0.0,
        # constants exposed for the fused kernels (the ode closure captures
        # them; the XLA path never reads this dict)
        parameter={"mu": float(mu), "sigma": float(sigma),
                   "theta": float(theta), "tau": float(tau),
                   "omega_lo": float(lo), "omega_hi": float(hi)},
        limits={},
        nominal={},
        initializer=initializer,
        ode=ode,
        jacobian=None,
        has_jacobian=False,
        needs_noise=True,
    )


LOAD_FACTORIES = {
    "ConstantSpeedLoad": constant_speed_load,
    "PolynomialStaticLoad": polynomial_static_load,
    "ExternalSpeedLoad": external_speed_load,
    "OrnsteinUhlenbeckLoad": ornstein_uhlenbeck_load,
}
