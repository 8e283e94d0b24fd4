"""Voltage supply models.

Counterpart of ``/root/reference/src/gym_electric_motor/physical_systems/voltage_supplies.py``.
A supply spec provides ``get_voltage(sp, sup_state, t, i_sup) -> (u_sup,
sup_state')`` as a pure function; supplies with internal dynamics (RC) or
per-episode randomness (AC phase) carry that state explicitly.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class SupplySpec:
    kind: str
    u_nominal: float
    supply_range: tuple
    voltage_len: int
    parameter: dict
    # get_voltage(sp, sup_state, t, i_sup) -> ((voltage_len,), sup_state')
    get_voltage: Callable = None
    # reset_u(sp, u) -> (u_sup0, sup_state0); consumes n_reset_u uniforms
    # from the physical system's single reset-draw block (u is None when
    # n_reset_u == 0) — see SCMLSystem._reset_draws
    reset_u: Callable = None
    n_reset_u: int = 0
    n_state: int = 0  # float state entries carried in the env state

    def reset(self, sp, key):
        """Standalone key-based reset (draws its own block)."""
        u = jax.random.uniform(key, (self.n_reset_u,)) if self.n_reset_u else None
        return self.reset_u(sp, u)

    def sp(self, dtype=jnp.float32) -> dict:
        # host numpy (not jnp): closed over by jitted fns, see MotorSpec.mp
        return {k: np.asarray(v, dtype=dtype) for k, v in self.parameter.items()}


def ideal_voltage_supply(u_nominal=600.0) -> SupplySpec:
    """Constant supply (voltage_supplies.py:60-72)."""

    def get_voltage(sp, sup_state, t, i_sup):
        return sp["u_nominal"] * jnp.ones((1,)), sup_state

    def reset_u(sp, u):
        return sp["u_nominal"] * jnp.ones((1,)), jnp.zeros((0,))

    return SupplySpec(
        kind="IdealVoltageSupply",
        u_nominal=float(u_nominal),
        supply_range=(float(u_nominal), float(u_nominal)),
        voltage_len=1,
        parameter={"u_nominal": float(u_nominal)},
        get_voltage=get_voltage,
        reset_u=reset_u,
        n_state=0,
    )


def rc_voltage_supply(u_nominal=600.0, supply_parameter=None) -> SupplySpec:
    """RC-element supply (voltage_supplies.py:75-123).

    State layout: [u_sup, t_last]. The internal ODE is integrated with
    explicit Euler from the supply's last query time to ``t``, mirroring the
    reference's embedded ``EulerSolver``.
    """
    p = supply_parameter or {"R": 1.0, "C": 4e-3}

    def get_voltage(sp, sup_state, t, i_sup):
        u, t_last = sup_state[0], sup_state[1]
        dt = t - t_last
        du = (sp["u_0"] - u - sp["R"] * i_sup) / (sp["R"] * sp["C"])
        u_new = u + dt * du
        return jnp.stack([u_new]), jnp.stack([u_new, t])

    def reset_u(sp, u):
        return jnp.stack([sp["u_0"]]), jnp.stack([sp["u_0"], jnp.zeros(())])

    return SupplySpec(
        kind="RCVoltageSupply",
        u_nominal=float(u_nominal),
        supply_range=(0.0, float(u_nominal)),
        voltage_len=1,
        parameter={"u_0": float(u_nominal), "R": float(p["R"]), "C": float(p["C"])},
        get_voltage=get_voltage,
        reset_u=reset_u,
        n_state=2,
    )


def _ac_supply(kind, u_nominal, supply_parameter, n_phase, max_amp):
    fixed_phi = supply_parameter is not None and "phase" in supply_parameter
    f = (supply_parameter or {}).get("frequency", 50.0)
    phi0 = (supply_parameter or {}).get("phase", 0.0)
    phase_offsets = np.array([2.0 / 3.0 * np.pi * i for i in range(n_phase)])

    def get_voltage(sp, sup_state, t, i_sup):
        phi = sup_state[0]
        u = sp["max_amp"] * jnp.sin(
            2.0 * jnp.pi * sp["f"] * t + phi + jnp.asarray(phase_offsets, dtype=phi.dtype)
        )
        return u, sup_state

    def reset_u(sp, u):
        if fixed_phi:
            phi = jnp.full((1,), phi0)
        else:
            phi = u[:1] * 2.0 * jnp.pi
        u_v, _ = get_voltage(sp, phi, jnp.zeros(()), jnp.zeros(()))
        return u_v, phi

    return SupplySpec(
        kind=kind,
        u_nominal=float(u_nominal),
        supply_range=(-max_amp, max_amp),
        voltage_len=n_phase,
        # fixed_phase/phase exposed for the fused kernels (the closures
        # capture them; the XLA path never reads these entries)
        parameter={"f": float(f), "max_amp": float(max_amp),
                   "fixed_phase": 1.0 if fixed_phi else 0.0,
                   "phase": float(phi0)},
        get_voltage=get_voltage,
        reset_u=reset_u,
        n_reset_u=0 if fixed_phi else 1,
        n_state=1,
    )


def ac_1_phase_supply(u_nominal=230.0, supply_parameter=None) -> SupplySpec:
    """Single-phase sine supply with random phase per reset (voltage_supplies.py:126-166)."""
    return _ac_supply("AC1PhaseSupply", u_nominal, supply_parameter, 1,
                      float(u_nominal) * np.sqrt(2.0))


def ac_3_phase_supply(u_nominal=400.0, supply_parameter=None) -> SupplySpec:
    """Three-phase sine supply (voltage_supplies.py:169-213)."""
    return _ac_supply("AC3PhaseSupply", u_nominal, supply_parameter, 3,
                      float(u_nominal) / np.sqrt(3.0) * np.sqrt(2.0))


SUPPLY_FACTORIES = {
    "IdealVoltageSupply": ideal_voltage_supply,
    "RCVoltageSupply": rc_voltage_supply,
    "AC1PhaseSupply": ac_1_phase_supply,
    "AC3PhaseSupply": ac_3_phase_supply,
}
