"""Electric motor models.

Each motor family is described by

* a *spec* (host-side, numpy/python): default parameters, limit / nominal
  completion rules and the initial-state distribution — the counterpart of the
  reference's ``ElectricMotor`` constructor logic
  (``/root/reference/src/gym_electric_motor/physical_systems/electric_motors/``),
* a set of *device functions* ``ode(mp, state, u_in, omega)``, ``torque(mp,
  state)``, ``i_in(mp, state)`` operating on scalars/small vectors.  They are
  written as fused elementwise math instead of the reference's
  ``model_constants @ feature-vector`` matmul: with ODE dimensions of 1-5 the
  VPU-fused form is strictly faster on TPU than a tiny MXU matmul, and it
  vmaps to an (n_envs,)-wide vector program.

``mp`` is a plain dict of scalar jnp arrays (a pytree leaf-dict), so motor
parameters can be batched/domain-randomized without recompilation.

Parity notes reference the source formulas, e.g. the PMSM dq ODE matches
``permanent_magnet_synchronous_motor.py:107-119`` and its torque equation
``:134-139``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..utils.params import update_parameter_dict

# ---------------------------------------------------------------------------
# Host-side motor specification
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class MotorSpec:
    """Host-side description of a configured motor instance."""

    kind: str
    # ODE state names (the motor part of the integrated state vector)
    ode_states: tuple
    currents: tuple  # names of the motor's current states
    voltages: tuple  # names of the motor's input voltages
    parameter: dict  # physical parameters (floats)
    limits: dict  # completed limit dict
    nominal: dict  # completed nominal dict
    initializer: dict  # {'states': {...}, 'interval', 'random_init', 'random_params'}
    initial_limits: dict
    ode: Callable = None
    torque: Callable = None
    i_in: Callable = None
    jacobian: Callable = None
    has_jacobian: bool = True

    @property
    def n_ode(self) -> int:
        return len(self.ode_states)

    def mp(self, dtype=jnp.float32) -> dict:
        """Motor parameters as a dict of HOST numpy scalars.

        Kept on host deliberately: these dicts are closed over by jitted
        ``reset``/``simulate``.  numpy values embed as compile-time constants
        straight from host memory, whereas eager ``jnp`` arrays would force a
        device->host read-back at trace time (the exact failure mode of the
        round-1 driver bench: FAILED_PRECONDITION through the TPU tunnel).
        """
        return {k: np.asarray(v, dtype=dtype) for k, v in self.parameter.items()}


def _complete(limits, nominal, limits_agenda, nominal_agenda=None):
    """Replicates ``ElectricMotor._update_limits`` (electric_motor.py:297-317):
    unspecified (0-valued) limits are replaced by physical maxima and missing
    nominal values default to the limit values."""
    nominal_agenda = nominal_agenda or {}
    for qty, lim in limits_agenda.items():
        if limits.get(qty, 0) == 0:
            limits[qty] = lim
    for entry in list(limits.keys()):
        if nominal.get(entry, 0) == 0:
            nominal[entry] = nominal_agenda.get(entry, limits[entry])
    return limits, nominal


# ---------------------------------------------------------------------------
# DC motors  (dc_motor.py, dc_*_motor.py)
# ---------------------------------------------------------------------------

_DC_DEFAULT_NOMINAL = dict(omega=300.0, torque=16.0, i=97.0, i_a=97.0, i_e=97.0, u=60.0, u_a=60.0, u_e=60.0)
_DC_DEFAULT_LIMITS = dict(omega=400.0, torque=38.0, i=210.0, i_a=210.0, i_e=210.0, u=60.0, u_a=60.0, u_e=60.0)


def permex_dc_ode(mp, state, u_in, omega):
    """1-state ODE d i/dt, cf. dc_permanently_excited_motor.py:71-84."""
    i = state[0]
    di = (-mp["psi_e"] * omega - mp["r_a"] * i + u_in[0]) / mp["l_a"]
    return jnp.stack([di])


def permex_dc_torque(mp, state):
    return mp["psi_e"] * state[0]


def permex_dc_jacobian(mp, state, u_in, omega):
    return (
        jnp.array([[-1.0]]) * (mp["r_a"] / mp["l_a"]),
        jnp.stack([-mp["psi_e"] / mp["l_a"]]),
        jnp.stack([mp["psi_e"] * jnp.ones_like(state[0])]),
    )


def series_dc_ode(mp, state, u_in, omega):
    """dc_series_motor.py:68-83."""
    i = state[0]
    di = (-(mp["r_a"] + mp["r_e"]) * i - mp["l_e_prime"] * omega * i + u_in[0]) / (mp["l_a"] + mp["l_e"])
    return jnp.stack([di])


def series_dc_torque(mp, state):
    return mp["l_e_prime"] * state[0] * state[0]


def series_dc_jacobian(mp, state, u_in, omega):
    l_tot = mp["l_a"] + mp["l_e"]
    return (
        jnp.stack([jnp.stack([-(mp["r_a"] + mp["r_e"] + mp["l_e_prime"] * omega) / l_tot])]),
        jnp.stack([-mp["l_e_prime"] * state[0] / l_tot]),
        jnp.stack([2.0 * mp["l_e_prime"] * state[0]]),
    )


def extex_dc_ode(mp, state, u_in, omega):
    """2-state armature/excitation ODE, cf. dc_motor.py:96-127."""
    i_a, i_e = state[0], state[1]
    di_a = (-mp["r_a"] * i_a - mp["l_e_prime"] * omega * i_e + u_in[0]) / mp["l_a"]
    di_e = (-mp["r_e"] * i_e + u_in[1]) / mp["l_e"]
    return jnp.stack([di_a, di_e])


def extex_dc_torque(mp, state):
    return mp["l_e_prime"] * state[0] * state[1]


def extex_dc_jacobian(mp, state, u_in, omega):
    zero = jnp.zeros_like(omega)
    return (
        jnp.stack(
            [
                jnp.stack([-mp["r_a"] / mp["l_a"] + zero, -mp["l_e_prime"] / mp["l_a"] * omega]),
                jnp.stack([zero, -mp["r_e"] / mp["l_e"] + zero]),
            ]
        ),
        jnp.stack([-mp["l_e_prime"] * state[1] / mp["l_a"], zero]),
        jnp.stack([mp["l_e_prime"] * state[1], mp["l_e_prime"] * state[0]]),
    )


def shunt_dc_ode(mp, state, u_in, omega):
    """Shunt motor: both circuits see the same input voltage (dc_shunt_motor.py:72-74)."""
    return extex_dc_ode(mp, state, (u_in[0], u_in[0]), omega)


def _dc_spec(kind, defaults, currents, voltages, ode, torque, i_in, jacobian,
             motor_parameter=None, nominal_values=None, limit_values=None,
             motor_initializer=None, default_initializer=None):
    parameter = update_parameter_dict(defaults, motor_parameter or {})
    limits = dict(_DC_DEFAULT_LIMITS)
    limits.update(limit_values or {})
    nominal = dict(_DC_DEFAULT_NOMINAL)
    nominal.update(nominal_values or {})
    initializer = dict(default_initializer)
    initializer.update(motor_initializer or {})

    # limit completion (dc_*_motor.py _update_limits)
    r_a = parameter.get("r_a", 1.0) or 1.0
    if kind == "PermExDc":
        agenda = {"u": _DC_DEFAULT_LIMITS["u"], "i": limits["u"] / r_a}
    elif kind == "SeriesDc":
        agenda = {"u": _DC_DEFAULT_LIMITS["u"], "i": limits["u"] / (r_a + parameter["r_e"])}
    elif kind == "ShuntDc":
        agenda = {
            "u": _DC_DEFAULT_LIMITS["u"],
            "i_a": limits.get("i", None) or limits["u"] / r_a,
            "i_e": limits.get("i", None) or limits["u"] / parameter["r_e"],
        }
    else:  # ExtExDc
        agenda = {
            "u_a": _DC_DEFAULT_LIMITS["u"],
            "u_e": _DC_DEFAULT_LIMITS["u"],
            "i_a": limits.get("i", None) or limits["u"] / r_a,
            "i_e": limits.get("i", None) or limits["u"] / parameter["r_e"],
        }
    # torque limit from current limits (dc_motor.py:153-159)
    if kind == "PermExDc":
        agenda["torque"] = parameter["psi_e"] * limits["i"]
    elif kind == "SeriesDc":
        agenda["torque"] = parameter["l_e_prime"] * limits["i"] ** 2
    else:
        agenda["torque"] = parameter["l_e_prime"] * limits["i_a"] * limits["i_e"]
    agenda["omega"] = _DC_DEFAULT_LIMITS["omega"]
    limits, nominal = _complete(limits, nominal, agenda)
    initial_limits = dict(nominal)

    return MotorSpec(
        kind=kind,
        ode_states=currents,
        currents=currents,
        voltages=voltages,
        parameter=parameter,
        limits=limits,
        nominal=nominal,
        initializer=initializer,
        initial_limits=initial_limits,
        ode=ode,
        torque=torque,
        i_in=i_in,
        jacobian=jacobian,
    )


def permex_dc(**kwargs) -> MotorSpec:
    return _dc_spec(
        "PermExDc",
        {"r_a": 16e-3, "l_a": 19e-6, "psi_e": 0.165, "j_rotor": 0.025},
        ("i",),
        ("u",),
        permex_dc_ode,
        permex_dc_torque,
        lambda mp, s: s[:1],
        permex_dc_jacobian,
        default_initializer={"states": {"i": 0.0}, "interval": None, "random_init": None, "random_params": (None, None)},
        **kwargs,
    )


def series_dc(**kwargs) -> MotorSpec:
    return _dc_spec(
        "SeriesDc",
        {"r_a": 16e-3, "r_e": 48e-3, "l_a": 19e-6, "l_e_prime": 1.7e-3, "l_e": 5.4e-3, "j_rotor": 0.0025},
        ("i",),
        ("u",),
        series_dc_ode,
        series_dc_torque,
        lambda mp, s: s[:1],
        series_dc_jacobian,
        default_initializer={"states": {"i": 0.0}, "interval": None, "random_init": None, "random_params": (None, None)},
        **kwargs,
    )


def shunt_dc(**kwargs) -> MotorSpec:
    return _dc_spec(
        "ShuntDc",
        {"r_a": 16e-3, "r_e": 4e-1, "l_a": 19e-6, "l_e_prime": 1.7e-3, "l_e": 5.4e-3, "j_rotor": 0.0025},
        ("i_a", "i_e"),
        ("u",),
        shunt_dc_ode,
        extex_dc_torque,
        lambda mp, s: jnp.stack([s[0] + s[1]]),
        extex_dc_jacobian,
        default_initializer={
            "states": {"i_a": 0.0, "i_e": 0.0},
            "interval": None,
            "random_init": None,
            "random_params": (None, None),
        },
        **kwargs,
    )


def extex_dc(**kwargs) -> MotorSpec:
    return _dc_spec(
        "ExtExDc",
        {"r_a": 16e-3, "r_e": 16e-2, "l_a": 19e-6, "l_e_prime": 1.7e-3, "l_e": 5.4e-3, "j_rotor": 0.0025},
        ("i_a", "i_e"),
        ("u_a", "u_e"),
        extex_dc_ode,
        extex_dc_torque,
        lambda mp, s: s[:2],
        extex_dc_jacobian,
        default_initializer={
            "states": {"i_a": 0.0, "i_e": 0.0},
            "interval": None,
            "random_init": None,
            "random_params": (None, None),
        },
        **kwargs,
    )


# ---------------------------------------------------------------------------
# Synchronous motors  (synchronous_motor.py + subclasses)
# ---------------------------------------------------------------------------


def pmsm_ode(mp, state, u_dq, omega):
    """PMSM dq-frame ODE, cf. permanent_magnet_synchronous_motor.py:107-119.

    state = [i_sd, i_sq, epsilon]; u_dq = [u_sd, u_sq].
    """
    i_sd, i_sq = state[0], state[1]
    p = mp["p"]
    di_sd = (-mp["r_s"] * i_sd + mp["l_q"] * p * omega * i_sq + u_dq[0]) / mp["l_d"]
    di_sq = (
        -mp["psi_p"] * p * omega - mp["r_s"] * i_sq - mp["l_d"] * p * omega * i_sd + u_dq[1]
    ) / mp["l_q"]
    deps = p * omega
    return jnp.stack([di_sd, di_sq, deps])


def pmsm_torque(mp, state):
    """1.5 p (psi_p + (l_d - l_q) i_sd) i_sq (permanent_magnet_synchronous_motor.py:134-139)."""
    return 1.5 * mp["p"] * (mp["psi_p"] + (mp["l_d"] - mp["l_q"]) * state[0]) * state[1]


def synrm_ode(mp, state, u_dq, omega):
    """SynRM = PMSM with psi_p = 0 (synchronous_reluctance_motor.py:117-130)."""
    i_sd, i_sq = state[0], state[1]
    p = mp["p"]
    di_sd = (-mp["r_s"] * i_sd + mp["l_q"] * p * omega * i_sq + u_dq[0]) / mp["l_d"]
    di_sq = (-mp["r_s"] * i_sq - mp["l_d"] * p * omega * i_sd + u_dq[1]) / mp["l_q"]
    deps = p * omega
    return jnp.stack([di_sd, di_sq, deps])


def synrm_torque(mp, state):
    return 1.5 * mp["p"] * (mp["l_d"] - mp["l_q"]) * state[0] * state[1]


def _sync_spec(kind, defaults, default_limits, default_nominal, io_voltages, io_currents,
               currents, voltages, ode, torque, default_initializer, torque_limit_fn,
               motor_parameter=None, nominal_values=None, limit_values=None, motor_initializer=None):
    parameter = update_parameter_dict(defaults, motor_parameter or {})
    limits = dict(default_limits)
    limits.update(limit_values or {})
    nominal = dict(default_nominal)
    nominal.update(nominal_values or {})
    initializer = dict(default_initializer)
    initializer.update(motor_initializer or {})

    # synchronous_motor.py:174-188 — phase voltage/current completion
    voltage_limit = 0.5 * limits["u"]
    voltage_nominal = 0.5 * nominal["u"]
    limits_agenda, nominal_agenda = {}, {}
    for u, i in zip(io_voltages, io_currents):
        limits_agenda[u] = voltage_limit
        nominal_agenda[u] = voltage_nominal
        limits_agenda[i] = limits.get("i", None) or limits[u] / parameter["r_s"]
        nominal_agenda[i] = nominal.get("i", None) or nominal[u] / parameter["r_s"]
    limits_agenda["omega"] = default_limits["omega"]
    limits, nominal = _complete(limits, nominal, limits_agenda, nominal_agenda)
    # torque limit (three_phase_motor.py:127-133)
    tl = {"torque": torque_limit_fn(parameter, limits, nominal)}
    limits, nominal = _complete(limits, nominal, tl)
    initial_limits = dict(nominal)

    return MotorSpec(
        kind=kind,
        ode_states=currents + ("epsilon",),
        currents=currents,
        voltages=voltages,
        parameter=parameter,
        limits=limits,
        nominal=nominal,
        initializer=initializer,
        initial_limits=initial_limits,
        ode=ode,
        torque=torque,
        i_in=lambda mp, s: s[: len(currents)],
        jacobian=None,
    )


def _pmsm_torque_limit(mp, limits, nominal):
    """permanent_magnet_synchronous_motor.py:121-132 (MTPC point at limit current)."""
    if mp["l_d"] == mp["l_q"]:
        return 1.5 * mp["p"] * mp["psi_p"] * limits["i_sq"]
    i_n = nominal["i"]
    _p = mp["psi_p"] / (2 * (mp["l_d"] - mp["l_q"]))
    _q = -(i_n**2) / 2
    i_d_opt = -_p / 2 - math.sqrt((_p / 2) ** 2 - _q)
    i_q_opt = math.sqrt(i_n**2 - i_d_opt**2)
    return 1.5 * mp["p"] * (mp["psi_p"] + (mp["l_d"] - mp["l_q"]) * i_d_opt) * i_q_opt


def pmsm(**kwargs) -> MotorSpec:
    return _sync_spec(
        "PMSM",
        {"p": 3.0, "l_d": 0.37e-3, "l_q": 1.2e-3, "j_rotor": 0.03883, "r_s": 18e-3, "psi_p": 66e-3},
        dict(omega=4e3 * np.pi / 30, torque=0.0, i=400.0, epsilon=math.pi, u=300.0),
        dict(omega=3e3 * np.pi / 30, torque=0.0, i=240.0, epsilon=math.pi, u=300.0),
        ["u_a", "u_b", "u_c", "u_sd", "u_sq"],
        ["i_a", "i_b", "i_c", "i_sd", "i_sq"],
        ("i_sd", "i_sq"),
        ("u_sd", "u_sq"),
        pmsm_ode,
        pmsm_torque,
        {"states": {"i_sq": 0.0, "i_sd": 0.0, "epsilon": 0.0}, "interval": None, "random_init": None,
         "random_params": (None, None)},
        _pmsm_torque_limit,
        **kwargs,
    )


def _synrm_torque_limit(mp, limits, nominal):
    """synchronous_reluctance_motor.py:132-134."""
    i_sd = limits["i_sd"] / math.sqrt(2)
    i_sq = limits["i_sq"] / math.sqrt(2)
    return 1.5 * mp["p"] * (mp["l_d"] - mp["l_q"]) * i_sd * i_sq


def synrm(**kwargs) -> MotorSpec:
    return _sync_spec(
        "SynRM",
        {"p": 4.0, "l_d": 10.1e-3, "l_q": 4.1e-3, "j_rotor": 0.8e-3, "r_s": 0.57},
        dict(omega=4.3e3 * np.pi / 30, torque=0.0, i=18.0, epsilon=math.pi, u=80.0),
        dict(omega=3e3 * np.pi / 30, torque=0.0, i=10.0, epsilon=math.pi, u=80.0),
        ["u_a", "u_b", "u_c", "u_sd", "u_sq"],
        ["i_a", "i_b", "i_c", "i_sd", "i_sq"],
        ("i_sd", "i_sq"),
        ("u_sd", "u_sq"),
        synrm_ode,
        synrm_torque,
        {"states": {"i_sq": 0.0, "i_sd": 0.0, "epsilon": 0.0}, "interval": None, "random_init": None,
         "random_params": (None, None)},
        _synrm_torque_limit,
        **kwargs,
    )


# ---------------------------------------------------------------------------
# Externally excited synchronous motor (externally_excited_synchronous_motor.py)
# ---------------------------------------------------------------------------


def _eesm_derived(mp):
    """Stator-side transformed rotor parameters (eesm:125-135)."""
    r_E = mp["k"] ** 2 * 1.5 * mp["r_e"]
    l_M = mp["k"] * 1.5 * mp["l_m"]
    l_E = mp["k"] ** 2 * 1.5 * mp["l_e"]
    i_k_rs = 2.0 / 3.0 / mp["k"]
    sigma = 1.0 - l_M**2 / (mp["l_d"] * l_E)
    return r_E, l_M, l_E, i_k_rs, sigma


def eesm_ode(mp, state, u_dqe, omega):
    """EESM 4-state ODE [i_sd, i_sq, i_e, eps], cf. eesm:139-182."""
    r_E, l_M, l_E, i_k_rs, sigma = _eesm_derived(mp)
    i_sd, i_sq, i_e = state[0], state[1], state[2]
    p = mp["p"]
    u_d, u_q, u_e = u_dqe[0], u_dqe[1], u_dqe[2]
    di_sd = (
        -mp["r_s"] / sigma * i_sd
        + l_M * r_E / (sigma * l_E) * i_k_rs * i_e
        + u_d / sigma
        - l_M * mp["k"] / (sigma * l_E) * u_e
        + mp["l_q"] * p / sigma * omega * i_sq
    ) / mp["l_d"]
    di_sq = (
        -mp["r_s"] * i_sq + u_q - mp["l_d"] * p * omega * i_sd - p * l_M * i_k_rs * omega * i_e
    ) / mp["l_q"]
    di_e = (
        l_M * mp["r_s"] / (sigma * mp["l_d"]) * i_sd
        - r_E / sigma * i_k_rs * i_e
        - l_M / (sigma * mp["l_d"]) * u_d
        + mp["k"] / sigma * u_e
        - p * l_M * mp["l_q"] / (sigma * mp["l_d"]) * omega * i_sq
    ) / (l_E * i_k_rs)
    deps = p * omega
    return jnp.stack([di_sd, di_sq, di_e, deps])


def eesm_torque(mp, state):
    """eesm:200-203."""
    _, l_M, _, i_k_rs, _ = _eesm_derived(mp)
    return 1.5 * mp["p"] * (l_M * state[2] * i_k_rs + (mp["l_d"] - mp["l_q"]) * state[0]) * state[1]


def _eesm_torque_limit(mp, limits, nominal):
    """eesm:184-198."""
    r_E, l_M, l_E, i_k_rs, sigma = _eesm_derived(
        {k: float(v) for k, v in mp.items()}
    )
    if mp["l_d"] == mp["l_q"]:
        i_d_opt, i_q_opt = 0.0, limits["i_sq"]
    else:
        i_n = nominal["i"]
        _p = l_M * i_n / (2 * (mp["l_d"] - mp["l_q"]))
        _q = -(i_n**2) / 2
        if mp["l_d"] < mp["l_q"]:
            i_d_opt = -_p / 2 - math.sqrt((_p / 2) ** 2 - _q)
        else:
            i_d_opt = -_p / 2 + math.sqrt((_p / 2) ** 2 - _q)
        i_q_opt = math.sqrt(i_n**2 - i_d_opt**2)
    return 1.5 * mp["p"] * (l_M * limits["i_e"] * i_k_rs + (mp["l_d"] - mp["l_q"]) * i_d_opt) * i_q_opt


def eesm(**kwargs) -> MotorSpec:
    spec = _sync_spec(
        "EESM",
        {
            "p": 3.0,
            "l_d": 1.66e-3,
            "l_q": 0.35e-3,
            "l_m": 1.589e-3,
            "l_e": 1.74e-3,
            "j_rotor": 0.3883,
            "r_s": 15.55e-3,
            "r_e": 7.2e-3,
            "k": 65.21,
        },
        dict(omega=12e3 * np.pi / 30, torque=0.0, i=150.0, i_e=150.0, epsilon=math.pi, u=320.0),
        dict(omega=4.3e3 * np.pi / 30, torque=0.0, i=120.0, i_e=150.0, epsilon=math.pi, u=320.0),
        ["u_a", "u_b", "u_c", "u_sd", "u_sq", "u_e"],
        ["i_a", "i_b", "i_c", "i_sd", "i_sq", "i_e"],
        ("i_sd", "i_sq", "i_e"),
        ("u_sd", "u_sq", "u_e"),
        eesm_ode,
        eesm_torque,
        {"states": {"i_sq": 0.0, "i_sd": 0.0, "i_e": 0.0, "epsilon": 0.0}, "interval": None,
         "random_init": None, "random_params": (None, None)},
        _eesm_torque_limit,
        **kwargs,
    )
    return spec


# ---------------------------------------------------------------------------
# Induction motors (induction_motor.py + subclasses)
# ---------------------------------------------------------------------------


def _im_derived(mp):
    l_s = mp["l_m"] + mp["l_sigs"]
    l_r = mp["l_m"] + mp["l_sigr"]
    sigma = (l_s * l_r - mp["l_m"] ** 2) / (l_s * l_r)
    tau_r = l_r / mp["r_r"]
    tau_sig = sigma * l_s / (mp["r_s"] + mp["r_r"] * (mp["l_m"] ** 2) / (l_r**2))
    return l_s, l_r, sigma, tau_r, tau_sig


def induction_ode(mp, state, u_sr_alphabeta, omega):
    """5-state alpha/beta induction machine ODE, cf. induction_motor.py:287-313.

    state = [i_salpha, i_sbeta, psi_ralpha, psi_rbeta, epsilon]
    u_sr_alphabeta = ((u_salpha, u_sbeta), (u_ralpha, u_rbeta))
    """
    l_s, l_r, sigma, tau_r, tau_sig = _im_derived(mp)
    i_sa, i_sb, psi_ra, psi_rb = state[0], state[1], state[2], state[3]
    p = mp["p"]
    u_sal, u_sbe = u_sr_alphabeta[0][0], u_sr_alphabeta[0][1]
    u_ral, u_rbe = u_sr_alphabeta[1][0], u_sr_alphabeta[1][1]
    c_psi = mp["l_m"] * mp["r_r"] / (sigma * l_s * l_r**2)
    c_w = mp["l_m"] * p / (sigma * l_r * l_s)
    c_u = 1.0 / (sigma * l_s)
    c_ur = mp["l_m"] / (sigma * l_r * l_s)
    di_sa = -i_sa / tau_sig + c_psi * psi_ra + c_w * omega * psi_rb + c_u * u_sal - c_ur * u_ral
    di_sb = -i_sb / tau_sig + c_psi * psi_rb - c_w * omega * psi_ra + c_u * u_sbe - c_ur * u_rbe
    dpsi_ra = mp["l_m"] / tau_r * i_sa - psi_ra / tau_r - p * omega * psi_rb + u_ral
    dpsi_rb = mp["l_m"] / tau_r * i_sb - psi_rb / tau_r + p * omega * psi_ra + u_rbe
    deps = p * omega
    return jnp.stack([di_sa, di_sb, dpsi_ra, dpsi_rb, deps])


def scim_ode(mp, state, u_salphabeta, omega):
    """SCIM: rotor windings are short-circuited, u_r = 0 (squirrel_cage_induction_motor.py:121-129)."""
    zero = jnp.zeros_like(u_salphabeta[0])
    return induction_ode(mp, state, (u_salphabeta, (zero, zero)), omega)


def induction_torque(mp, state):
    """induction_motor.py:236-248."""
    l_r = mp["l_m"] + mp["l_sigr"]
    return 1.5 * mp["p"] * mp["l_m"] / l_r * (state[2] * state[1] - state[3] * state[0])


def _im_torque_limit(mp, limits, nominal):
    """induction_motor.py:223-234."""
    l_r = mp["l_m"] + mp["l_sigr"]
    return 1.5 * mp["p"] * mp["l_m"] ** 2 / l_r * limits["i_sd"] * limits["i_sq"] / 2


def _im_spec(kind, defaults, default_limits, default_nominal, io_voltages, io_currents, ode,
             motor_parameter=None, nominal_values=None, limit_values=None, motor_initializer=None,
             initial_limits=None):
    parameter = update_parameter_dict(defaults, motor_parameter or {})
    # The reference keeps the 'u'/'i' placeholders in the limit dict and fills
    # the per-quantity IO entries via the agenda only — phase voltage limits
    # are HALF the placeholder 'u' (squirrel_cage_induction_motor.py:131-144,
    # doubly_fed_induction_motor.py:135-152).  User-provided per-quantity
    # limit_values take precedence (they pre-populate the dict).
    limits = dict(default_limits)
    limits.update(limit_values or {})
    nominal = dict(default_nominal)
    nominal.update(nominal_values or {})

    voltage_limit = 0.5 * limits["u"]
    voltage_nominal = 0.5 * nominal["u"]
    limits_agenda, nominal_agenda = {}, {}
    r_div = parameter["r_s"] if kind == "SCIM" else parameter["r_r"]
    for u, i in zip(io_voltages, io_currents):
        limits_agenda[u] = voltage_limit
        nominal_agenda[u] = voltage_nominal
        limits_agenda[i] = limits.get("i", None) or limits[u] / r_div
        nominal_agenda[i] = nominal.get("i", None) or nominal[u] / r_div
    limits_agenda["omega"] = default_limits["omega"]
    limits, nominal = _complete(limits, nominal, limits_agenda, nominal_agenda)
    tl = {"torque": _im_torque_limit(parameter, limits, nominal)}
    limits, nominal = _complete(limits, nominal, tl)

    initializer = {
        "states": {"i_salpha": 0.0, "i_sbeta": 0.0, "psi_ralpha": 0.0, "psi_rbeta": 0.0, "epsilon": 0.0},
        "interval": None,
        "random_init": None,
        "random_params": (None, None),
    }
    initializer.update(motor_initializer or {})
    init_lims = dict(nominal)
    init_lims.update(initial_limits or {})

    return MotorSpec(
        kind=kind,
        ode_states=("i_salpha", "i_sbeta", "psi_ralpha", "psi_rbeta", "epsilon"),
        currents=("i_salpha", "i_sbeta"),
        voltages=("u_salpha", "u_sbeta"),
        parameter=parameter,
        limits=limits,
        nominal=nominal,
        initializer=initializer,
        initial_limits=init_lims,
        ode=ode,
        torque=induction_torque,
        i_in=lambda mp, s: s[:2],
        jacobian=None,
    )


_IM_IO_VOLTAGES = ["u_sa", "u_sb", "u_sc", "u_salpha", "u_sbeta", "u_sd", "u_sq"]
_IM_IO_CURRENTS = ["i_sa", "i_sb", "i_sc", "i_salpha", "i_sbeta", "i_sd", "i_sq"]
_DFIM_IO_VOLTAGES = _IM_IO_VOLTAGES + ["u_ra", "u_rb", "u_rc", "u_rd", "u_rq", "u_ralpha", "u_rbeta"]
_DFIM_IO_CURRENTS = _IM_IO_CURRENTS + ["i_ra", "i_rb", "i_rc", "i_rd", "i_rq", "i_ralpha", "i_rbeta"]


def scim(**kwargs) -> MotorSpec:
    return _im_spec(
        "SCIM",
        {"p": 2.0, "l_m": 143.75e-3, "l_sigs": 5.87e-3, "l_sigr": 5.87e-3, "j_rotor": 1.1e-3,
         "r_s": 2.9338, "r_r": 1.355},
        dict(omega=4e3 * np.pi / 30, torque=0.0, i=5.5, epsilon=math.pi, u=560.0),
        dict(omega=3e3 * np.pi / 30, torque=0.0, i=3.9, epsilon=math.pi, u=560.0),
        _IM_IO_VOLTAGES,
        _IM_IO_CURRENTS,
        scim_ode,
        **kwargs,
    )


def dfim(**kwargs) -> MotorSpec:
    return _im_spec(
        "DFIM",
        {"p": 2.0, "l_m": 297.5e-3, "l_sigs": 25.71e-3, "l_sigr": 25.71e-3, "j_rotor": 13.695e-3,
         "r_s": 4.42, "r_r": 3.51},
        dict(omega=1800 * np.pi / 30, torque=0.0, i=9.0, epsilon=math.pi, u=720.0),
        dict(omega=1650 * np.pi / 30, torque=0.0, i=7.5, epsilon=math.pi, u=720.0),
        _DFIM_IO_VOLTAGES,
        _DFIM_IO_CURRENTS,
        induction_ode,
        **kwargs,
    )


# ---------------------------------------------------------------------------
# Switched reluctance motor — EXTENSION.  The reference only STUBS the SRM
# (envs/gym_srm/srm_finite_control_env.py raises NotImplementedError on
# every method); this is a working 3-phase SRM with the standard
# sinusoidal-inductance (unsaturated) model:
#
#   L_k(eps)   = l0 - l1 cos(eps - k 2pi/3),  eps = p * theta_mech
#   dL_k/dth   = p l1 sin(eps - k 2pi/3)
#   u_k        = r_s i_k + L_k di_k/dt + i_k dL_k/dth * omega
#   T          = sum_k 1/2 i_k^2 dL_k/dth      (reluctance torque)
#
# Phase currents are UNIPOLAR (the asymmetric half-bridge conducts one
# direction; the system clamps i >= 0 after each step — ideal diodes).
#
# MAGNETIC SATURATION (opt-in, ``motor_parameter={"psi_s": ...}``): the
# exponential flux model (Torrey/Lang-style analytic saturating SRM)
#
#   psi_k(eps, i) = psi_s (1 - exp(-i L_k / psi_s))
#   u = R i + (dpsi/di) di/dt + (dpsi/deps_mech) omega
#     => di/dt = (u - R i - i L'_k omega e^{-x}) / (L_k e^{-x}),
#        x = i L_k / psi_s
#   T = sum_k dW'_k/dth = sum_k (L'_k psi_s^2 / L_k^2)
#                              [(1 - e^{-x}) - x e^{-x}]
#     (coenergy W' = psi_s i + (psi_s^2/L)(e^{-x} - 1); the small-x limit
#      recovers the linear 1/2 i^2 L' exactly).
#
# psi_s absent/None selects the linear model (bit-identical behavior).
# ---------------------------------------------------------------------------

_SRM_PHI = (0.0, 2.0 * math.pi / 3.0, 4.0 * math.pi / 3.0)


def _srm_sat(mp):
    v = mp.get("psi_s", None)
    return None if v is None or float(v) <= 0.0 else v


def srm_ode(mp, state, u_in, omega):
    eps = state[3]
    phi = jnp.asarray(_SRM_PHI, dtype=state.dtype)
    s_k = jnp.sin(eps - phi)
    l_k = mp["l0"] - mp["l1"] * jnp.cos(eps - phi)
    dl_dth = mp["p"] * mp["l1"] * s_k
    i = state[:3]
    psi_s = _srm_sat(mp)
    if psi_s is None:
        di = (u_in - mp["r_s"] * i - i * dl_dth * omega) / l_k
    else:
        e = jnp.exp(-i * l_k / psi_s)      # incremental-saturation factor
        di = (u_in - mp["r_s"] * i - i * dl_dth * omega * e) / (l_k * e)
    return jnp.concatenate([di, jnp.stack([mp["p"] * omega])])


def srm_torque(mp, state):
    eps = state[3]
    phi = jnp.asarray(_SRM_PHI, dtype=state.dtype)
    dl_dth = mp["p"] * mp["l1"] * jnp.sin(eps - phi)
    i = state[:3]
    psi_s = _srm_sat(mp)
    if psi_s is None:
        return jnp.sum(0.5 * i * i * dl_dth)
    l_k = mp["l0"] - mp["l1"] * jnp.cos(eps - phi)
    x = i * l_k / psi_s
    e = jnp.exp(-x)
    return jnp.sum((dl_dth * psi_s**2 / (l_k * l_k))
                   * ((1.0 - e) - x * e))


def switched_reluctance_motor(motor_parameter=None, nominal_values=None,
                              limit_values=None, motor_initializer=None
                              ) -> MotorSpec:
    """3-phase switched reluctance motor (extension — upstream stub only).

    Parameters: ``r_s`` phase resistance, ``l_min``/``l_max`` unaligned/
    aligned phase inductance (the sinusoidal profile interpolates),
    ``p`` rotor pole count (the electrical angle advances at p * omega),
    ``j_rotor``.  Torque limit = the single-phase maximum
    0.5 i_lim^2 p l1."""
    defaults = {"p": 4.0, "r_s": 0.5, "l_min": 12e-3, "l_max": 60e-3,
                "j_rotor": 5e-3, "psi_s": None}
    parameter = update_parameter_dict(defaults, motor_parameter or {})
    if parameter.get("psi_s") is None:
        # absent key selects the linear model (mp() would turn None into
        # nan and silently poison the ODE)
        parameter.pop("psi_s", None)
    parameter["l0"] = 0.5 * (parameter["l_max"] + parameter["l_min"])
    parameter["l1"] = 0.5 * (parameter["l_max"] - parameter["l_min"])
    limits = dict(omega=500.0, torque=0.0, i=20.0, epsilon=math.pi, u=400.0)
    limits.update(limit_values or {})
    nominal = dict(omega=300.0, torque=0.0, i=16.0, epsilon=math.pi,
                   u=400.0)
    nominal.update(nominal_values or {})
    limits_agenda, nominal_agenda = {}, {}
    for k in "abc":
        limits_agenda[f"u_{k}"] = limits["u"]    # full DC link per phase
        nominal_agenda[f"u_{k}"] = nominal["u"]
        limits_agenda[f"i_{k}"] = limits["i"]
        nominal_agenda[f"i_{k}"] = nominal["i"]
    limits, nominal = _complete(limits, nominal, limits_agenda,
                                nominal_agenda)
    tl = 0.5 * limits["i"] ** 2 * parameter["p"] * parameter["l1"]
    limits, nominal = _complete(limits, nominal, {"torque": tl})
    initializer = {"states": {"i_a": 0.0, "i_b": 0.0, "i_c": 0.0,
                              "epsilon": 0.0},
                   "interval": None, "random_init": None,
                   "random_params": (None, None)}
    initializer.update(motor_initializer or {})
    return MotorSpec(
        kind="SRM",
        ode_states=("i_a", "i_b", "i_c", "epsilon"),
        currents=("i_a", "i_b", "i_c"),
        voltages=("u_a", "u_b", "u_c"),
        parameter=parameter,
        limits=limits,
        nominal=nominal,
        initializer=initializer,
        initial_limits=dict(nominal),
        ode=srm_ode,
        torque=srm_torque,
        i_in=lambda mp, s: s[:3],
        jacobian=None,
        has_jacobian=False,
    )


MOTOR_FACTORIES = {
    "PermExDc": permex_dc,
    "SeriesDc": series_dc,
    "ShuntDc": shunt_dc,
    "ExtExDc": extex_dc,
    "PMSM": pmsm,
    "SynRM": synrm,
    "EESM": eesm,
    "SCIM": scim,
    "DFIM": dfim,
    "SRM": switched_reluctance_motor,
}
