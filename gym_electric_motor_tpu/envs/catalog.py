"""Environment catalog: the 54 reference environment ids + 6 SRM extension ids.

The reference implements 54 near-identical ~190-LoC classes
(``/root/reference/src/gym_electric_motor/envs/``); here the catalog is a
table keyed by the env-id grammar ``{Finite|Cont}-{CC|TC|SC}-{Motor}-v0``
(``envs/motors.py:68-86``).  Default components per id were extracted from
the reference env classes and are overridable through ``make()`` kwargs
(the env-arg pattern of ``utils.initialize``, utils.py:5-16).
"""

from __future__ import annotations

from .. import references as rg
from ..constraints import LimitConstraint, SquaredConstraint
from ..core import ElectricMotorEnvironment
from ..models import converters as cv
from ..models import loads as ld
from ..models import motors as mt
from ..models import supplies as sp
from ..physical_systems import (
    DcMotorSystem,
    DFIMSystem,
    EESMSystem,
    SCIMSystem,
    SRMSystem,
    SynchronousMotorSystem,
)
from ..rewards import WeightedSumOfErrors

# The reference's 9 motor families + the SRM EXTENSION (the reference only
# stubs switched-reluctance envs — envs/gym_srm/*.py raise
# NotImplementedError; here the 6 SRM ids are fully functional).
_MOTORS = ["PermExDc", "ExtExDc", "SeriesDc", "ShuntDc", "PMSM", "EESM", "SynRM", "SCIM", "DFIM", "SRM"]
REFERENCE_MOTORS = _MOTORS[:-1]
_TASKS = ["CC", "TC", "SC"]
_ACTIONS = ["Finite", "Cont"]

ENV_IDS = [f"{a}-{t}-{m}-v0" for m in _MOTORS for t in _TASKS for a in _ACTIONS]

# Per-env default tables (extracted from the reference env classes; see the
# per-family files under /root/reference/src/gym_electric_motor/envs/).
# Key: (action, task, motor) -> dict of defaults.

_SUPPLY_U = {
    # (action, task, motor) exceptions; default below
    ("Finite", "CC", "SeriesDc"): 420.0,
    ("Finite", "TC", "SeriesDc"): 420.0,
    ("Cont", "CC", "PMSM"): 300.0,
    ("Cont", "CC", "EESM"): 300.0,
}


def _supply_u(a, t, m):
    if (a, t, m) in _SUPPLY_U:
        return _SUPPLY_U[(a, t, m)]
    if m in ("PermExDc", "ExtExDc", "SeriesDc", "ShuntDc"):
        return 60.0
    if m == "SRM":
        return 400.0
    return 420.0


# PolynomialStaticLoad parameters for SC tasks.
_SC_LOAD = {
    ("Finite", "PermExDc"): dict(a=0.0, b=0.0, c=0.0, j_load=1e-3),
    ("Cont", "PermExDc"): dict(a=0.0, b=0.0, c=0.0, j_load=1e-4),
    ("Finite", "ExtExDc"): dict(a=0.0, b=0.0, c=0.0, j_load=1e-4),
    ("Cont", "ExtExDc"): dict(a=0.0, b=0.0, c=0.0, j_load=1e-4),
    ("Finite", "SeriesDc"): dict(a=0.15, b=0.05, c=0.0, j_load=1e-4),
    ("Cont", "SeriesDc"): dict(a=0.01, b=0.05, c=0.0, j_load=1e-4),
    ("Finite", "ShuntDc"): dict(a=0.05, b=0.01, c=0.0, j_load=1e-4),
    ("Cont", "ShuntDc"): dict(a=0.05, b=0.01, c=0.0, j_load=1e-4),
}

# Wiener sigma ranges explicitly set by the reference envs (else the
# generator default (1e-3, 1e-1) applies).
_REF_SIGMA = {
    ("CC", "PermExDc"): (1e-2, 1e-1),
    ("TC", "PermExDc"): (1e-2, 1e-1),
    ("SC", "PermExDc", "Cont"): (1e-3, 5e-2),
    ("SC", "PermExDc", "Finite"): (1e-3, 5e-3),
    ("SC", "SeriesDc", "Cont"): (1e-3, 2e-2),
    ("SC", "SeriesDc", "Finite"): (1e-3, 5e-3),
    ("SC", "ShuntDc", "Cont"): (1e-3, 3e-2),
    ("SC", "ShuntDc", "Finite"): (1e-3, 5e-3),
    ("SC", "SynRM"): (1e-3, 1e-2),
    ("SC", "SCIM"): (1e-3, 1e-2),
    ("SC", "DFIM"): (1e-3, 1e-2),
}


def _sigma_for(task, motor, action):
    for key in ((task, motor, action), (task, motor)):
        if key in _REF_SIGMA:
            return _REF_SIGMA[key]
    return (1e-3, 1e-1)


def _default_converter(action, motor, tau):
    if motor in ("PermExDc", "SeriesDc", "ShuntDc"):
        return (cv.finite_four_quadrant_converter(tau) if action == "Finite"
                else cv.cont_four_quadrant_converter(tau))
    if motor == "ExtExDc":
        if action == "Finite":
            subs = [cv.finite_four_quadrant_converter(tau), cv.finite_four_quadrant_converter(tau)]
            return cv.finite_multi_converter(subs, tau)
        subs = [cv.cont_four_quadrant_converter(tau), cv.cont_four_quadrant_converter(tau)]
        return cv.cont_multi_converter(subs, tau)
    if motor in ("PMSM", "SynRM", "SCIM"):
        return (cv.finite_b6_bridge_converter(tau) if action == "Finite"
                else cv.cont_b6_bridge_converter(tau))
    if motor == "EESM":
        if action == "Finite":
            subs = [cv.finite_b6_bridge_converter(tau), cv.finite_four_quadrant_converter(tau)]
            return cv.finite_multi_converter(subs, tau)
        subs = [cv.cont_b6_bridge_converter(tau), cv.cont_four_quadrant_converter(tau)]
        return cv.cont_multi_converter(subs, tau)
    if motor == "DFIM":
        if action == "Finite":
            subs = [cv.finite_b6_bridge_converter(tau), cv.finite_b6_bridge_converter(tau)]
            return cv.finite_multi_converter(subs, tau)
        subs = [cv.cont_b6_bridge_converter(tau), cv.cont_b6_bridge_converter(tau)]
        return cv.cont_multi_converter(subs, tau)
    if motor == "SRM":
        return (cv.finite_asymmetric_bridge_converter(tau) if action == "Finite"
                else cv.cont_asymmetric_bridge_converter(tau))
    raise KeyError(motor)


def _default_references(task, motor, action):
    sig = _sigma_for(task, motor, action)
    if task == "SC":
        return rg.ReferenceSpec([rg.WienerProcessReference("omega", sigma_range=sig)])
    if task == "TC":
        if motor == "ShuntDc" and action == "Cont":
            return rg.ReferenceSpec(
                [rg.WienerProcessReference("torque", sigma_range=sig, limit_margin=(0, 0.8))]
            )
        return rg.ReferenceSpec([rg.WienerProcessReference("torque", sigma_range=sig)])
    # CC
    if motor in ("PermExDc", "SeriesDc"):
        return rg.ReferenceSpec([rg.WienerProcessReference("i", sigma_range=sig)])
    if motor == "ShuntDc":
        return rg.ReferenceSpec([rg.WienerProcessReference("i_a", sigma_range=sig)])
    if motor == "ExtExDc":
        return rg.ReferenceSpec([
            rg.WienerProcessReference("i_a", sigma_range=sig),
            rg.WienerProcessReference("i_e", sigma_range=sig),
        ])
    if motor == "EESM":
        return rg.ReferenceSpec([
            rg.WienerProcessReference("i_sd"),
            rg.WienerProcessReference("i_sq"),
            rg.WienerProcessReference("i_e", limit_margin=(0, 1)),
        ])
    if motor == "SRM":
        # unipolar phase currents -> references live in [0, 1]
        return rg.ReferenceSpec([
            rg.WienerProcessReference("i_a", sigma_range=sig, limit_margin=(0, 1)),
            rg.WienerProcessReference("i_b", sigma_range=sig, limit_margin=(0, 1)),
            rg.WienerProcessReference("i_c", sigma_range=sig, limit_margin=(0, 1)),
        ])
    return rg.ReferenceSpec([
        rg.WienerProcessReference("i_sd"),
        rg.WienerProcessReference("i_sq"),
    ])


def _default_reward(task, motor):
    if task == "SC":
        return WeightedSumOfErrors(reward_weights=dict(omega=1.0))
    if task == "TC":
        return WeightedSumOfErrors(reward_weights=dict(torque=1.0))
    if motor in ("PermExDc", "SeriesDc"):
        return WeightedSumOfErrors(reward_weights=dict(i=1.0))
    if motor == "ShuntDc":
        return WeightedSumOfErrors(reward_weights=dict(i_a=1.0))
    if motor == "ExtExDc":
        return WeightedSumOfErrors(reward_weights=dict(i_a=0.5, i_e=0.5))
    if motor == "EESM":
        return WeightedSumOfErrors(reward_weights=dict(i_sd=1 / 3, i_sq=1 / 3, i_e=1 / 3))
    if motor == "SRM":
        return WeightedSumOfErrors(reward_weights=dict(i_a=1 / 3, i_b=1 / 3, i_c=1 / 3))
    return WeightedSumOfErrors(reward_weights=dict(i_sd=0.5, i_sq=0.5))


def _default_constraints(motor):
    if motor in ("PermExDc", "SeriesDc"):
        return (LimitConstraint(("i",)),)
    if motor in ("ShuntDc", "ExtExDc"):
        return (LimitConstraint(("i_a",)), LimitConstraint(("i_e",)))
    if motor == "EESM":
        return (SquaredConstraint(("i_sq", "i_sd")), LimitConstraint(("i_e",)))
    if motor == "SRM":
        return (LimitConstraint(("i_a", "i_b", "i_c")),)
    return (SquaredConstraint(("i_sq", "i_sd")),)


_SYSTEM_CLASSES = {
    "PermExDc": DcMotorSystem,
    "ExtExDc": DcMotorSystem,
    "SeriesDc": DcMotorSystem,
    "ShuntDc": DcMotorSystem,
    "PMSM": SynchronousMotorSystem,
    "SynRM": SynchronousMotorSystem,
    "EESM": EESMSystem,
    "SCIM": SCIMSystem,
    "DFIM": DFIMSystem,
    "SRM": SRMSystem,
}


def _parse_env_id(env_id):
    parts = env_id.split("-")
    if len(parts) != 4 or parts[0] not in _ACTIONS or parts[1] not in _TASKS \
            or parts[2] not in _MOTORS or parts[3] != "v0":
        raise KeyError(f"Unknown env id {env_id!r}; valid ids: {{Finite|Cont}}-{{CC|TC|SC}}-"
                       f"{{{'|'.join(_MOTORS)}}}-v0")
    return parts[0], parts[1], parts[2]


def make_functional(
    env_id: str,
    supply=None,
    converter=None,
    motor=None,
    load=None,
    reference_generator=None,
    reward_function=None,
    constraints=None,
    state_filter=None,
    tau=None,
    solver="rk4",
    substeps=1,
    control_space="abc",
    dtype=None,
    physical_system_wrappers=(),
    dynamic_params=False,
) -> ElectricMotorEnvironment:
    """Build the functional environment for a reference env id.

    Components may be overridden with spec instances (the counterpart of the
    reference's instance/dict/class env-arg pattern)."""
    action, task, motor_name = _parse_env_id(env_id)
    tau = tau if tau is not None else (1e-5 if action == "Finite" else 1e-4)

    # The env-arg pattern (utils.py:5-16): every component accepts an
    # instance (spec) or a dict of keyword overrides merged into the default
    # factory call.
    if isinstance(supply, dict):
        kw = dict(u_nominal=_supply_u(action, task, motor_name))
        kw.update(supply)
        supply = sp.ideal_voltage_supply(**kw)
    else:
        supply = supply or sp.ideal_voltage_supply(_supply_u(action, task, motor_name))
    if isinstance(converter, dict):
        default_conv = _default_converter(action, motor_name, tau)
        converter = cv.CONVERTER_FACTORIES[default_conv.kind](tau=tau, **converter) \
            if default_conv.kind in cv.CONVERTER_FACTORIES and "Multi" not in default_conv.kind \
            else default_conv
    else:
        converter = converter or _default_converter(action, motor_name, tau)
    if isinstance(motor, dict):
        motor_spec = mt.MOTOR_FACTORIES[motor_name](**motor)
    else:
        motor_spec = motor or mt.MOTOR_FACTORIES[motor_name]()
    if isinstance(load, dict):
        if task == "SC":
            params = _SC_LOAD.get((action, motor_name), dict(a=0.01, b=0.01, c=0.0, j_load=1e-5))
            params = dict(params)
            params.update(load.get("load_parameter", load))
            load = ld.polynomial_static_load(params)
        else:
            load = ld.constant_speed_load(**load)
    elif load is None:
        if task == "SC":
            load = ld.polynomial_static_load(
                _SC_LOAD.get((action, motor_name), dict(a=0.01, b=0.01, c=0.0, j_load=1e-5))
            )
        else:
            omega_fixed = 230.0 if (motor_name, task, action) == ("ShuntDc", "TC", "Cont") else 100.0
            load = ld.constant_speed_load(omega_fixed=omega_fixed)
    reference_generator = reference_generator or _default_references(task, motor_name, action)
    reward_function = reward_function or _default_reward(task, motor_name)
    constraints = constraints if constraints is not None else _default_constraints(motor_name)

    system_cls = _SYSTEM_CLASSES[motor_name]
    kwargs = dict(supply=supply, converter=converter, motor=motor_spec, load=load,
                  tau=tau, solver=solver, substeps=substeps,
                  dynamic_params=dynamic_params)
    if issubclass(system_cls, (SynchronousMotorSystem, SCIMSystem)):
        # includes EESM (3-dim dq) and DFIM (which rejects dq loudly)
        kwargs["control_space"] = control_space
    elif control_space != "abc":
        raise ValueError(
            f"control_space={control_space!r} is not supported for {motor_name} "
            "(three-phase systems only; reference physical_systems.py:423-431)"
        )
    if dtype is not None:
        kwargs["dtype"] = dtype
    system = system_cls(**kwargs)
    physical_system_wrappers = tuple(physical_system_wrappers)
    if motor_name == "ShuntDc":
        # All reference ShuntDc envs append a CurrentSumProcessor by default
        # (e.g. envs/gym_dcm/shunt_dc_motor_env/finite_cc_shunt_dc_env.py:192)
        from ..wrappers import CurrentSumProcessor

        physical_system_wrappers = physical_system_wrappers + (
            CurrentSumProcessor(("i_a", "i_e")),
        )
    if physical_system_wrappers:
        from ..wrappers import apply_wrappers

        system = apply_wrappers(system, physical_system_wrappers)

    return ElectricMotorEnvironment(
        physical_system=system,
        reference_generator=reference_generator,
        reward_function=reward_function,
        constraints=constraints,
        state_filter=state_filter,
    )


def make(env_id: str, **kwargs):
    """Gymnasium-style single-env adapter around :func:`make_functional`.

    ``callbacks`` / ``visualization`` / ``render_mode`` hook the host step
    loop like the reference env (core.py:287-289)."""
    from .gym_adapter import GymnasiumEnv

    n_envs = kwargs.pop("n_envs", None)
    callbacks = kwargs.pop("callbacks", ())
    visualization = kwargs.pop("visualization", None)
    render_mode = kwargs.pop("render_mode", None)
    env = make_functional(env_id, **kwargs)
    if n_envs:
        from ..core import VectorEnv

        return VectorEnv(env, n_envs)
    return GymnasiumEnv(env, callbacks=callbacks, visualization=visualization,
                        render_mode=render_mode)


def registry():
    return list(ENV_IDS)
