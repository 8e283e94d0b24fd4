"""Cross-framework closed-loop parity: the auto-tuned cascade here must
produce the same closed-loop trajectory as the reference's gem_controllers
cascade on the same DC speed-control task.

Both loops use matched Euler integrators and a constant speed reference; the
reference side needs its known workarounds (module stubs for the absent
control_block_diagram package, unwrapped env, reference_names patch)."""

import sys
import types

import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rgx
from gym_electric_motor_tpu.controllers import GemController

N_STEPS = 6000
ENV_ID = "Cont-SC-PermExDc-v0"


def _stub_block_diagram_modules():
    class _Any:
        def __getattr__(self, k):
            return _Any()

        def __call__(self, *a, **k):
            return _Any()

        def __mro_entries__(self, bases):
            return (object,)

    for name in ("control_block_diagram", "control_block_diagram.components",
                 "control_block_diagram.predefined_components"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__getattr__ = lambda k: _Any()
            sys.modules[name] = mod


def run_reference(reference_gem):
    _stub_block_diagram_modules()
    np.complex = complex  # reference uses the removed alias
    from gym_electric_motor.physical_systems.solvers import EulerSolver
    from gym_electric_motor.reference_generators import ConstReferenceGenerator
    import gem_controllers as gc

    env = reference_gem.make(
        ENV_ID,
        ode_solver=EulerSolver(),
        reference_generator=ConstReferenceGenerator(
            reference_state="omega", reference_value=0.5),
    ).unwrapped
    env.reference_generator._reference_names = ["omega"]
    ctrl = gc.GemController.make(env, ENV_ID, block_diagram=False)
    ctrl.reset()
    (state, ref), _ = env.reset(seed=0)
    om = list(env.state_names).index("omega")
    out = []
    for _ in range(N_STEPS):
        action = ctrl.control(state, ref)
        (state, ref), _r, term, *_ = env.step(action)
        out.append(state[om])
        if term:
            break
    return np.array(out)


def run_tpu():
    import jax

    env = gemx.make_functional(
        ENV_ID, solver="euler",
        reference_generator=rgx.ConstReference("omega", reference_value=0.5),
    )
    ctrl = GemController.make(env, ENV_ID)
    out = ctrl.control_environment(env, N_STEPS, key=jax.random.PRNGKey(0))
    om = env.state_names.index("omega")
    return np.asarray(out["states"][:, om])


@pytest.mark.filterwarnings("ignore")
def test_closed_loop_matches_reference_controller(reference_gem):
    ref_tr = run_reference(reference_gem)
    tpu_tr = run_tpu()
    assert len(ref_tr) == N_STEPS, "reference loop terminated early"
    # same rise behavior and steady state: trajectories agree within 2% of
    # full scale throughout (float32 device loop vs float64 host loop)
    diff = np.abs(ref_tr - tpu_tr[: len(ref_tr)])
    assert diff.max() < 0.02, diff.max()
    np.testing.assert_allclose(tpu_tr[-100:].mean(), 0.5, atol=0.005)
    np.testing.assert_allclose(ref_tr[-100:].mean(), 0.5, atol=0.005)


# ---------------------------------------------------------------------------
# AC current-control cascades (round-2 VERDICT #6): upstream CC tuning works
# for synchronous machines — compare full trajectories.
# ---------------------------------------------------------------------------

AC_CASES = {
    "Cont-CC-PMSM-v0": {"i_sd": -0.1, "i_sq": 0.3},
    "Cont-CC-SynRM-v0": {"i_sd": 0.2, "i_sq": 0.3},
}
AC_STEPS = 3000


def run_reference_ac(reference_gem, env_id, targets):
    _stub_block_diagram_modules()
    np.complex = complex
    from gym_electric_motor.physical_systems.solvers import EulerSolver
    from gym_electric_motor.reference_generators import (
        ConstReferenceGenerator,
        MultipleReferenceGenerator,
    )
    import gem_controllers as gc

    rg = MultipleReferenceGenerator([
        ConstReferenceGenerator(reference_state=s, reference_value=v)
        for s, v in targets.items()
    ])
    env = reference_gem.make(env_id, ode_solver=EulerSolver(),
                             reference_generator=rg).unwrapped
    env.reference_generator._reference_names = list(targets)
    ctrl = gc.GemController.make(env, env_id, block_diagram=False)
    ctrl.reset()
    (state, ref), _ = env.reset(seed=0)
    idx = [list(env.state_names).index(s) for s in targets]
    out = []
    for _ in range(AC_STEPS):
        action = ctrl.control(state, ref)
        (state, ref), _r, term, *_ = env.step(action)
        out.append([state[i] for i in idx])
        if term:
            break
    return np.array(out)


def run_tpu_ac(env_id, targets):
    import jax

    env = gemx.make_functional(
        env_id, solver="euler",
        reference_generator=rgx.ReferenceSpec(
            [rgx.ConstReference(s, v) for s, v in targets.items()]),
    )
    ctrl = GemController.make(env, env_id)
    out = ctrl.control_environment(env, AC_STEPS, key=jax.random.PRNGKey(0))
    idx = [env.state_names.index(s) for s in targets]
    return np.asarray(out["states"])[:, idx]


@pytest.mark.filterwarnings("ignore")
@pytest.mark.parametrize("env_id", sorted(AC_CASES))
def test_ac_current_control_matches_reference(reference_gem, env_id):
    targets = AC_CASES[env_id]
    ref_tr = run_reference_ac(reference_gem, env_id, targets)
    tpu_tr = run_tpu_ac(env_id, targets)
    assert len(ref_tr) == AC_STEPS, "reference loop terminated early"
    diff = np.abs(ref_tr - tpu_tr[: len(ref_tr)])
    assert diff.max() < 0.02, diff.max()
    tgt = np.array(list(targets.values()))
    np.testing.assert_allclose(tpu_tr[-100:].mean(axis=0), tgt, atol=0.005)
    np.testing.assert_allclose(ref_tr[-100:].mean(axis=0), tgt, atol=0.005)


@pytest.mark.filterwarnings("ignore")
def test_eesm_cc_diverges_in_lockstep_with_reference(reference_gem):
    """The upstream EESM CC cascade drives i_sd into the limit within ~19
    steps on Cont-CC-EESM-v0 (same failure family as the documented TC/SC
    divergence, tests/test_controllers.py).  This port reproduces the cascade
    faithfully: the divergence trajectories agree step-for-step until the
    violation.  (Step semantics differ only at termination: upstream returns
    the violating state, our loop auto-resets.)"""
    targets = {"i_sd": -0.1, "i_sq": 0.25, "i_e": 0.3}
    ref_tr = run_reference_ac(reference_gem, "Cont-CC-EESM-v0", targets)
    assert len(ref_tr) < 100, "upstream EESM CC no longer diverges — compare!"

    tpu_tr = run_tpu_ac("Cont-CC-EESM-v0", targets)
    n = len(ref_tr) - 1  # exclude the terminal (auto-reset) step
    diff = np.abs(ref_tr[:n] - tpu_tr[:n])
    assert diff.max() < 1e-3, diff.max()
