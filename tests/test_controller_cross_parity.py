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
