"""Converter parity tests.

Every converter spec is checked against the corresponding reference converter
class (``/root/reference/src/gym_electric_motor/physical_systems/converters.py``)
over all actions, current signs and (for finite converters) previous switching
states, including nonzero interlocking time.  This subsumes the reference's
table-driven expected-voltage tests
(``tests/test_physical_systems/test_converters.py:18-60``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import gym_electric_motor_tpu.models.converters as cv

TAU = 1e-5
CURRENTS = [-0.8, 0.0, 0.6]


def run_ref_cycle(conv, action, i_in, t0=0.0):
    """One control cycle through a reference converter, mirroring
    ``SCMLSystem.simulate`` (physical_systems.py:171-192): per switching
    sub-interval record (duration, u_frac list, i_sup)."""
    times = conv.set_action(action, t0)
    out = []
    t = t0
    for t_sw in times:
        i_sup = conv.i_sup(list(np.atleast_1d(i_in)))
        u = conv.convert(list(np.atleast_1d(i_in)), t)
        out.append((t_sw - t, list(np.atleast_1d(u).astype(float)), float(i_sup)))
        t = t_sw
    return out


def run_tpu_cycle(spec, conv_state, action, i_in):
    """Same cycle through a ConverterSpec's pure functions (the unrolled
    schedule executed by ``SCMLSystem.simulate`` in physical_systems.py)."""
    action = jnp.asarray(action)
    i_vec = jnp.atleast_1d(jnp.asarray(i_in, dtype=jnp.float32))
    intervals = spec.interval_states(conv_state, action)
    durations = spec.interval_durations()
    flag = spec.interlock_flag(conv_state, action)
    out = []
    cur = conv_state
    prev = None
    for j, dur in enumerate(durations):
        i_sup = spec.i_sup(cur, action, i_vec)
        u = spec.u_frac(intervals[j], action, i_vec)
        if j > 0 and flag is not None:
            # mirror the SCMLSystem.simulate gating: without interlock this
            # cycle, the reference runs one sub-interval whose signals hold
            i_sup = jnp.where(flag, i_sup, prev[1])
            u = jnp.where(flag, u, prev[0])
        prev = (u, i_sup)
        out.append((dur, list(np.atleast_1d(np.asarray(u, dtype=float))), float(i_sup)))
        cur = intervals[j]
    return out, cur


def assert_cycles_match(ref_out, tpu_out):
    # The reference may emit more sub-intervals (e.g. a zero-length segment);
    # compare the piecewise-constant voltage/current signal over time instead.
    def signal(out):
        segs = []
        t = 0.0
        for dur, u, i_sup in out:
            if dur > 1e-12:
                segs.append((t, t + dur, tuple(np.round(u, 6)), round(i_sup, 6)))
                t += dur
        return segs

    ref_sig, tpu_sig = signal(ref_out), signal(tpu_out)
    # merge adjacent segments with equal values
    def merge(segs):
        merged = []
        for s in segs:
            if merged and merged[-1][2:] == s[2:] and abs(merged[-1][1] - s[0]) < 1e-12:
                merged[-1] = (merged[-1][0], s[1], s[2], s[3])
            else:
                merged.append(list(s) and s)
        return [(round(a, 12), round(b, 12), u, i) for a, b, u, i in merged]

    assert merge(ref_sig) == merge(tpu_sig)


# ---------------------------------------------------------------------------
# Finite converters
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("interlock", [0.0, 1e-6])
@pytest.mark.parametrize("i_in", CURRENTS)
def test_finite_one_quadrant(reference_gem, i_in, interlock):
    from gym_electric_motor.physical_systems import converters as rc

    ref = rc.FiniteOneQuadrantConverter(tau=TAU, interlocking_time=interlock)
    ref.reset()
    spec = cv.finite_one_quadrant_converter(TAU, interlock)
    conv_state = spec.init_state()
    for step, action in enumerate([0, 1, 1, 0, 1]):
        ref_out = run_ref_cycle(ref, action, i_in, t0=step * TAU)
        tpu_out, conv_state = run_tpu_cycle(spec, conv_state, action, i_in)
        assert_cycles_match(ref_out, tpu_out)


@pytest.mark.parametrize("interlock", [0.0, 1e-6])
@pytest.mark.parametrize("i_in", CURRENTS)
def test_finite_two_quadrant(reference_gem, i_in, interlock):
    from gym_electric_motor.physical_systems import converters as rc

    ref = rc.FiniteTwoQuadrantConverter(tau=TAU, interlocking_time=interlock)
    ref.reset()
    spec = cv.finite_two_quadrant_converter(TAU, interlock)
    conv_state = spec.init_state()
    for step, action in enumerate([0, 1, 2, 1, 0, 2, 2, 1]):
        ref_out = run_ref_cycle(ref, action, i_in, t0=step * TAU)
        tpu_out, conv_state = run_tpu_cycle(spec, conv_state, action, i_in)
        assert_cycles_match(ref_out, tpu_out)


@pytest.mark.parametrize("interlock", [0.0, 1e-6])
@pytest.mark.parametrize("i_in", CURRENTS)
def test_finite_four_quadrant(reference_gem, i_in, interlock):
    from gym_electric_motor.physical_systems import converters as rc

    ref = rc.FiniteFourQuadrantConverter(tau=TAU, interlocking_time=interlock)
    ref.reset()
    spec = cv.finite_four_quadrant_converter(TAU, interlock)
    conv_state = spec.init_state()
    for step, action in enumerate([0, 1, 2, 3, 1, 3, 0, 2, 1]):
        ref_out = run_ref_cycle(ref, action, i_in, t0=step * TAU)
        tpu_out, conv_state = run_tpu_cycle(spec, conv_state, action, i_in)
        assert_cycles_match(ref_out, tpu_out)


@pytest.mark.parametrize("interlock", [0.0, 1e-6])
def test_finite_b6_bridge(reference_gem, interlock):
    from gym_electric_motor.physical_systems import converters as rc

    ref = rc.FiniteB6BridgeConverter(tau=TAU, interlocking_time=interlock)
    ref.reset()
    spec = cv.finite_b6_bridge_converter(TAU, interlock)
    conv_state = spec.init_state()
    i_abc = [0.4, -0.7, 0.3]
    for step, action in enumerate([0, 5, 3, 7, 2, 6, 1, 4, 0, 7]):
        ref_out = run_ref_cycle(ref, action, i_abc, t0=step * TAU)
        tpu_out, conv_state = run_tpu_cycle(spec, conv_state, action, i_abc)
        assert_cycles_match(ref_out, tpu_out)


def test_finite_multi(reference_gem):
    from gym_electric_motor.physical_systems import converters as rc

    ref = rc.FiniteMultiConverter(
        subconverters=[
            rc.FiniteB6BridgeConverter(tau=TAU),
            rc.FiniteFourQuadrantConverter(tau=TAU),
        ],
        tau=TAU,
    )
    ref.reset()
    spec = cv.finite_multi_converter(
        [cv.finite_b6_bridge_converter(TAU), cv.finite_four_quadrant_converter(TAU)], TAU
    )
    conv_state = spec.init_state()
    i_in = [0.4, -0.7, 0.3, -0.2]
    rng = np.random.default_rng(0)
    for step in range(8):
        action = np.array([rng.integers(8), rng.integers(4)])
        ref_out = run_ref_cycle(ref, action, i_in, t0=step * TAU)
        tpu_out, conv_state = run_tpu_cycle(spec, conv_state, action, i_in)
        assert_cycles_match(ref_out, tpu_out)


# ---------------------------------------------------------------------------
# Continuous converters
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("interlock", [0.0, 1e-6])
@pytest.mark.parametrize("i_in", CURRENTS)
@pytest.mark.parametrize("action", [0.0, 0.25, 1.0])
def test_cont_one_quadrant(reference_gem, action, i_in, interlock):
    from gym_electric_motor.physical_systems import converters as rc

    ref = rc.ContOneQuadrantConverter(tau=TAU, interlocking_time=interlock)
    ref.reset()
    spec = cv.cont_one_quadrant_converter(TAU, interlock)
    ref_out = run_ref_cycle(ref, [action], i_in)
    tpu_out, _ = run_tpu_cycle(spec, spec.init_state(), [action], i_in)
    assert_cycles_match(ref_out, tpu_out)


@pytest.mark.parametrize("interlock", [0.0, 1e-6])
@pytest.mark.parametrize("i_in", CURRENTS)
@pytest.mark.parametrize("action", [0.0, 0.25, 1.0])
def test_cont_two_quadrant(reference_gem, action, i_in, interlock):
    from gym_electric_motor.physical_systems import converters as rc

    ref = rc.ContTwoQuadrantConverter(tau=TAU, interlocking_time=interlock)
    ref.reset()
    spec = cv.cont_two_quadrant_converter(TAU, interlock)
    ref_out = run_ref_cycle(ref, [action], i_in)
    tpu_out, _ = run_tpu_cycle(spec, spec.init_state(), [action], i_in)
    assert_cycles_match(ref_out, tpu_out)


@pytest.mark.parametrize("interlock", [0.0, 1e-6])
@pytest.mark.parametrize("i_in", CURRENTS)
@pytest.mark.parametrize("action", [-1.0, -0.3, 0.0, 0.6, 1.0])
def test_cont_four_quadrant(reference_gem, action, i_in, interlock):
    from gym_electric_motor.physical_systems import converters as rc

    ref = rc.ContFourQuadrantConverter(tau=TAU, interlocking_time=interlock)
    ref.reset()
    spec = cv.cont_four_quadrant_converter(TAU, interlock)
    ref_out = run_ref_cycle(ref, [action], i_in)
    tpu_out, _ = run_tpu_cycle(spec, spec.init_state(), [action], i_in)
    assert_cycles_match(ref_out, tpu_out)


@pytest.mark.parametrize("interlock", [0.0, 1e-6])
def test_cont_b6_bridge(reference_gem, interlock):
    from gym_electric_motor.physical_systems import converters as rc

    ref = rc.ContB6BridgeConverter(tau=TAU, interlocking_time=interlock)
    ref.reset()
    spec = cv.cont_b6_bridge_converter(TAU, interlock)
    i_abc = [0.4, -0.7, 0.3]
    for action in ([0.0, 0.0, 0.0], [1.0, -1.0, 0.5], [-0.2, 0.8, -0.9]):
        ref_out = run_ref_cycle(ref, np.array(action), i_abc)
        tpu_out, _ = run_tpu_cycle(spec, spec.init_state(), np.array(action), i_abc)
        assert_cycles_match(ref_out, tpu_out)


def test_cont_multi(reference_gem):
    from gym_electric_motor.physical_systems import converters as rc

    ref = rc.ContMultiConverter(
        subconverters=[
            rc.ContB6BridgeConverter(tau=TAU),
            rc.ContFourQuadrantConverter(tau=TAU),
        ],
        tau=TAU,
    )
    ref.reset()
    spec = cv.cont_multi_converter(
        [cv.cont_b6_bridge_converter(TAU), cv.cont_four_quadrant_converter(TAU)], TAU
    )
    i_in = [0.4, -0.7, 0.3, -0.2]
    action = np.array([0.3, -0.5, 0.9, -0.1])
    ref_out = run_ref_cycle(ref, action, i_in)
    tpu_out, _ = run_tpu_cycle(spec, spec.init_state(), action, i_in)
    assert_cycles_match(ref_out, tpu_out)
