"""Callback bus, RampingLimitMargin curriculum, dashboard and observer tests
(counterparts of the reference's tests/test_callbacks.py and the
visualization smoke checks)."""

import os

import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.callbacks import Callback, RampingLimitMargin
from gym_electric_motor_tpu.observers import StateObserver
from gym_electric_motor_tpu.visualization import (
    ConsolePrinter,
    MeanEpisodeRewardPlot,
    MotorDashboard,
    RenderMode,
)


class SpyCallback(Callback):
    def __init__(self):
        super().__init__()
        self.calls = []

    def on_reset_begin(self):
        self.calls.append("reset_begin")

    def on_reset_end(self, state, reference):
        self.calls.append("reset_end")

    def on_step_begin(self, k, action):
        self.calls.append(("step_begin", k))

    def on_step_end(self, k, state, reference, reward, terminated):
        self.calls.append(("step_end", k))

    def on_close(self):
        self.calls.append("close")


def test_callback_dispatch_order():
    spy = SpyCallback()
    env = gemx.make("Finite-CC-PermExDc-v0", callbacks=(spy,))
    env.reset(seed=0)
    env.step(1)
    env.step(2)
    env.close()
    assert spy.calls == [
        "reset_begin", "reset_end",
        ("step_begin", 0), ("step_end", 0),
        ("step_begin", 1), ("step_end", 1),
        "close",
    ]


def test_ramping_limit_margin():
    cb = RampingLimitMargin(
        initial_limit_margin=(-0.2, 0.2), maximum_limit_margin=(-1, 1),
        step_size=0.4, update_time="episode", update_freq=1,
    )
    env = gemx.make("Finite-SC-PermExDc-v0", callbacks=(cb,))
    env.reset(seed=0)
    # after first reset: one update applied (freq=1) -> (-0.6, 0.6)
    np.testing.assert_allclose(cb._limit_margin, (-0.6, 0.6), rtol=1e-9)
    m = env._state.refs[0]
    np.testing.assert_allclose(float(m["mlo"]), -0.6, rtol=1e-6)
    np.testing.assert_allclose(float(m["mhi"]), 0.6, rtol=1e-6)
    # reference values respect the narrowed margin (until the episode ends —
    # each reset advances the curriculum)
    for _ in range(300):
        (s, r), _rew, term, *_ = env.step(1)
        assert -0.6 - 1e-6 <= float(r[0]) <= 0.6 + 1e-6
        if term:
            break
    env.reset()
    assert cb._limit_margin == (-1.0, 1.0)  # saturated at maximum
    m = env._state.refs[0]
    np.testing.assert_allclose(float(m["mhi"]), 1.0)


def test_console_printer(capsys):
    env = gemx.make("Finite-CC-PermExDc-v0", visualization=ConsolePrinter(verbose=1))
    env.reset(seed=1)
    for _ in range(5):
        env.step(1)
    env.reset()
    out = capsys.readouterr().out
    assert "Episode 0" in out and "steps: 5" in out


def test_dashboard_records_and_saves(tmp_path):
    dash = MotorDashboard(state_plots=("omega", "i"), reward_plot=True,
                          update_interval=50, render_mode=RenderMode.FigureOnce)
    env = gemx.make("Cont-CC-PermExDc-v0", visualization=dash)
    env.reset(seed=2)
    for _ in range(60):
        _obs, _r, term, *_ = env.step(np.array([0.4]))
        if term:
            env.reset()
    paths = dash.save_to_file(str(tmp_path / "dash"))
    assert paths and all(os.path.exists(p) for p in paths)


def test_dashboard_episode_plot():
    dash = MotorDashboard(additional_plots=(MeanEpisodeRewardPlot(),),
                          update_interval=10)
    env = gemx.make("Finite-CC-PermExDc-v0", visualization=dash)
    for ep in range(3):
        env.reset(seed=ep)
        for _ in range(4):
            env.step(1)
    env.reset()
    plot = dash._episode_plots[0]
    assert len(plot._values) == 3
    assert all(np.isfinite(v) for v in plot._values)


def test_plot_rollout_bulk():
    env = gemx.make_functional("Cont-CC-PermExDc-v0")
    import jax

    venv = gemx.VectorEnv(env, n_envs=2)
    state, obs = venv.reset(jax.random.PRNGKey(0))
    traj = []
    for _ in range(30):
        state, (s, r), rew, term = venv.step(state, np.full((2, 1), 0.3, np.float32))
        traj.append(np.asarray(s)[0])
    dash = MotorDashboard(state_plots=("omega", "i"))
    fig = dash.plot_rollout(env, np.array(traj))
    assert fig is not None


def test_state_observer():
    env = gemx.make("Finite-CC-PermExDc-v0")
    env.reset(seed=0)
    env.step(1)
    obs = StateObserver("i", env)
    val = obs.observe()
    assert np.isfinite(val)
    ref_obs = StateObserver("i_ref", env)
    assert np.isfinite(ref_obs.observe())
    with pytest.raises(KeyError):
        StateObserver("nonsense", env).observe()


def test_motor_dashboard_legacy_alias():
    """The deprecated MotorDashboardLegacy API (motor_dashboard.py:15-310)
    constructs with the legacy scale_plots kwarg and warns."""
    import warnings

    from gym_electric_motor_tpu.visualization import MotorDashboardLegacy

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        dash = MotorDashboardLegacy(state_plots="all", reward_plot=True,
                                    scale_plots=True)
    assert any(issubclass(x.category, DeprecationWarning) for x in w)
    assert dash.update_interval == 1000


def test_external_plot(tmp_path):
    """ExternalPlot mirrors the reference's external_plot.py usage: a
    referenced series plus two additional lines injected per step via
    add_data ride the dashboard's time axis and render/save."""
    from gym_electric_motor_tpu.visualization import ExternalPlot

    ext = ExternalPlot(referenced=True, additional_lines=2,
                       min=-1.0, max=1.0)
    ext.set_label({"y_label": "y", "state_label": "$x$",
                   "ref_label": "$x^*$", "add_label": ["$a$", "$b$"]})
    dash = MotorDashboard(state_plots=("i",), additional_plots=(ext,),
                          update_interval=100,
                          render_mode=RenderMode.FigureOnce)
    env = gemx.make("Finite-CC-PermExDc-v0", visualization=dash)
    env.reset(seed=0)
    for t in range(30):
        ext.add_data([np.sin(t / 5), np.sin(t / 10),
                      np.sin(t / 15), np.sin(t / 20)])
        _obs, _r, term, *_ = env.step(1)
        if term:
            env.reset()
    captured = ext._values[~np.isnan(ext._values)]
    assert len(captured) == 30
    np.testing.assert_allclose(captured[3], np.sin(3 / 5), rtol=1e-6)
    np.testing.assert_allclose(
        ext._adds[1, ~np.isnan(ext._adds[1])][7], np.sin(7 / 20), rtol=1e-6)
    paths = dash.save_to_file(str(tmp_path / "extplot"))
    assert paths and all(os.path.exists(p) for p in paths)
    # wrong arity is a loud error
    with pytest.raises(AssertionError):
        ext.add_data([0.0, 1.0])


def test_externally_referenced_state_plot(tmp_path):
    """ExternallyReferencedStatePlot takes its dashed reference from the
    user (e.g. a cascade's intermediate setpoint), not the env — the
    reference's externally_referenced_state_plot.py behavior."""
    from gym_electric_motor_tpu.visualization import (
        ExternallyReferencedStatePlot)

    plot = ExternallyReferencedStatePlot("i")
    dash = MotorDashboard(additional_plots=(plot,), update_interval=100,
                          render_mode=RenderMode.FigureOnce)
    env = gemx.make("Cont-SC-PermExDc-v0", visualization=dash)
    env.reset(seed=1)
    for t in range(20):
        plot.external_reference(0.1 * (t % 5))
        _obs, _r, term, *_ = env.step(np.array([0.3]))
        if term:
            env.reset()
    refs = plot._refs[~np.isnan(plot._refs)]
    vals = plot._values[~np.isnan(plot._values)]
    assert len(refs) == 20 and len(vals) == 20
    np.testing.assert_allclose(refs[7], 0.1 * (7 % 5), rtol=1e-6)
    # the env DOES publish an omega reference, but this plot ignores the
    # env reference vector entirely (external source only)
    assert plot._ref_idx is None
    paths = dash.save_to_file(str(tmp_path / "extref"))
    assert paths and all(os.path.exists(p) for p in paths)
