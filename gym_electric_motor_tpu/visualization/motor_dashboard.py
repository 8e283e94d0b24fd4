"""MotorDashboard (motor_dashboard.py:15-400).

Host-side matplotlib dashboard fed per step through the callback bus, with
``update_interval`` batching of redraws, window/agg figure handling,
``save_to_file`` and a TPU-extra bulk path :meth:`plot_rollout` for recorded
device rollouts.
"""

from __future__ import annotations

import enum

import numpy as np

from ..callbacks import ElectricMotorVisualization
from .motor_dashboard_plots import (
    ActionPlot,
    EpisodePlot,
    MotorDashboardPlot,
    RewardPlot,
    StatePlot,
    StepPlot,
    TimePlot,
)


class RenderMode(enum.Enum):
    """render_modes.py:1-3."""

    Figure = "figure"
    FigureOnce = "figure_once"


def _mpl():
    import matplotlib

    if matplotlib.get_backend().lower() not in ("tkagg", "qtagg", "macosx"):
        try:
            matplotlib.use("Agg", force=False)
        except Exception:
            pass
    import matplotlib.pyplot as plt

    return plt


class MotorDashboard(ElectricMotorVisualization):
    """A dashboard of Time/Episode/Step plots (motor_dashboard.py:15-107)."""

    def __init__(self, state_plots=(), action_plots=(), reward_plot=False,
                 additional_plots=(), update_interval=1000, time_plot_width=10000,
                 style=None, render_mode=RenderMode.Figure):
        super().__init__()
        assert isinstance(reward_plot, bool)
        assert update_interval > 0
        self._state_plots = state_plots
        self._action_plots = action_plots
        self._reward_plot = reward_plot
        self._additional_plots = tuple(additional_plots)
        self._update_interval = int(update_interval)
        self._time_plot_width = int(time_plot_width)
        self._style = style
        self.render_mode = (RenderMode(render_mode)
                            if not isinstance(render_mode, RenderMode) else render_mode)
        self._plots = []
        self._time_plots = []
        self._episode_plots = []
        self._step_plots = []
        self._figures = []
        self._k = 0
        self._initialized = False

    @property
    def update_interval(self):
        return self._update_interval

    def set_env(self, env):
        """Instantiate the configured plots against the env (motor_dashboard.py:163-211)."""
        self._env = env
        state_names = list(env.state_names)
        states = state_names if self._state_plots == "all" else list(self._state_plots)
        actions = (list(range(1)) if self._action_plots == "all"
                   else list(self._action_plots))
        self._plots = [StatePlot(s) for s in states]
        self._plots += [ActionPlot(a) for a in actions]
        if self._reward_plot:
            self._plots.append(RewardPlot())
        self._plots += list(self._additional_plots)
        for p in self._plots:
            if isinstance(p, TimePlot):
                p.set_width(self._time_plot_width)
            p.set_env(env)
        self._time_plots = [p for p in self._plots if isinstance(p, TimePlot)]
        self._episode_plots = [p for p in self._plots if isinstance(p, EpisodePlot)]
        self._step_plots = [p for p in self._plots if isinstance(p, StepPlot)]
        self._initialized = False
        return self

    # ---- callback bus (motor_dashboard.py:110-160) ----

    def on_reset_begin(self):
        for p in self._plots:
            p.on_reset_begin()

    def on_reset_end(self, state, reference):
        for p in self._plots:
            p.on_reset_end(state, reference)

    def on_step_begin(self, k, action):
        for p in self._plots:
            p.on_step_begin(k, action)

    def on_step_end(self, k, state, reference, reward, terminated):
        for p in self._plots:
            p.on_step_end(k, state, reference, reward, terminated)
        self._k += 1
        if self.render_mode == RenderMode.Figure and self._k % self._update_interval == 0:
            self.render()

    def on_close(self):
        if self.render_mode == RenderMode.FigureOnce:
            self.render()

    # ---- drawing ----

    def initialize(self):
        plt = _mpl()
        if self._style:
            plt.style.use(self._style)
        self._figures = []
        groups = [g for g in (self._time_plots, self._episode_plots, self._step_plots) if g]
        for group in groups:
            fig, axes = plt.subplots(len(group), 1, squeeze=False, sharex=True)
            for p, ax in zip(group, axes[:, 0]):
                p.initialize(ax)
            self._figures.append(fig)
        self._initialized = True

    def render(self):
        if not self._plots:
            return
        if not self._initialized:
            self.initialize()
        for p in self._plots:
            p.render()
        for fig in self._figures:
            fig.canvas.draw_idle()

    def show(self):
        self.render()
        return self._figures

    @property
    def figure(self):
        return self._figures[0] if self._figures else None

    def save_to_file(self, filename="dashboard", filetype="png"):
        """motor_dashboard.py:368-400."""
        self.render()
        paths = []
        for i, fig in enumerate(self._figures):
            path = f"{filename}_{i}.{filetype}"
            fig.savefig(path, dpi=120, bbox_inches="tight")
            paths.append(path)
        return paths

    # ---- TPU-native bulk path ----

    def plot_rollout(self, env, states, references=None, rewards=None, tau=None,
                     max_points=20000):
        """Plot a recorded device rollout (arrays shaped (T, n_states) /
        (T, n_refs) / (T,)) in one shot — the batch equivalent of the per-step
        callback feed.  Returns the matplotlib figure."""
        plt = _mpl()
        states = np.asarray(states)
        T = states.shape[0]
        stride = max(1, T // max_points)
        t = np.arange(0, T, stride) * (tau or env.tau)
        state_names = list(env.state_names)
        plot_states = (state_names if self._state_plots in ("all", ())
                       else list(self._state_plots))
        n = len(plot_states) + (1 if rewards is not None else 0)
        fig, axes = plt.subplots(n, 1, squeeze=False, sharex=True, figsize=(10, 2 * n))
        for ax, name in zip(axes[:, 0], plot_states):
            idx = state_names.index(name)
            ax.plot(t, states[::stride, idx], label=name)
            if references is not None and name in env.reference_names:
                r = np.asarray(references)
                ax.plot(t, r[::stride, list(env.reference_names).index(name)],
                        "--", label=f"{name}*")
            ax.axhline(1.0, color="red", linewidth=0.8)
            ax.axhline(-1.0, color="red", linewidth=0.8)
            ax.set_ylabel(name)
            ax.grid(True)
            ax.legend(loc="upper right")
        if rewards is not None:
            ax = axes[-1, 0]
            ax.plot(t, np.asarray(rewards)[::stride])
            ax.set_ylabel("reward")
            ax.grid(True)
        axes[-1, 0].set_xlabel("time / s")
        self._figures = [fig]
        self._initialized = True
        return fig


class MotorDashboardLegacy(MotorDashboard):
    """Deprecated pre-render-mode dashboard API
    (motor_dashboard.py:15-310): the reference kept the old class under
    this name when the render-mode dashboard replaced it.  Thin alias —
    accepts the legacy ``scale_plots`` kwarg (forwarded to the time plots
    exactly like upstream) and warns on construction, matching the
    upstream deprecation path."""

    def __init__(self, *args, scale_plots=None, **kwargs):
        import warnings

        warnings.warn(
            "MotorDashboardLegacy is deprecated; use MotorDashboard "
            "(optionally with render_mode=...) instead.",
            DeprecationWarning, stacklevel=2)
        self._scale_plots = scale_plots
        super().__init__(*args, **kwargs)
