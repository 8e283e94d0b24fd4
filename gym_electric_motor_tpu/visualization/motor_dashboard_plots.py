"""Dashboard plots.

Counterparts of ``visualization/motor_dashboard_plots/``: the
TimePlot/EpisodePlot/StepPlot taxonomy (base_plots.py:7-248) and the concrete
StatePlot/ActionPlot/RewardPlot/episode-statistics plots.  Data capture is
numpy ring buffers on the host; drawing happens lazily on ``render``.
"""

from __future__ import annotations

import numpy as np


class MotorDashboardPlot:
    """base_plots.py:7-77."""

    def __init__(self):
        self._axis = None
        self._env = None

    def set_env(self, env):
        self._env = env

    def initialize(self, axis):
        self._axis = axis
        axis.grid(True)

    def on_reset_begin(self):
        pass

    def on_reset_end(self, state, reference):
        pass

    def on_step_begin(self, k, action):
        pass

    def on_step_end(self, k, state, reference, reward, terminated):
        pass

    def render(self):
        raise NotImplementedError


class TimePlot(MotorDashboardPlot):
    """Plots a quantity over simulation time in a sliding window
    (base_plots.py:80-166)."""

    def __init__(self):
        super().__init__()
        self._t = 0.0
        self._tau = 1e-4
        self._x_width = 10000
        self._x = None
        self._k = 0

    def set_env(self, env):
        super().set_env(env)
        self._tau = env.tau
        self._x = np.full(self._x_width, np.nan)
        self._reset_data()

    def set_width(self, width):
        self._x_width = int(width)

    def _reset_data(self):
        self._x = np.full(self._x_width, np.nan)

    def on_step_end(self, k, state, reference, reward, terminated):
        self._x[self._k % self._x_width] = self._t
        self._t += self._tau
        self._k += 1


class EpisodePlot(MotorDashboardPlot):
    """Plots statistics per episode (base_plots.py:169-205)."""

    def __init__(self):
        super().__init__()
        self._episodes = []
        self._values = []

    def _episode_value(self):
        raise NotImplementedError

    def on_reset_begin(self):
        if getattr(self, "_episode_started", False):
            self._episodes.append(len(self._episodes))
            self._values.append(self._episode_value())
        self._episode_started = True

    def render(self):
        self._axis.clear()
        self._axis.grid(True)
        self._axis.plot(self._episodes, self._values, marker=".")
        self._axis.set_xlabel("episode")
        self._axis.set_ylabel(self.label)


class StepPlot(MotorDashboardPlot):
    """Plots statistics over cumulative steps (base_plots.py:208-248)."""

    label = ""


class StatePlot(TimePlot):
    """State + reference + limit lines (state_plot.py)."""

    def __init__(self, state):
        super().__init__()
        self.state = state
        self._values = None
        self._refs = None
        self._state_idx = None
        self._ref_idx = None
        self._limit = 1.0

    def set_env(self, env):
        super().set_env(env)
        self._state_idx = list(env.state_names).index(self.state)
        self._ref_idx = (
            list(env.reference_names).index(self.state)
            if self.state in env.reference_names else None
        )
        self._values = np.full(self._x_width, np.nan)
        self._refs = np.full(self._x_width, np.nan)

    def on_step_end(self, k, state, reference, reward, terminated):
        i = self._k % self._x_width
        self._values[i] = np.asarray(state)[self._state_idx]
        if self._ref_idx is not None:
            self._refs[i] = np.asarray(reference)[self._ref_idx]
        super().on_step_end(k, state, reference, reward, terminated)

    def render(self):
        self._axis.clear()
        self._axis.grid(True)
        order = np.argsort(np.nan_to_num(self._x, nan=np.inf))
        x, v, r = self._x[order], self._values[order], self._refs[order]
        self._axis.plot(x, v, label=self.state)
        if self._ref_idx is not None:
            self._axis.plot(x, r, linestyle="--", label=f"{self.state}*")
        # normalized limit lines at +-1 (state_plot.py draws denormalized ones)
        self._axis.axhline(1.0, color="red", linewidth=0.8)
        self._axis.axhline(-1.0, color="red", linewidth=0.8)
        self._axis.set_ylabel(self.state)
        self._axis.legend(loc="upper right")


class ActionPlot(TimePlot):
    """Applied actions over time (action_plot.py)."""

    def __init__(self, action=0):
        super().__init__()
        self.action = action
        self._values = None

    def set_env(self, env):
        super().set_env(env)
        self._values = np.full(self._x_width, np.nan)

    def on_step_begin(self, k, action):
        a = np.atleast_1d(np.asarray(action, dtype=float))
        self._pending = a[self.action] if a.size > self.action else a[0]

    def on_step_end(self, k, state, reference, reward, terminated):
        self._values[self._k % self._x_width] = getattr(self, "_pending", np.nan)
        super().on_step_end(k, state, reference, reward, terminated)

    def render(self):
        self._axis.clear()
        self._axis.grid(True)
        order = np.argsort(np.nan_to_num(self._x, nan=np.inf))
        self._axis.step(self._x[order], self._values[order], where="post")
        self._axis.set_ylabel(f"action {self.action}")


class RewardPlot(TimePlot):
    """Reward over time (reward_plot.py)."""

    def __init__(self):
        super().__init__()
        self._values = None

    def set_env(self, env):
        super().set_env(env)
        self._values = np.full(self._x_width, np.nan)

    def on_step_end(self, k, state, reference, reward, terminated):
        self._values[self._k % self._x_width] = float(reward)
        super().on_step_end(k, state, reference, reward, terminated)

    def render(self):
        self._axis.clear()
        self._axis.grid(True)
        order = np.argsort(np.nan_to_num(self._x, nan=np.inf))
        self._axis.plot(self._x[order], self._values[order])
        self._axis.set_ylabel("reward")


class EpisodeLengthPlot(EpisodePlot):
    """episode_length_plot.py."""

    label = "episode length"

    def __init__(self):
        super().__init__()
        self._steps = 0

    def on_step_end(self, k, state, reference, reward, terminated):
        self._steps += 1

    def _episode_value(self):
        v = self._steps
        self._steps = 0
        return v


class MeanEpisodeRewardPlot(EpisodePlot):
    """mean_episode_reward_plot.py."""

    label = "mean reward"

    def __init__(self):
        super().__init__()
        self._sum = 0.0
        self._steps = 0

    def on_step_end(self, k, state, reference, reward, terminated):
        self._sum += float(reward)
        self._steps += 1

    def _episode_value(self):
        v = self._sum / max(self._steps, 1)
        self._sum, self._steps = 0.0, 0
        return v


class CumulativeConstraintViolationPlot(EpisodePlot):
    """cumulative_constraint_violation_plot.py."""

    label = "cumulated violations"

    def __init__(self):
        super().__init__()
        self._violations = 0

    def on_step_end(self, k, state, reference, reward, terminated):
        if terminated:
            self._violations += 1

    def _episode_value(self):
        return self._violations


class ExternalPlot(TimePlot):
    """User-injectable time series riding the dashboard's time axis.

    Counterpart of the reference's ``ExternalPlot``
    (examples/classic_controllers/external_plot.py:5-120): plots one
    primary line that does not belong to the env state, optionally a
    dashed reference for it, plus ``additional_lines`` extra lines.  The
    user pushes one sample per control step via :meth:`add_data`; the
    dashboard's step callback advances the shared time ring, so the
    injected series stays aligned with the state plots.

    >>> ext = ExternalPlot(referenced=True, additional_lines=2,
    ...                    min=-1.0, max=1.0)
    >>> ext.set_label({"y_label": "y", "state_label": "$x$",
    ...                "ref_label": "$x^*$", "add_label": ["$a$", "$b$"]})
    >>> env = gemx.make(..., visualization=MotorDashboard(
    ...     state_plots=("i_sd",), additional_plots=(ext,)))
    >>> ext.add_data([x, x_ref, a, b])     # once per step, BEFORE step()
    """

    def __init__(self, referenced=False, additional_lines=0,
                 min=0.0, max=1.0):  # noqa: A002 - reference kwarg names
        super().__init__()
        self._referenced = bool(referenced)
        self._n_add = int(additional_lines)
        self._ymin, self._ymax = float(min), float(max)
        self.y_label = ""
        self.state_label = "state"
        self.ref_label = "reference"
        self.add_labels = [f"add_{i}" for i in range(self._n_add)]
        self._pending = None
        self._values = None
        self._refs = None
        self._adds = None

    def set_env(self, env):
        super().set_env(env)
        self._values = np.full(self._x_width, np.nan)
        self._refs = np.full(self._x_width, np.nan)
        self._adds = np.full((self._n_add, self._x_width), np.nan)

    def set_label(self, labels):
        """Reference-compatible label dict: keys ``y_label``,
        ``state_label``, ``ref_label``, ``add_label`` (list)."""
        self.y_label = labels.get("y_label", self.y_label)
        self.state_label = labels.get("state_label", self.state_label)
        self.ref_label = labels.get("ref_label", self.ref_label)
        if "add_label" in labels:
            self.add_labels = list(labels["add_label"])

    def add_data(self, data):
        """Push one FLAT sample: ``[state]``, ``[state, ref]``
        (referenced) or ``[state, ref, add_1, ..., add_n]`` — the
        reference's calling convention (external_plot.py:121-141)."""
        data = list(np.atleast_1d(np.asarray(data, dtype=float)))
        expected = 1 + int(self._referenced) + self._n_add
        assert len(data) == expected, (
            f"ExternalPlot.add_data expects {expected} values "
            f"(state{' + ref' if self._referenced else ''} + "
            f"{self._n_add} additional), got {len(data)}")
        self._pending = data

    def on_step_end(self, k, state, reference, reward, terminated):
        i = self._k % self._x_width
        if self._pending is not None:
            vals = self._pending
            self._values[i] = vals[0]
            if self._referenced:
                self._refs[i] = vals[1]
            for j in range(self._n_add):
                self._adds[j, i] = vals[1 + int(self._referenced) + j]
            self._pending = None
        else:
            # no sample pushed this step: blank the ring slot so the
            # plot shows a gap instead of a value from one window ago
            self._values[i] = np.nan
            self._refs[i] = np.nan
            self._adds[:, i] = np.nan
        super().on_step_end(k, state, reference, reward, terminated)

    def render(self):
        self._axis.clear()
        self._axis.grid(True)
        order = np.argsort(np.nan_to_num(self._x, nan=np.inf))
        x = self._x[order]
        self._axis.plot(x, self._values[order], label=self.state_label)
        if self._referenced:
            self._axis.plot(x, self._refs[order], linestyle="--",
                            label=self.ref_label)
        for j in range(self._n_add):
            self._axis.plot(x, self._adds[j, order],
                            label=self.add_labels[j])
        self._axis.set_ylim(self._ymin, self._ymax)
        self._axis.set_ylabel(self.y_label)
        self._axis.legend(loc="upper right")


class ExternallyReferencedStatePlot(StatePlot):
    """StatePlot whose dashed reference is supplied by the USER instead of
    the env's reference vector — e.g. an intermediate setpoint generated
    inside a cascaded controller.

    Counterpart of the reference's ``ExternallyReferencedStatePlot``
    (examples/classic_controllers/externally_referenced_state_plot.py:
    4-38).  Deviation: values are NORMALIZED here (this dashboard plots
    normalized quantities throughout), so :meth:`external_reference`
    takes the normalized reference directly instead of multiplying by
    the state limit.

    >>> plot = ExternallyReferencedStatePlot("i_sd")
    >>> env = gemx.make(..., visualization=MotorDashboard(
    ...     additional_plots=(plot,)))
    >>> plot.external_reference(0.3)       # once per step
    """

    def set_env(self, env):
        super().set_env(env)
        self._ref_idx = None          # never read the env reference
        self._external_ref = np.nan

    def external_reference(self, value):
        self._external_ref = float(value)

    def on_step_end(self, k, state, reference, reward, terminated):
        self._refs[self._k % self._x_width] = self._external_ref
        super().on_step_end(k, state, reference, reward, terminated)

    def render(self):
        self._axis.clear()
        self._axis.grid(True)
        order = np.argsort(np.nan_to_num(self._x, nan=np.inf))
        x = self._x[order]
        self._axis.plot(x, self._values[order], label=self.state)
        self._axis.plot(x, self._refs[order], linestyle="--",
                        label=f"{self.state}* (external)")
        self._axis.axhline(1.0, color="red", linewidth=0.8)
        self._axis.axhline(-1.0, color="red", linewidth=0.8)
        self._axis.set_ylabel(self.state)
        self._axis.legend(loc="upper right")
