"""Callbacks.

Counterpart of the reference's callback bus (``core.py:708-753``) and the
curriculum callback (``callbacks.py:11-125``).  Callbacks hook the host-side
environment loop (:class:`~gym_electric_motor_tpu.envs.gym_adapter.GymnasiumEnv`);
for device-side batched rollouts, use the metric hooks of
:class:`~gym_electric_motor_tpu.core.VectorEnv` instead.
"""

from __future__ import annotations



class Callback:
    """core.py:708-740."""

    def __init__(self):
        self._env = None

    def set_env(self, env):
        self._env = env

    def on_reset_begin(self):
        pass

    def on_reset_end(self, state, reference):
        pass

    def on_step_begin(self, k, action):
        pass

    def on_step_end(self, k, state, reference, reward, terminated):
        pass

    def on_close(self):
        pass


class ElectricMotorVisualization(Callback):
    """core.py:743-753."""

    def render(self):
        raise NotImplementedError


class RampingLimitMargin(Callback):
    """Curriculum callback widening the reference limit margin over training
    (callbacks.py:11-125).

    The margins live inside the on-device reference-generator state
    ("mlo"/"mhi"), so updating them is a cheap functional state edit — no
    retracing.  Margin values are direct normalized bounds, exactly like the
    reference callback's raw-tuple overwrite (callbacks.py:85-90, 118-125).
    """

    def __init__(self, initial_limit_margin=(-0.1, 0.1), maximum_limit_margin=(-1, 1),
                 step_size=0.1, update_time="episode", update_freq=10):
        super().__init__()
        assert update_time in ("step", "episode")
        assert initial_limit_margin[1] > initial_limit_margin[0]
        assert maximum_limit_margin[1] > maximum_limit_margin[0]
        assert initial_limit_margin[0] >= -1 and maximum_limit_margin[0] >= -1
        assert initial_limit_margin[1] <= 1 and maximum_limit_margin[1] <= 1
        self._limit_margin = tuple(initial_limit_margin)
        self._maximum_limit_margin = tuple(maximum_limit_margin)
        self._step_size = step_size
        self._update_time = update_time
        self._update_freq = update_freq
        self._count = 0

    def set_env(self, env):
        self._env = env
        self._apply_margin()

    def _apply_margin(self):
        """Write the current margin into every sub-generator's device state."""
        if getattr(self._env, "_state", None) is None:
            return
        from .references import set_margins

        state = self._env._state
        lo, hi = self._limit_margin
        new_refs = tuple(set_margins(r, lo, hi) for r in state.refs)
        self._env._state = state.replace(refs=new_refs)

    def _update_limit_margin(self):
        """callbacks.py:113-125."""
        if self._limit_margin != self._maximum_limit_margin:
            new_lower = max(self._limit_margin[0] - self._step_size, self._maximum_limit_margin[0])
            new_upper = min(self._limit_margin[1] + self._step_size, self._maximum_limit_margin[1])
            self._limit_margin = (new_lower, new_upper)
        self._apply_margin()

    def on_step_end(self, k, state, reference, reward, terminated):
        if self._update_time == "step":
            self._count += 1
            if self._count % self._update_freq == 0:
                self._count = 0
                self._update_limit_margin()

    def on_reset_end(self, state, reference):
        if self._update_time == "episode":
            self._count += 1
            if self._count % self._update_freq == 0:
                self._count = 0
                self._update_limit_margin()
        # reset rebuilt the device state with the statically-bound margins;
        # re-impose the current curriculum margin either way
        self._apply_margin()
