"""Classical control for the switched-reluctance family (EXTENSION).

The reference has NO SRM controller (it stubs the whole family), and the
dq cascade architecture of :class:`GemController` does not apply — SRM
drives use position-based COMMUTATION: each phase produces torque
``0.5 i^2 dL/dtheta``, so torque of a given sign is produced by firing a
phase only while its inductance slope has that sign, with the phase
current regulated by a hysteresis band (finite converters) or a
proportional duty (continuous).

:class:`SRMCommutationController` implements the standard three-loop
architecture on that principle:

* **CC** — per-phase current regulation toward the referenced setpoints
  (hysteresis for the finite asymmetric bridge, P + resistive
  feed-forward duty for the continuous one).  Raising a phase current is
  position-independent (L > 0 always), so plain regulation tracks any
  feasible setpoint.
* **TC** — single-pulse commutation (only the phase with the largest
  usable inductance slope fires — window overlaps would double-produce
  the torque) with the sqrt linearization
  ``i* = sqrt(2 |T*| / (p l1 sin_k))``, plus an integral trim on the
  MEASURED torque (ramp-time undershoot): steady error ~0.3%.
* **SC** — an anti-windup PI speed loop produces the torque command,
  then the TC logic commutates it.

All control laws are branch-free jnp on one env's observation vector —
``control_environment`` vmaps them exactly like the dq cascade.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import readers


@dataclasses.dataclass
class SRMCommutationController:
    """Host-tuned commutation controller; pure device control law."""

    env_id: str
    control_task: str
    action_type: str
    tau: float
    current_idx: np.ndarray
    omega_idx: int
    torque_idx: int
    eps_idx: int
    i_lim: float
    t_lim: float
    w_lim: float
    u_lim: float
    p: float
    l1: float
    r_s: float
    # firing window + regulation
    theta_on: float = 0.2        # min |sin(eps - phi_k)| to fire a phase
    hysteresis: float = 0.02     # finite: band around i* (normalized)
    kp_i: float = 8.0            # cont: duty P gain on the current error
    current_margin: float = 0.2  # setpoint ceiling (1 - margin) * i_lim
    # speed loop (SC)
    kp_w: float = 0.0
    ki_w: float = 0.0
    t_max: float = 0.0
    # TC integral trim on the MEASURED torque (the open-loop sqrt
    # linearization undershoots ~10% from phase-current ramp time)
    ki_t: float = 400.0

    @classmethod
    def make(cls, env, env_id, current_safety_margin=0.2, a=4):
        action_type, control_task, motor_type = readers.split_env_id(env_id)
        assert motor_type == "SRM"
        names = list(env.state_names)
        lim = np.asarray(env.physical_system.limits)
        mp = env.physical_system.motor.parameter
        tau = float(env.physical_system.tau)
        j_total = float(mp["j_rotor"]) + float(
            getattr(env.physical_system.load, "j_load", 0.0))
        t_lim = float(lim[names.index("torque")])
        # speed PI by the symmetric optimum on the mechanical integrator
        # (same tuning rule as the dq cascade's speed stage): bandwidth
        # well under the commutation frequency
        a, tau_w = float(a), 50.0 * tau
        kp_w = j_total / (a * tau_w)
        ki_w = kp_w / (a**2 * tau_w)
        return cls(
            env_id=env_id, control_task=control_task,
            action_type=action_type, tau=tau,
            current_idx=np.array([names.index(n)
                                  for n in ("i_a", "i_b", "i_c")]),
            omega_idx=names.index("omega"),
            torque_idx=names.index("torque"),
            eps_idx=names.index("epsilon"),
            i_lim=float(lim[names.index("i_a")]), t_lim=t_lim,
            w_lim=float(lim[names.index("omega")]),
            u_lim=float(lim[names.index("u_a")]),
            p=float(mp["p"]), l1=float(mp["l1"]), r_s=float(mp["r_s"]),
            current_margin=current_safety_margin,
            kp_w=kp_w, ki_w=ki_w, t_max=0.9 * t_lim,
        )

    # ---- device control law ----

    def reset(self):
        return jnp.zeros(())          # speed-PI integrator

    def _firing(self, eps, sign):
        """per-phase inductance slope sin(eps - phi_k) and the firing mask
        for torque of the given sign"""
        phis = jnp.asarray([0.0, 2.0 * np.pi / 3.0, 4.0 * np.pi / 3.0],
                           jnp.float32)
        s = jnp.sin(eps - phis)
        fire = (s * sign) > self.theta_on
        return s, fire

    def _current_setpoints(self, obs, t_ref):
        """TC/SC: torque linearization i*_k = sqrt(2|T*| / (p l1 s_k)) on
        the firing phases (CC uses the referenced setpoints directly)."""
        eps = obs[self.eps_idx] * np.pi
        sign = jnp.sign(t_ref)
        s, fire = self._firing(eps, sign)
        # single-pulse commutation: command only the phase with the
        # largest usable inductance slope (window overlaps would
        # double-produce the torque, and the window-edge phase is the
        # inefficient one — measured +16% / -14% errors with
        # all-window and equal-split firing respectively)
        gain = s * sign
        best = gain >= jnp.max(gain)
        fire = fire & best
        i_cmd = jnp.sqrt(2.0 * jnp.abs(t_ref)
                         / (self.p * self.l1 * jnp.maximum(jnp.abs(s),
                                                           0.05)))
        i_max = (1.0 - self.current_margin) * self.i_lim
        return jnp.where(fire, jnp.minimum(i_cmd, i_max), 0.0) / self.i_lim

    def _regulate(self, obs, i_star_n):
        """normalized per-phase setpoints -> converter action"""
        i_n = obs[jnp.asarray(self.current_idx)]
        if self.action_type == "Finite":
            mag = i_n < i_star_n - self.hysteresis
            dem = i_n > i_star_n + self.hysteresis
            # inside the band: freewheel if a setpoint exists, demagnetize
            # a phase commanded to zero (drive it out fast)
            hold = jnp.where(i_star_n > 1e-6, 0, 2)
            return jnp.where(mag, 1, jnp.where(dem, 2, hold)).astype(
                jnp.int32)
        # cont: P on the error + resistive feed-forward duty
        duty_ff = self.r_s * (i_star_n * self.i_lim) / self.u_lim
        duty = self.kp_i * (i_star_n - i_n) + duty_ff
        return jnp.clip(duty, -1.0, 1.0)

    def control(self, cs, obs, ref_obs, collect_internals=False):
        if self.control_task == "CC":
            action = self._regulate(obs, ref_obs)
            ints = {"i_star": ref_obs * self.i_lim}
            return ((cs, action, ints) if collect_internals
                    else (cs, action))
        if self.control_task == "TC":
            t_star = ref_obs[0] * self.t_lim
            t_meas = obs[self.torque_idx] * self.t_lim
            integ = jnp.clip(cs + self.ki_t * (t_star - t_meas) * self.tau,
                             -0.3 * self.t_lim, 0.3 * self.t_lim)
            t_ref = t_star + integ
        else:  # SC: anti-windup PI speed loop -> torque command
            w_err = (ref_obs[0] - obs[self.omega_idx]) * self.w_lim
            t_raw = self.kp_w * w_err + cs
            t_ref = jnp.clip(t_raw, -self.t_max, self.t_max)
            # integrate only while unsaturated (conditional anti-windup)
            integ = cs + jnp.where(t_raw == t_ref,
                                   self.ki_w * w_err * self.tau, 0.0)
        i_star_n = self._current_setpoints(obs, t_ref)
        action = self._regulate(obs, i_star_n)
        if collect_internals:
            return integ, action, {"torque_star": t_ref,
                                   "i_star": i_star_n * self.i_lim}
        return integ, action

    # same run loop as GemController.control_environment
    def control_environment(self, env, n_steps, key=None, n_envs=None,
                            collect_internals=False):
        key = key if key is not None else jax.random.PRNGKey(0)

        def single(key):
            state, (obs, ref_obs) = env.reset(key)
            cs = self.reset()

            def body(carry, _):
                state, cs, obs, ref_obs = carry
                if collect_internals:
                    cs, action, ints = self.control(cs, obs, ref_obs, True)
                else:
                    cs, action = self.control(cs, obs, ref_obs)
                    ints = {}
                state, (obs2, ref2), reward, term = env.step_autoreset(
                    state, action)
                return (state, cs, obs2, ref2), (obs2, ref2, reward, term,
                                                 ints)

            _, (states, refs, rewards, terms, ints) = jax.lax.scan(
                body, (state, cs, obs, ref_obs), None, length=n_steps)
            out = dict(states=states, references=refs, rewards=rewards,
                       terminations=terms)
            if collect_internals:
                out["cascade_references"] = ints
            return out

        if n_envs is None:
            return jax.jit(single)(key)
        keys = jax.random.split(key, n_envs)
        return jax.jit(jax.vmap(single))(keys)
