"""Classic controller stack — the reference's secondary, example-grade
controller implementation, rebuilt TPU-first.

Counterpart of ``examples/classic_controllers/classic_controllers.py`` (628
LoC) plus its ``controllers/`` package (17 modules, ~3.5k LoC): an
independent, simpler controller-design system that ships alongside the main
auto-tuned ``gem_controllers`` stack.  ``Controller.make(env)`` auto-selects
the controller structure from the motor family / control task / action space
(classic_controllers.py:187-296), tunes it per the symmetric optimum
(classic_controllers.py:299-628), and returns a controller whose whole loop
is a pure jittable function — rollouts run inside one ``lax.scan`` on device
instead of the reference's per-step Python dispatch.

Deliberately reproduced upstream quirks (each marked at its site):

* Cascade outer-stage P error is computed against the *subordinate* stage's
  state while the I error uses the controlled state
  (cascaded_controller.py:147-157).
* The DC cascade reads ``mp.get("psie_e")`` (a typo for ``psi_e``), so the
  EMF feedforward is effectively disabled for PermExDc in the cascade
  (cascaded_controller.py:52, 224-230).
* The cascaded FOC's q-axis decoupling multiplies by ``limit[u_sd]`` where
  the plain FOC uses ``limit[i_sd]`` (cascaded_foc_controller.py:223-234 vs
  foc_controller.py:130-141).
* ``if self.ref_e_idx:`` skips the external i_e reference when i_e is the
  first referenced state (cascaded_controller.py:200-201).

Upstream crashes NOT reproduced (raise a clear error instead): EESM (no
classic design path), DFIM (3-phase action written into a 6-dim action
space), finite-control-set induction CC (``d_controller`` never built,
induction_motor_foc.py:80-89).
"""

from __future__ import annotations

import dataclasses
import types

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import transforms
from .base import PI, PID, OnOff, ThreePoint
from . import induction as _im

DC_MOTORS = ("PermExDc", "SeriesDc", "ShuntDc", "ExtExDc")
SYNC_MOTORS = ("PMSM", "SynRM")
IM_MOTORS = ("SCIM", "DFIM")


# ---------------------------------------------------------------------------
# Host-side environment introspection
# ---------------------------------------------------------------------------

def _env_data(env):
    ps = env.physical_system
    # unwrap PhysicalSystemWrappers to reach motor/load/converter attributes
    base = ps
    while getattr(base, "inner", None) is not None:
        base = base.inner
    names = list(ps.state_names)
    d = dict(
        names=names,
        limits=np.asarray(ps.limits, dtype=np.float64),
        nominal=np.asarray(ps.nominal_state, dtype=np.float64),
        ss_low=np.asarray(ps.state_space_low, dtype=np.float64),
        ss_high=np.asarray(ps.state_space_high, dtype=np.float64),
        tau=float(ps.tau),
        mp={k: (float(v) if np.ndim(v) == 0 else v) for k, v in base.motor.parameter.items()},
        motor=base.motor.kind,
        j_total=float(np.asarray(base.lp["j_total"])),
        dead_time=float(getattr(base.converter, "interlocking_time", 0.0)) > 0.0,
    )
    # CURRENTS_IDX / VOLTAGES_IDX analogue (dc_motor systems list currents
    # first-to-last as [i_a, i_e] / [i]; voltages [u_a, u_e] / [u]).
    d["currents"] = [names.index(n) for n in ("i", "i_a", "i_e") if n in names]
    d["voltages"] = [names.index(n) for n in ("u", "u_a", "u_e") if n in names]
    space = env.action_space
    d["space_kind"] = space.__class__.__name__
    if d["space_kind"] == "Discrete":
        d["n_actions"] = int(space.n)
    elif d["space_kind"] == "MultiDiscrete":
        d["n_actions"] = int(np.asarray(space.nvec)[0])
    else:
        d["box_low"] = np.asarray(space.low, dtype=np.float64)
        d["box_high"] = np.asarray(space.high, dtype=np.float64)
    d["ref_states"] = list(env.reference_names)
    return d


def _idx(d, name):
    return d["names"].index(name)


# ---------------------------------------------------------------------------
# Automated controller design (classic_controllers.py:187-296)
# ---------------------------------------------------------------------------

def automated_controller_design(d):
    """Pick controller type + stage dicts from motor family, referenced
    states, and action-space type (classic_controllers.py:187-296)."""
    cont = d["space_kind"] == "Box"
    refs = d["ref_states"]
    motor = d["motor"]
    stages = []
    if motor in DC_MOTORS:
        if "omega" in refs or "torque" in refs:
            controller_type = "cascaded_controller"
            stages = [
                {"controller_type": "pi_controller" if cont else "three_point"},
                {"controller_type": "pi_controller"},
            ]
        else:
            stages = [{"controller_type": "pi_controller" if cont else "three_point"}]
            controller_type = stages[0]["controller_type"]
        if motor == "ExtExDc":
            stages = [stages, [{"controller_type": "pi_controller" if cont else "three_point"}]]
    elif motor in SYNC_MOTORS:
        if "i_sq" in refs or "torque" in refs:
            controller_type = "foc_controller" if "i_sq" in refs else "cascaded_foc_controller"
            stages = ([[{"controller_type": "pi_controller"}, {"controller_type": "pi_controller"}]]
                      if cont else
                      [[{"controller_type": "on_off"}]] * 3)
        elif "omega" in refs:
            controller_type = "cascaded_foc_controller"
            stages = ([[{"controller_type": "pi_controller"}, {"controller_type": "pi_controller"}],
                       [{"controller_type": "pi_controller"}]]
                      if cont else
                      [[{"controller_type": "on_off"}]] * 3 + [[{"controller_type": "pi_controller"}]])
    elif motor in IM_MOTORS:
        if "i_sq" in refs or "torque" in refs:
            controller_type = ("foc_rotor_flux_observer" if "i_sq" in refs
                               else "cascaded_foc_rotor_flux_observer")
            stages = ([[{"controller_type": "pi_controller"}, {"controller_type": "pi_controller"}]]
                      if cont else
                      [[{"controller_type": "on_off"}]] * 3)
        elif "omega" in refs:
            controller_type = "cascaded_foc_rotor_flux_observer"
            stages = ([[{"controller_type": "pi_controller"}, {"controller_type": "pi_controller"}],
                       [{"controller_type": "pi_controller"}]]
                      if cont else
                      [[{"controller_type": "on_off"}]] * 3 + [[{"controller_type": "pi_controller"}]])
    else:
        raise NotImplementedError(
            f"The classic controller stack does not support {motor} "
            "(the reference's automated design has no path for it either — "
            "classic_controllers.py:187-296 falls through and crashes).")
    return controller_type, stages


# ---------------------------------------------------------------------------
# Automated gain tuning per the symmetric optimum
# (classic_controllers.py:299-628)
# ---------------------------------------------------------------------------

def automated_gain(d, stages, controller_type, a=4, enabled=True):
    """Fill missing p/i/d gains in the stage dicts (symmetric optimum,
    classic_controllers.py:299-628).  Host-side numpy only."""
    if not enabled:
        return stages
    mp = dict(d["mp"])
    limits, names, tau = d["limits"], d["names"], d["tau"]
    omega_lim = limits[_idx(d, "omega")]
    motor = d["motor"]
    refs = d["ref_states"]
    cont = d["space_kind"] == "Box"

    def setdefaults(st, p, i, dg=None):
        st.setdefault("p_gain", p)
        st.setdefault("i_gain", i)
        if st["controller_type"] == "pid_controller":
            st.setdefault("d_gain", dg if dg is not None else st["p_gain"] * tau)

    if motor in DC_MOTORS:
        i_a_lim = limits[d["currents"][0]]
        i_e_lim = limits[d["currents"][-1]]
        u_a_lim = limits[d["voltages"][0]]
        u_e_lim = limits[d["voltages"][-1]]
        if motor == "SeriesDc":
            mp["l"] = mp["l_a"] + mp["l_e"]
        else:
            mp["l"] = mp["l_a"] if "l_a" in mp else mp["l"]
        if motor == "ExtExDc":
            stages_a, stages_e = stages[0], stages[1]
            if cont:
                # excitation stage (classic_controllers.py:360-372)
                p = mp["l_e"] / (tau * a) / u_e_lim * i_e_lim
                setdefaults(stages_e[0], p, p / (tau * a**2))
        else:
            stages_a = stages
        if controller_type in ("pi_controller", "pid_controller"):
            # ContinuousActionController branch (classic_controllers.py:380-407)
            if "i" in refs or "i_a" in refs or "torque" in refs:
                p = mp["l"] / (tau * a) / u_a_lim * i_a_lim
                setdefaults(stages_a[0], p, p / (tau * a**2))
            elif "omega" in refs:
                p = d["j_total"] * mp["r_a"] ** 2 / (a * mp["l"]) / u_a_lim * omega_lim
                setdefaults(stages_a[0], p, p / (a * mp["l"]))
        elif controller_type == "cascaded_controller":
            # (classic_controllers.py:409-467)
            for i, st in enumerate(stages_a):
                if st["controller_type"] not in ("pi_controller", "pid_controller"):
                    continue
                if i == 0:
                    p = mp["l"] / (tau * a) / u_a_lim * i_a_lim
                    setdefaults(st, p, p / (tau * a**2))
                elif i == 1:
                    t_n = tau * a**2
                    p = d["j_total"] / (a * t_n) / i_a_lim * omega_lim
                    setdefaults(st, p, p / (a * t_n))
    elif motor in SYNC_MOTORS:
        i_sd_lim = limits[_idx(d, "i_sd")]
        i_sq_lim = limits[_idx(d, "i_sq")]
        u_sd_lim = limits[_idx(d, "u_sd")]
        u_sq_lim = limits[_idx(d, "u_sq")]
        torque_lim = limits[_idx(d, "torque")]
        psi_p = mp.get("psi_p", 0.0)
        if cont:
            stage_d, stage_q = stages[0][0], stages[0][1]
            p_d = mp["l_d"] / (1.5 * tau * a) / u_sd_lim * i_sd_lim
            p_q = mp["l_q"] / (1.5 * tau * a) / u_sq_lim * i_sq_lim
            setdefaults(stage_d, p_d, p_d / (1.5 * tau * a**2))
            setdefaults(stage_q, p_q, p_q / (1.5 * tau * a**2))
            if controller_type == "cascaded_foc_controller" and "torque" not in refs:
                # overlaid speed stage (classic_controllers.py:522-538)
                t_n = stage_d["p_gain"] / stage_d["i_gain"]
                p = d["j_total"] / (a**2 * t_n) / torque_lim * omega_lim
                setdefaults(stages[1][0], p, p / (a * t_n))
        elif controller_type == "cascaded_foc_controller" and "omega" in refs:
            # discrete overlaid stage (classic_controllers.py:543-561);
            # diverges for l_d == l_q exactly as upstream does.
            p = (d["j_total"] / (1.5 * a**2 * mp["p"] * np.abs(mp["l_d"] - mp["l_q"]))
                 / i_sq_lim * omega_lim)
            setdefaults(stages[3][0], p, p / (1.5 * tau * a))
    elif motor in IM_MOTORS:
        # (classic_controllers.py:563-626)
        l_s = mp["l_m"] + mp["l_sigs"]
        l_r = mp["l_m"] + mp["l_sigr"]
        sigma = (l_s * l_r - mp["l_m"] ** 2) / (l_s * l_r)
        tau_sigma = (sigma * l_s) / (mp["r_s"] + mp["r_r"] * mp["l_m"] ** 2 / l_r**2)
        tau_r = l_r / mp["r_r"]
        p = tau_r / tau_sigma
        i = p / tau_sigma
        if cont:
            setdefaults(stages[0][0], p, i, p * tau_sigma)
            setdefaults(stages[0][1], p, i, p * tau_sigma)
            if controller_type == "cascaded_foc_rotor_flux_observer" and "torque" not in refs:
                torque_lim = limits[_idx(d, "torque")]
                t_n = p / i
                p_o = d["j_total"] / (a**2 * t_n) / torque_lim * omega_lim
                setdefaults(stages[1][0], p_o, p_o / (a * t_n))
    return stages


# ---------------------------------------------------------------------------
# Stage construction
# ---------------------------------------------------------------------------

def _make_stage(d, st, cascaded=False, control_e=False):
    """Instantiate a base controller from a stage dict
    (continuous_controller.py:4-9, discrete_controller.py:11-25)."""
    kind = st["controller_type"]
    tau = d["tau"]
    if kind == "pi_controller":
        return PI(float(st.get("p_gain", 5.0)), float(st.get("i_gain", 5.0)), tau)
    if kind == "pid_controller":
        return PID(float(st.get("p_gain", 5.0)), float(st.get("i_gain", 5.0)),
                   float(st.get("d_gain", 0.005)), tau)
    n = d.get("n_actions", 3)
    if kind == "on_off":
        off = 2 if n in (3, 4) and not control_e else 0
        if cascaded:
            off = int(d["ss_low"][0])
        return OnOff(float(st.get("hysteresis", 0.02)), 1.0, float(off))
    if kind == "three_point":
        neg = 2 if n in (3, 4, 8) and not control_e else 0
        if cascaded:
            neg = int(d["ss_low"][0])
        return ThreePoint(
            float(st.get("switch_to_positive_level", 0.02)),
            float(st.get("switch_to_negative_level", 0.02)),
            float(st.get("switch_to_neutral_from_positive", 0.01)),
            float(st.get("switch_to_neutral_from_negative", 0.01)),
            1.0, float(neg))
    raise ValueError(f"unknown stage controller_type {kind!r}")


def _is_cont(st):
    return st["controller_type"] in ("pi_controller", "pid_controller")


# ---------------------------------------------------------------------------
# The controller object
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class ClassicController:
    """A fully designed classic controller: host params + pure device law."""

    family: str
    prm: dict
    stages: dict
    ops: object = None  # shim carrying .ops_params for the sync torque stage

    # -- state ------------------------------------------------------------
    def reset(self):
        cs = {name: stage.init() for name, stage in self.stages.items()}
        if self.family in ("im_foc", "im_cascaded_foc"):
            cs["flux"] = _im.flux_observer_init()
        if self.family == "im_cascaded_foc":
            cs["mod"] = _im.modulation_init()
        if self.family == "cascaded_foc" and self.prm.get("torque_control"):
            from ..controllers.pmsm_ops import pmsm_ops_reset
            cs["ops"] = pmsm_ops_reset()
        return cs

    # -- control law dispatch ----------------------------------------------
    def control(self, cs, state, reference):
        """One control step: ``(cs, action) = control(cs, state, ref)``.

        ``state`` and ``reference`` are the env's normalized observation
        vectors; the returned action matches the env action space (float
        vector for Box, int32 scalar/vector for Discrete/MultiDiscrete).
        """
        return getattr(self, "_control_" + self.family)(cs, state, reference)

    # -- DC: ContinuousActionController (continuous_action_controller.py) --
    def _dc_ff(self, state, cascade):
        """EMF feedforward (continuous_action_controller.py:148-155 /
        cascaded_controller.py:224-230)."""
        p = self.prm
        if cascade:
            # quirk: mp.get("psie_e") typo upstream means the constant-psi
            # path never triggers in the cascade; PermExDc degenerates to
            # the 1e-6 floor (feedforward effectively off).
            psi_e = p["l_e"] * state[p["i_e_idx"]] * p["nom_i_e"] if p["l_e"] else 0.0
            psi_e = jnp.maximum(psi_e, 1e-6)
        else:
            if p["psi_e"] is not None:
                psi_e = p["psi_e"]
            else:
                psi_e = p["l_e"] * state[p["i_e_idx"]] * p["nom_i_e"]
        return state[p["omega_idx"]] * p["nom_omega"] * psi_e / p["nom_u"]

    def _control_dc_cont(self, cs, state, reference):
        p = self.prm
        st = self.stages["a"]
        s, r = state[p["ref_state_idx"]], reference[p["ref_idx"]]
        u, cs_a = st.control(cs["a"], s, r)
        u = u + self._dc_ff(state, cascade=False)
        in_lim = (u >= p["a_lo"]) & (u <= p["a_hi"])
        cs_a = st.integrate(cs_a, s, r, in_lim)
        action = jnp.clip(u, p["a_lo"], p["a_hi"])[None]
        new_cs = {"a": cs_a}
        if "e" in self.stages:
            ste = self.stages["e"]
            se, re_ = state[p["i_e_idx"]], reference[p["ref_e_idx"]]
            ue, cs_e = ste.control(cs["e"], se, re_)
            in_e = (ue >= p["ae_lo"]) & (ue <= p["ae_hi"])
            cs_e = ste.integrate(cs_e, se, re_, in_e)
            action = jnp.concatenate([action, jnp.clip(ue, p["ae_lo"], p["ae_hi"])[None]])
            new_cs["e"] = cs_e
        return new_cs, action

    # -- DC: DiscreteActionController (dicrete_action_controller.py) -------
    def _control_dc_finite(self, cs, state, reference):
        p = self.prm
        a, cs_a = self.stages["a"].control(
            cs["a"], state[p["ref_state_idx"]], reference[p["ref_idx"]])
        new_cs = {"a": cs_a}
        if "e" in self.stages:
            ae, cs_e = self.stages["e"].control(
                cs["e"], state[p["i_e_idx"]], reference[p["ref_e_idx"]])
            new_cs["e"] = cs_e
            return new_cs, jnp.stack([a, ae]).astype(jnp.int32)
        return new_cs, a.astype(jnp.int32)

    # -- DC: CascadedController (cascaded_controller.py) -------------------
    def _control_dc_cascade(self, cs, state, reference):
        p = self.prm
        new_cs = dict(cs)
        control_e = "e" in self.stages
        outer = self.stages.get("outer")
        # reference chain (cascaded_controller.py:137-164).  ref layout:
        # [i_a*, (torque*,) top_ref, (i_e*)]
        if outer is not None and p["run_outer"]:
            # quirk: P error vs the subordinate state, I error vs the
            # controlled state (cascaded_controller.py:147-157).
            sub_state = state[p["outer_sub_idx"]]
            top_ref = reference[p["ref_idx"]]
            mid, cs_o = outer.control(cs["outer"], sub_state, top_ref)
            in_lim = ((mid >= p["state_limit_low"][p["outer_sub_idx"]])
                      & (mid <= p["state_limit_high"][p["outer_sub_idx"]]))
            if outer.kind == "cont":
                cs_o = outer.integrate(cs_o, state[p["outer_state_idx"]],
                                       reference[0], in_lim)
                mid = jnp.clip(mid, p["state_limit_low"][p["outer_sub_idx"]],
                               p["state_limit_high"][p["outer_sub_idx"]])
            new_cs["outer"] = cs_o
        else:
            mid = reference[p["ref_idx"]]

        if control_e:
            # optimal i_a/i_e split for the ExtExDc
            # (cascaded_controller.py:166-182)
            t_ref = mid * p["torque_lim"]
            i_e = jnp.clip(
                jnp.power(p["r_a"] * t_ref**2 / (p["r_e"] * p["l_e"] ** 2), 0.25),
                p["ss_low_ie"] * p["i_e_lim"], p["ss_high_ie"] * p["i_e_lim"])
            i_a = jnp.clip(t_ref / (p["l_e"] * i_e),
                           p["ss_low_ia"] * p["i_a_lim"], p["ss_high_ia"] * p["i_a_lim"])
            ref0 = i_a / p["i_a_lim"]
            ref_e = i_e / p["i_e_lim"]
            if p["ref_e_idx"]:
                # quirk: `if self.ref_e_idx:` is False when i_e is refs[0]
                # (cascaded_controller.py:200-201)
                ref_e = reference[p["ref_e_idx"]]
        else:
            ref0 = mid

        inner = self.stages["inner"]
        u, cs_i = inner.control(cs["inner"], state[p["i_a_state_idx"]], ref0)
        if inner.kind == "cont":
            u = u + self._dc_ff(state, cascade=True)
            in_lim = (u >= p["a_lo"]) & (u <= p["a_hi"])
            cs_i = inner.integrate(cs_i, state[p["i_a_state_idx"]], ref0, in_lim)
            action = jnp.clip(u, p["a_lo"], p["a_hi"])[None]
        else:
            action = u[None]
        new_cs["inner"] = cs_i

        if control_e:
            ste = self.stages["e"]
            ue, cs_e = ste.control(cs["e"], state[p["i_e_idx"]], ref_e)
            new_cs["e"] = cs_e
            if inner.kind == "cont":
                in_e = (ue >= p["ae_lo"]) & (ue <= p["ae_hi"])
                new_cs["e"] = ste.integrate(cs_e, state[p["i_e_idx"]], ref_e, in_e)
                # quirk: BOTH action entries are clipped to the e-limits
                # (cascaded_controller.py:206-209)
                action = jnp.clip(jnp.concatenate([action, ue[None]]),
                                  p["ae_lo"], p["ae_hi"])
            else:
                action = jnp.concatenate([action, ue[None]]).astype(jnp.int32)
        elif inner.kind != "cont":
            action = action[0].astype(jnp.int32)
        return new_cs, action

    # -- Synchronous: FieldOrientedController (foc_controller.py) ----------
    def _eps_advance(self, state):
        """epsilon_d: rotor angle advanced by the converter dead time
        (foc_controller.py:107-115)."""
        p = self.prm
        return (state[p["eps_idx"]] * p["eps_lim"]
                + p["dead_time"] * p["tau"] * state[p["omega_idx"]]
                * p["omega_lim"] * p["mp_p"])

    def _sync_decouple(self, state, cascaded):
        """dq cross-coupling feedforward (foc_controller.py:119-141;
        cascaded variant cascaded_foc_controller.py:212-234 — note the
        upstream u_sq_0 bug there: l_d is scaled by limit[u_sd], not
        limit[i_sd])."""
        p = self.prm
        if not p["decoupling"]:
            return 0.0, 0.0
        omega = state[p["omega_idx"]]
        i_sd_scale = p["u_sd_lim"] if cascaded else p["i_sd_lim"]
        u_sd_0 = (-omega * p["mp_p"] * p["l_q"] * state[p["i_sq_idx"]]
                  * p["i_sq_lim"] / p["u_sd_lim"] * p["omega_lim"])
        u_sq_0 = (omega * p["mp_p"]
                  * (state[p["i_sd_idx"]] * p["l_d"] * i_sd_scale + p["psi_p"])
                  / p["u_sq_lim"] * p["omega_lim"])
        return u_sd_0, u_sq_0

    def _abc_out(self, u_sd, u_sq, eps_d):
        """Backward transformation + reference-potential shift
        (foc_controller.py:153-155)."""
        abc = transforms.dq_to_abc(jnp.stack([u_sd, u_sq]), eps_d)
        return abc - 0.5 * (jnp.max(abc) + jnp.min(abc))

    def _control_foc(self, cs, state, reference):
        p = self.prm
        eps_d = self._eps_advance(state)
        if p["cont"]:
            u_sd_0, u_sq_0 = self._sync_decouple(state, cascaded=False)
            sd, rd = state[p["d_idx"]], reference[p["ref_d_idx"]]
            sq, rq = state[p["q_idx"]], reference[p["ref_q_idx"]]
            u_sd, cs_d = self.stages["d"].control(cs["d"], sd, rd)
            u_sq, cs_q = self.stages["q"].control(cs["q"], sq, rq)
            raw = self._abc_out(u_sd + u_sd_0, u_sq + u_sq_0, eps_d)
            action = jnp.clip(raw, p["box_lo"], p["box_hi"])
            ok = jnp.all(action == raw)
            cs_d = self.stages["d"].integrate(cs_d, sd, rd, ok)
            cs_q = self.stages["q"].integrate(cs_q, sq, rq, ok)
            return {"d": cs_d, "q": cs_q}, action
        # finite: on-off per abc phase, B6 bit encoding
        # (foc_controller.py:169-180)
        ref_abc = transforms.dq_to_abc(
            jnp.stack([reference[p["ref_d_idx"]], reference[p["ref_q_idx"]]]), eps_d)
        new_cs = dict(cs)
        action = jnp.zeros((), jnp.int32)
        for i, ph in enumerate("abc"):
            ai, new_cs[ph] = self.stages[ph].control(
                cs[ph], state[p["i_abc_idx"][i]], ref_abc[i])
            action = action + (2 ** (2 - i)) * ai.astype(jnp.int32)
        return new_cs, action

    def ops_operating_point(self, cs_ops, state, torque_phys):
        """Torque -> (i_sd*, i_sq*) through the shared OPS engine.

        The engine works in physical units (its modulation controller
        compares ``2*|u_dq|/u_dc`` against a_max and builds the flux ceiling
        from the *physical* omega, foc_operation_point_selection.py:110-147),
        so the normalized observation is denormalized here first — the same
        convention the primary stack uses (controllers/controller.py:481);
        upstream's classic stack denormalizes inside its own copy of the
        engine (torque_to_current_conversion.py:610-624).  Mutates ``cs_ops``
        in place for the modulation scalars.
        """
        from ..controllers.pmsm_ops import pmsm_select_operating_point
        state_denorm = state * jnp.asarray(self.prm["limits"], state.dtype)
        return pmsm_select_operating_point(self.ops, cs_ops, state_denorm,
                                           torque_phys)

    # -- Synchronous: CascadedFieldOrientedController -----------------------
    def _control_cascaded_foc(self, cs, state, reference):
        p = self.prm
        new_cs = dict(cs)
        eps_d = self._eps_advance(state)
        # overlaid speed stage (cascaded_foc_controller.py:178-203)
        if p["omega_control"]:
            ov = self.stages["overlaid"]
            t_ref, cs_o = ov.control(cs["overlaid"], state[p["omega_idx"]],
                                     reference[p["ref_idx"]])
            in_lim = ((t_ref >= 0.85 * p["ss_low_t"]) & (t_ref <= 0.85 * p["ss_high_t"]))
            if ov.kind == "cont":
                cs_o = ov.integrate(cs_o, state[p["omega_idx"]],
                                    reference[p["ref_idx"]], in_lim)
                t_ref = jnp.where(
                    in_lim, t_ref,
                    jnp.clip(t_ref, p["nom_t_ratio"] * p["ss_low_t"],
                             p["nom_t_ratio"] * p["ss_high_t"]))
            new_cs["overlaid"] = cs_o
        else:
            t_ref = reference[p["ref_idx"]]

        if p["torque_control"]:
            # torque -> (i_sd*, i_sq*) via the shared PMSM/SynRM operation-
            # point engine (design decision: one OPS implementation serves
            # both controller stacks; the reference duplicates ~700 LoC in
            # torque_to_current_conversion.py — same MTPC/MTPF + modulation
            # math, LUT-interpolated).
            cs_ops = dict(new_cs["ops"])
            idq = self.ops_operating_point(cs_ops, state, t_ref * p["torque_lim"])
            new_cs["ops"] = cs_ops
            ref_d = idq[0] / p["i_sd_lim"]
            ref_q = idq[1] / p["i_sq_lim"]
        else:
            ref_d = reference[p["ref_d_idx"]]
            ref_q = reference[p["ref_q_idx"]]

        if p["cont"]:
            u_sd_0, u_sq_0 = self._sync_decouple(state, cascaded=True)
            sd, sq = state[p["i_sd_idx"]], state[p["i_sq_idx"]]
            u_sd, cs_d = self.stages["d"].control(cs["d"], sd, ref_d)
            u_sq, cs_q = self.stages["q"].control(cs["q"], sq, ref_q)
            raw = self._abc_out(u_sd + u_sd_0, u_sq + u_sq_0, eps_d)
            action = jnp.clip(raw, p["box_lo"], p["box_hi"])
            ok = jnp.all(action == raw)
            new_cs["d"] = self.stages["d"].integrate(cs_d, sd, ref_d, ok)
            new_cs["q"] = self.stages["q"].integrate(cs_q, sq, ref_q, ok)
            return new_cs, action
        ref_abc = transforms.dq_to_abc(jnp.stack([ref_d, ref_q]), eps_d)
        action = jnp.zeros((), jnp.int32)
        for i, ph in enumerate("abc"):
            ai, new_cs[ph] = self.stages[ph].control(
                cs[ph], state[p["i_abc_idx"][i]], ref_abc[i])
            action = action + (2 ** (2 - i)) * ai.astype(jnp.int32)
        return new_cs, action

    # -- Induction machines --------------------------------------------------
    def _control_im_foc(self, cs, state, reference):
        return _im.control_im_foc(self, cs, state, reference)

    def _control_im_cascaded_foc(self, cs, state, reference):
        return _im.control_im_cascaded_foc(self, cs, state, reference)

    # -- rollout -------------------------------------------------------------
    def control_environment(self, env, n_steps, key=None, n_envs=None):
        """Closed-loop rollout on device (one jitted ``lax.scan``), mirroring
        the host step loops in the reference's classic examples
        (classic_controllers_dc_motor_example.py:58-74)."""
        key = key if key is not None else jax.random.PRNGKey(0)

        def single(key):
            state, (obs, ref_obs) = env.reset(key)
            cs = self.reset()

            def body(carry, _):
                state, cs, obs, ref_obs = carry
                cs, action = self.control(cs, obs, ref_obs)
                state, (obs2, ref2), reward, term = env.step_autoreset(state, action)
                return (state, cs, obs2, ref2), (obs2, ref2, reward, term)

            _, (states, refs, rewards, terms) = jax.lax.scan(
                body, (state, cs, obs, ref_obs), None, length=n_steps)
            return dict(states=states, references=refs, rewards=rewards,
                        terminations=terms)

        if n_envs is None:
            return jax.jit(single)(key)
        return jax.jit(jax.vmap(single))(jax.random.split(key, n_envs))


# ---------------------------------------------------------------------------
# Controller.make — the public factory (classic_controllers.py:37-93)
# ---------------------------------------------------------------------------

class Controller:
    """Factory for the classic (secondary) controller stack."""

    @classmethod
    def make(cls, env, stages=None, a=4, decoupling=True,
             automated_gain: bool = True, **controller_kwargs):
        d = _env_data(env)
        if stages is None:
            controller_type, stages = automated_controller_design(d)
        else:
            controller_type, stages = _find_controller_type(d, stages)
        stages = globals()["automated_gain"](d, stages, controller_type, a=a,
                                             enabled=automated_gain)
        return _build(env, d, controller_type, stages, decoupling=decoupling)


def _find_controller_type(d, stages):
    """classic_controllers.py:135-184 — infer the controller type from a
    user-passed stage list (normalized to the same shapes the automated
    design emits)."""
    if d["motor"] in DC_MOTORS:
        if isinstance(stages, str):
            return stages, [{"controller_type": stages}]
        if isinstance(stages, dict):
            return stages["controller_type"], [stages]
        inner = stages[0] if isinstance(stages[0], list) else stages
        if isinstance(stages[0], list) or len(inner) > 1:
            if len(inner) > 1:
                return "cascaded_controller", stages
            return inner[0]["controller_type"], stages
        return stages[0]["controller_type"], stages
    refs = d["ref_states"]
    plain = ("foc_controller" if d["motor"] in SYNC_MOTORS
             else "foc_rotor_flux_observer")
    cascaded = ("cascaded_foc_controller" if d["motor"] in SYNC_MOTORS
                else "cascaded_foc_rotor_flux_observer")
    # upstream returns the cascaded type for ANY len(stages) != 2 sync/IM
    # config — including a one-element [[d, q]] list with i_sq referenced
    # (classic_controllers.py:157-184); matched exactly.
    if len(stages) == 2 and len(stages[1]) == 1 and "i_sq" in refs:
        return plain, stages
    return cascaded, stages


def _build(env, d, controller_type, stages, decoupling=True):
    motor = d["motor"]
    refs = d["ref_states"]
    cont = d["space_kind"] == "Box"
    limits, nominal = d["limits"], d["nominal"]

    if motor == "EESM":
        raise NotImplementedError(
            "EESM has no classic-controller path (the reference's design "
            "table has no EESM branch; classic_controllers.py:187-296).")

    if motor in DC_MOTORS:
        return _build_dc(env, d, controller_type, stages, cont)
    if motor in SYNC_MOTORS:
        return _build_sync(env, d, controller_type, stages, cont, decoupling)
    if motor == "DFIM":
        raise NotImplementedError(
            "DFIM is not supported by the classic stack: upstream writes a "
            "3-phase stator voltage into the 6-dim dual-converter action "
            "space and crashes (induction_motor_foc.py:142-146).")
    return _im.build_im(env, d, controller_type, stages, cont, decoupling,
                        ClassicController)


def _dc_common_prm(d, cont):
    names = d["names"]
    mp = d["mp"]
    prm = dict(
        omega_idx=names.index("omega"),
        i_e_idx=d["currents"][-1],
        u_idx=d["voltages"][-1],
        nom_omega=float(d["nominal"][names.index("omega")]),
        nom_i_e=float(d["nominal"][d["currents"][-1]]),
        nom_u=float(d["nominal"][d["voltages"][-1]]),
        psi_e=mp.get("psi_e"),
        l_e=mp.get("l_e_prime", 0.0),
    )
    if cont:
        u_idx = prm["u_idx"]
        prm["a_lo"] = float(d["box_low"][0] * d["nominal"][u_idx] / d["limits"][u_idx])
        prm["a_hi"] = float(d["box_high"][0] * d["nominal"][u_idx] / d["limits"][u_idx])
        if d["motor"] == "ExtExDc":
            u_e = names.index("u_e")
            prm["ae_lo"] = float(d["box_low"][1] * d["nominal"][u_e] / d["limits"][u_e])
            prm["ae_hi"] = float(d["box_high"][1] * d["nominal"][u_e] / d["limits"][u_e])
    return prm


def _build_dc(env, d, controller_type, stages, cont):
    names = d["names"]
    refs = d["ref_states"]
    control_e = d["motor"] == "ExtExDc"
    ref_idx = next(i for i, r in enumerate(refs) if r != "i_e")
    prm = _dc_common_prm(d, cont)
    prm["ref_idx"] = ref_idx

    if controller_type == "cascaded_controller":
        stages_a = stages[0] if control_e else stages
        stage_objs = {"inner": _make_stage(d, stages_a[0], cascaded=False)}
        if len(stages_a) > 1:
            stage_objs["outer"] = _make_stage(d, stages_a[1], cascaded=True)
        if control_e:
            stage_objs["e"] = _make_stage(d, stages[1][0], control_e=True)
        i_a_idx = d["currents"][0]
        torque_idx = names.index("torque")
        omega_idx = names.index("omega")
        ref_state_name_idx = names.index(refs[ref_idx])
        control_omega = 1 if (control_e and "omega" in refs) else 0
        # run_outer: the upstream loop bounds skip the outer stage for the
        # ExtExDc torque task (range(1,1,-1) is empty,
        # cascaded_controller.py:141-145)
        run_outer = not (control_e and not control_omega)
        # the subordinate-state quirk index: outer P error reads
        # ref_state_idx[ref_idx] = i_a (plain) / torque (ExtEx SC)
        outer_sub_idx = torque_idx if control_omega else i_a_idx
        outer_state_idx = omega_idx if "omega" in refs else ref_state_name_idx
        mp = d["mp"]
        prm.update(
            i_a_state_idx=i_a_idx,
            outer_sub_idx=outer_sub_idx,
            outer_state_idx=outer_state_idx,
            run_outer=run_outer,
            state_limit_low=d["ss_low"] * d["nominal"] / d["limits"],
            state_limit_high=d["ss_high"] * d["nominal"] / d["limits"],
            torque_lim=float(d["limits"][torque_idx]),
            i_a_lim=float(d["limits"][i_a_idx]),
            i_e_lim=float(d["limits"][d["currents"][-1]]),
            ss_low_ia=float(d["ss_low"][i_a_idx]),
            ss_high_ia=float(d["ss_high"][i_a_idx]),
            ss_low_ie=float(d["ss_low"][d["currents"][-1]]),
            ss_high_ie=float(d["ss_high"][d["currents"][-1]]),
            r_a=mp.get("r_a", 0.0), r_e=mp.get("r_e", 1.0),
            ref_e_idx=(refs.index("i_e") if "i_e" in refs else 0),
        )
        # cascade FF quirk: psi_e lookup key is misspelled upstream
        prm["psi_e"] = None
        return ClassicController("dc_cascade", prm, stage_objs)

    # single-stage current control
    stages_a = stages[0] if control_e else stages
    st0 = stages_a[0] if isinstance(stages_a, list) else stages_a
    prm["ref_state_idx"] = names.index(refs[ref_idx])
    family = "dc_cont" if cont else "dc_finite"
    stage_objs = {"a": _make_stage(d, st0)}
    if control_e:
        prm["ref_e_idx"] = refs.index("i_e")
        stage_objs["e"] = _make_stage(d, stages[1][0], control_e=True)
    return ClassicController(family, prm, stage_objs)


def _build_sync(env, d, controller_type, stages, cont, decoupling):
    names = d["names"]
    refs = d["ref_states"]
    mp = d["mp"]
    torque_idx = names.index("torque")
    prm = dict(
        cont=cont,
        decoupling=decoupling,
        tau=d["tau"],
        limits=d["limits"],
        mp_p=mp["p"], l_d=mp["l_d"], l_q=mp["l_q"], psi_p=mp.get("psi_p", 0.0),
        omega_idx=names.index("omega"),
        eps_idx=names.index("epsilon"),
        i_sd_idx=names.index("i_sd"),
        i_sq_idx=names.index("i_sq"),
        omega_lim=float(d["limits"][names.index("omega")]),
        eps_lim=float(d["limits"][names.index("epsilon")]),
        i_sd_lim=float(d["limits"][names.index("i_sd")]),
        i_sq_lim=float(d["limits"][names.index("i_sq")]),
        u_sd_lim=float(d["limits"][names.index("u_sd")]),
        u_sq_lim=float(d["limits"][names.index("u_sq")]),
        torque_lim=float(d["limits"][torque_idx]),
    )
    if cont:
        prm["box_lo"] = float(d["box_low"][0])
        prm["box_hi"] = float(d["box_high"][0])

    if controller_type == "foc_controller":
        # dead time handling: 1.5 control periods with an interlocked
        # converter, 0.5 otherwise (foc_controller.py:59-61)
        prm["dead_time"] = 1.5 if d["dead_time"] else 0.5
        prm["ref_d_idx"] = refs.index("i_sd")
        prm["ref_q_idx"] = refs.index("i_sq")
        prm["d_idx"] = names.index("i_sd")
        prm["q_idx"] = names.index("i_sq")
        if cont:
            stage_objs = {"d": _make_stage(d, stages[0][0]),
                          "q": _make_stage(d, stages[0][1])}
        else:
            stage_objs = {ph: _make_stage(d, stages[i][0])
                          for i, ph in enumerate("abc")}
            prm["i_abc_idx"] = [names.index(f"i_{ph}") for ph in "abc"]
        return ClassicController("foc", prm, stage_objs)

    # cascaded_foc_controller (always dead_time 0.5 upstream,
    # cascaded_foc_controller.py:67)
    prm["dead_time"] = 0.5
    prm["torque_control"] = "torque" in refs or "omega" in refs
    prm["omega_control"] = "omega" in refs
    prm["ref_idx"] = 0
    prm["ss_low_t"] = float(d["ss_low"][torque_idx])
    prm["ss_high_t"] = float(d["ss_high"][torque_idx])
    prm["nom_t_ratio"] = float(d["nominal"][torque_idx] / d["limits"][torque_idx])
    if not prm["torque_control"]:
        prm["ref_d_idx"] = refs.index("i_sd")
        prm["ref_q_idx"] = refs.index("i_sq")

    ops = None
    if prm["torque_control"]:
        from ..controllers.pmsm_ops import tune_pmsm_ops
        env_id = f"{'Cont' if cont else 'Finite'}-TC-{d['motor']}-v0"
        ops = types.SimpleNamespace(ops_params=tune_pmsm_ops(env, env_id))

    if cont:
        stage_objs = {"d": _make_stage(d, stages[0][0]),
                      "q": _make_stage(d, stages[0][1])}
        if prm["omega_control"]:
            stage_objs["overlaid"] = _make_stage(d, stages[1][0], cascaded=True)
    else:
        stage_objs = {ph: _make_stage(d, stages[i][0]) for i, ph in enumerate("abc")}
        prm["i_abc_idx"] = [names.index(f"i_{ph}") for ph in "abc"]
        if prm["omega_control"]:
            stage_objs["overlaid"] = _make_stage(d, stages[3][0], cascaded=True)
    return ClassicController("cascaded_foc", prm, stage_objs, ops=ops)
