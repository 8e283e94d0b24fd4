"""Fused Pallas kernels for the switched-reluctance family (EXTENSION).

The reference only STUBS the SRM (envs/gym_srm/*.py raise
NotImplementedError); this family makes the 6 SRM catalog ids first-class
citizens of the fused tier: the sinusoidal-inductance phase ODE
(models/motors.py:srm_ode) integrates entirely in VMEM with the
asymmetric half-bridge applied per phase, and the full family surface
(record adapter + policy adapter) plugs the SRM into the universal
recorder, the in-kernel policy/PPO/DQN machinery and the sharded
dispatch exactly like the reference families.

Physics notes (mirroring ``physical_systems.SRMSystem``):

* the electrical angle advances at ``p * omega`` and every RK4 stage
  re-evaluates ``sin/cos(eps)`` (the inductance profile depends on eps
  INSIDE the step — unlike the dq-frame machines there is no
  rotating-frame trick, so the stage sincos is inherent physics);
* phase currents are UNIPOLAR: the ideal freewheel diodes stop
  conducting at zero current, implemented as a per-cycle clamp
  ``i = max(i, 0)`` after the RK4 — the exact XLA-path semantics;
* the asymmetric bridge has no shoot-through path, so there is no
  interlocking dead time and no carried half-bridge state (i_sup uses
  the current action, like the 1QC/cont converters).
"""

from __future__ import annotations

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_common import (
    LANE,
    TWO_PI,
    _fused_check_system,
    _fused_constraint_mode,
    _fused_state_noise,
    _make_fused_mech,
    _make_fused_supply,
    _make_rng,
    _make_wiener,
    _norm_advance,
    _param_reset_draws,
    _parse_randomize,
    _policy_obs_spec,
    _ref_configs,
    _ref_n_rows,
    _ref_needs_wf,
    _rotation_protocol,
    _step_noise,
    _sup_reset_planes,
    _u_sup_plane_idx,
    _uniform_from_bits,
    _wrap_dead_time,
    _wrap_j_resolve,
    _wrap_mech_time,
    _wse_err,
)

# phase offsets: cos/sin(k * 2pi/3) as compile-time constants so the
# per-stage trig is ONE sincos(eps) + constant rotations
_COS_PHI = (1.0, -0.5, -0.5)
_SIN_PHI = (0.0, float(np.sqrt(3.0) / 2.0), float(-np.sqrt(3.0) / 2.0))


def _srm_family(env, R, action_mode, randomize=None):
    """Shared SRM-family closures — consumed by the reducing rollout
    (``make_fused_srm_rollout``), the generic recorder and the universal
    policy kernels.

    ``randomize``: optional ``{param: (lo, hi)}`` — ``r_s`` (winding
    temperature drift), the ``l0``/``l1`` inductance profile (the SRM
    obs norms never read them, so the profile is a clean axis) plus the
    generic ``j_rotor``/``u_sup`` axes as per-env state planes (same
    design as ``_dc_family``)."""
    ps = env.physical_system
    _fused_check_system(ps, allow_dead_time=True, allow_state_noise=True)
    mp = {k: float(v) for k, v in ps.motor.parameter.items()}
    names = list(ps.state_names)
    lim = np.asarray(ps.limits)
    conv = ps.converter
    finite = conv.action_type == "finite"
    assert conv.kind in ("Finite-ASYM", "Cont-ASYM"), (
        f"the SRM family implements the asymmetric half-bridge; got "
        f"{conv.kind!r} — use the general XLA path")

    r_s, l0, l1, p = mp["r_s"], mp["l0"], mp["l1"], mp["p"]
    param_names, n_param, p_idx, param_ranges = _parse_randomize(
        randomize, ("r_s", "l0", "l1", "j_rotor", "u_sup"), "SRM",
        "the winding resistance, inductance profile + inertia + u_sup")

    def resolve(pp):
        """(r_s, l0?, l1?) — None marks a non-randomized inductance so
        ``_lparams`` keeps the compile-time float expressions (bit-exact
        default path); the SRM obs norms never read l0/l1 (currents +
        cos/sin eps only), so the inductance profile is a clean
        randomization axis here, unlike the induction families"""
        return (pp[p_idx["r_s"]] if "r_s" in p_idx else r_s,
                pp[p_idx["l0"]] if "l0" in p_idx else None,
                pp[p_idx["l1"]] if "l1" in p_idx else None)

    tau = float(ps.tau)
    i_lim = float(lim[names.index("i_a")])
    t_lim = float(lim[names.index("torque")])
    w_lim = float(lim[names.index("omega")])
    shape = (R, LANE)
    n_ach = 3

    mload = _make_fused_mech(ps, float(mp["j_rotor"]), shape)
    resolve, j_rand = _wrap_j_resolve(resolve, mload, p_idx)
    mech_mode, mech = mload.mode, mload.mech
    needs_step_noise = mload.needs_step_noise
    omega_fixed = mload.omega_fixed
    sup = _make_fused_supply(ps, shape, tau)
    _u_idx = _u_sup_plane_idx(p_idx, sup)
    n_sup = sup.n_sup
    COS_D = SIN_D = None
    if not mech:
        COS_D = np.float32(np.cos(tau * p * omega_fixed))
        SIN_D = np.float32(np.sin(tau * p * omega_fixed))

    PL1 = np.float32(p * l1)
    L0C, L1C = np.float32(l0), np.float32(l1)

    def _lparams(pc):
        """(p*l1, l0, l1) — compile-time floats on the default path (the
        exact expressions the non-randomized kernels used, so that path
        stays bit-identical), per-env planes under randomize"""
        l0_v = L0C if pc[1] is None else pc[1]
        l1_v = L1C if pc[2] is None else pc[2]
        pl1 = PL1 if pc[2] is None else np.float32(p) * pc[2]
        return pl1, l0_v, l1_v

    # magnetic saturation (opt-in psi_s — see models/motors.py): the
    # exponential flux model's incremental factor e = exp(-i L / psi_s)
    # scales both the back-EMF term and the incremental inductance; the
    # torque uses the coenergy form.  psi_s absent = linear model.
    PSI_S = mp.get("psi_s", None)
    INV_PSI_S = None if PSI_S is None else np.float32(1.0 / PSI_S)

    def _trig_cs(ce, se):
        """per-phase sin/cos(eps - phi_k) from a given (cos eps, sin eps)"""
        s_k = tuple(se * np.float32(cp) - ce * np.float32(sp)
                    for cp, sp in zip(_COS_PHI, _SIN_PHI))
        c_k = tuple(ce * np.float32(cp) + se * np.float32(sp)
                    for cp, sp in zip(_COS_PHI, _SIN_PHI))
        return s_k, c_k

    def _trig(eps):
        """per-phase sin/cos(eps - phi_k) from ONE sincos(eps)"""
        return _trig_cs(jnp.cos(eps), jnp.sin(eps))

    def _tq(i3, s_k, c_k, lp):
        """reluctance torque from the per-phase slope sines — the ONE
        torque expression shared by the integrator rhs and the reward
        path (coenergy form when saturating); ``lp = _lparams(pc)``"""
        pl1, l0_v, l1_v = lp
        if INV_PSI_S is None:
            return pl1 * (0.5 * (i3[0] * i3[0] * s_k[0]
                                 + i3[1] * i3[1] * s_k[1]
                                 + i3[2] * i3[2] * s_k[2]))
        tq = 0.0
        for k in range(3):
            l_k = l0_v - l1_v * c_k[k]
            x = i3[k] * l_k * INV_PSI_S
            e = jnp.exp(-x)
            tq = tq + (pl1 * s_k[k] * np.float32(PSI_S**2)
                       / (l_k * l_k)) * ((1.0 - e) - x * e)
        return tq

    def torque_of(i3, eps, lp=(PL1, L0C, L1C)):
        s_k, c_k = _trig(eps)
        return _tq(i3, s_k, c_k, lp)

    def rhs(core, u3, z, ts, pc, cs=None):
        """``cs``: optional precomputed (cos eps, sin eps) for this RK4
        stage — the fixed-speed envs derive it from the carried rotation
        by COMPILE-TIME stage constants, eliminating all per-stage
        transcendentals (the mech envs must evaluate sincos of the
        integrated eps: the inductance profile depends on eps INSIDE the
        step, there is no rotating-frame trick)."""
        if mech:
            w, ia, ib, ic, eps = core
        else:
            ia, ib, ic, eps = core
            w = omega_fixed
        r_s_v = pc[0]
        pl1, l0_v, l1_v = lp = _lparams(pc)
        if cs is None:
            s_k, c_k = _trig(eps)
        else:
            s_k, c_k = _trig_cs(cs[0], cs[1])
        i3 = (ia, ib, ic)
        if INV_PSI_S is None:
            di = tuple(
                (u3[k] - r_s_v * i3[k] - i3[k] * (pl1 * s_k[k]) * w)
                / (l0_v - l1_v * c_k[k])
                for k in range(3))
        else:
            di = []
            for k in range(3):
                l_k = l0_v - l1_v * c_k[k]
                e = jnp.exp(-i3[k] * l_k * INV_PSI_S)
                di.append((u3[k] - r_s_v * i3[k]
                           - i3[k] * (pl1 * s_k[k]) * w * e) / (l_k * e))
            di = tuple(di)
        deps = np.float32(p) * w if mech else np.float32(p * omega_fixed) + 0.0 * eps
        if not mech:
            return di + (deps,)
        tq = _tq(i3, s_k, c_k, lp)
        if j_rand:
            dw = mload.mech_rhs_j(w, tq, z, pc[-1])
        elif mload.needs_time:
            dw = mload.mech_rhs_t(w, tq, z, ts)
        else:
            dw = mload.mech_rhs(w, tq, z)
        return (dw,) + di + (deps,)

    n_core = 5 if mech else 4
    n_state = n_core + n_sup + n_param
    i_eps = n_core - 1
    n_bridge = 0

    def fracs(action):
        """per-phase voltage fraction of u_sup (asymmetric bridge)"""
        if finite:
            return tuple((a == 1).astype(jnp.float32)
                         - (a == 2).astype(jnp.float32) for a in action)
        return tuple(jnp.clip(a, -1.0, 1.0) for a in action)

    def advance_bridges(bs, action):
        return ()

    # fixed-speed stage rotations: eps advances EXACTLY linearly (deps/dt
    # = p*omega_fixed is state-independent), so the mid/full-stage
    # (cos, sin)(eps) are the cycle-start rotation rotated by compile-time
    # constants — zero transcendentals per step on the CC/TC configs
    CH = SH = CF = SF = None
    if not mech:
        CH = np.float32(np.cos(0.5 * tau * p * omega_fixed))
        SH = np.float32(np.sin(0.5 * tau * p * omega_fixed))
        CF, SF = COS_D, SIN_D    # full-stage rotation == the per-cycle one

    def rk4(core, u3, z, dt, pc, t0=None, cs0=None):
        def axpy(st, k, cc):
            return tuple(si + cc * ki for si, ki in zip(st, k))

        tm = te = None
        if t0 is not None:
            tm, te = t0 + 0.5 * dt, t0 + dt
        cs1 = cs2 = cs3 = None
        if cs0 is not None:
            c0, s0 = cs0
            cs1 = (c0 * CH - s0 * SH, s0 * CH + c0 * SH)
            cs3 = (c0 * CF - s0 * SF, s0 * CF + c0 * SF)
            cs2 = cs1
        k1 = rhs(core, u3, z, t0, pc, cs0)
        k2 = rhs(axpy(core, k1, 0.5 * dt), u3, z, tm, pc, cs1)
        k3 = rhs(axpy(core, k2, 0.5 * dt), u3, z, tm, pc, cs2)
        k4 = rhs(axpy(core, k3, dt), u3, z, te, pc, cs3)
        return tuple(
            si + (dt / 6.0) * (a1 + 2.0 * (a2 + a3) + a4)
            for si, a1, a2, a3, a4 in zip(core, k1, k2, k3, k4)
        )

    def physics_step(state, action, c, s, z=None, bs=None, t0=None):
        core = state[:n_core]
        sup_planes = state[n_core:n_core + n_sup]
        pp = state[n_core + n_sup:]
        pc = resolve(pp)
        fr = fracs(action)
        if sup.needs_i_sup:
            i3 = core[1:4] if mech else core[0:3]
            i_sup_val = fr[0] * i3[0] + fr[1] * i3[1] + fr[2] * i3[2]
        else:
            i_sup_val = None
        u_sup_val, sup_new = sup.supply_u(
            sup_planes, i_sup_val,
            None if _u_idx is None else pp[_u_idx])
        u3 = tuple(f * u_sup_val for f in fr)
        # fixed-speed: (c, s) IS cos/sin(eps) at cycle start (the carried
        # rotation in the reducing kernel; fresh sincos elsewhere)
        cs0 = None if mech else (c, s)
        new_core = rk4(core, u3, z, np.float32(tau), pc, t0, cs0)
        # ideal-diode clamp: phase currents stay >= 0 (SRMSystem.simulate)
        off = 1 if mech else 0
        clamped = tuple(jnp.maximum(new_core[off + k], 0.0)
                        for k in range(3))
        new_core = new_core[:off] + clamped + new_core[off + 3:]
        return new_core + sup_new + pp

    def reset_state(bits):
        zero = jnp.zeros(shape, jnp.float32)
        core = ((mload.omega_reset(bits),) if mech else ()) + (zero,) * 4
        pdraws = _param_reset_draws(bits, shape, param_ranges)
        return core + _sup_reset_planes(sup, bits, pdraws, _u_idx) + pdraws

    ref_cfg = _ref_configs(env, R,
                           require_wiener=action_mode == "random")
    n_ref = len(ref_cfg)
    n_rows = _ref_n_rows(ref_cfg)
    shape_r = (n_rows * R, LANE)
    rw = env.reward_function
    bias = np.float32(rw._bias_value)
    violation_reward = np.float32(rw._violation_value)

    def _i3(state):
        return state[1:4] if mech else state[0:3]

    def ref_quantity(state, j):
        nm = ref_cfg[j]["name"]
        if nm == "omega":
            return state[0] * np.float32(1.0 / w_lim)
        if nm == "torque":
            # per-env inductances under randomize (the torque NORM stays
            # the static catalog limit, the XLA dynamic_params convention)
            lp = _lparams(resolve(state[n_core + n_sup:]))
            return (torque_of(_i3(state), state[i_eps], lp)
                    * np.float32(1.0 / t_lim))
        k = {"i_a": 0, "i_b": 1, "i_c": 2}[nm]
        return _i3(state)[k] * ref_cfg[j]["inv_lim"]

    def _sample_actions(bits):
        if finite:
            # one uniform sub-action in {0, 1, 2} per phase
            return tuple(
                jnp.minimum((_uniform_from_bits(bits(shape)) * 3.0)
                            .astype(jnp.int32), 2)
                for _ in range(3))
        return tuple(2.0 * _uniform_from_bits(bits(shape)) - 1.0
                     for _ in range(n_ach))

    # --- ExternalSpeedLoad time plane + DeadTimeProcessor action planes ---
    physics_step, advance_bridges, n_bridge, bridge_dtypes = \
        _wrap_mech_time(mload, tau, physics_step, advance_bridges,
                        n_bridge, has_cs=True, k_int=0.0)
    physics_step, advance_bridges, n_bridge, bridge_dtypes = \
        _wrap_dead_time(ps,
                        ((jnp.int32,) if finite else (jnp.float32,)) * 3,
                        physics_step, advance_bridges, n_bridge,
                        has_cs=True, base_dtypes=bridge_dtypes)

    # --- generic record-adapter surface (see ops/pallas_record.py) ---
    state_names = ((("omega",) if mech else ())
                   + ("i_a", "i_b", "i_c", "eps") + sup.names + param_names)
    _t_ref = any(c["name"] == "torque" for c in ref_cfg)
    observe = _fused_state_noise(
        ps, state_names, lambda nm: float(lim[names.index(nm)]),
        allowed=((() if _t_ref else ("i_a", "i_b", "i_c"))
                 + (("omega",) if mech else ())))
    act_names = ("action_a", "action_b", "action_c")
    act_dtype = jnp.int32 if finite else jnp.float32
    inv_ilim = np.float32(1.0 / i_lim)

    def sample_actions_t(bits):
        return _sample_actions(bits)

    def read_actions(ref, t):
        return tuple(ref[t, j] for j in range(3))

    def pre_step(cur):
        return (jnp.cos(cur[i_eps]), jnp.sin(cur[i_eps]))

    rot_init = rot_advance = pre_step_rot = None
    if not mech:
        rot_init, rot_advance = _rotation_protocol(COS_D, SIN_D, i_eps)

        def pre_step_rot(cur, c, s):
            return (c, s)

    def step(cur, acts, aux, z=None, bs=None):
        c, s = aux
        state = physics_step(cur, acts, c, s, z, bs)
        eps = state[i_eps]
        # wrap to [-pi, pi) — the SRMSystem convention
        eps = eps - np.float32(TWO_PI) * jnp.floor(
            (eps + np.float32(np.pi)) * np.float32(1.0 / TWO_PI))
        return state[:i_eps] + (eps,) + state[i_eps + 1:]

    no_cons = _fused_constraint_mode(
        env, (("limit", ("i_a", "i_b", "i_c")),)) == "none"

    def violated(state):
        if no_cons:  # constraints=(): the env never terminates
            return jnp.zeros(shape, jnp.bool_)
        i3 = _i3(state)
        v = jnp.abs(i3[0]) * inv_ilim > 1.0
        v = v | (jnp.abs(i3[1]) * inv_ilim > 1.0)
        return v | (jnp.abs(i3[2]) * inv_ilim > 1.0)

    def quantities(state, aux):
        return [ref_quantity(state, j) for j in range(n_ref)]

    # --- policy-adapter surface (see ops/pallas_policy.py) ---
    off = 1 if mech else 0
    obs_spec = _policy_obs_spec(mech, w_lim, omega_fixed, [
        ("state", off, 1.0 / i_lim), ("state", off + 1, 1.0 / i_lim),
        ("state", off + 2, 1.0 / i_lim), ("cos", i_eps), ("sin", i_eps)])

    return SimpleNamespace(
        obs_spec=obs_spec, act_ns=((3, 3, 3) if finite else None),
        act_range=(None if finite else
                   (np.full((n_ach,), -1.0, np.float32),
                    np.ones((n_ach,), np.float32))),
        aux_cs=lambda aux: aux,
        n_state=n_state, finite=finite, mech=mech, shape=shape,
        shape_r=shape_r, n_ref=n_ref, n_rows=n_rows, ref_cfg=ref_cfg,
        bias=bias, violation_reward=violation_reward, i_lim=i_lim,
        COS_D=COS_D, SIN_D=SIN_D, physics_step=physics_step,
        ref_quantity=ref_quantity, sample_actions=_sample_actions,
        state_names=state_names, act_names=act_names, act_dtype=act_dtype,
        sample_actions_t=sample_actions_t, read_actions=read_actions,
        pre_step=pre_step, step=step, violated=violated,
        quantities=quantities, pre_step_rot=pre_step_rot,
        rot_init=rot_init, rot_advance=rot_advance,
        mech_mode=mech_mode, sup_mode=sup.mode, n_sup=n_sup, n_core=n_core,
        i_eps=i_eps, needs_step_noise=needs_step_noise,
        param_names=param_names, param_ranges=param_ranges,
        n_param=n_param, observe=observe,
        reset_state=reset_state, n_bridge=n_bridge,
        bridge_dtypes=bridge_dtypes,
        advance_bridges=_norm_advance(advance_bridges),
    )


def make_fused_srm_rollout(env, n_steps, n_envs, action_mode="random",
                           interpret=False, randomize=None):
    """Universal fused rollout for the switched-reluctance family — all 6
    {Finite,Cont} x {CC,TC,SC} SRM catalog ids (EXTENSION: upstream only
    stubs them).

    * random mode: ``rollout(seed, *state0) -> (*states, reward_sum,
      term_count, rv, rk, rl, rs)``; states = (omega?, i_a, i_b, i_c,
      eps).
    * buffer mode: ``rollout(*state0, actions) -> states`` with int32
      ``(n_steps, 3, R, LANE)`` per-phase {0 freewheel, 1 magnetize,
      2 demagnetize} commands (finite) / float32 duties (cont);
      deterministic physics only — the bit-level validation path vs the
      XLA env.
    """
    assert n_envs % LANE == 0
    R = n_envs // LANE
    fs = _srm_family(env, R, action_mode, randomize)
    n_state, finite, mech, shape, shape_r = (
        fs.n_state, fs.finite, fs.mech, fs.shape, fs.shape_r)
    n_ref, ref_cfg = fs.n_ref, fs.ref_cfg
    n_rows = fs.n_rows
    bias, violation_reward = fs.bias, fs.violation_reward
    COS_D, SIN_D, i_eps = fs.COS_D, fs.SIN_D, fs.i_eps
    n_bs = fs.n_bridge
    physics_step, ref_quantity = fs.physics_step, fs.ref_quantity
    _sample_actions = fs.sample_actions
    has_wf = _ref_needs_wf(ref_cfg)
    PI_F = np.float32(np.pi)

    def _wrap_eps(eps):
        return eps - np.float32(TWO_PI) * jnp.floor(
            (eps + PI_F) * np.float32(1.0 / TWO_PI))

    def kernel(seed_ref, *refs):
        state0 = refs[:n_state]
        out_state = refs[n_state: 2 * n_state]
        out_reward, out_terms, out_rv, out_rk, out_rl, out_rs = (
            refs[2 * n_state: 2 * n_state + 6])
        scratch = refs[2 * n_state + 6:]
        rv_ref, rk_ref, rl_ref, rs_ref, rng_ref = scratch[:5]
        j = 5
        za_ref = zb_ref = c_ref = s_ref = None
        if n_rows == 1:
            za_ref, zb_ref = scratch[j], scratch[j + 1]
            j += 2
        if not mech:
            c_ref, s_ref = scratch[j], scratch[j + 1]
        wf_ref = scratch[-1] if has_wf else None
        seed, bits = _make_rng(interpret, rng_ref)
        seed(seed_ref[0])
        for o, s in zip(out_state, state0):
            o[:] = s[:]
        if not mech:
            c_ref[:] = jnp.cos(state0[i_eps][:])
            s_ref[:] = jnp.sin(state0[i_eps][:])
        out_reward[:] = jnp.zeros(shape, jnp.float32)
        out_terms[:] = jnp.zeros(shape, jnp.float32)

        w_init, w_advance = _make_wiener(bits, ref_cfg, R, shape, shape_r,
                                         rv_ref, rk_ref, rl_ref, rs_ref,
                                         za_ref, zb_ref, wf_ref)
        w_init()

        def body(t, bs):
            action = _sample_actions(bits)
            z = _step_noise(fs.needs_step_noise, bits, shape)
            cur = tuple(o[:] for o in out_state)
            if mech:
                c, s = jnp.cos(cur[i_eps]), jnp.sin(cur[i_eps])
            else:
                c, s = c_ref[:], s_ref[:]
            state = physics_step(cur, action, c, s, z,
                                 bs if n_bs else None)
            state = (state[:i_eps] + (_wrap_eps(state[i_eps]),)
                     + state[i_eps + 1:])

            sobs = fs.observe(state, bits) if fs.observe else state
            violated = fs.violated(sobs)

            refs_now = rv_ref[:]
            wse = bias - _wse_err(ref_cfg[0], ref_quantity(sobs, 0),
                                  refs_now[:R])
            for jj in range(1, n_ref):
                wse = wse - _wse_err(ref_cfg[jj], ref_quantity(sobs, jj),
                                     refs_now[jj * R:(jj + 1) * R])
            reward = jnp.where(violated, violation_reward, wse)
            out_reward[:] = out_reward[:] + reward
            out_terms[:] = out_terms[:] + violated.astype(jnp.float32)
            zero = jnp.zeros(shape, jnp.float32)
            for o, s2, r0 in zip(out_state, state, fs.reset_state(bits)):
                o[:] = jnp.where(violated, r0, s2)
            if not mech:
                c_new = c * COS_D - s * SIN_D
                s_new = s * COS_D + c * SIN_D
                inv = jax.lax.rsqrt(c_new * c_new + s_new * s_new)
                c_ref[:] = jnp.where(violated,
                                     jnp.ones(shape, jnp.float32),
                                     c_new * inv)
                s_ref[:] = jnp.where(violated, zero, s_new * inv)

            w_advance(t, violated)
            if not n_bs:
                return 0
            return tuple(jnp.where(violated, 0, b)
                         for b in fs.advance_bridges(bs, action, cur,
                                                     (c, s)))

        init = (tuple(jnp.zeros(shape, dt) for dt in fs.bridge_dtypes)
                if n_bs else 0)
        jax.lax.fori_loop(0, n_steps, body, init)
        out_rv[:] = rv_ref[:]
        out_rk[:] = rk_ref[:]
        out_rl[:] = rl_ref[:]
        out_rs[:] = rs_ref[:]

    def kernel_buffer(*refs):
        state0 = refs[:n_state]
        actions_ref = refs[n_state]
        out_state = refs[n_state + 1:]
        for o, s in zip(out_state, state0):
            o[:] = s[:]

        def body(t, bs):
            action = tuple(actions_ref[t, k] for k in range(3))
            cur = tuple(o[:] for o in out_state)
            c, s = jnp.cos(cur[i_eps]), jnp.sin(cur[i_eps])
            state = physics_step(cur, action, c, s, None,
                                 bs if n_bs else None)
            state = (state[:i_eps] + (_wrap_eps(state[i_eps]),)
                     + state[i_eps + 1:])
            for o, s2 in zip(out_state, state):
                o[:] = s2
            if not n_bs:
                return 0
            return fs.advance_bridges(bs, action, cur, (c, s))

        init = (tuple(jnp.zeros(shape, dt) for dt in fs.bridge_dtypes)
                if n_bs else 0)
        jax.lax.fori_loop(0, n_steps, body, init)

    if action_mode == "buffer":
        assert not fs.needs_step_noise, (
            "buffer (bit-validation) mode needs deterministic physics; "
            "set the OU load's sigma to 0")

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    if action_mode == "buffer":
        @jax.jit
        def rollout(*args):
            return pl.pallas_call(
                kernel_buffer,
                out_shape=tuple(jax.ShapeDtypeStruct(shape, jnp.float32)
                                for _ in range(n_state)),
                in_specs=[vmem] * (n_state + 1),
                out_specs=tuple(vmem for _ in range(n_state)),
                interpret=interpret,
            )(*args)

        return rollout

    out_shapes = (tuple(jax.ShapeDtypeStruct(shape, jnp.float32)
                        for _ in range(n_state + 2))
                  + tuple(jax.ShapeDtypeStruct(shape_r, jnp.float32)
                          for _ in range(4)))
    scratch_shapes = (
        [pltpu.VMEM(shape_r, jnp.float32) for _ in range(4)]
        + [pltpu.VMEM(shape_r, jnp.uint32)]
        + ([pltpu.VMEM(shape, jnp.float32) for _ in range(2)]
           if n_rows == 1 else [])
        + ([] if mech
           else [pltpu.VMEM(shape, jnp.float32) for _ in range(2)])
        + ([pltpu.VMEM((4 * n_rows * R, LANE), jnp.float32)]
           if has_wf else [])
    )

    @jax.jit
    def rollout(seed, *state0):
        return pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)]
                      + [vmem] * n_state),
            out_specs=tuple(vmem for _ in range(len(out_shapes))),
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(jnp.asarray([seed], jnp.int32), *state0)

    return rollout


def make_fused_srm_cascade_rollout(env, ctrl, n_steps, n_envs,
                                   interpret=False):
    """Fused closed-loop commutation cascade for the SRM — ALL THREE
    control tasks of :class:`controllers.srm.SRMCommutationController`
    run in-kernel against the family physics:

    * **SC** — anti-windup PI speed loop -> single-pulse commutation with
      the sqrt torque linearization -> per-phase regulation;
    * **TC** — integral trim on the MEASURED (coenergy) torque ->
      commutation -> regulation; the trim integrator is the carried
      controller state;
    * **CC** — per-phase regulation straight toward the referenced
      ``i_a/i_b/i_c`` setpoints (no carried state).

    Both converter types are supported: Finite = hysteresis band on the
    asymmetric bridge, Cont = P duty on the current error + resistive
    feed-forward — exactly ``SRMCommutationController._regulate``.  The
    env's reference process, WSE reward, limit constraint and in-kernel
    auto-reset all ride along; the controller integrator persists across
    episode resets, exactly as ``control_environment`` carries ``cs``.

    ``ctrl`` must be ``GemController.make(env, env_id)`` (routed to the
    commutation controller).  Build the env with ``ConstReference`` for
    the deterministic validation path.

    ``rollout(seed, *state0) -> (*states, reward_sum, term_count, rv,
    rk, rl, rs, integ)``; states = (omega?, i_a, i_b, i_c, eps, ...).
    """
    from ..controllers.srm import SRMCommutationController

    assert isinstance(ctrl, SRMCommutationController)
    task = ctrl.control_task
    finite_ctrl = ctrl.action_type == "Finite"
    assert task in ("SC", "TC", "CC")
    assert n_envs % LANE == 0
    R = n_envs // LANE
    fs = _srm_family(env, R, "random")
    assert fs.observe is None, (
        "the in-kernel cascade rejects StateNoiseProcessor — use the XLA "
        "control_environment")
    assert fs.finite == finite_ctrl
    if task == "SC":
        assert fs.mech and fs.n_ref == 1
        assert fs.ref_cfg[0]["name"] == "omega"
    elif task == "TC":
        assert fs.n_ref == 1 and fs.ref_cfg[0]["name"] == "torque"
    else:
        assert fs.n_ref == 3
        assert [c["name"] for c in fs.ref_cfg] == ["i_a", "i_b", "i_c"]
    mech = fs.mech
    n_state, shape, shape_r = fs.n_state, fs.shape, fs.shape_r
    n_rows, ref_cfg = fs.n_rows, fs.ref_cfg
    n_ref = fs.n_ref
    bias, violation_reward = fs.bias, fs.violation_reward
    i_eps = fs.i_eps
    COS_D, SIN_D = fs.COS_D, fs.SIN_D
    n_bs = fs.n_bridge
    assert n_bs == 0, "wrapper planes are not supported in the cascade"
    physics_step, ref_quantity = fs.physics_step, fs.ref_quantity
    has_wf = _ref_needs_wf(ref_cfg)
    PI_F = np.float32(np.pi)
    off = 1 if mech else 0

    # controller constants (host floats -> compile-time)
    KP_W, KI_W = np.float32(ctrl.kp_w), np.float32(ctrl.ki_w)
    T_MAX = np.float32(ctrl.t_max)
    W_LIM = np.float32(ctrl.w_lim)
    I_LIM = np.float32(ctrl.i_lim)
    T_LIM = np.float32(ctrl.t_lim)
    KI_T = np.float32(ctrl.ki_t)
    TAU_C = np.float32(ctrl.tau)
    PL1 = np.float32(ctrl.p * ctrl.l1)
    THETA_ON = np.float32(ctrl.theta_on)
    HYST = np.float32(ctrl.hysteresis)
    KP_I = np.float32(ctrl.kp_i)
    # cont resistive feed-forward duty per normalized setpoint
    FF_I = np.float32(ctrl.r_s * ctrl.i_lim / ctrl.u_lim)
    I_MAX = np.float32((1.0 - ctrl.current_margin) * ctrl.i_lim)
    CPH = tuple(np.float32(v) for v in _COS_PHI)
    SPH = tuple(np.float32(v) for v in _SIN_PHI)

    def _regulate(cur, i_star_n):
        """normalized per-phase setpoints -> converter action
        (SRMCommutationController._regulate, branch-free)"""
        acts = []
        for k in range(3):
            i_n = cur[off + k] * (1.0 / I_LIM)
            if finite_ctrl:
                mag = i_n < i_star_n[k] - HYST
                dem = i_n > i_star_n[k] + HYST
                hold = jnp.where(i_star_n[k] > np.float32(1e-6), 0, 2)
                acts.append(jnp.where(mag, 1,
                                      jnp.where(dem, 2, hold)).astype(
                    jnp.int32))
            else:
                duty = (KP_I * (i_star_n[k] - i_n) + FF_I * i_star_n[k])
                acts.append(jnp.clip(duty, -1.0, 1.0))
        return tuple(acts)

    def _commutate(t_ref, ce, se):
        """single-pulse commutation + sqrt linearization -> normalized
        per-phase setpoints (``_current_setpoints``); (ce, se) is the
        cycle-start cos/sin(eps)"""
        sign = jnp.sign(t_ref)
        s_k = tuple(se * cp - ce * sp for cp, sp in zip(CPH, SPH))
        gain = tuple(sk * sign for sk in s_k)
        gmax = jnp.maximum(gain[0], jnp.maximum(gain[1], gain[2]))
        i_star = []
        for k in range(3):
            fire = (gain[k] > THETA_ON) & (gain[k] >= gmax)
            i_cmd = jnp.sqrt(2.0 * jnp.abs(t_ref)
                             / (PL1 * jnp.maximum(jnp.abs(s_k[k]),
                                                  np.float32(0.05))))
            i_star.append(jnp.where(fire, jnp.minimum(i_cmd, I_MAX),
                                    0.0) * (1.0 / I_LIM))
        return tuple(i_star)

    def control(cur, integ, refs_now, ce, se):
        """the full task law -> (integ', action tuple) — branch-free port
        of SRMCommutationController.control"""
        if task == "CC":
            i_star_n = tuple(refs_now[k * R:(k + 1) * R]
                             for k in range(3))
            return integ, _regulate(cur, i_star_n)
        if task == "TC":
            t_star = refs_now[:R] * T_LIM
            t_meas = ref_quantity(cur, 0) * T_LIM
            integ = jnp.clip(integ + KI_T * (t_star - t_meas) * TAU_C,
                             -0.3 * T_LIM, 0.3 * T_LIM)
            t_ref = t_star + integ
        else:  # SC
            w_err = (refs_now[:R] - cur[0] * (1.0 / W_LIM)) * W_LIM
            t_raw = KP_W * w_err + integ
            t_ref = jnp.clip(t_raw, -T_MAX, T_MAX)
            integ = integ + jnp.where(t_raw == t_ref,
                                      KI_W * w_err * TAU_C, 0.0)
        return integ, _regulate(cur, _commutate(t_ref, ce, se))

    def kernel(seed_ref, *refs):
        state0 = refs[:n_state]
        out_state = refs[n_state: 2 * n_state]
        (out_reward, out_terms, out_rv, out_rk, out_rl, out_rs,
         out_integ) = refs[2 * n_state: 2 * n_state + 7]
        scratch = refs[2 * n_state + 7:]
        rv_ref, rk_ref, rl_ref, rs_ref, rng_ref = scratch[:5]
        j = 5
        za_ref = zb_ref = c_ref = s_ref = None
        if n_rows == 1:
            za_ref, zb_ref = scratch[j], scratch[j + 1]
            j += 2
        if not mech:
            c_ref, s_ref = scratch[j], scratch[j + 1]
            j += 2
        wf_ref = scratch[-1] if has_wf else None
        seed, bits = _make_rng(interpret, rng_ref)
        seed(seed_ref[0])
        for o, s in zip(out_state, state0):
            o[:] = s[:]
        if not mech:
            c_ref[:] = jnp.cos(state0[i_eps][:])
            s_ref[:] = jnp.sin(state0[i_eps][:])
        out_reward[:] = jnp.zeros(shape, jnp.float32)
        out_terms[:] = jnp.zeros(shape, jnp.float32)

        w_init, w_advance = _make_wiener(bits, ref_cfg, R, shape, shape_r,
                                         rv_ref, rk_ref, rl_ref, rs_ref,
                                         za_ref, zb_ref, wf_ref)
        w_init()

        def body(t, integ):
            cur = tuple(o[:] for o in out_state)
            refs_now = rv_ref[:]
            if mech:
                c, s = jnp.cos(cur[i_eps]), jnp.sin(cur[i_eps])
            else:
                c, s = c_ref[:], s_ref[:]
            integ, action = control(cur, integ, refs_now, c, s)
            z = _step_noise(fs.needs_step_noise, bits, shape)
            state = physics_step(cur, action, c, s, z, None)
            eps = state[i_eps]
            eps = eps - np.float32(TWO_PI) * jnp.floor(
                (eps + PI_F) * np.float32(1.0 / TWO_PI))
            state = state[:i_eps] + (eps,) + state[i_eps + 1:]

            violated = fs.violated(state)
            wse = bias - _wse_err(ref_cfg[0], ref_quantity(state, 0),
                                  refs_now[:R])
            for jj in range(1, n_ref):
                wse = wse - _wse_err(ref_cfg[jj],
                                     ref_quantity(state, jj),
                                     refs_now[jj * R:(jj + 1) * R])
            reward = jnp.where(violated, violation_reward, wse)
            out_reward[:] = out_reward[:] + reward
            out_terms[:] = out_terms[:] + violated.astype(jnp.float32)
            zero = jnp.zeros(shape, jnp.float32)
            for o, s2, r0 in zip(out_state, state, fs.reset_state(bits)):
                o[:] = jnp.where(violated, r0, s2)
            if not mech:
                c_new = c * COS_D - s * SIN_D
                s_new = s * COS_D + c * SIN_D
                inv = jax.lax.rsqrt(c_new * c_new + s_new * s_new)
                c_ref[:] = jnp.where(violated,
                                     jnp.ones(shape, jnp.float32),
                                     c_new * inv)
                s_ref[:] = jnp.where(violated, zero, s_new * inv)
            w_advance(t, violated)
            # the integrator persists across resets (control_environment
            # carries cs through autoreset)
            return integ

        integ = jax.lax.fori_loop(0, n_steps, body,
                                  jnp.zeros(shape, jnp.float32))
        out_integ[:] = integ
        out_rv[:] = rv_ref[:]
        out_rk[:] = rk_ref[:]
        out_rl[:] = rl_ref[:]
        out_rs[:] = rs_ref[:]

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shapes = (tuple(jax.ShapeDtypeStruct(shape, jnp.float32)
                        for _ in range(n_state + 2))
                  + tuple(jax.ShapeDtypeStruct(shape_r, jnp.float32)
                          for _ in range(4))
                  + (jax.ShapeDtypeStruct(shape, jnp.float32),))
    scratch_shapes = (
        [pltpu.VMEM(shape_r, jnp.float32) for _ in range(4)]
        + [pltpu.VMEM(shape_r, jnp.uint32)]
        + ([pltpu.VMEM(shape, jnp.float32) for _ in range(2)]
           if n_rows == 1 else [])
        + ([] if mech
           else [pltpu.VMEM(shape, jnp.float32) for _ in range(2)])
        + ([pltpu.VMEM((4 * n_rows * R, LANE), jnp.float32)]
           if has_wf else [])
    )

    @jax.jit
    def rollout(seed, *state0):
        return pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)]
                      + [vmem] * n_state),
            out_specs=tuple(vmem for _ in range(len(out_shapes))),
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(jnp.asarray([seed], jnp.int32), *state0)

    return rollout
