"""Squirrel-cage induction (SCIM) fused kernels: the Cont-TC-SCIM
reducing kernel and the universal induction family builder
(_induction_family / make_fused_induction_rollout)."""

from __future__ import annotations

import functools
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
    _param_reset_draws,
    _parse_randomize,
    _sup_reset_planes,
    _u_sup_plane_idx,
    _wrap_j_resolve,
    _fused_dead_time_steps,
    _fused_control_space,
    _fused_dq_wrapper,
    _fused_state_noise,
    _fused_constraint_mode,
    _require_default_constraints,
    _norm_advance,
    _wrap_dead_time,
    _wrap_mech_time,
    _fused_interlock,
    _fused_load,
    _fused_u_sup,
    _interlock_state,
    _make_b6,
    _make_fused_mech,
    _make_fused_supply,
    _make_rng,
    _make_wiener,
    _policy_obs_spec,
    _ref_configs,
    _ref_n_rows,
    _ref_needs_wf,
    _step_noise,
    _uniform_from_bits,
    _wse_err,
)


def make_fused_scim_rollout(env, n_steps, n_envs, action_mode="random",
                            interpret=False):
    """Fused rollout for Cont-TC-SCIM-v0 — the stiffest family: 5-state
    alpha/beta induction ODE (induction_motor.py:287-313, rotor shorted),
    continuous B6 duty-cycle converter, Wiener torque reference, WSE torque
    reward and the squared dq-current constraint (which needs no field-angle
    atan2: the Park rotation preserves the current norm).

    ``action_mode='buffer'``: ``rollout(isa0, isb0, psa0, psb0, actions)``
    with a ``(n_steps, 3, n_envs//128, 128)`` float32 abc duty buffer in
    [-1, 1], deterministic physics only — the bit-level validation path."""
    _require_default_constraints(env)
    assert n_envs % LANE == 0
    R = n_envs // LANE
    ps = env.physical_system
    _fused_check_system(ps)
    mp = ps.motor.parameter
    names = list(ps.state_names)
    lim = np.asarray(ps.limits)

    l_m = float(mp["l_m"])
    l_s = float(mp["l_m"] + mp["l_sigs"])
    l_r = float(mp["l_m"] + mp["l_sigr"])
    r_s, r_r, p = float(mp["r_s"]), float(mp["r_r"]), float(mp["p"])
    sigma = (l_s * l_r - l_m**2) / (l_s * l_r)
    tau_r = l_r / r_r
    tau_sig = sigma * l_s / (r_s + r_r * l_m**2 / l_r**2)
    c_psi = l_m * r_r / (sigma * l_s * l_r**2)
    c_w = l_m * p / (sigma * l_r * l_s)
    c_u = 1.0 / (sigma * l_s)
    k_t = 1.5 * p * l_m / l_r

    omega = float(_fused_load(ps, ("ConstantSpeedLoad",)).omega_fixed)
    tau = float(ps.tau)
    u_half = 0.5 * _fused_u_sup(ps)
    i_lim = float(lim[names.index("i_sd")])
    t_lim = float(lim[names.index("torque")])
    t_margin = float(ps.nominal_state[names.index("torque")] / t_lim)
    w_over_span = 1.0 / 2.0
    violation_reward = -1.0 / (1.0 - 0.9)
    p_omega = p * omega
    shape = (R, LANE)
    LN10 = np.float32(np.log(10.0))

    def rhs(i_sa, i_sb, ps_a, ps_b, u_a, u_b):
        di_sa = -i_sa / tau_sig + c_psi * ps_a + c_w * omega * ps_b + c_u * u_a
        di_sb = -i_sb / tau_sig + c_psi * ps_b - c_w * omega * ps_a + c_u * u_b
        dps_a = (l_m * i_sa - ps_a) / tau_r - p_omega * ps_b
        dps_b = (l_m * i_sb - ps_b) / tau_r + p_omega * ps_a
        return di_sa, di_sb, dps_a, dps_b

    def _step_physics(isa, isb, pa, pb, ua, ub, uc):
        # continuous B6: u_phase = a * u_sup / 2 per phase
        u_al = (2.0 / 3.0) * (ua - 0.5 * (ub + uc))
        u_be = np.float32(1.0 / np.sqrt(3.0)) * (ub - uc)
        k1 = rhs(isa, isb, pa, pb, u_al, u_be)
        k2 = rhs(isa + 0.5 * tau * k1[0], isb + 0.5 * tau * k1[1],
                 pa + 0.5 * tau * k1[2], pb + 0.5 * tau * k1[3], u_al, u_be)
        k3 = rhs(isa + 0.5 * tau * k2[0], isb + 0.5 * tau * k2[1],
                 pa + 0.5 * tau * k2[2], pb + 0.5 * tau * k2[3], u_al, u_be)
        k4 = rhs(isa + tau * k3[0], isb + tau * k3[1],
                 pa + tau * k3[2], pb + tau * k3[3], u_al, u_be)
        sixth = tau / 6.0
        return (isa + sixth * (k1[0] + 2.0 * (k2[0] + k3[0]) + k4[0]),
                isb + sixth * (k1[1] + 2.0 * (k2[1] + k3[1]) + k4[1]),
                pa + sixth * (k1[2] + 2.0 * (k2[2] + k3[2]) + k4[2]),
                pb + sixth * (k1[3] + 2.0 * (k2[3] + k3[3]) + k4[3]))

    def kernel(seed_ref, isa_ref, isb_ref, psa_ref, psb_ref,
               out_isa, out_isb, out_psa, out_psb, out_reward, out_terms,
               out_rv, out_rk, out_rl, out_rs,
               rv_ref, rk_ref, rl_ref, rs_ref, rng_ref, za_ref, zb_ref):
        seed, bits = _make_rng(interpret, rng_ref)
        seed(seed_ref[0])
        out_isa[:] = isa_ref[:]
        out_isb[:] = isb_ref[:]
        out_psa[:] = psa_ref[:]
        out_psb[:] = psb_ref[:]
        out_reward[:] = jnp.zeros(shape, jnp.float32)
        out_terms[:] = jnp.zeros(shape, jnp.float32)

        def _draw_params(mask):
            u1 = _uniform_from_bits(bits(shape))
            u2 = _uniform_from_bits(bits(shape))
            rl_ref[:] = jnp.where(mask, jnp.floor(500.0 + 1500.0 * u1), rl_ref[:])
            rs_ref[:] = jnp.where(mask, jnp.exp(LN10 * (-3.0 + 2.0 * u2)), rs_ref[:])

        u = _uniform_from_bits(bits(shape))
        rv_ref[:] = (2.0 * u - 1.0) * t_margin
        rk_ref[:] = jnp.zeros(shape, jnp.float32)
        _draw_params(jnp.ones(shape, dtype=jnp.bool_))

        def body(t, _):
            ua = (2.0 * _uniform_from_bits(bits(shape)) - 1.0) * u_half
            ub = (2.0 * _uniform_from_bits(bits(shape)) - 1.0) * u_half
            uc = (2.0 * _uniform_from_bits(bits(shape)) - 1.0) * u_half
            isa, isb, pa, pb = _step_physics(
                out_isa[:], out_isb[:], out_psa[:], out_psb[:], ua, ub, uc)

            torque = k_t * (pa * isb - pb * isa)
            t_n = torque * (1.0 / t_lim)
            # |i_dq| == |i_alphabeta| (rotation-invariant) -> no atan2 needed
            violated = (isa * isa + isb * isb) * (1.0 / (i_lim * i_lim)) > 1.0
            reward = jnp.where(violated, violation_reward,
                               -w_over_span * jnp.abs(t_n - rv_ref[:]))
            out_reward[:] = out_reward[:] + reward
            out_terms[:] = out_terms[:] + violated.astype(jnp.float32)

            zero = jnp.zeros(shape, jnp.float32)
            out_isa[:] = jnp.where(violated, zero, isa)
            out_isb[:] = jnp.where(violated, zero, isb)
            out_psa[:] = jnp.where(violated, zero, pa)
            out_psb[:] = jnp.where(violated, zero, pb)

            # one Box-Muller pair every other step (see the PermExDc kernel)
            even = (t & 1) == 0

            @pl.when(even)
            def _():
                u1 = _uniform_from_bits(bits(shape))
                u2 = _uniform_from_bits(bits(shape))
                rad = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
                theta = np.float32(TWO_PI) * u2
                za_ref[:] = rad * jnp.cos(theta)
                zb_ref[:] = rad * jnp.sin(theta)

            draw = jnp.where(even, za_ref[:], zb_ref[:])
            regen = (rk_ref[:] >= rl_ref[:]) | violated
            _draw_params(regen)
            rk_ref[:] = jnp.where(regen, 0.0, rk_ref[:]) + 1.0
            value = jnp.clip(rv_ref[:] + rs_ref[:] * draw, -t_margin, t_margin)
            u3 = _uniform_from_bits(bits(shape))
            rv_ref[:] = jnp.where(violated, (2.0 * u3 - 1.0) * t_margin, value)
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)
        out_rv[:] = rv_ref[:]
        out_rk[:] = rk_ref[:]
        out_rl[:] = rl_ref[:]
        out_rs[:] = rs_ref[:]

    def kernel_buffer(isa_ref, isb_ref, psa_ref, psb_ref, actions_ref,
                      out_isa, out_isb, out_psa, out_psb):
        out_isa[:] = isa_ref[:]
        out_isb[:] = isb_ref[:]
        out_psa[:] = psa_ref[:]
        out_psb[:] = psb_ref[:]

        def body(t, _):
            ua = actions_ref[t, 0] * u_half
            ub = actions_ref[t, 1] * u_half
            uc = actions_ref[t, 2] * u_half
            isa, isb, pa, pb = _step_physics(
                out_isa[:], out_isb[:], out_psa[:], out_psb[:], ua, ub, uc)
            out_isa[:] = isa
            out_isb[:] = isb
            out_psa[:] = pa
            out_psb[:] = pb
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    if action_mode == "buffer":
        @jax.jit
        def rollout(isa0, isb0, psa0, psb0, actions):
            return pl.pallas_call(
                kernel_buffer,
                out_shape=tuple(jax.ShapeDtypeStruct(shape, jnp.float32)
                                for _ in range(4)),
                in_specs=[vmem] * 5,
                out_specs=tuple(vmem for _ in range(4)),
                interpret=interpret,
            )(isa0, isb0, psa0, psb0, actions)

        return rollout

    out_shapes = tuple(jax.ShapeDtypeStruct(shape, jnp.float32) for _ in range(10))

    @jax.jit
    def rollout(seed, isa0, isb0, psa0, psb0):
        return pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vmem] * 4,
            out_specs=tuple(vmem for _ in range(10)),
            scratch_shapes=(
                [pltpu.VMEM(shape, jnp.float32) for _ in range(4)]
                + [pltpu.VMEM(shape, jnp.uint32)]
                + [pltpu.VMEM(shape, jnp.float32) for _ in range(2)]
            ),
            interpret=interpret,
        )(jnp.asarray([seed], jnp.int32), isa0, isb0, psa0, psb0)

    return rollout


def _induction_family(env, R, action_mode, randomize=None):
    """Shared squirrel-cage-induction-family closures — consumed by the
    reducing rollout (``make_fused_induction_rollout``) and the generic
    trajectory recorder (``ops.pallas_record``).

    ``randomize``: optional ``{param: (lo, hi)}`` — ``r_s``/``r_r`` as
    per-env state planes (domain randomization, same design as
    ``_dc_family``).  The resistances are the canonical induction-machine
    drift axis (rotor resistance rises ~40% from cold to hot and breaks
    slip-frequency-based field orientation); the inductances stay baked —
    they set observation normalization constants (psi_lim = l_m * i_lim)
    that must be static."""
    ps = env.physical_system
    _fused_check_system(ps, allow_dead_time=True, allow_dq=True,
                        allow_state_noise=True,
                        allow_dq_wrapper=("DqToAbcActionProcessor",))
    mp = ps.motor.parameter
    names = list(ps.state_names)
    lim = np.asarray(ps.limits)
    conv = ps.converter
    # NoConverter (converters.py:114-127): no agent in the loop — the
    # supply feeds the stator terminals directly (the ideal-grid
    # simulation, voltage_supplies.py:169-213 + physical_systems
    # _u_terminal's polyphase branch).  u_abc = u_sup per phase; the AC3
    # supply provides the three phase-shifted sines as supply planes.
    conv_none = conv.action_type == "none"
    finite = conv.action_type == "finite"
    k_int = _fused_interlock(conv, float(ps.tau), finite)
    t_int = k_int * float(ps.tau)

    l_m = float(mp["l_m"])
    l_s = float(mp["l_m"] + mp["l_sigs"])
    l_r = float(mp["l_m"] + mp["l_sigr"])
    r_s, r_r, p = float(mp["r_s"]), float(mp["r_r"]), float(mp["p"])
    sigma = (l_s * l_r - l_m**2) / (l_s * l_r)
    c_w = l_m * p / (sigma * l_r * l_s)
    c_u = 1.0 / (sigma * l_s)
    k_t = 1.5 * p * l_m / l_r

    param_names, n_param, p_idx, param_ranges = _parse_randomize(
        randomize, ("r_s", "r_r", "j_rotor", "u_sup"), "SCIM",
        "the electrical resistances + inertia + u_sup")
    _sigma_ls = sigma * l_s
    _lm2_lr2 = l_m**2 / l_r**2
    _c_psi_den = sigma * l_s * l_r**2

    # control_space='dq': the (u_d, u_q) action is rotated to abc at the
    # rotor-FLUX field angle (cos/sin = psi / |psi|, exactly the XLA
    # path's atan2-based eps_fs — SCIMSystem.simulate)
    cs_dq = _fused_control_space(ps) == "dq"
    # The SCIM DqToAbcActionProcessor WRAPPER rotates at the FLUX
    # OBSERVER's psi_angle (+ the advance term) — the observer (a
    # 2-state forward-Euler flux integrator over the post-step currents,
    # flux_observer.py:9-110, using the NOMINAL motor parameters even
    # under randomize — realistic observer detuning) rides as two extra
    # state planes.
    dqw = _fused_dq_wrapper(ps, ("DqToAbcActionProcessor",))
    finite0 = conv.action_type == "finite"
    assert not (cs_dq and finite0)
    if dqw is not None:
        if cs_dq or finite0:
            raise NotImplementedError(
                "DqToAbc wrapper over a dq/finite base is not fused — "
                "use the general XLA path")
        if getattr(dqw, "_angle_name", "psi_angle") != "psi_angle":
            raise NotImplementedError(
                "the SCIM DqToAbc wrapper variant rotates at psi_angle")
    assert not (conv_none and (cs_dq or dqw is not None)), (
        "NoConverter has no action to convert")
    dq_mode = cs_dq or dqw is not None
    # DqToAbc wrapper + DeadTimeProcessor: the reference delays the
    # CONVERTED abc duty — fused via _wrap_dead_time's convert hook (the
    # push-time observer psi_angle + advance rotation produces the stored
    # planes); see _sync_family.  The wrapper's advance already includes
    # the dead_time term (wrappers.py DqToAbcActionProcessor).
    dq_dead = dqw is not None and _fused_dead_time_steps(ps) > 0
    n_obspsi = 2 if dqw is not None else 0
    adv_k = float(dqw._angle_advance) if dqw is not None else 0.0
    _obs_c = r_r * l_m / l_r          # flux_observer.py:93-99
    _obs_a = r_r / l_r
    n_ach = 0 if conv_none else (2 if dq_mode else 3)

    def getp(nm, pp):
        return pp[p_idx[nm]] if nm in p_idx else float(mp[nm])

    def resolve(pp):
        """(tau_r, tau_sig, c_psi) — the r-dependent ODE coefficients,
        in the exact float expression order of the baked path."""
        r_s_v, r_r_v = getp("r_s", pp), getp("r_r", pp)
        tau_r = l_r / r_r_v
        tau_sig = _sigma_ls / (r_s_v + r_r_v * _lm2_lr2)
        c_psi = l_m * r_r_v / _c_psi_den
        return tau_r, tau_sig, c_psi

    tau = float(ps.tau)
    i_lim = float(lim[names.index("i_sd")])
    t_lim = float(lim[names.index("torque")])
    w_lim = float(lim[names.index("omega")])
    shape = (R, LANE)

    mload = _make_fused_mech(ps, float(mp["j_rotor"]), shape)
    resolve, j_rand = _wrap_j_resolve(resolve, mload, p_idx)
    mech_mode, mech = mload.mode, mload.mech
    needs_step_noise = mload.needs_step_noise
    omega_fixed = mload.omega_fixed
    sup = _make_fused_supply(ps, shape, tau, allow_polyphase=conv_none)
    if conv_none and sup.needs_i_sup:
        raise NotImplementedError(
            "NoConverter + RCVoltageSupply is not fused — use the "
            "general XLA path")
    _u_idx = _u_sup_plane_idx(p_idx, sup)
    n_sup = sup.n_sup

    def el_rhs(w, el, u_al, u_be, pc):
        tau_r, tau_sig, c_psi = pc[:3]
        i_sa, i_sb, ps_a, ps_b = el
        pw = p * w
        di_sa = -i_sa / tau_sig + c_psi * ps_a + c_w * w * ps_b + c_u * u_al
        di_sb = -i_sb / tau_sig + c_psi * ps_b - c_w * w * ps_a + c_u * u_be
        dps_a = (l_m * i_sa - ps_a) / tau_r - pw * ps_b
        dps_b = (l_m * i_sb - ps_b) / tau_r + pw * ps_a
        return di_sa, di_sb, dps_a, dps_b

    def torque(el):
        return k_t * (el[2] * el[1] - el[3] * el[0])

    if mech:
        def rhs(core, u_al, u_be, z, ts, pc):
            w, el = core[0], core[1:]
            if j_rand:
                dw = mload.mech_rhs_j(w, torque(el), z, pc[-1])
            elif mload.needs_time:
                dw = mload.mech_rhs_t(w, torque(el), z, ts)
            else:
                dw = mload.mech_rhs(w, torque(el), z)
            return (dw,) + el_rhs(w, el, u_al, u_be, pc)
    else:
        def rhs(core, u_al, u_be, z, ts, pc):
            return el_rhs(omega_fixed, core, u_al, u_be, pc)

    n_core = 4 + (1 if mech else 0)
    n_state = n_core + n_sup + n_param + n_obspsi

    n_bridge = (3 if (finite and (k_int > 0.0
                                  or ps.supply.kind == "RCVoltageSupply"))
                else 0)

    b6 = _make_b6(finite, k_int)
    b6_cmd = b6.cmd

    def advance_bridges(bs, acts):
        action = acts[0] if isinstance(acts, tuple) else acts
        cmd = b6_cmd(action)
        if k_int > 0.0:
            return tuple(_interlock_state(b, c) for b, c in zip(bs, cmd))
        return cmd

    def _clarke_inv(i_al, i_be):
        # stator currents are already stator-frame alpha/beta: Clarke
        # back to abc without any rotation (physical_systems.py:771-814)
        half_b = np.float32(0.5 * np.sqrt(3.0))
        return (i_al, -0.5 * i_al + half_b * i_be,
                -0.5 * i_al - half_b * i_be)

    abc_frac, b6_i_sup = b6.frac, b6.i_sup

    def _uab(u_abc):
        return ((2.0 / 3.0) * (u_abc[0] - 0.5 * (u_abc[1] + u_abc[2])),
                np.float32(1.0 / np.sqrt(3.0)) * (u_abc[1] - u_abc[2]))

    def rk4(core, u_al, u_be, z, dt, pc, t0=None):
        def axpy(st, k, cc):
            return tuple(si + cc * ki for si, ki in zip(st, k))

        tm = te = None
        if t0 is not None:
            tm, te = t0 + 0.5 * dt, t0 + dt
        k1 = rhs(core, u_al, u_be, z, t0, pc)
        k2 = rhs(axpy(core, k1, 0.5 * dt), u_al, u_be, z, tm, pc)
        k3 = rhs(axpy(core, k2, 0.5 * dt), u_al, u_be, z, tm, pc)
        k4 = rhs(axpy(core, k3, dt), u_al, u_be, z, te, pc)
        return tuple(
            si + (dt / 6.0) * (a1 + 2.0 * (a2 + a3) + a4)
            for si, a1, a2, a3, a4 in zip(core, k1, k2, k3, k4)
        )

    def flux_dir(el):
        """cos/sin of the rotor-flux field angle, computed as psi/|psi|
        instead of an atan2+sincos round trip (atan2(0,0) = 0 -> (1, 0) at
        zero flux)"""
        ps_a, ps_b = el[2], el[3]
        mag2 = ps_a * ps_a + ps_b * ps_b
        tiny = mag2 < 1e-24
        inv = jax.lax.rsqrt(jnp.where(tiny, 1.0, mag2))
        return (jnp.where(tiny, 1.0, ps_a * inv),
                jnp.where(tiny, 0.0, ps_b * inv))

    def _obs_advance(new_core, psi_obs):
        """Forward-Euler flux-observer update from the POST-step currents
        and speed (flux_observer.py:93-99) — only carried when the SCIM
        dq wrapper is fused."""
        if not n_obspsi:
            return ()
        el_n = new_core[1:] if mech else new_core
        w_el = np.float32(p) * (new_core[0] if mech
                                else np.float32(omega_fixed))
        pre, pim = psi_obs
        d_re = el_n[0] * np.float32(_obs_c) - (pre * np.float32(_obs_a)
                                               + pim * w_el)
        d_im = el_n[1] * np.float32(_obs_c) - (pim * np.float32(_obs_a)
                                               - pre * w_el)
        return (pre + d_re * np.float32(tau), pim + d_im * np.float32(tau))

    def step_physics(state, action, z=None, bs=None, t0=None):
        core = state[:n_core]
        sup_planes = state[n_core:n_core + n_sup]
        pp = state[n_core + n_sup:n_core + n_sup + n_param]
        psi_obs = state[n_core + n_sup + n_param:]
        pc = resolve(pp)
        if cs_dq:
            el0 = core[1:] if mech else core
            fc, fsn = flux_dir(el0)
            al = fc * action[0] - fsn * action[1]
            be = fsn * action[0] + fc * action[1]
            action = _clarke_inv(al, be)
        elif dqw is not None and not dq_dead:
            # observer psi_angle (pre-step planes) + advance rotation
            fc, fsn = flux_dir((None, None, psi_obs[0], psi_obs[1]))
            w_now = core[0] if mech else omega_fixed
            delta = np.float32(adv_k * tau * p) * w_now
            cd, sd = jnp.cos(delta), jnp.sin(delta)
            ca, sa = fc * cd - fsn * sd, fsn * cd + fc * sd
            al = ca * action[0] - sa * action[1]
            be = sa * action[0] + ca * action[1]
            action = _clarke_inv(al, be)
        # dq_dead: action arrives PRE-CONVERTED (abc) from the deque
        finite_il = finite and k_int > 0.0
        i_abc = None
        if sup.needs_i_sup or k_int != 0.0:
            el_pre = core[1:] if mech else core
            i_abc = _clarke_inv(el_pre[0], el_pre[1])
        if sup.needs_i_sup:
            # finite B6: previous cycle's switch states feed i_sup (see
            # _dc_family.step_physics)
            i_sup_val = b6_i_sup(action, i_abc, bs if finite else None)
        else:
            i_sup_val = None
        u_sup_val, sup_new = sup.supply_u(
            sup_planes, i_sup_val,
            None if _u_idx is None else pp[_u_idx])

        if conv_none:
            # grid feed-through: u_abc = 1 * u_sup (per phase)
            u_abc = (u_sup_val if isinstance(u_sup_val, tuple)
                     else (u_sup_val,) * 3)
            new_core = rk4(core, *_uab(u_abc), z, tau, pc, t0)
            return (new_core + sup_new + pp
                    + _obs_advance(new_core, psi_obs))

        if finite_il:
            # 2-sub-interval interlock schedule (see _sync_family): the
            # stator-frame SCIM needs no mid-cycle angle refresh, only the
            # freewheeling phase currents
            cmd = b6_cmd(action)
            inter = tuple(_interlock_state(b, c) for b, c in zip(bs, cmd))
            flag = ((inter[0] != cmd[0]) | (inter[1] != cmd[1])
                    | (inter[2] != cmd[2]))
            u_abc0 = tuple(f * u_sup_val
                           for f in abc_frac(action, i_abc, inter))
            dt0 = jnp.where(flag, np.float32(t_int), 0.0)
            dt1 = jnp.where(flag, np.float32(tau - t_int),
                            np.float32(tau))
            tm = None if t0 is None else t0 + dt0
            core_mid = rk4(core, *_uab(u_abc0), z, dt0, pc, t0)
            el_mid = core_mid[1:] if mech else core_mid
            i_abc_m = _clarke_inv(el_mid[0], el_mid[1])
            u_abc1 = tuple(
                jnp.where(flag, f * u_sup_val, u0)
                for f, u0 in zip(abc_frac(action, i_abc_m, inter), u_abc0))
            new_core = rk4(core_mid, *_uab(u_abc1), z, dt1, pc, tm)
            return (new_core + sup_new + pp
                    + _obs_advance(new_core, psi_obs))

        u_al, u_be = _uab(tuple(f * u_sup_val
                                for f in abc_frac(action, i_abc)))
        new_core = rk4(core, u_al, u_be, z, tau, pc, t0)
        return (new_core + sup_new + pp
                + _obs_advance(new_core, psi_obs))

    def reset_state(bits):
        zero = jnp.zeros(shape, jnp.float32)
        core = ((mload.omega_reset(bits),) if mech else ()) + (zero,) * 4
        pdraws = _param_reset_draws(bits, shape, param_ranges)
        return (core + _sup_reset_planes(sup, bits, pdraws, _u_idx) + pdraws
                + (zero,) * n_obspsi)

    ref_cfg = _ref_configs(env, R,
                           require_wiener=action_mode == "random")
    n_ref = len(ref_cfg)
    n_rows = _ref_n_rows(ref_cfg)
    shape_r = (n_rows * R, LANE)
    rw = env.reward_function
    bias = np.float32(rw._bias_value)
    violation_reward = np.float32(rw._violation_value)
    needs_dq = any(c["name"] in ("i_sd", "i_sq") for c in ref_cfg)

    def core_el(state):
        return state[1:n_core] if mech else state[:n_core]

    def ref_quantities(state, cs):
        """cs is the PRE-step field direction: the reference refreshes the
        field angle only between sub-intervals, so the dq outputs combine
        the post-step currents with the stale angle
        (physical_systems.py:783-812)."""
        el = core_el(state)
        if needs_dq:
            c, s = cs
            i_sa, i_sb = el[0], el[1]
            i_dq = (c * i_sa + s * i_sb, c * i_sb - s * i_sa)
        else:
            i_dq = (None, None)
        out = []
        for cfg in ref_cfg:
            nm = cfg["name"]
            if nm == "omega":
                out.append(state[0] * np.float32(1.0 / w_lim))
            elif nm == "torque":
                out.append(torque(el) * np.float32(1.0 / t_lim))
            elif nm == "i_sd":
                out.append(i_dq[0] * cfg["inv_lim"])
            else:
                out.append(i_dq[1] * cfg["inv_lim"])
        return out

    def _sample_actions(bits):
        if finite:
            return (bits(shape) & jnp.uint32(7)).astype(jnp.int32)
        return tuple(2.0 * _uniform_from_bits(bits(shape)) - 1.0
                     for _ in range(n_ach))  # () for NoConverter

    # --- DeadTimeProcessor fused as carried action planes (see
    #     pallas_common._wrap_dead_time) ---
    step_physics, advance_bridges, n_bridge, bridge_dtypes = \
        _wrap_mech_time(mload, tau, step_physics, advance_bridges,
                        n_bridge, has_cs=False, k_int=k_int)
    dt_convert = None
    if dq_dead:
        # push-time conversion at the observer psi_angle of the PUSH
        # cycle (observer planes live at the tail of the state)
        def dt_convert(acts, cur, aux):
            psi_obs = cur[n_core + n_sup + n_param:]
            fc, fsn = flux_dir((None, None, psi_obs[0], psi_obs[1]))
            w_now = cur[0] if mech else omega_fixed
            delta = np.float32(adv_k * tau * p) * w_now
            cd, sd = jnp.cos(delta), jnp.sin(delta)
            ca, sa = fc * cd - fsn * sd, fsn * cd + fc * sd
            al = ca * acts[0] - sa * acts[1]
            be = sa * acts[0] + ca * acts[1]
            return _clarke_inv(al, be)

    step_physics, advance_bridges, n_bridge, bridge_dtypes = \
        _wrap_dead_time(ps,
                        (jnp.int32,) if finite
                        else (jnp.float32,) * (3 if dq_dead else n_ach),
                        step_physics, advance_bridges, n_bridge,
                        has_cs=False, base_dtypes=bridge_dtypes,
                        convert=dt_convert)

    # --- generic record-adapter surface (see ops/pallas_record.py) ---
    state_names = ((("omega",) if mech else ())
                   + ("i_salpha", "i_sbeta", "psi_ralpha", "psi_rbeta")
                   + sup.names + param_names
                   + (("psi_obs_alpha", "psi_obs_beta") if n_obspsi
                      else ()))
    observe = _fused_state_noise(
        ps, state_names, lambda nm: float(lim[names.index(nm)]),
        allowed=(("omega",) if mech else ()))
    act_names = (() if conv_none
                 else (("action",) if finite
                       else (("action_d", "action_q") if dq_mode
                             else ("action_a", "action_b", "action_c"))))
    act_dtype = jnp.int32 if finite else jnp.float32
    inv_ilim2 = np.float32(1.0 / (i_lim * i_lim))

    def sample_actions_t(bits):
        a = _sample_actions(bits)
        return (a,) if finite else a

    def read_actions(ref, t):
        if finite:
            return (ref[t],)
        return tuple(ref[t, j] for j in range(n_ach))

    def pre_step(cur):
        if not needs_dq:
            return ()
        return flux_dir(core_el(cur))

    def step(cur, acts, aux, z=None, bs=None):
        a = acts[0] if finite else acts
        return step_physics(cur, a, z, bs)

    no_cons = _fused_constraint_mode(
        env, (("squared", ("i_sq", "i_sd")),)) == "none"

    def violated(state):
        if no_cons:  # constraints=(): the env never terminates
            return jnp.zeros(shape, jnp.bool_)
        el = core_el(state)
        # |i_dq| == |i_alphabeta| (rotation-invariant)
        return (el[0] * el[0] + el[1] * el[1]) * inv_ilim2 > 1.0

    def quantities(state, aux):
        return ref_quantities(state, aux if needs_dq else None)

    # --- policy-adapter surface (see ops/pallas_policy.py); the stator
    # frame has no angle plane — the flux components (normalized by
    # l_m * i_lim) carry the field orientation into the observation
    off = 1 if mech else 0
    psi_lim = l_m * i_lim
    obs_spec = _policy_obs_spec(mech, w_lim, omega_fixed, [
        ("state", off, 1.0 / i_lim), ("state", off + 1, 1.0 / i_lim),
        ("state", off + 2, 1.0 / psi_lim), ("state", off + 3, 1.0 / psi_lim)])

    return SimpleNamespace(
        obs_spec=obs_spec, act_ns=((8,) if finite else None), aux_cs=None,
        act_range=(None if finite else
                   (np.full((n_ach,), -1.0, np.float32),
                    np.ones((n_ach,), np.float32))),
        n_state=n_state, finite=finite, mech=mech, shape=shape,
        shape_r=shape_r, n_ref=n_ref, n_rows=n_rows, ref_cfg=ref_cfg, bias=bias,
        violation_reward=violation_reward, i_lim=i_lim, needs_dq=needs_dq,
        step_physics=step_physics, flux_dir=flux_dir, core_el=core_el,
        ref_quantities=ref_quantities, sample_actions=_sample_actions,
        state_names=state_names, act_names=act_names, act_dtype=act_dtype,
        sample_actions_t=sample_actions_t, read_actions=read_actions,
        pre_step=pre_step, step=step, violated=violated,
        quantities=quantities,
        mech_mode=mech_mode, sup_mode=sup.mode, n_sup=n_sup, n_core=n_core,
        needs_step_noise=needs_step_noise, reset_state=reset_state,
        param_names=param_names, param_ranges=param_ranges,
        n_param=n_param, n_obspsi=n_obspsi, observe=observe,
        n_bridge=n_bridge, bridge_dtypes=bridge_dtypes,
        advance_bridges=_norm_advance(advance_bridges),
    )


def make_fused_induction_rollout(env, n_steps, n_envs, action_mode="random",
                                 interpret=False, randomize=None):
    """Universal fused rollout for the squirrel-cage induction family — all
    6 {Finite,Cont} x {CC,TC,SC} SCIM catalog configs from one builder.

    The 4-state alpha/beta ODE (induction_motor.py:287-313, rotor shorted)
    integrates under Clarke-only converter voltages (no Park — the SCIM
    system is stator-frame, physical_systems.py:771-814); dq output
    quantities for the CC reward are produced by rotating the stator
    current into the rotor-flux frame, with the flux direction computed as
    (psi_ra, psi_rb)/|psi| instead of an atan2+sincos round trip
    (physical_systems.py:736-741's eps_fs enters only through its cos/sin).
    SC adds the polynomial-load mechanical ODE; torque = k_t (psi_ra i_sb -
    psi_rb i_sa).  References/reward/constraint read from the env spec as
    in the DC/sync universal builders.

    * random mode: ``rollout(seed, *state0) -> (*states, reward_sum,
      term_count, rv, rk, rl, rs)``; states = (omega?, i_sa, i_sb,
      psi_ra, psi_rb).
    * buffer mode: ``rollout(*state0, actions) -> states`` with int32
      ``(n_steps, R, LANE)`` B6 bits (finite) / float32
      ``(n_steps, 3, R, LANE)`` duties (cont); deterministic physics only.
    """
    assert n_envs % LANE == 0
    R = n_envs // LANE
    fs = _induction_family(env, R, action_mode, randomize)
    if action_mode == "buffer" and not fs.act_names:
        raise NotImplementedError(
            "NoConverter has no actions to buffer — random mode is "
            "already deterministic for the grid-simulation env")
    n_state, finite, mech, shape, shape_r = (
        fs.n_state, fs.finite, fs.mech, fs.shape, fs.shape_r)
    n_ref, ref_cfg = fs.n_ref, fs.ref_cfg
    n_rows = fs.n_rows
    bias, violation_reward, i_lim = fs.bias, fs.violation_reward, fs.i_lim
    needs_dq, flux_dir, core_el = fs.needs_dq, fs.flux_dir, fs.core_el
    n_bs = fs.n_bridge
    _step_physics, ref_quantities = fs.step_physics, fs.ref_quantities
    _sample_actions = fs.sample_actions
    has_wf = _ref_needs_wf(ref_cfg)

    def kernel(seed_ref, *refs):
        state0 = refs[:n_state]
        out_state = refs[n_state: 2 * n_state]
        out_reward, out_terms, out_rv, out_rk, out_rl, out_rs = (
            refs[2 * n_state: 2 * n_state + 6])
        scratch = refs[2 * n_state + 6:]
        rv_ref, rk_ref, rl_ref, rs_ref, rng_ref = scratch[:5]
        za_ref, zb_ref = ((scratch[5], scratch[6]) if n_rows == 1
                          else (None, None))
        wf_ref = scratch[-1] if has_wf else None
        seed, bits = _make_rng(interpret, rng_ref)
        seed(seed_ref[0])
        for o, s in zip(out_state, state0):
            o[:] = s[:]
        out_reward[:] = jnp.zeros(shape, jnp.float32)
        out_terms[:] = jnp.zeros(shape, jnp.float32)

        w_init, w_advance = _make_wiener(bits, ref_cfg, R, shape, shape_r,
                                         rv_ref, rk_ref, rl_ref, rs_ref,
                                         za_ref, zb_ref, wf_ref)
        w_init()

        inv_ilim2 = np.float32(1.0 / (i_lim * i_lim))

        def body(t, bs):
            action = _sample_actions(bits)
            z = _step_noise(fs.needs_step_noise, bits, shape)
            cur = tuple(o[:] for o in out_state)
            cs = flux_dir(core_el(cur)) if needs_dq else None
            state = _step_physics(cur, action, z,
                                  bs if n_bs else None)

            sobs = fs.observe(state, bits) if fs.observe else state
            violated = fs.violated(sobs)
            qs = ref_quantities(sobs, cs)
            refs_now = rv_ref[:]
            wse = bias - _wse_err(ref_cfg[0], qs[0], refs_now[:R])
            if n_ref == 2:
                wse = wse - _wse_err(ref_cfg[1], qs[1], refs_now[R:])
            reward = jnp.where(violated, violation_reward, wse)
            out_reward[:] = out_reward[:] + reward
            out_terms[:] = out_terms[:] + violated.astype(jnp.float32)
            for o, s2, r0 in zip(out_state, state, fs.reset_state(bits)):
                o[:] = jnp.where(violated, r0, s2)

            w_advance(t, violated)
            if not n_bs:
                return 0
            return tuple(jnp.where(violated, 0, b)
                         for b in fs.advance_bridges(bs, action, cur))

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
            if finite:
                action = actions_ref[t]
            else:
                action = fs.read_actions(actions_ref, t)
            cur = tuple(o[:] for o in out_state)
            state = _step_physics(cur, action,
                                  None, bs if n_bs else None)
            for o, s in zip(out_state, state):
                o[:] = s
            if not n_bs:
                return 0
            return fs.advance_bridges(bs, action, cur)

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
        + ([pltpu.VMEM((4 * n_rows * R, LANE), jnp.float32)]
           if has_wf else [])
    )

    @jax.jit
    def rollout(seed, *state0):
        return pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vmem] * n_state,
            out_specs=tuple(vmem for _ in range(len(out_shapes))),
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(jnp.asarray([seed], jnp.int32), *state0)

    return rollout


