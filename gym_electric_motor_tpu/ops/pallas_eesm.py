"""Externally-excited synchronous (EESM) fused kernels: the
Finite-CC-EESM reducing kernel and the universal EESM family
builder (_eesm_family / make_fused_eesm_family_rollout)."""

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
    _c2i,
    _c2u,
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
    _hb_i_st,
    _hb_u_st,
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
    _rotation_protocol,
    _step_noise,
    _uniform_from_bits,
    _wse_err,
)


def make_fused_eesm_rollout(env, n_steps, n_envs, action_mode="random",
                            interpret=False):
    """Fused rollout for Finite-CC-EESM-v0 — the slowest XLA-path family
    (~52M steps/s): 3-current EESM ODE in the dq frame
    (externally_excited_synchronous_motor.py via models/motors.py:451-476),
    dual finite converter (B6 stator bits + 4QC excitation,
    converters.py:788-823 / :313-368), three Wiener references (i_sd*,
    i_sq*, i_e* with the (0, 1) one-sided i_e band), WSE reward (1/3 each),
    squared dq-current + i_e limit constraints, in-kernel auto-reset.

    ``action_mode='buffer'``: ``rollout(i_sd0, i_sq0, i_e0, eps0, actions)``
    with ``(n_steps, 2, n_envs//128, 128)`` int32 actions (B6, 4QC),
    deterministic physics only.
    """
    _require_default_constraints(env)
    assert n_envs % LANE == 0
    R = n_envs // LANE
    ps = env.physical_system
    _fused_check_system(ps)
    mp = {k: float(v) for k, v in ps.motor.parameter.items()}
    names = list(ps.state_names)
    lim = np.asarray(ps.limits)

    # stator-side transformed rotor params (models/motors.py:441-449)
    r_E = mp["k"] ** 2 * 1.5 * mp["r_e"]
    l_M = mp["k"] * 1.5 * mp["l_m"]
    l_E = mp["k"] ** 2 * 1.5 * mp["l_e"]
    i_k_rs = 2.0 / 3.0 / mp["k"]
    sig = 1.0 - l_M**2 / (mp["l_d"] * l_E)
    r_s, l_d, l_q, p, k_e = mp["r_s"], mp["l_d"], mp["l_q"], mp["p"], mp["k"]

    omega = float(_fused_load(ps, ("ConstantSpeedLoad",)).omega_fixed)
    tau = float(ps.tau)
    u_sup = _fused_u_sup(ps)
    i_lim = float(lim[names.index("i_sd")])
    ie_lim = float(lim[names.index("i_e")])
    m_sd = float(ps.nominal_state[names.index("i_sd")] / i_lim)
    # i_e reference band: limit_margin=(0, 1) (catalog.py _default_references)
    p_omega = p * omega
    w_over_span = (1.0 / 3.0) / 2.0
    violation_reward = -1.0 / (1.0 - 0.9)
    shape = (R, LANE)
    shape3 = (3 * R, LANE)
    LN10 = np.float32(np.log(10.0))

    def rhs(i_sd, i_sq, i_e, u_d, u_q, u_e):
        di_sd = (-r_s / sig * i_sd + l_M * r_E / (sig * l_E) * i_k_rs * i_e
                 + u_d / sig - l_M * k_e / (sig * l_E) * u_e
                 + l_q * p_omega / sig * i_sq) * (1.0 / l_d)
        di_sq = (-r_s * i_sq + u_q - l_d * p_omega * i_sd
                 - p_omega * l_M * i_k_rs * i_e) * (1.0 / l_q)
        di_e = (l_M * r_s / (sig * l_d) * i_sd - r_E / sig * i_k_rs * i_e
                - l_M / (sig * l_d) * u_d + k_e / sig * u_e
                - p_omega * l_M * l_q / (sig * l_d) * i_sq) * (1.0 / (l_E * i_k_rs))
        return di_sd, di_sq, di_e

    def _step_physics_cs(i_sd, i_sq, i_e, eps, c, s, a_b6, a_4qc):
        ua = (((a_b6 >> 2) & 1).astype(jnp.float32) - 0.5) * u_sup
        ub = (((a_b6 >> 1) & 1).astype(jnp.float32) - 0.5) * u_sup
        uc = ((a_b6 & 1).astype(jnp.float32) - 0.5) * u_sup
        u_e = (jnp.where(a_4qc == 1, 1.0, 0.0)
               - jnp.where(a_4qc == 2, 1.0, 0.0)) * u_sup
        u_al = (2.0 / 3.0) * (ua - 0.5 * (ub + uc))
        u_be = np.float32(1.0 / np.sqrt(3.0)) * (ub - uc)
        u_d = c * u_al + s * u_be
        u_q = -s * u_al + c * u_be
        k1 = rhs(i_sd, i_sq, i_e, u_d, u_q, u_e)
        k2 = rhs(i_sd + 0.5 * tau * k1[0], i_sq + 0.5 * tau * k1[1],
                 i_e + 0.5 * tau * k1[2], u_d, u_q, u_e)
        k3 = rhs(i_sd + 0.5 * tau * k2[0], i_sq + 0.5 * tau * k2[1],
                 i_e + 0.5 * tau * k2[2], u_d, u_q, u_e)
        k4 = rhs(i_sd + tau * k3[0], i_sq + tau * k3[1],
                 i_e + tau * k3[2], u_d, u_q, u_e)
        sixth = tau / 6.0
        return (i_sd + sixth * (k1[0] + 2.0 * (k2[0] + k3[0]) + k4[0]),
                i_sq + sixth * (k1[1] + 2.0 * (k2[1] + k3[1]) + k4[1]),
                i_e + sixth * (k1[2] + 2.0 * (k2[2] + k3[2]) + k4[2]),
                eps + tau * p_omega)

    def _step_physics(i_sd, i_sq, i_e, eps, a_b6, a_4qc):
        c, s = jnp.cos(eps), jnp.sin(eps)
        return _step_physics_cs(i_sd, i_sq, i_e, eps, c, s, a_b6, a_4qc)

    # constant-increment Park rotation (see make_fused_pmsm_rollout)
    COS_D = np.float32(np.cos(tau * p_omega))
    SIN_D = np.float32(np.sin(tau * p_omega))

    def kernel(seed_ref, isd_ref, isq_ref, ie_ref, eps_ref,
               out_isd, out_isq, out_ie, out_eps, out_reward, out_terms,
               out_rv, out_rk, out_rl, out_rs,
               rv_ref, rk_ref, rl_ref, rs_ref, rng_ref, c_ref, s_ref):
        seed, bits = _make_rng(interpret, rng_ref)
        seed(seed_ref[0])
        out_isd[:] = isd_ref[:]
        out_isq[:] = isq_ref[:]
        out_ie[:] = ie_ref[:]
        out_eps[:] = eps_ref[:]
        c_ref[:] = jnp.cos(eps_ref[:])
        s_ref[:] = jnp.sin(eps_ref[:])
        out_reward[:] = jnp.zeros(shape, jnp.float32)
        out_terms[:] = jnp.zeros(shape, jnp.float32)

        # per-generator-row margin bands, rows [i_sd | i_sq | i_e]; built
        # from iota (pallas kernels cannot capture array constants)
        is_ie = jax.lax.broadcasted_iota(jnp.int32, shape3, 0) >= 2 * R
        lo = jnp.where(is_ie, 0.0, -m_sd)
        hi = jnp.where(is_ie, 1.0, m_sd)

        def _draw_params(mask):
            u1 = _uniform_from_bits(bits(shape3))
            u2 = _uniform_from_bits(bits(shape3))
            rl_ref[:] = jnp.where(mask, jnp.floor(500.0 + 1500.0 * u1), rl_ref[:])
            rs_ref[:] = jnp.where(mask, jnp.exp(LN10 * (-3.0 + 2.0 * u2)), rs_ref[:])

        u = _uniform_from_bits(bits(shape3))
        rv_ref[:] = lo + (hi - lo) * u
        rk_ref[:] = jnp.zeros(shape3, jnp.float32)
        _draw_params(jnp.ones(shape3, dtype=jnp.bool_))

        def body(t, _):
            b = bits(shape)
            a_b6 = (b & jnp.uint32(7)).astype(jnp.int32)
            a_4qc = ((b >> jnp.uint32(3)) & jnp.uint32(3)).astype(jnp.int32)
            c, s = c_ref[:], s_ref[:]
            i_sd, i_sq, i_e, eps = _step_physics_cs(
                out_isd[:], out_isq[:], out_ie[:], out_eps[:], c, s, a_b6, a_4qc)
            eps = eps - np.float32(TWO_PI) * jnp.floor(eps * np.float32(1.0 / TWO_PI))
            c_new = c * COS_D - s * SIN_D
            s_new = s * COS_D + c * SIN_D
            inv = jax.lax.rsqrt(c_new * c_new + s_new * s_new)
            c_new = c_new * inv
            s_new = s_new * inv

            isd_n = i_sd * (1.0 / i_lim)
            isq_n = i_sq * (1.0 / i_lim)
            ie_n = i_e * (1.0 / ie_lim)
            violated = ((isd_n * isd_n + isq_n * isq_n) > 1.0) | (jnp.abs(ie_n) > 1.0)
            refs = rv_ref[:]
            wse = -(w_over_span * jnp.abs(isd_n - refs[:R])
                    + w_over_span * jnp.abs(isq_n - refs[R:2 * R])
                    + w_over_span * jnp.abs(ie_n - refs[2 * R:]))
            reward = jnp.where(violated, violation_reward, wse)
            out_reward[:] = out_reward[:] + reward
            out_terms[:] = out_terms[:] + violated.astype(jnp.float32)

            zero = jnp.zeros(shape, jnp.float32)
            out_isd[:] = jnp.where(violated, zero, i_sd)
            out_isq[:] = jnp.where(violated, zero, i_sq)
            out_ie[:] = jnp.where(violated, zero, i_e)
            out_eps[:] = jnp.where(violated, zero, eps)
            c_ref[:] = jnp.where(violated, jnp.ones(shape, jnp.float32), c_new)
            s_ref[:] = jnp.where(violated, zero, s_new)

            viol_f = violated.astype(jnp.float32)
            reset3 = jnp.concatenate([viol_f, viol_f, viol_f], axis=0) > 0.5
            # one Box-Muller pair covers i_sd*/i_sq*; a single draw covers
            # i_e* — 2 log/sqrt + 2 cos + 1 sin lanes instead of 3 of each
            u1 = _uniform_from_bits(bits(shape))
            u2 = _uniform_from_bits(bits(shape))
            rad = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
            theta = np.float32(TWO_PI) * u2
            u3 = _uniform_from_bits(bits(shape))
            u4 = _uniform_from_bits(bits(shape))
            z_e = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u3, 1e-12))) * jnp.cos(
                np.float32(TWO_PI) * u4)
            draw = jnp.concatenate(
                [rad * jnp.cos(theta), rad * jnp.sin(theta), z_e], axis=0)
            regen = (rk_ref[:] >= rl_ref[:]) | reset3
            _draw_params(regen)
            rk_ref[:] = jnp.where(regen, 0.0, rk_ref[:]) + 1.0
            value = jnp.clip(rv_ref[:] + rs_ref[:] * draw, lo, hi)
            u3 = _uniform_from_bits(bits(shape3))
            rv_ref[:] = jnp.where(reset3, lo + (hi - lo) * u3, value)
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)
        out_rv[:] = rv_ref[:]
        out_rk[:] = rk_ref[:]
        out_rl[:] = rl_ref[:]
        out_rs[:] = rs_ref[:]

    def kernel_buffer(isd_ref, isq_ref, ie_ref, eps_ref, actions_ref,
                      out_isd, out_isq, out_ie, out_eps):
        out_isd[:] = isd_ref[:]
        out_isq[:] = isq_ref[:]
        out_ie[:] = ie_ref[:]
        out_eps[:] = eps_ref[:]

        def body(t, _):
            i_sd, i_sq, i_e, eps = _step_physics(
                out_isd[:], out_isq[:], out_ie[:], out_eps[:],
                actions_ref[t, 0], actions_ref[t, 1])
            eps = eps - np.float32(TWO_PI) * jnp.floor(eps * np.float32(1.0 / TWO_PI))
            out_isd[:] = i_sd
            out_isq[:] = i_sq
            out_ie[:] = i_e
            out_eps[:] = eps
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    if action_mode == "buffer":
        @jax.jit
        def rollout(isd0, isq0, ie0, eps0, actions):
            return pl.pallas_call(
                kernel_buffer,
                out_shape=tuple(jax.ShapeDtypeStruct(shape, jnp.float32)
                                for _ in range(4)),
                in_specs=[vmem] * 5,
                out_specs=tuple(vmem for _ in range(4)),
                interpret=interpret,
            )(isd0, isq0, ie0, eps0, actions)

        return rollout

    out_shapes = (tuple(jax.ShapeDtypeStruct(shape, jnp.float32) for _ in range(6))
                  + tuple(jax.ShapeDtypeStruct(shape3, jnp.float32) for _ in range(4)))

    @jax.jit
    def rollout(seed, isd0, isq0, ie0, eps0):
        return pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vmem] * 4,
            out_specs=tuple(vmem for _ in range(10)),
            scratch_shapes=(
                [pltpu.VMEM(shape3, jnp.float32) for _ in range(4)]
                + [pltpu.VMEM(shape3, jnp.uint32)]
                + [pltpu.VMEM(shape, jnp.float32) for _ in range(2)]
            ),
            interpret=interpret,
        )(jnp.asarray([seed], jnp.int32), isd0, isq0, ie0, eps0)

    return rollout


def _eesm_family(env, R, action_mode, randomize=None):
    """Shared EESM-family closures — consumed by the reducing rollout
    (``make_fused_eesm_family_rollout``) and the generic trajectory
    recorder (``ops.pallas_record``).

    ``randomize``: optional ``{param: (lo, hi)}`` — ``r_s``/``r_e`` (the
    stator and excitation winding resistances, the temperature-drift
    axis) as per-env state planes; same design as ``_dc_family``."""
    ps = env.physical_system
    _fused_check_system(ps, allow_dead_time=True, allow_dq=True,
                        allow_state_noise=True,
                        allow_dq_wrapper=("_EESMDqToAbcActionProcessor",))
    mp = {k: float(v) for k, v in ps.motor.parameter.items()}
    names = list(ps.state_names)
    lim = np.asarray(ps.limits)
    conv = ps.converter
    finite = conv.action_type == "finite"
    k_int = _fused_interlock(conv, float(ps.tau), finite)
    t_int = k_int * float(ps.tau)

    # stator-side transformed rotor params (models/motors.py:441-449)
    r_E = mp["k"] ** 2 * 1.5 * mp["r_e"]
    l_M = mp["k"] * 1.5 * mp["l_m"]
    l_E = mp["k"] ** 2 * 1.5 * mp["l_e"]
    i_k_rs = 2.0 / 3.0 / mp["k"]
    sig = 1.0 - l_M**2 / (mp["l_d"] * l_E)
    r_s, l_d, l_q, p, k_e = mp["r_s"], mp["l_d"], mp["l_q"], mp["p"], mp["k"]

    param_names, n_param, p_idx, param_ranges = _parse_randomize(
        randomize, ("r_s", "r_e", "j_rotor", "u_sup"), "EESM",
        "the electrical resistances + inertia + u_sup")
    # control_space='dq': (u_d, u_q, u_e) — the stator pair is rotated to
    # abc at the cycle-start angle, the excitation duty passes through
    # (physical_systems.py EESMSystem.simulate)
    cs_dq = _fused_control_space(ps) == "dq"
    dqw = _fused_dq_wrapper(ps, ("_EESMDqToAbcActionProcessor",))
    finite0 = ps.converter.action_type == "finite"
    assert not (cs_dq and finite0)
    if dqw is not None:
        if cs_dq or finite0:
            raise NotImplementedError(
                "EESM DqToAbc wrapper over a dq/finite base is not fused "
                "— use the general XLA path")
    dq_mode = cs_dq or dqw is not None
    # DqToAbc wrapper + DeadTimeProcessor: fused via _wrap_dead_time's
    # convert hook — the stored planes are the CONVERTED (abc + exciter)
    # duties rotated at the push-time advanced angle (see _sync_family)
    dq_dead = dqw is not None and _fused_dead_time_steps(ps) > 0
    n_ach = 3 if dq_mode else 4

    def resolve(pp):
        """(r_s, r_E): the excitation resistance transforms stator-side
        by the same k^2 * 1.5 factor as the baked path."""
        r_s_v = pp[p_idx["r_s"]] if "r_s" in p_idx else r_s
        r_e_v = pp[p_idx["r_e"]] if "r_e" in p_idx else mp["r_e"]
        return r_s_v, k_e ** 2 * 1.5 * r_e_v

    tau = float(ps.tau)
    i_lim = float(lim[names.index("i_sd")])
    ie_lim = float(lim[names.index("i_e")])
    t_lim = float(lim[names.index("torque")])
    w_lim = float(lim[names.index("omega")])
    shape = (R, LANE)

    mload = _make_fused_mech(ps, float(mp["j_rotor"]), shape)
    resolve, j_rand = _wrap_j_resolve(resolve, mload, p_idx)
    mech_mode, mech = mload.mode, mload.mech
    needs_step_noise = mload.needs_step_noise
    omega_fixed = mload.omega_fixed
    sup = _make_fused_supply(ps, shape, tau)
    _u_idx = _u_sup_plane_idx(p_idx, sup)
    n_sup = sup.n_sup
    COS_D = SIN_D = COS_DI = SIN_DI = None
    if not mech:
        COS_D = np.float32(np.cos(tau * p * omega_fixed))
        SIN_D = np.float32(np.sin(tau * p * omega_fixed))
        COS_DI = np.float32(np.cos(t_int * p * omega_fixed))
        SIN_DI = np.float32(np.sin(t_int * p * omega_fixed))

    def torque3(i_sd, i_sq, i_e):
        return 1.5 * p * (l_M * i_e * i_k_rs + (l_d - l_q) * i_sd) * i_sq

    def el_rhs(w, i_sd, i_sq, i_e, u_d, u_q, u_e, pc):
        r_s, r_E = pc[:2]
        pw = p * w
        di_sd = (-r_s / sig * i_sd + l_M * r_E / (sig * l_E) * i_k_rs * i_e
                 + u_d / sig - l_M * k_e / (sig * l_E) * u_e
                 + l_q * pw / sig * i_sq) * (1.0 / l_d)
        di_sq = (-r_s * i_sq + u_q - l_d * pw * i_sd
                 - pw * l_M * i_k_rs * i_e) * (1.0 / l_q)
        di_e = (l_M * r_s / (sig * l_d) * i_sd - r_E / sig * i_k_rs * i_e
                - l_M / (sig * l_d) * u_d + k_e / sig * u_e
                - pw * l_M * l_q / (sig * l_d) * i_sq) * (1.0 / (l_E * i_k_rs))
        return di_sd, di_sq, di_e

    if mech:
        def rhs(core, u_d, u_q, u_e, z, ts, pc):
            w, i_sd, i_sq, i_e, eps = core
            tq = torque3(i_sd, i_sq, i_e)
            if j_rand:
                dw = mload.mech_rhs_j(w, tq, z, pc[-1])
            elif mload.needs_time:
                dw = mload.mech_rhs_t(w, tq, z, ts)
            else:
                dw = mload.mech_rhs(w, tq, z)
            return ((dw,) + el_rhs(w, i_sd, i_sq, i_e, u_d, u_q, u_e, pc)
                    + (p * w,))
    else:
        def rhs(core, u_d, u_q, u_e, z, ts, pc):
            i_sd, i_sq, i_e, eps = core
            return (el_rhs(omega_fixed, i_sd, i_sq, i_e, u_d, u_q, u_e, pc)
                    + (np.float32(p * omega_fixed) + 0.0 * eps,))

    n_core = 5 if mech else 4
    n_state = n_core + n_sup + n_param
    i_eps = n_core - 1

    n_bridge = (5 if (finite and (k_int > 0.0
                                  or ps.supply.kind == "RCVoltageSupply"))
                else 0)

    b6 = _make_b6(finite, k_int)

    def bridge_cmd(action):
        """B6 (3) + excitation 4QC (2) commanded half-bridge states"""
        a_b6, a_4qc = action
        return b6.cmd(a_b6) + (1 + (a_4qc >= 2).astype(jnp.int32),
                               1 + (a_4qc & jnp.int32(1)))

    def advance_bridges(bs, action):
        cmd = bridge_cmd(action)
        if k_int > 0.0:
            return tuple(_interlock_state(b, c) for b, c in zip(bs, cmd))
        return cmd

    def voltage_fracs(action, i_abc=None, i_e=None, st=None):
        """(phase fracs, excitation frac) of u_sup — B6 + 4QC channels
        (converters.py:788-823, 313-368 via the multi converter); cont
        channels carry the interlock discount (_c2u); interlocked finite
        reads the half-bridge states ``st`` incl. freewheeling"""
        if finite:
            a_b6, a_4qc = action
            fa, fb, fc = b6.frac(a_b6, i_abc, st[:3] if st else None)
            if st is not None:
                fe = _hb_u_st(st[3], i_e) - _hb_u_st(st[4], -i_e)
            else:
                fe = (jnp.where(a_4qc == 1, 1.0, 0.0)
                      - jnp.where(a_4qc == 2, 1.0, 0.0))
            return fa, fb, fc, fe
        fa, fb, fc = b6.frac(action[:3], i_abc)
        if k_int == 0.0:
            return fa, fb, fc, action[3]
        ae = jnp.clip(action[3], -1.0, 1.0)
        fe = (_c2u(0.5 * (ae + 1.0), i_e, k_int)
              - _c2u(-0.5 * (ae - 1.0), i_e, k_int))
        return fa, fb, fc, fe

    def conv_i_sup(action, i_abc, i_e, st=None):
        """multi-converter supply current: B6 (upper-switch / duty-weighted
        phase sum) + excitation 4QC (converters.py:289-298, 354-368,
        429-496, 547-612)"""
        if finite:
            a_b6, a_4qc = action
            i_b6 = b6.i_sup(a_b6, i_abc, st[:3] if st else None)
            if st is not None:
                return i_b6 + _hb_i_st(st[3], i_e) + _hb_i_st(st[4], -i_e)
            return i_b6 + (jnp.where(a_4qc <= 1, i_e, 0.0)
                           + jnp.where((a_4qc == 0) | (a_4qc == 2), -i_e,
                                       0.0))
        i_b6 = b6.i_sup(action[:3], i_abc)
        ae = jnp.clip(action[3], -1.0, 1.0)
        if k_int == 0.0:
            return i_b6 + ae * i_e
        return i_b6 + (_c2i(0.5 * (ae + 1.0), i_e, k_int)
                       + _c2i(-0.5 * (ae - 1.0), -i_e, k_int))

    def dq_to_abc(i_sd, i_sq, c, s):
        i_al = c * i_sd - s * i_sq
        i_be = s * i_sd + c * i_sq
        half_b = np.float32(0.5 * np.sqrt(3.0))
        return (i_al, -0.5 * i_al + half_b * i_be, -0.5 * i_al - half_b * i_be)

    def _currents(core):
        return core[1:4] if mech else core[0:3]

    def _udqe(fracs, u_sup_val, c, s):
        fa, fb, fc, fe = fracs
        ua, ub, uc = fa * u_sup_val, fb * u_sup_val, fc * u_sup_val
        u_al = (2.0 / 3.0) * (ua - 0.5 * (ub + uc))
        u_be = np.float32(1.0 / np.sqrt(3.0)) * (ub - uc)
        return (c * u_al + s * u_be, -s * u_al + c * u_be, fe * u_sup_val)

    def rk4(core, u_d, u_q, u_e, z, dt, pc, t0=None):
        def axpy(st, k, cc):
            return tuple(si + cc * ki for si, ki in zip(st, k))

        tm = te = None
        if t0 is not None:
            tm, te = t0 + 0.5 * dt, t0 + dt
        k1 = rhs(core, u_d, u_q, u_e, z, t0, pc)
        k2 = rhs(axpy(core, k1, 0.5 * dt), u_d, u_q, u_e, z, tm, pc)
        k3 = rhs(axpy(core, k2, 0.5 * dt), u_d, u_q, u_e, z, tm, pc)
        k4 = rhs(axpy(core, k3, dt), u_d, u_q, u_e, z, te, pc)
        return tuple(
            si + (dt / 6.0) * (a1 + 2.0 * (a2 + a3) + a4)
            for si, a1, a2, a3, a4 in zip(core, k1, k2, k3, k4)
        )

    def physics_step(state, action, c, s, z=None, bs=None, t0=None):
        core = state[:n_core]
        sup_planes = state[n_core:n_core + n_sup]
        pp = state[n_core + n_sup:]
        pc = resolve(pp)
        if cs_dq:
            action = dq_to_abc(action[0], action[1], c, s) + (action[2],)
        elif dqw is not None and not dq_dead:
            w_now = core[0] if mech else omega_fixed
            delta = np.float32(float(dqw._angle_advance) * tau * p) * w_now
            cd, sd = jnp.cos(delta), jnp.sin(delta)
            c_a, s_a = c * cd - s * sd, s * cd + c * sd
            action = (dq_to_abc(action[0], action[1], c_a, s_a)
                      + (action[2],))
        # dq_dead: action arrives PRE-CONVERTED (abc + exciter) from the
        # dead-time deque (converted at push time by dt_convert)
        finite_il = finite and k_int > 0.0
        i_abc = i_e = None
        if sup.needs_i_sup or k_int != 0.0:
            i_sd, i_sq, i_e = _currents(core)
            i_abc = dq_to_abc(i_sd, i_sq, c, s)
        if sup.needs_i_sup:
            # finite B6 + 4QC: previous cycle's switch states feed i_sup
            # (see _dc_family.step_physics)
            i_sup_val = conv_i_sup(action, i_abc, i_e,
                                   bs if finite else None)
        else:
            i_sup_val = None
        u_sup_val, sup_new = sup.supply_u(
            sup_planes, i_sup_val,
            None if _u_idx is None else pp[_u_idx])

        if finite_il:
            # 2-sub-interval interlock schedule with mid-cycle angle and
            # current refresh (see _sync_family.physics_step)
            cmd = bridge_cmd(action)
            inter = tuple(_interlock_state(b, c2)
                          for b, c2 in zip(bs, cmd))
            flag = inter[0] != cmd[0]
            for b, c2 in zip(inter[1:], cmd[1:]):
                flag = flag | (b != c2)
            f0 = voltage_fracs(action, i_abc, i_e, inter)
            u0 = _udqe(f0, u_sup_val, c, s)
            dt0 = jnp.where(flag, np.float32(t_int), 0.0)
            dt1 = jnp.where(flag, np.float32(tau - t_int),
                            np.float32(tau))
            tm = None if t0 is None else t0 + dt0
            core_mid = rk4(core, *u0, z, dt0, pc, t0)
            if mech:
                eps_mid = core_mid[i_eps]
                c1, s1 = jnp.cos(eps_mid), jnp.sin(eps_mid)
            else:
                c1 = jnp.where(flag, c * COS_DI - s * SIN_DI, c)
                s1 = jnp.where(flag, s * COS_DI + c * SIN_DI, s)
            i_sd_m, i_sq_m, i_e_m = _currents(core_mid)
            i_abc_m = dq_to_abc(i_sd_m, i_sq_m, c1, s1)
            f1 = voltage_fracs(action, i_abc_m, i_e_m, inter)
            # freeze abc/excitation voltages at interval-0 values for
            # no-interlock envs, then transform with the refreshed angle
            fr = tuple(jnp.where(flag, b, a) for a, b in zip(f0, f1))
            u1 = _udqe(fr, u_sup_val, c1, s1)
            return rk4(core_mid, *u1, z, dt1, pc, tm) + sup_new + pp

        u = _udqe(voltage_fracs(action, i_abc, i_e), u_sup_val, c, s)
        return rk4(core, *u, z, tau, pc, t0) + sup_new + pp

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

    def ref_quantity(state, j):
        nm = ref_cfg[j]["name"]
        i_sd, i_sq, i_e = (state[1:4] if mech else state[0:3])
        if nm == "omega":
            return state[0] * np.float32(1.0 / w_lim)
        if nm == "torque":
            return torque3(i_sd, i_sq, i_e) * np.float32(1.0 / t_lim)
        q = {"i_sd": i_sd, "i_sq": i_sq, "i_e": i_e}[nm]
        return q * ref_cfg[j]["inv_lim"]

    def _sample_actions(bits):
        if finite:
            b = bits(shape)
            return ((b & jnp.uint32(7)).astype(jnp.int32),
                    ((b >> jnp.uint32(3)) & jnp.uint32(3)).astype(jnp.int32))
        return tuple(2.0 * _uniform_from_bits(bits(shape)) - 1.0
                     for _ in range(n_ach))

    # --- DeadTimeProcessor fused as carried action planes (see
    #     pallas_common._wrap_dead_time) ---
    physics_step, advance_bridges, n_bridge, bridge_dtypes = \
        _wrap_mech_time(mload, tau, physics_step, advance_bridges,
                        n_bridge, has_cs=True, k_int=k_int)
    dt_convert = None
    if dq_dead:
        def dt_convert(acts, cur, aux):
            c, s = aux
            w_now = cur[0] if mech else omega_fixed
            delta = np.float32(float(dqw._angle_advance) * tau * p) * w_now
            cd, sd = jnp.cos(delta), jnp.sin(delta)
            c_a, s_a = c * cd - s * sd, s * cd + c * sd
            return dq_to_abc(acts[0], acts[1], c_a, s_a) + (acts[2],)

    physics_step, advance_bridges, n_bridge, bridge_dtypes = \
        _wrap_dead_time(ps,
                        (jnp.int32,) * 2 if finite
                        else (jnp.float32,) * (4 if dq_dead else n_ach),
                        physics_step, advance_bridges, n_bridge,
                        has_cs=True, base_dtypes=bridge_dtypes,
                        convert=dt_convert)

    # --- generic record-adapter surface (see ops/pallas_record.py) ---
    state_names = ((("omega",) if mech else ())
                   + ("i_sd", "i_sq", "i_e", "eps") + sup.names
                   + param_names)
    _t_ref = any(c["name"] == "torque" for c in ref_cfg)
    observe = _fused_state_noise(
        ps, state_names, lambda nm: float(lim[names.index(nm)]),
        allowed=((() if _t_ref else ("i_sd", "i_sq", "i_e"))
                 + (("omega",) if mech else ())))
    act_names = (("action_b6", "action_e") if finite
                 else (("action_d", "action_q", "action_e") if dq_mode
                       else ("action_a", "action_b", "action_c",
                             "action_e")))
    act_dtype = jnp.int32 if finite else jnp.float32
    n_act = len(act_names)
    inv_ilim = np.float32(1.0 / i_lim)
    inv_ielim = np.float32(1.0 / ie_lim)

    def read_actions(ref, t):
        return tuple(ref[t, j] for j in range(n_act))

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
        eps = eps - np.float32(TWO_PI) * jnp.floor(
            eps * np.float32(1.0 / TWO_PI))
        return state[:i_eps] + (eps,) + state[i_eps + 1:]

    no_cons = _fused_constraint_mode(
        env, (("squared", ("i_sq", "i_sd")), ("limit", ("i_e",)))) == "none"

    def violated(state):
        if no_cons:  # constraints=(): the env never terminates
            return jnp.zeros(shape, jnp.bool_)
        i_sd, i_sq, i_e = (state[1:4] if mech else state[0:3])
        isd_n, isq_n = i_sd * inv_ilim, i_sq * inv_ilim
        ie_n = i_e * inv_ielim
        return (((isd_n * isd_n + isq_n * isq_n) > 1.0)
                | (jnp.abs(ie_n) > 1.0))

    def quantities(state, aux):
        return [ref_quantity(state, j) for j in range(n_ref)]

    # --- policy-adapter surface (see ops/pallas_policy.py) ---
    off = 1 if mech else 0
    obs_spec = _policy_obs_spec(mech, w_lim, omega_fixed, [
        ("state", off, 1.0 / i_lim), ("state", off + 1, 1.0 / i_lim),
        ("state", off + 2, 1.0 / ie_lim), ("cos", i_eps), ("sin", i_eps)])

    return SimpleNamespace(
        obs_spec=obs_spec, act_ns=((8, 4) if finite else None),
        act_range=(None if finite else
                   (np.full((n_ach,), -1.0, np.float32),
                    np.ones((n_ach,), np.float32))),
        aux_cs=lambda aux: aux,
        n_state=n_state, finite=finite, mech=mech, shape=shape,
        shape_r=shape_r, n_ref=n_ref, n_rows=n_rows, ref_cfg=ref_cfg, bias=bias,
        violation_reward=violation_reward, i_lim=i_lim, ie_lim=ie_lim,
        COS_D=COS_D, SIN_D=SIN_D, physics_step=physics_step,
        ref_quantity=ref_quantity, sample_actions=_sample_actions,
        state_names=state_names, act_names=act_names, act_dtype=act_dtype,
        sample_actions_t=_sample_actions, read_actions=read_actions,
        pre_step=pre_step, step=step, violated=violated,
        quantities=quantities, pre_step_rot=pre_step_rot,
        rot_init=rot_init, rot_advance=rot_advance,
        mech_mode=mech_mode, sup_mode=sup.mode, n_sup=n_sup, n_core=n_core,
        i_eps=i_eps, needs_step_noise=needs_step_noise,
        param_names=param_names, param_ranges=param_ranges,
        n_param=n_param, observe=observe,
        reset_state=reset_state, n_bridge=n_bridge, bridge_dtypes=bridge_dtypes,
        advance_bridges=_norm_advance(advance_bridges),
    )


def make_fused_eesm_family_rollout(env, n_steps, n_envs,
                                   action_mode="random", interpret=False, randomize=None):
    """Universal fused rollout for the externally-excited synchronous
    family — all 6 {Finite,Cont} x {CC,TC,SC} EESM catalog configs.

    Same 3-current dq ODE as ``make_fused_eesm_rollout`` (externally_
    excited_synchronous_motor.py via models/motors.py:451-476) but with
    the converter (finite B6 bits + 4QC table vs cont B6/4QC duties),
    task references (i_sd*/i_sq*/i_e* | torque* | omega*), reward weights
    and the mechanical model read from the env spec.  SC adds the
    polynomial-load mechanical ODE (torque = 1.5 p (l_M i_e i_k_rs +
    (l_d - l_q) i_sd) i_sq, eesm:200-203) and per-step sincos; CC/TC keep
    the incremental Park rotation.

    * random mode: ``rollout(seed, *state0) -> (*states, reward_sum,
      term_count, rv, rk, rl, rs)``; states = (omega?, i_sd, i_sq, i_e,
      eps).
    * buffer mode: ``rollout(*state0, actions) -> states`` with int32
      ``(n_steps, 2, R, LANE)`` (finite: B6, 4QC) or float32
      ``(n_steps, 4, R, LANE)`` (cont duties) action buffers.
    """
    assert n_envs % LANE == 0
    R = n_envs // LANE
    fs = _eesm_family(env, R, action_mode, randomize)
    n_state, finite, mech, shape, shape_r = (
        fs.n_state, fs.finite, fs.mech, fs.shape, fs.shape_r)
    n_ref, ref_cfg = fs.n_ref, fs.ref_cfg
    n_rows = fs.n_rows
    bias, violation_reward = fs.bias, fs.violation_reward
    i_lim, ie_lim = fs.i_lim, fs.ie_lim
    COS_D, SIN_D, i_eps = fs.COS_D, fs.SIN_D, fs.i_eps
    n_bs = fs.n_bridge
    physics_step, ref_quantity = fs.physics_step, fs.ref_quantity
    _sample_actions = fs.sample_actions
    has_wf = _ref_needs_wf(ref_cfg)

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

        inv_2pi = np.float32(1.0 / TWO_PI)
        inv_ilim = np.float32(1.0 / i_lim)
        inv_ielim = np.float32(1.0 / ie_lim)

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
            eps = state[i_eps]
            eps = eps - np.float32(TWO_PI) * jnp.floor(eps * inv_2pi)
            state = state[:i_eps] + (eps,) + state[i_eps + 1:]

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
        inv_2pi = np.float32(1.0 / TWO_PI)

        def body(t, bs):
            if finite:
                action = (actions_ref[t, 0], actions_ref[t, 1])
            else:
                action = tuple(actions_ref[t, k]
                               for k in range(len(fs.act_names)))
            cur = tuple(o[:] for o in out_state)
            c, s = jnp.cos(cur[i_eps]), jnp.sin(cur[i_eps])
            state = physics_step(cur, action, c, s, None,
                                 bs if n_bs else None)
            eps = state[i_eps]
            eps = eps - np.float32(TWO_PI) * jnp.floor(eps * inv_2pi)
            state = state[:i_eps] + (eps,) + state[i_eps + 1:]
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
        + ([] if mech else [pltpu.VMEM(shape, jnp.float32) for _ in range(2)])
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


