"""Synchronous-family (PMSM/SynRM) fused kernels: the flagship
Finite-CC-PMSM reducing rollout + trajectory recorder
(_PmsmCtx), the universal family builder (_sync_family /
make_fused_sync_rollout), and the closed-loop FOC
controller-in-the-loop kernel."""

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
    _fused_constraint_mode,
    _require_default_constraints,
    _fused_state_noise,
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
    _rotation_protocol,
    _step_noise,
    _uniform_from_bits,
    _wse_err,
)


class _PmsmCtx:
    """Baked constants + per-step physics closures for the Finite-CC-PMSM
    (and SynRM, psi_p=0) kernels — shared by the reducing rollout
    (``make_fused_pmsm_rollout``) and the trajectory-recording rollout
    (``make_fused_pmsm_record_rollout``) so the semantics cannot diverge."""

    def __init__(self, env):
        ps = env.physical_system
        mp = ps.motor.parameter
        names = list(ps.state_names)
        lim = np.asarray(ps.limits)

        r_s, l_d, l_q = float(mp["r_s"]), float(mp["l_d"]), float(mp["l_q"])
        psi_p, p = float(mp.get("psi_p", 0.0)), float(mp["p"])
        omega = float(_fused_load(ps, ("ConstantSpeedLoad",)).omega_fixed)
        self.tau = tau = float(ps.tau)
        u_sup = _fused_u_sup(ps)
        self.i_lim = float(lim[names.index("i_sd")])
        # Wiener margins: nominal/limit ratio times the state-space bounds
        self.margin = float(ps.nominal_state[names.index("i_sd")] / self.i_lim)
        # WeightedSumOfErrors over the two referenced currents, span 2 each
        self.w_over_span = 0.5 / 2.0
        self.violation_reward = -1.0 / (1.0 - 0.9)  # r_min/(1-gamma), rw_sum=1
        self.p_omega = p_omega = p * omega

        # Park-rotation increment per control cycle: with ConstantSpeedLoad
        # the electrical angle advances by a COMPILE-TIME-CONSTANT
        # tau*p*omega, so cos/sin(eps) are maintained by a 4-mul incremental
        # rotation (plus rsqrt renorm to bound float32 drift) instead of two
        # transcendental evaluations per step — and the in-kernel reset
        # angle is zero, so the reset rotation state is the constant (1, 0).
        self.COS_D = np.float32(np.cos(tau * p_omega))
        self.SIN_D = np.float32(np.sin(tau * p_omega))

        def sub_interval_rhs(i_sd, i_sq, u_d, u_q):
            di_sd = (-r_s * i_sd + l_q * p_omega * i_sq + u_d) * (1.0 / l_d)
            di_sq = (-psi_p * p_omega - r_s * i_sq - l_d * p_omega * i_sd
                     + u_q) * (1.0 / l_q)
            return di_sd, di_sq

        def rk4(i_sd, i_sq, u_d, u_q):
            k1d, k1q = sub_interval_rhs(i_sd, i_sq, u_d, u_q)
            k2d, k2q = sub_interval_rhs(i_sd + 0.5 * tau * k1d,
                                        i_sq + 0.5 * tau * k1q, u_d, u_q)
            k3d, k3q = sub_interval_rhs(i_sd + 0.5 * tau * k2d,
                                        i_sq + 0.5 * tau * k2q, u_d, u_q)
            k4d, k4q = sub_interval_rhs(i_sd + tau * k3d, i_sq + tau * k3q,
                                        u_d, u_q)
            sixth = tau / 6.0
            return (i_sd + sixth * (k1d + 2.0 * (k2d + k3d) + k4d),
                    i_sq + sixth * (k1q + 2.0 * (k2q + k3q) + k4q))

        def physics_step_cs(i_sd, i_sq, eps, c, s, action):
            # B6 bridge: action bits -> phase voltage (converters.py:788-823)
            ua = ((action >> 2) & 1).astype(jnp.float32) - 0.5
            ub = ((action >> 1) & 1).astype(jnp.float32) - 0.5
            uc = (action & 1).astype(jnp.float32) - 0.5
            ua, ub, uc = ua * u_sup, ub * u_sup, uc * u_sup
            # Clarke + Park at the cycle-start angle
            u_alpha = (2.0 / 3.0) * (ua - 0.5 * (ub + uc))
            u_beta = np.float32(1.0 / np.sqrt(3.0)) * (ub - uc)
            u_d = c * u_alpha + s * u_beta
            u_q = -s * u_alpha + c * u_beta
            i_sd, i_sq = rk4(i_sd, i_sq, u_d, u_q)
            return i_sd, i_sq, eps + tau * p_omega

        def physics_step(i_sd, i_sq, eps, action):
            c, s = jnp.cos(eps), jnp.sin(eps)
            return physics_step_cs(i_sd, i_sq, eps, c, s, action)

        self.physics_step_cs = physics_step_cs
        self.physics_step = physics_step


def make_fused_pmsm_rollout(env, n_steps, n_envs, action_mode="random",
                            interpret=False):
    """Build the fused rollout.  ``env`` must be a Finite-CC-PMSM-v0 (or
    Finite-CC-SynRM-v0 — the same dq machine with psi_p = 0,
    synchronous_reluctance_motor.py:117-173) functional env; its constants
    are baked into the kernel.

    Returns ``rollout(seed, i_sd0, i_sq0, eps0) -> (i_sd, i_sq, eps,
    reward_sum, term_count)`` with all array args/outputs shaped
    ``(n_envs // 128, 128)`` float32.  With ``action_mode='buffer'`` the
    rollout takes an extra ``(n_steps, n_envs // 128, 128)`` int32 action
    array and disables the stochastic parts (no reference noise, no reset) —
    the configuration used for bit-level physics validation.
    """
    _require_default_constraints(env)
    assert n_envs % LANE == 0
    R = n_envs // LANE
    ctx = _PmsmCtx(env)
    i_lim, margin = ctx.i_lim, ctx.margin
    w_over_span, violation_reward = ctx.w_over_span, ctx.violation_reward
    COS_D, SIN_D = ctx.COS_D, ctx.SIN_D
    physics_step_cs, physics_step = ctx.physics_step_cs, ctx.physics_step
    random_actions = action_mode == "random"

    shape = (R, LANE)

    # both reference generators (i_sd*, i_sq*) live stacked in one
    # (2R, LANE) buffer: rows [0:R] = i_sd*, rows [R:2R] = i_sq* — one
    # vector op advances both
    shape2 = (2 * R, LANE)
    LN10 = np.float32(np.log(10.0))

    def kernel_random(seed_ref, i_sd_ref, i_sq_ref, eps_ref,
                      out_i_sd, out_i_sq, out_eps, out_reward, out_terms,
                      out_rv, out_rk, out_rl, out_rs,
                      rv_ref, rk_ref, rl_ref, rs_ref, rng_ref,
                      c_ref, s_ref):
        seed, bits = _make_rng(interpret, rng_ref)
        seed(seed_ref[0])
        out_i_sd[:] = i_sd_ref[:]
        out_i_sq[:] = i_sq_ref[:]
        out_eps[:] = eps_ref[:]
        c_ref[:] = jnp.cos(eps_ref[:])
        s_ref[:] = jnp.sin(eps_ref[:])
        out_reward[:] = jnp.zeros(shape, jnp.float32)
        out_terms[:] = jnp.zeros(shape, jnp.float32)

        def _draw_params(mask):
            u1 = _uniform_from_bits(bits(shape2))
            u2 = _uniform_from_bits(bits(shape2))
            new_len = jnp.floor(500.0 + 1500.0 * u1)
            new_sig = jnp.exp(LN10 * (-3.0 + 2.0 * u2))  # log-uniform [1e-3, 1e-1]
            rl_ref[:] = jnp.where(mask, new_len, rl_ref[:])
            rs_ref[:] = jnp.where(mask, new_sig, rs_ref[:])

        # init both generators
        u = _uniform_from_bits(bits(shape2))
        rv_ref[:] = (2.0 * u - 1.0) * margin
        rk_ref[:] = jnp.zeros(shape2, jnp.float32)
        _draw_params(jnp.ones(shape2, dtype=jnp.bool_))

        def body(t, _):
            action = (bits(shape) & jnp.uint32(7)).astype(jnp.int32)
            c, s = c_ref[:], s_ref[:]
            i_sd, i_sq, eps = physics_step_cs(
                out_i_sd[:], out_i_sq[:], out_eps[:], c, s, action)
            eps = eps - np.float32(TWO_PI) * jnp.floor(eps * np.float32(1.0 / TWO_PI))
            c_new = c * COS_D - s * SIN_D
            s_new = s * COS_D + c * SIN_D
            inv = jax.lax.rsqrt(c_new * c_new + s_new * s_new)
            c_new = c_new * inv
            s_new = s_new * inv

            i_sd_n = i_sd * (1.0 / i_lim)
            i_sq_n = i_sq * (1.0 / i_lim)
            violated = (i_sd_n * i_sd_n + i_sq_n * i_sq_n) > 1.0
            refs = rv_ref[:]
            wse = -(w_over_span * jnp.abs(i_sd_n - refs[:R])
                    + w_over_span * jnp.abs(i_sq_n - refs[R:]))
            reward = jnp.where(violated, violation_reward, wse)
            out_reward[:] = out_reward[:] + reward
            out_terms[:] = out_terms[:] + violated.astype(jnp.float32)

            # in-kernel auto-reset (constant default initializers)
            zero = jnp.zeros(shape, jnp.float32)
            out_i_sd[:] = jnp.where(violated, zero, i_sd)
            out_i_sq[:] = jnp.where(violated, zero, i_sq)
            out_eps[:] = jnp.where(violated, zero, eps)
            c_ref[:] = jnp.where(violated, jnp.ones(shape, jnp.float32), c_new)
            s_ref[:] = jnp.where(violated, zero, s_new)

            # Wiener advance for both refs in one (2R, LANE) pass
            # concat float masks, not bools: Mosaic rejects the i1
            # vreg cast the bool concat needs when R is not a
            # multiple of the sublane count (small-batch kernels)
            viol_f = violated.astype(jnp.float32)
            reset2 = jnp.concatenate([viol_f, viol_f], axis=0) > 0.5
            # one Box-Muller PAIR per env feeds both reference streams
            # (z1 = r cos, z2 = r sin are exactly independent N(0,1)):
            # halves the log/sqrt/cos lane count vs two independent draws
            u1 = _uniform_from_bits(bits(shape))
            u2 = _uniform_from_bits(bits(shape))
            rad = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
            theta = np.float32(TWO_PI) * u2
            draw = jnp.concatenate(
                [rad * jnp.cos(theta), rad * jnp.sin(theta)], axis=0)
            regen = (rk_ref[:] >= rl_ref[:]) | reset2
            _draw_params(regen)
            rk_ref[:] = jnp.where(regen, 0.0, rk_ref[:]) + 1.0
            value = jnp.clip(rv_ref[:] + rs_ref[:] * draw, -margin, margin)
            u3 = _uniform_from_bits(bits(shape2))
            rv_ref[:] = jnp.where(reset2, (2.0 * u3 - 1.0) * margin, value)
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)
        # final Wiener state snapshot — the observables behind the
        # statistical kernel tests (value / step-counter / length / sigma)
        out_rv[:] = rv_ref[:]
        out_rk[:] = rk_ref[:]
        out_rl[:] = rl_ref[:]
        out_rs[:] = rs_ref[:]

    def kernel_buffer(i_sd_ref, i_sq_ref, eps_ref, actions_ref,
                      out_i_sd, out_i_sq, out_eps, out_reward, out_terms):
        out_i_sd[:] = i_sd_ref[:]
        out_i_sq[:] = i_sq_ref[:]
        out_eps[:] = eps_ref[:]
        out_reward[:] = jnp.zeros(shape, jnp.float32)
        out_terms[:] = jnp.zeros(shape, jnp.float32)

        def body(t, _):
            action = actions_ref[t]
            i_sd, i_sq, eps = physics_step(out_i_sd[:], out_i_sq[:], out_eps[:], action)
            eps = eps - np.float32(TWO_PI) * jnp.floor(eps * np.float32(1.0 / TWO_PI))
            out_i_sd[:] = i_sd
            out_i_sq[:] = i_sq
            out_eps[:] = eps
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)

    out_shapes = tuple(jax.ShapeDtypeStruct(shape, jnp.float32) for _ in range(5))
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    if random_actions:
        debug_shapes = tuple(jax.ShapeDtypeStruct(shape2, jnp.float32)
                             for _ in range(4))

        @jax.jit
        def rollout(seed, i_sd0, i_sq0, eps0):
            return pl.pallas_call(
                kernel_random,
                out_shape=out_shapes + debug_shapes,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vmem, vmem, vmem],
                out_specs=tuple(vmem for _ in range(9)),
                scratch_shapes=(
                    [pltpu.VMEM((2 * R, LANE), jnp.float32) for _ in range(4)]
                    + [pltpu.VMEM((2 * R, LANE), jnp.uint32)]
                    + [pltpu.VMEM(shape, jnp.float32) for _ in range(2)]
                ),
                interpret=interpret,
            )(jnp.asarray([seed], jnp.int32), i_sd0, i_sq0, eps0)

        return rollout

    @jax.jit
    def rollout(i_sd0, i_sq0, eps0, actions):
        return pl.pallas_call(
            kernel_buffer,
            out_shape=out_shapes,
            in_specs=[vmem, vmem, vmem, vmem],
            out_specs=tuple(vmem for _ in range(5)),
            interpret=interpret,
        )(i_sd0, i_sq0, eps0, actions)

    return rollout


def make_fused_pmsm_record_rollout(env, n_steps, n_envs, chunk=None,
                                   action_mode="random", interpret=False):
    """Fused PMSM rollout that RECORDS the full per-step trajectory to HBM.

    Same per-step semantics as ``make_fused_pmsm_rollout`` (B6 bridge ->
    Park -> RK4 -> Wiener references -> WSE reward -> squared constraint ->
    in-kernel auto-reset), but the kernel runs a sequential grid over
    ``n_steps // chunk`` time chunks: the drive state persists in VMEM
    scratch across grid steps while each chunk's per-step signals stream to
    HBM through pipelined output windows.  This is the off-policy /
    analysis path — transitions come OUT of the kernel instead of being
    reduced to sums, at HBM-bandwidth cost instead of dispatch-per-step
    cost.

    ``action_mode='random'``: ``rollout(seed, i_sd0, i_sq0, eps0) ->
    (i_sd, i_sq, eps, ref_d, ref_q, action, reward, done)``, each
    ``(n_steps, n_envs // 128, 128)`` (``action`` int32, rest float32).
    ``i_sd``/``i_sq``/``eps`` are the post-step, post-autoreset values
    (what a Gymnasium ``step`` returns as the next observation);
    ``ref_d``/``ref_q`` are the references the step's reward was computed
    against (the references the agent saw when choosing the action).

    ``action_mode='buffer'``: ``rollout(i_sd0, i_sq0, eps0, actions) ->
    (i_sd, i_sq, eps)`` per step, deterministic physics only — the
    configuration used for step-for-step validation vs the XLA env.

    ``chunk`` (steps per grid iteration) bounds the VMEM window:
    8 signals x chunk x (R x 128) x 4 B must fit alongside the scratch
    state; the default targets ~4 MB (chunk=8 at 16k envs).
    """
    _require_default_constraints(env)
    assert n_envs % LANE == 0
    R = n_envs // LANE
    if chunk is None:
        # target ~4 MB of output window (8 signals, double-buffered),
        # clamped to n_steps and snapped down to a divisor of it
        chunk = min(max(1, (8 * LANE) // R), n_steps)
        while n_steps % chunk:
            chunk -= 1
    assert n_steps % chunk == 0, "n_steps must be a multiple of chunk"
    n_chunks = n_steps // chunk

    ctx = _PmsmCtx(env)
    i_lim, margin = ctx.i_lim, ctx.margin
    w_over_span, violation_reward = ctx.w_over_span, ctx.violation_reward
    COS_D, SIN_D = ctx.COS_D, ctx.SIN_D
    physics_step_cs = ctx.physics_step_cs
    LN10 = np.float32(np.log(10.0))
    shape = (R, LANE)
    shape2 = (2 * R, LANE)

    if action_mode == "buffer":
        def kernel_buf(acts_ref, i_sd0_ref, i_sq0_ref, eps0_ref,
                       out_isd, out_isq, out_eps,
                       isd_s, isq_s, eps_s):
            @pl.when(pl.program_id(0) == 0)
            def _():
                isd_s[:] = i_sd0_ref[:]
                isq_s[:] = i_sq0_ref[:]
                eps_s[:] = eps0_ref[:]

            def body(k, _):
                eps = eps_s[:]
                c, s = jnp.cos(eps), jnp.sin(eps)
                i_sd, i_sq, eps = physics_step_cs(
                    isd_s[:], isq_s[:], eps, c, s, acts_ref[k])
                eps = eps - np.float32(TWO_PI) * jnp.floor(
                    eps * np.float32(1.0 / TWO_PI))
                isd_s[:] = i_sd
                isq_s[:] = i_sq
                eps_s[:] = eps
                out_isd[k] = i_sd
                out_isq[k] = i_sq
                out_eps[k] = eps
                return 0

            jax.lax.fori_loop(0, chunk, body, 0)

        tblk = pl.BlockSpec((chunk, R, LANE), lambda i: (i, 0, 0))
        const = pl.BlockSpec((R, LANE), lambda i: (0, 0))
        traj = jax.ShapeDtypeStruct((n_steps, R, LANE), jnp.float32)

        @jax.jit
        def rollout(i_sd0, i_sq0, eps0, actions):
            return pl.pallas_call(
                kernel_buf,
                grid=(n_chunks,),
                out_shape=(traj, traj, traj),
                in_specs=[tblk, const, const, const],
                out_specs=(tblk, tblk, tblk),
                scratch_shapes=[pltpu.VMEM(shape, jnp.float32)
                                for _ in range(3)],
                interpret=interpret,
            )(actions, i_sd0, i_sq0, eps0)

        return rollout

    assert action_mode == "random", action_mode

    def kernel(seed_ref, i_sd0_ref, i_sq0_ref, eps0_ref,
               out_isd, out_isq, out_eps, out_refd, out_refq,
               out_act, out_reward, out_done,
               isd_s, isq_s, eps_s, c_s, s_s,
               rv_ref, rk_ref, rl_ref, rs_ref, rng_ref):
        pid = pl.program_id(0)
        seed, bits = _make_rng(interpret, rng_ref)
        # reseed per chunk (grid iterations are sequential but the PRNG
        # state is not guaranteed to persist across them); stride by
        # n_chunks so launches with different root seeds never share a
        # per-chunk seed (seed s covers [s*n_chunks, (s+1)*n_chunks))
        seed(seed_ref[0] * n_chunks + pid)

        def _draw_params(mask):
            u1 = _uniform_from_bits(bits(shape2))
            u2 = _uniform_from_bits(bits(shape2))
            new_len = jnp.floor(500.0 + 1500.0 * u1)
            new_sig = jnp.exp(LN10 * (-3.0 + 2.0 * u2))
            rl_ref[:] = jnp.where(mask, new_len, rl_ref[:])
            rs_ref[:] = jnp.where(mask, new_sig, rs_ref[:])

        @pl.when(pid == 0)
        def _():
            isd_s[:] = i_sd0_ref[:]
            isq_s[:] = i_sq0_ref[:]
            eps_s[:] = eps0_ref[:]
            c_s[:] = jnp.cos(eps0_ref[:])
            s_s[:] = jnp.sin(eps0_ref[:])
            u = _uniform_from_bits(bits(shape2))
            rv_ref[:] = (2.0 * u - 1.0) * margin
            rk_ref[:] = jnp.zeros(shape2, jnp.float32)
            _draw_params(jnp.ones(shape2, dtype=jnp.bool_))

        def body(k, _):
            action = (bits(shape) & jnp.uint32(7)).astype(jnp.int32)
            c, s = c_s[:], s_s[:]
            i_sd, i_sq, eps = physics_step_cs(
                isd_s[:], isq_s[:], eps_s[:], c, s, action)
            eps = eps - np.float32(TWO_PI) * jnp.floor(
                eps * np.float32(1.0 / TWO_PI))
            c_new = c * COS_D - s * SIN_D
            s_new = s * COS_D + c * SIN_D
            inv = jax.lax.rsqrt(c_new * c_new + s_new * s_new)
            c_new = c_new * inv
            s_new = s_new * inv

            i_sd_n = i_sd * (1.0 / i_lim)
            i_sq_n = i_sq * (1.0 / i_lim)
            violated = (i_sd_n * i_sd_n + i_sq_n * i_sq_n) > 1.0
            refs = rv_ref[:]
            wse = -(w_over_span * jnp.abs(i_sd_n - refs[:R])
                    + w_over_span * jnp.abs(i_sq_n - refs[R:]))
            reward = jnp.where(violated, violation_reward, wse)

            zero = jnp.zeros(shape, jnp.float32)
            isd_s[:] = jnp.where(violated, zero, i_sd)
            isq_s[:] = jnp.where(violated, zero, i_sq)
            eps_s[:] = jnp.where(violated, zero, eps)
            c_s[:] = jnp.where(violated, jnp.ones(shape, jnp.float32), c_new)
            s_s[:] = jnp.where(violated, zero, s_new)

            out_isd[k] = isd_s[:]
            out_isq[k] = isq_s[:]
            out_eps[k] = eps_s[:]
            out_refd[k] = refs[:R]
            out_refq[k] = refs[R:]
            out_act[k] = action
            out_reward[k] = reward
            out_done[k] = violated.astype(jnp.float32)

            viol_f = violated.astype(jnp.float32)
            reset2 = jnp.concatenate([viol_f, viol_f], axis=0) > 0.5
            u1 = _uniform_from_bits(bits(shape))
            u2 = _uniform_from_bits(bits(shape))
            rad = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
            theta = np.float32(TWO_PI) * u2
            draw = jnp.concatenate(
                [rad * jnp.cos(theta), rad * jnp.sin(theta)], axis=0)
            regen = (rk_ref[:] >= rl_ref[:]) | reset2
            _draw_params(regen)
            rk_ref[:] = jnp.where(regen, 0.0, rk_ref[:]) + 1.0
            value = jnp.clip(rv_ref[:] + rs_ref[:] * draw, -margin, margin)
            u3 = _uniform_from_bits(bits(shape2))
            rv_ref[:] = jnp.where(reset2, (2.0 * u3 - 1.0) * margin, value)
            return 0

        jax.lax.fori_loop(0, chunk, body, 0)

    tblk = pl.BlockSpec((chunk, R, LANE), lambda i: (i, 0, 0))
    const = pl.BlockSpec((R, LANE), lambda i: (0, 0))
    traj_f = jax.ShapeDtypeStruct((n_steps, R, LANE), jnp.float32)
    traj_i = jax.ShapeDtypeStruct((n_steps, R, LANE), jnp.int32)

    @jax.jit
    def rollout(seed, i_sd0, i_sq0, eps0):
        return pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            out_shape=(traj_f, traj_f, traj_f, traj_f, traj_f,
                       traj_i, traj_f, traj_f),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      const, const, const],
            out_specs=(tblk,) * 8,
            scratch_shapes=(
                [pltpu.VMEM(shape, jnp.float32) for _ in range(5)]
                + [pltpu.VMEM(shape2, jnp.float32) for _ in range(4)]
                + [pltpu.VMEM(shape2, jnp.uint32)]
            ),
            interpret=interpret,
        )(jnp.asarray([seed], jnp.int32), i_sd0, i_sq0, eps0)

    return rollout


def _sync_family(env, R, action_mode, randomize=None):
    """Shared synchronous-family (PMSM/SynRM) closures — consumed by the
    reducing rollout (``make_fused_sync_rollout``) and the generic
    trajectory recorder (``ops.pallas_record``).

    ``randomize``: optional ``{param: (lo, hi)}`` — electrical motor
    parameters as per-env state planes (domain randomization; the same
    design as ``_dc_family``: appended after the supply planes, read by
    the dq ODE each step, redrawn uniform on every violation reset).
    PMSM supports r_s/l_d/l_q/psi_p (flux and inductance drift with
    temperature/saturation — the classic robustness axis); SynRM
    r_s/l_d/l_q."""
    ps = env.physical_system
    _fused_check_system(ps, allow_dead_time=True, allow_dq=True,
                        allow_state_noise=True,
                        allow_dq_wrapper=("DqToAbcActionProcessor",))
    mp = ps.motor.parameter
    names = list(ps.state_names)
    lim = np.asarray(ps.limits)
    conv = ps.converter
    finite = conv.action_type == "finite"
    k_int = _fused_interlock(conv, float(ps.tau), finite)
    t_int = k_int * float(ps.tau)
    # control_space='dq': the (u_d, u_q) action is rotated to abc at the
    # cycle-start angle (the same stale eps the physics uses) — exactly
    # physical_systems.py SynchronousMotorSystem.simulate.  The
    # advance-angle DqToAbcActionProcessor WRAPPER additionally advances
    # the rotation by _angle_advance * tau * omega * p evaluated on the
    # pre-step state (the wrapper's carried previous state IS the
    # kernel's cur) — dq_to_abc_action_processor.py:8-114.
    cs_dq = _fused_control_space(ps) == "dq"
    dqw = _fused_dq_wrapper(ps, ("DqToAbcActionProcessor",))
    if dqw is not None:
        if cs_dq or finite:
            raise NotImplementedError(
                "DqToAbcActionProcessor over a dq/finite base system is "
                "not fused — use the general XLA path")
        if getattr(dqw, "_angle_name", "epsilon") != "epsilon":
            raise NotImplementedError(
                "only the rotor-angle ('epsilon') DqToAbc wrapper is "
                "fused; the psi_angle variant needs the FluxObserver "
                "state — use the general XLA path")
    dq_mode = cs_dq or dqw is not None
    # DqToAbc wrapper + DeadTimeProcessor: the reference delays the
    # CONVERTED abc duty (the dq action rotates at the PUSH-time angle
    # and the result sits in the deque) — fused by storing the converted
    # duty in the dead-time planes via _wrap_dead_time's convert hook.
    # The wrapper itself already advances by (0.5 + dead_time) *
    # tau * omega * p (dq_to_abc_action_processor.py:72-73).
    dq_dead = dqw is not None and _fused_dead_time_steps(ps) > 0
    adv_k = float(dqw._angle_advance) if dqw is not None else 0.0
    n_ach = 2 if dq_mode else 3

    p = float(mp["p"])
    _rand_ok = (("r_s", "l_d", "l_q", "psi_p", "j_rotor")
                if "psi_p" in mp
                else ("r_s", "l_d", "l_q", "j_rotor"))
    param_names, n_param, p_idx, param_ranges = _parse_randomize(
        randomize, _rand_ok + ("u_sup",), ps.motor.kind,
        "the electrical motor parameters (+ j_rotor, u_sup)")

    def getp(nm, pp):
        if nm in p_idx:
            return pp[p_idx[nm]]
        return float(mp.get(nm, 0.0)) if nm == "psi_p" else float(mp[nm])

    def resolve(pp):
        l_d, l_q = getp("l_d", pp), getp("l_q", pp)
        return (getp("r_s", pp), l_d, l_q, 1.0 / l_d, 1.0 / l_q,
                getp("psi_p", pp))

    tau = float(ps.tau)
    i_lim = float(lim[names.index("i_sd")])
    t_lim = float(lim[names.index("torque")])
    w_lim = float(lim[names.index("omega")])
    shape = (R, LANE)

    mload = _make_fused_mech(ps, float(mp["j_rotor"]), shape)
    resolve, j_rand = _wrap_j_resolve(resolve, mload, p_idx)
    mech_mode, mech = mload.mode, mload.mech
    needs_step_noise = mload.needs_step_noise
    sup = _make_fused_supply(ps, shape, tau)
    _u_idx = _u_sup_plane_idx(p_idx, sup)
    n_sup = sup.n_sup

    COS_D = SIN_D = COS_DI = SIN_DI = None
    omega_fixed = mload.omega_fixed
    if not mech:
        COS_D = np.float32(np.cos(tau * p * omega_fixed))
        SIN_D = np.float32(np.sin(tau * p * omega_fixed))
        # mid-cycle rotation for the interlock sub-interval refresh
        COS_DI = np.float32(np.cos(t_int * p * omega_fixed))
        SIN_DI = np.float32(np.sin(t_int * p * omega_fixed))

    def torque(i_sd, i_sq, pc):
        _r_s, l_d, l_q, _ild, _ilq, psi_p = pc[:6]
        return 1.5 * p * (psi_p + (l_d - l_q) * i_sd) * i_sq

    def el_rhs(w, i_sd, i_sq, u_d, u_q, pc):
        r_s, l_d, l_q, inv_ld, inv_lq, psi_p = pc[:6]
        pw = p * w
        di_sd = (-r_s * i_sd + l_q * pw * i_sq + u_d) * inv_ld
        di_sq = (-psi_p * pw - r_s * i_sq - l_d * pw * i_sd + u_q) * inv_lq
        return di_sd, di_sq

    if mech:
        def rhs(core, u_d, u_q, z, ts, pc):
            w, i_sd, i_sq, eps = core
            tq = torque(i_sd, i_sq, pc)
            if j_rand:
                dw = mload.mech_rhs_j(w, tq, z, pc[-1])
            elif mload.needs_time:
                dw = mload.mech_rhs_t(w, tq, z, ts)
            else:
                dw = mload.mech_rhs(w, tq, z)
            di_sd, di_sq = el_rhs(w, i_sd, i_sq, u_d, u_q, pc)
            return dw, di_sd, di_sq, p * w
    else:
        def rhs(core, u_d, u_q, z, ts, pc):
            i_sd, i_sq, eps = core
            di_sd, di_sq = el_rhs(omega_fixed, i_sd, i_sq, u_d, u_q, pc)
            return di_sd, di_sq, np.float32(p * omega_fixed) + 0.0 * eps

    n_core = 4 if mech else 3
    n_state = n_core + n_sup + n_param
    i_eps = n_core - 1

    n_bridge = (3 if (finite and (k_int > 0.0
                                  or ps.supply.kind == "RCVoltageSupply"))
                else 0)

    b6 = _make_b6(finite, k_int)
    b6_cmd, abc_frac, b6_i_sup = b6.cmd, b6.frac, b6.i_sup

    def advance_bridges(bs, action):
        cmd = b6_cmd(action)
        if k_int > 0.0:
            return tuple(_interlock_state(b, c) for b, c in zip(bs, cmd))
        return cmd

    def dq_to_abc(i_sd, i_sq, c, s):
        """inverse Park + Clarke (t_32 rows, three_phase_motor.py:16-88)"""
        i_al = c * i_sd - s * i_sq
        i_be = s * i_sd + c * i_sq
        half_b = np.float32(0.5 * np.sqrt(3.0))
        return (i_al, -0.5 * i_al + half_b * i_be, -0.5 * i_al - half_b * i_be)

    def _park(u_abc, c, s):
        u_alpha = (2.0 / 3.0) * (u_abc[0] - 0.5 * (u_abc[1] + u_abc[2]))
        u_beta = np.float32(1.0 / np.sqrt(3.0)) * (u_abc[1] - u_abc[2])
        return c * u_alpha + s * u_beta, -s * u_alpha + c * u_beta

    def rk4(core, u_d, u_q, z, dt, pc, t0=None):
        def axpy(st, k, cc):
            return tuple(si + cc * ki for si, ki in zip(st, k))

        # RK4 stage times (ops/integrators.py rk4_step) — only evaluated
        # for time-dependent mech models (ExternalSpeedLoad)
        tm = te = None
        if t0 is not None:
            tm, te = t0 + 0.5 * dt, t0 + dt
        k1 = rhs(core, u_d, u_q, z, t0, pc)
        k2 = rhs(axpy(core, k1, 0.5 * dt), u_d, u_q, z, tm, pc)
        k3 = rhs(axpy(core, k2, 0.5 * dt), u_d, u_q, z, tm, pc)
        k4 = rhs(axpy(core, k3, dt), u_d, u_q, z, te, pc)
        return tuple(
            si + (dt / 6.0) * (a1 + 2.0 * (a2 + a3) + a4)
            for si, a1, a2, a3, a4 in zip(core, k1, k2, k3, k4)
        )

    def _dq_of(core):
        return (core[1], core[2]) if mech else (core[0], core[1])

    def physics_step(state, action, c, s, z=None, bs=None, t0=None):
        core = state[:n_core]
        sup_planes = state[n_core:n_core + n_sup]
        pp = state[n_core + n_sup:]
        pc = resolve(pp)
        if cs_dq:
            action = dq_to_abc(action[0], action[1], c, s)
        elif dqw is not None and not dq_dead:
            w_now = core[0] if mech else omega_fixed
            delta = np.float32(adv_k * tau * p) * w_now
            cd, sd = jnp.cos(delta), jnp.sin(delta)
            c_a, s_a = c * cd - s * sd, s * cd + c * sd
            action = dq_to_abc(action[0], action[1], c_a, s_a)
        # dq_dead: the action arrives PRE-CONVERTED (3-tuple abc) from the
        # dead-time deque — conversion happened at push time (dt_convert)
        finite_il = finite and k_int > 0.0
        i_abc = None
        if sup.needs_i_sup or k_int != 0.0:
            i_sd, i_sq = _dq_of(core)
            i_abc = dq_to_abc(i_sd, i_sq, c, s)
        if sup.needs_i_sup:
            # finite B6: i_sup reads the PREVIOUS cycle's switch states
            # carried in ``bs`` (the reference queries i_sup before
            # convert() flips the bridges — see _dc_family.step_physics)
            i_sup_val = b6_i_sup(action, i_abc, bs if finite else None)
        else:
            i_sup_val = None
        # one supply query per cycle (both reference sub-intervals query at
        # the same timestamp — see _dc_family.step_physics)
        u_sup_val, sup_new = sup.supply_u(
            sup_planes, i_sup_val,
            None if _u_idx is None else pp[_u_idx])

        if finite_il:
            # 2-sub-interval interlock schedule: interlock pattern for the
            # whole cycle (deferred quirk); the rotor angle and currents
            # refresh between sub-intervals, with the abc voltage frozen at
            # interval-0 values for envs with no interlock this cycle
            # (physical_systems.py:487-525)
            cmd = b6_cmd(action)
            inter = tuple(_interlock_state(b, cm)
                          for b, cm in zip(bs, cmd))
            flag = ((inter[0] != cmd[0]) | (inter[1] != cmd[1])
                    | (inter[2] != cmd[2]))
            u_abc0 = tuple(f * u_sup_val
                           for f in abc_frac(action, i_abc, inter))
            u_d0, u_q0 = _park(u_abc0, c, s)
            # single reference sub-interval when no interlock: leg
            # durations (0, tau) per env — a dt=0 RK4 leg is an exact
            # identity (see the DC variant)
            dt0 = jnp.where(flag, np.float32(t_int), 0.0)
            dt1 = jnp.where(flag, np.float32(tau - t_int),
                            np.float32(tau))
            tm = None if t0 is None else t0 + dt0
            core_mid = rk4(core, u_d0, u_q0, z, dt0, pc, t0)
            if mech:
                eps_mid = core_mid[i_eps]
                c1, s1 = jnp.cos(eps_mid), jnp.sin(eps_mid)
            else:
                # no-interlock envs keep the cycle-start angle (their
                # mid state IS the start state)
                c1 = jnp.where(flag, c * COS_DI - s * SIN_DI, c)
                s1 = jnp.where(flag, s * COS_DI + c * SIN_DI, s)
            i_sd_m, i_sq_m = _dq_of(core_mid)
            i_abc_m = dq_to_abc(i_sd_m, i_sq_m, c1, s1)
            u_abc1 = tuple(
                jnp.where(flag, f * u_sup_val, u0)
                for f, u0 in zip(abc_frac(action, i_abc_m, inter), u_abc0))
            u_d1, u_q1 = _park(u_abc1, c1, s1)
            return rk4(core_mid, u_d1, u_q1, z, dt1, pc, tm) + sup_new + pp

        fa, fb, fc = abc_frac(action, i_abc)
        u_d, u_q = _park((fa * u_sup_val, fb * u_sup_val, fc * u_sup_val),
                         c, s)
        return rk4(core, u_d, u_q, z, tau, pc, t0) + sup_new + pp

    def reset_state(bits):
        zero = jnp.zeros(shape, jnp.float32)
        core = ((mload.omega_reset(bits),) if mech else ()) + (zero,) * 3
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
    no_cons = _fused_constraint_mode(
        env, (("squared", ("i_sq", "i_sd")),)) == "none"

    def ref_quantity(state, j):
        nm = ref_cfg[j]["name"]
        i_sd, i_sq = (state[1], state[2]) if mech else (state[0], state[1])
        if nm == "omega":
            return state[0] * np.float32(1.0 / w_lim)
        if nm == "torque":
            pc = resolve(state[n_core + n_sup:])
            return torque(i_sd, i_sq, pc) * np.float32(1.0 / t_lim)
        q = i_sd if nm == "i_sd" else i_sq
        return q * ref_cfg[j]["inv_lim"]

    def _sample_actions(bits):
        if finite:
            return (bits(shape) & jnp.uint32(7)).astype(jnp.int32)
        return tuple(2.0 * _uniform_from_bits(bits(shape)) - 1.0
                     for _ in range(n_ach))

    # --- ExternalSpeedLoad time plane + DeadTimeProcessor action
    #     planes, fused as carried state (see pallas_common) ---
    physics_step, advance_bridges, n_bridge, bridge_dtypes = \
        _wrap_mech_time(mload, tau, physics_step, advance_bridges,
                        n_bridge, has_cs=True, k_int=k_int)
    dt_convert = None
    if dq_dead:
        # push-time conversion: the stored planes are the abc duty rotated
        # at the pre-step angle + the wrapper's advance term
        def dt_convert(acts, cur, aux):
            c, s = aux
            w_now = cur[0] if mech else omega_fixed
            delta = np.float32(adv_k * tau * p) * w_now
            cd, sd = jnp.cos(delta), jnp.sin(delta)
            c_a, s_a = c * cd - s * sd, s * cd + c * sd
            return dq_to_abc(acts[0], acts[1], c_a, s_a)

    physics_step, advance_bridges, n_bridge, bridge_dtypes = \
        _wrap_dead_time(ps,
                        (jnp.int32,) if finite
                        else (jnp.float32,) * (3 if dq_dead else n_ach),
                        physics_step, advance_bridges, n_bridge,
                        has_cs=True, base_dtypes=bridge_dtypes,
                        convert=dt_convert)

    # --- generic record-adapter surface (see ops/pallas_record.py) ---
    state_names = ((("omega",) if mech else ()) + ("i_sd", "i_sq", "eps")
                   + sup.names + param_names)
    _t_ref = any(c["name"] == "torque" for c in ref_cfg)
    observe = _fused_state_noise(
        ps, state_names, lambda nm: float(lim[names.index(nm)]),
        allowed=((() if _t_ref else ("i_sd", "i_sq"))
                 + (("omega",) if mech else ())))
    act_names = (("action",) if finite
                 else (("action_d", "action_q") if dq_mode
                       else ("action_a", "action_b", "action_c")))
    act_dtype = jnp.int32 if finite else jnp.float32

    def sample_actions_t(bits):
        a = _sample_actions(bits)
        return (a,) if finite else a

    def read_actions(ref, t):
        if finite:
            return (ref[t],)
        return tuple(ref[t, j] for j in range(n_ach))

    def pre_step(cur):
        return (jnp.cos(cur[i_eps]), jnp.sin(cur[i_eps]))

    rot_init = rot_advance = pre_step_rot = None
    if not mech:
        rot_init, rot_advance = _rotation_protocol(COS_D, SIN_D, i_eps)

        def pre_step_rot(cur, c, s):
            return (c, s)

    def step(cur, acts, aux, z=None, bs=None):
        c, s = aux
        a = acts[0] if finite else acts
        state = physics_step(cur, a, c, s, z, bs)
        eps = state[i_eps]
        eps = eps - np.float32(TWO_PI) * jnp.floor(
            eps * np.float32(1.0 / TWO_PI))
        return state[:i_eps] + (eps,) + state[i_eps + 1:]

    def violated(state):
        if no_cons:  # constraints=(): the env never terminates
            return jnp.zeros(shape, jnp.bool_)
        i_sd, i_sq = (state[1], state[2]) if mech else (state[0], state[1])
        i_sd_n = i_sd * np.float32(1.0 / i_lim)
        i_sq_n = i_sq * np.float32(1.0 / i_lim)
        return (i_sd_n * i_sd_n + i_sq_n * i_sq_n) > 1.0

    def quantities(state, aux):
        return [ref_quantity(state, j) for j in range(n_ref)]

    # --- policy-adapter surface (see ops/pallas_policy.py) ---
    off = 1 if mech else 0
    obs_spec = _policy_obs_spec(mech, w_lim, omega_fixed, [
        ("state", off, 1.0 / i_lim), ("state", off + 1, 1.0 / i_lim),
        ("cos", i_eps), ("sin", i_eps)])

    return SimpleNamespace(
        obs_spec=obs_spec, act_ns=((8,) if finite else None),
        act_range=(None if finite else
                   (np.full((n_ach,), -1.0, np.float32),
                    np.ones((n_ach,), np.float32))),
        aux_cs=lambda aux: aux,
        n_state=n_state, finite=finite, mech=mech, shape=shape,
        shape_r=shape_r, n_ref=n_ref, n_rows=n_rows, ref_cfg=ref_cfg, bias=bias,
        violation_reward=violation_reward, i_lim=i_lim, COS_D=COS_D,
        SIN_D=SIN_D, physics_step=physics_step, ref_quantity=ref_quantity,
        sample_actions=_sample_actions, state_names=state_names,
        act_names=act_names, act_dtype=act_dtype,
        sample_actions_t=sample_actions_t, read_actions=read_actions,
        pre_step=pre_step, step=step, violated=violated,
        quantities=quantities, pre_step_rot=pre_step_rot,
        rot_init=rot_init, rot_advance=rot_advance,
        mech_mode=mech_mode, sup_mode=sup.mode, n_sup=n_sup, n_core=n_core,
        i_eps=i_eps, needs_step_noise=needs_step_noise,
        param_names=param_names, param_ranges=param_ranges,
        n_param=n_param, observe=observe,
        reset_state=reset_state, n_bridge=n_bridge, bridge_dtypes=bridge_dtypes,
        # single-head finite callers pass (action,) — unwrap to the plane
        # form advance_bridges expects; cont multi-channel tuples (which
        # only reach here through the dead-time pipeline) pass through.
        # cur/aux feed the dead-time convert hook (dq_dead) — see
        # pallas_common._norm_advance.
        advance_bridges=(lambda _adv=_norm_advance(advance_bridges):
                         lambda bs, acts, cur=None, aux=None: _adv(
                             bs, acts[0]
                             if (isinstance(acts, tuple) and len(acts) == 1)
                             else acts, cur, aux))(),
    )


def make_fused_sync_rollout(env, n_steps, n_envs, action_mode="random",
                            interpret=False, randomize=None):
    """Universal fused rollout for the synchronous family — all 12
    {Finite,Cont} x {CC,TC,SC} x {PMSM,SynRM} catalog configs.

    Reads every semantic from the env spec: the dq ODE with psi_p = 0
    covering SynRM (permanent_magnet_synchronous_motor.py:107-119,
    synchronous_reluctance_motor.py:117-130), B6 bridge bits (finite,
    converters.py:788-823) or duty u = a*u_sup/2 (cont, converters.py:
    846-881), Park at the cycle-start angle (the reference's stale-epsilon
    quirk, physical_systems.py:487-525), the SquaredConstraint on the dq
    currents, Wiener references on (i_sd*, i_sq*) / torque* / omega* and
    the WSE reward.  CC/TC (ConstantSpeedLoad) keep the 4-mul incremental
    Park rotation; SC adds the PolynomialStaticLoad mechanical ODE to the
    joint RK4 state and evaluates cos/sin(eps) per step (omega varies);
    the OU speed load and the AC1/RC supplies run in-kernel with their
    extra state planes exactly like the DC family (see ``_dc_family``).

    * random mode: ``rollout(seed, *state0) -> (*states, reward_sum,
      term_count, rv, rk, rl, rs)``; states = (omega?, i_sd, i_sq, eps,
      *supply planes).
    * buffer mode: ``rollout(*state0, actions) -> states`` with an int32
      ``(n_steps, R, LANE)`` (finite) or float32 ``(n_steps, 3, R, LANE)``
      (cont) action buffer; deterministic physics only.
    """
    assert n_envs % LANE == 0
    R = n_envs // LANE
    fs = _sync_family(env, R, action_mode, randomize)
    n_state, finite, mech, shape, shape_r = (
        fs.n_state, fs.finite, fs.mech, fs.shape, fs.shape_r)
    n_ref, ref_cfg = fs.n_ref, fs.ref_cfg
    n_rows = fs.n_rows
    bias, violation_reward, i_lim = fs.bias, fs.violation_reward, fs.i_lim
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
            if n_ref == 2:
                wse = wse - _wse_err(ref_cfg[1], ref_quantity(sobs, 1),
                                     refs_now[R:])
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
                                     jnp.ones(shape, jnp.float32), c_new * inv)
                s_ref[:] = jnp.where(violated, zero, s_new * inv)

            w_advance(t, violated)
            if not n_bs:
                return 0
            # converter.reset() on violation: all-off switching states
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
                action = actions_ref[t]
            else:
                action = fs.read_actions(actions_ref, t)
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


def make_fused_foc_rollout(env, ctrl, n_steps, n_envs, ref_mode="wiener",
                           interpret=False):
    """Fused closed-loop FOC rollout for Cont-CC-PMSM-v0: the ENTIRE control
    cycle — tuned PI current controller with EMF decoupling, squared voltage
    clipping with anti-windup, advance-angle dq->abc transform, continuous
    output stage (controllers/controller.py:417-520) — fused with the PMSM
    physics, Wiener current references, WSE reward, squared constraint and
    in-kernel auto-reset.  Round-1 closed-loop baseline (XLA path): 224M
    controlled env-steps/s.

    ``ctrl`` must be ``GemController.make(env, "Cont-CC-PMSM-v0")``; its
    tuned gains are baked into the kernel.

    ``ref_mode='const'``: ``rollout(seed, isd0, isq0, eps0, ref_d, ref_q)``
    holds the (normalized) references fixed at the given planes — the
    closed loop is then deterministic and is compared step-for-step against
    ``ctrl.control_environment`` in tests/test_pallas_rollout.py.
    """
    _require_default_constraints(env)
    assert n_envs % LANE == 0
    assert ctrl.control_task == "CC" and ctrl.output_kind == "cont"
    R = n_envs // LANE
    ps = env.physical_system
    _fused_check_system(ps)
    mp = ps.motor.parameter
    names = list(ps.state_names)
    lim = np.asarray(ps.limits)

    # physics constants (as in make_fused_pmsm_rollout)
    r_s, l_d, l_q = float(mp["r_s"]), float(mp["l_d"]), float(mp["l_q"])
    psi_p, p = float(mp["psi_p"]), float(mp["p"])
    omega = float(_fused_load(ps, ("ConstantSpeedLoad",)).omega_fixed)
    tau = float(ps.tau)
    u_half = 0.5 * _fused_u_sup(ps)
    i_lim = float(lim[names.index("i_sd")])
    margin = float(ps.nominal_state[names.index("i_sd")] / i_lim)
    w_over_span = 0.5 / 2.0
    violation_reward = -1.0 / (1.0 - 0.9)
    p_omega = p * omega

    # tuned controller constants (GemController.make)
    cc_p_d, cc_p_q = (float(x) for x in ctrl.cc_p_gain)
    cc_i_d, cc_i_q = (float(x) for x in ctrl.cc_i_gain)
    clip_d, clip_q = (float(x) for x in np.asarray(ctrl.cc_clip_limits))
    # classic EMF feedforward: u += (l_emf * i[emf_idx] + psi_emf) * omega_el
    # (emf_current_idx = (i_sq, i_sd) for the PMSM)
    l_emf_d, l_emf_q = (float(x) for x in ctrl.l_emf)
    psi_emf_d, psi_emf_q = (float(x) for x in ctrl.psi_emf)
    omega_el = omega * float(ctrl.pole_pairs)
    ref_lim_d, ref_lim_q = (float(x) for x in ctrl.ref_limits)
    out_lim = float(np.asarray(ctrl.output_limits)[0])
    # advance angle uses the MECHANICAL omega (controller.py:452-454)
    adv_dt = float(ctrl.advance_factor) * tau * omega
    # constant-increment rotor-angle rotation + constant advance rotation
    COS_D = np.float32(np.cos(tau * p_omega))
    SIN_D = np.float32(np.sin(tau * p_omega))
    COS_A = np.float32(np.cos(adv_dt))
    SIN_A = np.float32(np.sin(adv_dt))

    shape = (R, LANE)
    shape2 = (2 * R, LANE)
    LN10 = np.float32(np.log(10.0))
    wiener = ref_mode == "wiener"

    def rhs(i_sd, i_sq, u_d, u_q):
        di_sd = (-r_s * i_sd + l_q * p_omega * i_sq + u_d) * (1.0 / l_d)
        di_sq = (-psi_p * p_omega - r_s * i_sq - l_d * p_omega * i_sd + u_q) * (1.0 / l_q)
        return di_sd, di_sq

    def _cycle(i_sd, i_sq, eps, ce, se, integ_d, integ_q, ref_d_n, ref_q_n):
        """One full FOC control cycle: controller then physics."""
        # ---- controller (denormalized quantities)
        err_d = ref_d_n * ref_lim_d - i_sd
        err_q = ref_q_n * ref_lim_q - i_sq
        u_d = cc_p_d * err_d + cc_i_d * integ_d
        u_q = cc_p_q * err_q + cc_i_q * integ_q
        # EMF decoupling (classic): indices swap d<->q currents
        u_d = u_d + (l_emf_d * i_sq + psi_emf_d) * omega_el
        u_q = u_q + (l_emf_q * i_sd + psi_emf_q) * omega_el
        # squared clipping + anti-windup on the integrators
        rel = (u_d / clip_d) ** 2 + (u_q / clip_q) ** 2
        not_clipped = rel < 1.0
        integ_d = integ_d + tau * err_d * not_clipped
        integ_q = integ_q + tau * err_q * not_clipped
        # advance-angle dq->abc on the UNCLIPPED voltage (reference quirk,
        # pi_current_controller.py:160-167); cos/sin(eps + adv_dt) come from
        # the tracked rotation state rotated by the constant advance angle
        c = ce * COS_A - se * SIN_A
        s = se * COS_A + ce * SIN_A
        u_al = c * u_d - s * u_q
        u_be = s * u_d + c * u_q
        ua = u_al
        ub = -0.5 * u_al + np.float32(np.sqrt(3.0) / 2.0) * u_be
        uc = -0.5 * u_al - np.float32(np.sqrt(3.0) / 2.0) * u_be
        # cont output stage + converter: u_phase = clip(u/out_lim) * u_sup/2
        ua = jnp.clip(ua * (1.0 / out_lim), -1.0, 1.0) * u_half
        ub = jnp.clip(ub * (1.0 / out_lim), -1.0, 1.0) * u_half
        uc = jnp.clip(uc * (1.0 / out_lim), -1.0, 1.0) * u_half

        # ---- physics (Park at the cycle-start rotor angle + RK4)
        u_alpha = (2.0 / 3.0) * (ua - 0.5 * (ub + uc))
        u_beta = np.float32(1.0 / np.sqrt(3.0)) * (ub - uc)
        pu_d = ce * u_alpha + se * u_beta
        pu_q = -se * u_alpha + ce * u_beta
        k1 = rhs(i_sd, i_sq, pu_d, pu_q)
        k2 = rhs(i_sd + 0.5 * tau * k1[0], i_sq + 0.5 * tau * k1[1], pu_d, pu_q)
        k3 = rhs(i_sd + 0.5 * tau * k2[0], i_sq + 0.5 * tau * k2[1], pu_d, pu_q)
        k4 = rhs(i_sd + tau * k3[0], i_sq + tau * k3[1], pu_d, pu_q)
        sixth = tau / 6.0
        return (i_sd + sixth * (k1[0] + 2.0 * (k2[0] + k3[0]) + k4[0]),
                i_sq + sixth * (k1[1] + 2.0 * (k2[1] + k3[1]) + k4[1]),
                eps + tau * p_omega, integ_d, integ_q)

    def kernel(seed_ref, isd_ref, isq_ref, eps_ref, rd_ref, rq_ref,
               out_isd, out_isq, out_eps, out_reward, out_terms,
               out_rv, out_rk, out_rl, out_rs,
               rv_ref, rk_ref, rl_ref, rs_ref, rng_ref, igd_ref, igq_ref,
               c_ref, s_ref):
        seed, bits = _make_rng(interpret, rng_ref)
        seed(seed_ref[0])
        out_isd[:] = isd_ref[:]
        out_isq[:] = isq_ref[:]
        out_eps[:] = eps_ref[:]
        c_ref[:] = jnp.cos(eps_ref[:])
        s_ref[:] = jnp.sin(eps_ref[:])
        out_reward[:] = jnp.zeros(shape, jnp.float32)
        out_terms[:] = jnp.zeros(shape, jnp.float32)
        igd_ref[:] = jnp.zeros(shape, jnp.float32)
        igq_ref[:] = jnp.zeros(shape, jnp.float32)

        def _draw_params(mask):
            u1 = _uniform_from_bits(bits(shape2))
            u2 = _uniform_from_bits(bits(shape2))
            rl_ref[:] = jnp.where(mask, jnp.floor(500.0 + 1500.0 * u1), rl_ref[:])
            rs_ref[:] = jnp.where(mask, jnp.exp(LN10 * (-3.0 + 2.0 * u2)), rs_ref[:])

        if wiener:
            u = _uniform_from_bits(bits(shape2))
            rv_ref[:] = (2.0 * u - 1.0) * margin
            rk_ref[:] = jnp.zeros(shape2, jnp.float32)
            _draw_params(jnp.ones(shape2, dtype=jnp.bool_))
        else:
            rv_ref[:] = jnp.concatenate([rd_ref[:], rq_ref[:]], axis=0)
            rk_ref[:] = jnp.zeros(shape2, jnp.float32)
            rl_ref[:] = jnp.full(shape2, 1e9, jnp.float32)
            rs_ref[:] = jnp.zeros(shape2, jnp.float32)

        def body(t, _):
            refs = rv_ref[:]
            c, se_ = c_ref[:], s_ref[:]
            i_sd, i_sq, eps, igd, igq = _cycle(
                out_isd[:], out_isq[:], out_eps[:], c, se_,
                igd_ref[:], igq_ref[:], refs[:R], refs[R:])
            eps = eps - np.float32(TWO_PI) * jnp.floor(eps * np.float32(1.0 / TWO_PI))
            c_new = c * COS_D - se_ * SIN_D
            s_new = se_ * COS_D + c * SIN_D
            inv_cs = jax.lax.rsqrt(c_new * c_new + s_new * s_new)
            c_new = c_new * inv_cs
            s_new = s_new * inv_cs
            igd_ref[:] = igd
            igq_ref[:] = igq

            isd_n = i_sd * (1.0 / i_lim)
            isq_n = i_sq * (1.0 / i_lim)
            violated = (isd_n * isd_n + isq_n * isq_n) > 1.0
            wse = -(w_over_span * jnp.abs(isd_n - refs[:R])
                    + w_over_span * jnp.abs(isq_n - refs[R:]))
            reward = jnp.where(violated, violation_reward, wse)
            out_reward[:] = out_reward[:] + reward
            out_terms[:] = out_terms[:] + violated.astype(jnp.float32)

            zero = jnp.zeros(shape, jnp.float32)
            out_isd[:] = jnp.where(violated, zero, i_sd)
            out_isq[:] = jnp.where(violated, zero, i_sq)
            out_eps[:] = jnp.where(violated, zero, eps)
            c_ref[:] = jnp.where(violated, jnp.ones(shape, jnp.float32), c_new)
            s_ref[:] = jnp.where(violated, zero, s_new)
            # env auto-reset does NOT reset the controller state
            # (control_environment carries cs across episode boundaries)

            if wiener:
                # concat float masks, not bools: Mosaic rejects the i1 vreg
                # cast the bool concat needs when R is not a multiple of the
                # sublane count (small-batch kernels)
                viol_f = violated.astype(jnp.float32)
                reset2 = jnp.concatenate([viol_f, viol_f], axis=0) > 0.5
                u1 = _uniform_from_bits(bits(shape))
                u2 = _uniform_from_bits(bits(shape))
                rad = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
                theta = np.float32(TWO_PI) * u2
                draw = jnp.concatenate(
                    [rad * jnp.cos(theta), rad * jnp.sin(theta)], axis=0)
                regen = (rk_ref[:] >= rl_ref[:]) | reset2
                _draw_params(regen)
                rk_ref[:] = jnp.where(regen, 0.0, rk_ref[:]) + 1.0
                value = jnp.clip(rv_ref[:] + rs_ref[:] * draw, -margin, margin)
                u3 = _uniform_from_bits(bits(shape2))
                rv_ref[:] = jnp.where(reset2, (2.0 * u3 - 1.0) * margin, value)
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)
        out_rv[:] = rv_ref[:]
        out_rk[:] = rk_ref[:]
        out_rl[:] = rl_ref[:]
        out_rs[:] = rs_ref[:]

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shapes = (tuple(jax.ShapeDtypeStruct(shape, jnp.float32) for _ in range(5))
                  + tuple(jax.ShapeDtypeStruct(shape2, jnp.float32) for _ in range(4)))

    @jax.jit
    def rollout(seed, isd0, isq0, eps0, ref_d=None, ref_q=None):
        z = jnp.zeros(shape, jnp.float32)
        ref_d = z if ref_d is None else ref_d
        ref_q = z if ref_q is None else ref_q
        return pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vmem] * 5,
            out_specs=tuple(vmem for _ in range(9)),
            scratch_shapes=(
                [pltpu.VMEM(shape2, jnp.float32) for _ in range(4)]
                + [pltpu.VMEM(shape2, jnp.uint32)]
                + [pltpu.VMEM(shape, jnp.float32) for _ in range(4)]
            ),
            interpret=interpret,
        )(jnp.asarray([seed], jnp.int32), isd0, isq0, eps0, ref_d, ref_q)

    return rollout


