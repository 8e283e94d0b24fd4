"""Universal trajectory-recording fused rollouts — every catalog id.

The reducing family kernels (``ops.pallas_rollout``) keep the whole rollout
in VMEM and return only the final state plus metric sums.  This module is
the off-policy / analysis counterpart: ONE generic chunked-grid harness
that records every per-step transition (post-step state, the references
the agent saw, the action, reward, done) to HBM for ALL 54 catalog env ids
(reference behavior: the transition tuple a ``gym_electric_motor`` user
collects from ``env.step`` loops to feed replay-buffer RL,
/root/reference/src/gym_electric_motor/core.py:194-231).

Design (same recipe as ``make_fused_pmsm_record_rollout``):

* sequential grid over ``n_steps // chunk`` time chunks — the TPU grid is
  sequential, so the drive state persists in VMEM scratch across grid
  steps while each chunk's signals stream out through pipelined,
  time-indexed output BlockSpecs;
* the per-step physics/reward/action semantics come from the SAME family
  namespaces (``_dc_family`` .. ``_dfim_family``) the reducing kernels
  alias, so recording and reducing kernels cannot diverge;
* the PRNG is reseeded per grid step with ``seed * n_chunks + pid`` —
  scratch PRNG state is not guaranteed to persist across grid iterations,
  and the stride keeps launches with adjacent root seeds decorrelated.

``make_fused_record_rollout(env, T, N)`` returns ``rollout(seed, *state0)
-> dict`` mapping signal names (family state names incl. any AC1/RC
supply planes, ``ref_*``, ``action*``, ``reward``, ``done``) to
``(T, N // 128, 128)`` arrays.  AC1/RC supplies and the OU speed load
record in-kernel with drawn per-episode reset values, exactly like the
reducing kernels.
``action_mode='buffer'`` gives the deterministic validation path:
``rollout(*state0, actions) -> dict`` of per-step states, matched
step-for-step against the XLA env in tests/test_pallas_record_universal.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_rollout import (
    _pick_chunk,
    FUSED_FAMILY_BUILDERS,
    _wse_err,
    LANE,
    fused_state_arity,
    _ref_needs_wf,
    _dc_family,
    _dfim_family,
    _eesm_family,
    _induction_family,
    _make_rng,
    _make_wiener,
    _step_noise,
    _sync_family,
)
from .pallas_srm import _srm_family

_FAMILY_NAMESPACES = {
    "dc": _dc_family,
    "sync": _sync_family,
    "induction": _induction_family,
    "eesm": _eesm_family,
    "dfim": _dfim_family,
    "srm": _srm_family,
}


def make_fused_record_rollout(env, n_steps, n_envs, chunk=None,
                              action_mode="random", interpret=False):
    """Build the trajectory-recording rollout for any catalog env.

    See the module docstring for semantics.  Every scalar reference kind
    records in-kernel (wiener/laplace/const/waveforms), including
    switched compositions and NESTED switched generators; all TEN motor
    families are covered (incl. the SRM extension).
    """
    assert n_envs % LANE == 0
    R = n_envs // LANE
    family = FUSED_FAMILY_BUILDERS[env.physical_system.motor.kind]
    fs = _FAMILY_NAMESPACES[family](env, R, action_mode)
    n_state, n_ref = fs.n_state, fs.n_ref
    n_rows = getattr(fs, "n_rows", n_ref)
    n_act = len(fs.act_names)
    shape, shape_r = fs.shape, fs.shape_r
    sample = getattr(fs, "sample_actions_t", fs.sample_actions)
    ref_cfg, bias, violation_reward = fs.ref_cfg, fs.bias, fs.violation_reward

    const = pl.BlockSpec((R, LANE), lambda i: (0, 0))

    bds = getattr(fs, "bridge_dtypes",
                  (jnp.int32,) * getattr(fs, "n_bridge", 0))

    if action_mode == "buffer":
        assert not fs.needs_step_noise, (
            "buffer (bit-validation) mode needs deterministic physics; "
            "set the OU load's sigma to 0")
        n_planes = n_state + n_act
        chunk = _pick_chunk(n_steps, n_planes, R, chunk)
        n_chunks = n_steps // chunk
        multi = n_act > 1
        n_prev_b = getattr(fs, "n_bridge", 0)

        def kernel_buf(acts_ref, *refs):
            state0 = refs[:n_state]
            outs = refs[n_state: 2 * n_state]
            state_s = refs[2 * n_state: 2 * n_state + n_state]
            pa_refs = refs[2 * n_state + n_state:]

            @pl.when(pl.program_id(0) == 0)
            def _():
                for ss, s0 in zip(state_s, state0):
                    ss[:] = s0[:]
                for pa, dt in zip(pa_refs, bds):
                    pa[:] = jnp.zeros(shape, dt)

            def body(k, _):
                acts = fs.read_actions(acts_ref, k)
                bs = (tuple(pa[:] for pa in pa_refs)
                      if n_prev_b else None)
                cur = tuple(ss[:] for ss in state_s)
                aux = fs.pre_step(cur)
                state = fs.step(cur, acts, aux, None, bs)
                for i, (ss, s2) in enumerate(zip(state_s, state)):
                    ss[:] = s2
                    outs[i][k] = s2
                if n_prev_b:
                    a_in = acts[0] if len(acts) == 1 else acts
                    for pa, b in zip(pa_refs,
                                     fs.advance_bridges(bs, a_in, cur, aux)):
                        pa[:] = b
                return 0

            jax.lax.fori_loop(0, chunk, body, 0)

        tblk = pl.BlockSpec((chunk, R, LANE), lambda i: (i, 0, 0))
        ablk = (pl.BlockSpec((chunk, n_act, R, LANE),
                             lambda i: (i, 0, 0, 0)) if multi else tblk)
        traj = jax.ShapeDtypeStruct((n_steps, R, LANE), jnp.float32)

        @jax.jit
        def rollout(*args):
            *state0, actions = args
            out = pl.pallas_call(
                kernel_buf,
                grid=(n_chunks,),
                out_shape=(traj,) * n_state,
                in_specs=[ablk] + [const] * n_state,
                out_specs=(tblk,) * n_state,
                scratch_shapes=[pltpu.VMEM(shape, jnp.float32)
                                for _ in range(n_state)]
                + [pltpu.VMEM(shape, dt) for dt in bds],
                interpret=interpret,
            )(actions, *state0)
            return dict(zip(fs.state_names, out))

        rollout.signals = tuple(fs.state_names)
        return rollout

    assert action_mode == "random", action_mode
    names = (tuple(fs.state_names)
             + tuple("ref_" + c["name"] for c in ref_cfg)
             + tuple(fs.act_names) + ("reward", "done"))
    n_sig = len(names)
    chunk = _pick_chunk(n_steps, n_sig, R, chunk)
    n_chunks = n_steps // chunk
    # constant-speed three-phase families carry cos/sin(eps) in scratch and
    # advance them by constant-increment rotation instead of per-step
    # transcendentals (same diet as the reducing kernels, +~20% measured)
    has_rot = getattr(fs, "rot_advance", None) is not None
    has_wf = _ref_needs_wf(ref_cfg)
    # finite converters with RC supply or interlocking carry the half-bridge
    # switching states in scratch across steps AND chunks (see
    # _dc_family.step_physics for the reference citation)
    n_prev = getattr(fs, "n_bridge", 0)

    def kernel(seed_ref, *refs):
        state0 = refs[:n_state]
        outs = refs[n_state: n_state + n_sig]
        out_state = outs[:n_state]
        out_ref = outs[n_state: n_state + n_ref]
        out_act = outs[n_state + n_ref: n_state + n_ref + n_act]
        out_reward, out_done = outs[-2], outs[-1]
        scratch = refs[n_state + n_sig:]
        state_s = scratch[:n_state]
        rv_ref, rk_ref, rl_ref, rs_ref, rng_ref = scratch[n_state:
                                                          n_state + 5]
        j = n_state + 5
        za_ref = zb_ref = c_ref = s_ref = None
        if n_rows == 1:
            za_ref, zb_ref = scratch[j], scratch[j + 1]
            j += 2
        if has_rot:
            c_ref, s_ref = scratch[j], scratch[j + 1]
            j += 2
        if has_wf:
            wf_ref = scratch[j]
            j += 1
        else:
            wf_ref = None
        bs_refs = scratch[j: j + n_prev]

        pid = pl.program_id(0)
        seed, bits = _make_rng(interpret, rng_ref)
        # reseed per chunk (PRNG scratch persistence across grid steps is
        # not guaranteed); stride by n_chunks so adjacent root seeds never
        # share a per-chunk seed
        seed(seed_ref[0] * n_chunks + pid)

        w_init, w_advance = _make_wiener(bits, ref_cfg, R, shape, shape_r,
                                         rv_ref, rk_ref, rl_ref, rs_ref,
                                         za_ref, zb_ref, wf_ref)

        @pl.when(pid == 0)
        def _():
            for ss, s0 in zip(state_s, state0):
                ss[:] = s0[:]
            if has_rot:
                c0, s0_ = fs.rot_init(tuple(s0[:] for s0 in state0))
                c_ref[:] = c0
                s_ref[:] = s0_
            for pa, dt in zip(bs_refs, bds):
                pa[:] = jnp.zeros(shape, dt)
            w_init()

        def body(k, _):
            acts = sample(bits)
            z = _step_noise(fs.needs_step_noise, bits, shape)
            bs = (tuple(pa[:] for pa in bs_refs) if n_prev else None)
            cur = tuple(ss[:] for ss in state_s)
            if has_rot:
                rc, rs = c_ref[:], s_ref[:]
                aux = fs.pre_step_rot(cur, rc, rs)
            else:
                aux = fs.pre_step(cur)
            state = fs.step(cur, acts, aux, z, bs)
            # StateNoiseProcessor: violation/reward and the RECORDED
            # signals see the noisy state; the carried ODE state stays
            # clean (violation steps record the clean reset draw)
            noisy = getattr(fs, "observe", None)
            sobs = noisy(state, bits) if noisy else state
            violated = fs.violated(sobs)
            qs = fs.quantities(sobs, aux)
            refs_now = rv_ref[:]
            wse = bias - _wse_err(ref_cfg[0], qs[0], refs_now[:R])
            for j in range(1, n_ref):
                wse = wse - _wse_err(ref_cfg[j], qs[j],
                                     refs_now[j * R:(j + 1) * R])
            reward = jnp.where(violated, violation_reward, wse)

            for i, (ss, s2, r0) in enumerate(zip(state_s, state,
                                                 fs.reset_state(bits))):
                ss[:] = jnp.where(violated, r0, s2)
                out_state[i][k] = (ss[:] if not noisy
                                   else jnp.where(violated, r0, sobs[i]))
            if n_prev:
                # converter.reset() on violation: all-off switching states
                a_in = acts[0] if len(acts) == 1 else acts
                for pa, b in zip(bs_refs,
                                 fs.advance_bridges(bs, a_in, cur, aux)):
                    pa[:] = jnp.where(violated, 0, b)
            for j in range(n_ref):
                out_ref[j][k] = refs_now[j * R:(j + 1) * R]
            for j, a in enumerate(acts):
                out_act[j][k] = a
            out_reward[k] = reward
            out_done[k] = violated.astype(jnp.float32)

            if has_rot:
                c_new, s_new = fs.rot_advance(rc, rs, violated)
                c_ref[:] = c_new
                s_ref[:] = s_new
            # global step index: the n_ref==1 temporal Box-Muller pairing
            # keys on step parity, which must not restart per chunk
            w_advance(pid * chunk + k, violated)
            return 0

        jax.lax.fori_loop(0, chunk, body, 0)

    tblk = pl.BlockSpec((chunk, R, LANE), lambda i: (i, 0, 0))
    traj_f = jax.ShapeDtypeStruct((n_steps, R, LANE), jnp.float32)
    traj_a = jax.ShapeDtypeStruct((n_steps, R, LANE), fs.act_dtype)
    out_shapes = ((traj_f,) * (n_state + n_ref) + (traj_a,) * n_act
                  + (traj_f, traj_f))
    scratch_shapes = (
        [pltpu.VMEM(shape, jnp.float32) for _ in range(n_state)]
        + [pltpu.VMEM(shape_r, jnp.float32) for _ in range(4)]
        + [pltpu.VMEM(shape_r, jnp.uint32)]
        + ([pltpu.VMEM(shape, jnp.float32) for _ in range(2)]
           if n_rows == 1 else [])
        + ([pltpu.VMEM(shape, jnp.float32) for _ in range(2)]
           if has_rot else [])
        + ([pltpu.VMEM((4 * n_rows * R, LANE), jnp.float32)]
           if has_wf else [])
        + [pltpu.VMEM(shape, dt) for dt in bds]
    )

    @jax.jit
    def rollout(seed, *state0):
        out = pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [const] * n_state,
            out_specs=(tblk,) * n_sig,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(jnp.asarray([seed], jnp.int32), *state0)
        return dict(zip(names, out))

    rollout.signals = names
    return rollout


def make_sharded_record_rollout(env, n_steps, n_envs, mesh, chunk=None,
                                interpret=False):
    """Recorder x device mesh: the env batch rides ``P('env')`` over
    ``mesh`` and ONE recording kernel streams each device's local shard to
    its own HBM — multi-chip off-policy data collection with zero
    cross-device traffic (trajectories stay device-local, sharded
    ``P(None, 'env')`` along the env-row axis, ready for a sharded
    replay consumer).

    ``rollout(seed, *state_planes) -> dict`` of ``(n_steps, n_envs // 128,
    128)`` arrays; per-device seeds decorrelate by folding in the mesh
    position with the same stride scheme the reducing sharded wrapper uses.
    """
    from functools import partial as _partial

    from jax.sharding import NamedSharding, PartitionSpec as _P

    from .pallas_rollout import _resolve_shard_map

    _shard_map = _resolve_shard_map()
    (axis,) = mesh.axis_names
    n_dev = mesh.size
    assert n_envs % (n_dev * LANE) == 0
    local_envs = n_envs // n_dev
    local = make_fused_record_rollout(env, n_steps, local_envs, chunk=chunk,
                                      interpret=interpret)
    names = local.signals
    n_state = fused_state_arity(env)
    spec_t = _P(None, axis)   # (T, R, LANE): env rows sharded over devices
    spec_s = _P(axis)         # (R, LANE) state planes

    @_partial(_shard_map, mesh=mesh,
              in_specs=(_P(),) + (spec_s,) * n_state,
              out_specs=(spec_t,) * len(names),
              check_vma=False)
    def run(seed, *planes):
        dev_seed = seed[0] * jnp.int32(n_dev) + jax.lax.axis_index(axis)
        out = local(dev_seed, *planes)
        return tuple(out[nm] for nm in names)

    shard = NamedSharding(mesh, spec_s)

    @jax.jit
    def rollout(seed, *planes):
        planes = tuple(jax.device_put(x, shard) for x in planes)
        out = run(jnp.asarray([seed], jnp.int32), *planes)
        return dict(zip(names, out))

    rollout.signals = names
    return rollout
