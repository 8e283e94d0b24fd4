"""Fused Pallas rollouts — import facade + universal dispatch.

The XLA path (vmap + scan) executes ~100 small VPU ops per env step with the
state bouncing through HBM every scan iteration — measured at ~59M
env-steps/s on one v5e chip.  The fused kernels run the ENTIRE rollout
inside one ``pallas_call``: every state variable lives in VMEM for all T
steps, random numbers come from the on-core PRNG (``pltpu.prng_seed`` /
``prng_random_bits``), and the only HBM traffic is the initial/final state
(plus, for the recorders, the streamed per-step signals).

The kernels live in per-family modules (split out of this former monolith):

  ``pallas_common``     shared PRNG / supply / load / converter / reference
                        machinery every family kernel builds on
  ``pallas_dc``         PermExDc + Series/Shunt SC + universal DC family
                        + the speed-cascade-in-the-loop kernel
  ``pallas_sync``       PMSM/SynRM + universal sync family + fused FOC loop
  ``pallas_induction``  SCIM + universal induction family
  ``pallas_eesm``       EESM + universal EESM family
  ``pallas_dfim``       DFIM + universal DFIM family
  ``pallas_policy``     policy-in-the-loop kernels (eval / record / train)

This module re-exports every name (the stable import surface) and holds the
universal dispatch: ``make_fused_rollout`` routes any of the 54 catalog env
ids to its family builder; ``make_sharded_fused_rollout`` runs any family
kernel per-device over a ``jax.sharding.Mesh``.

All kernels are validated in tests/test_pallas_*.py: deterministic physics
bit-level against the XLA env (buffer-action / const-ref modes), and the
stochastic parts (references, sub-episode regeneration, in-kernel
auto-reset) statistically via the interpret-mode xorshift bit source (see
``pallas_common._make_rng``) against the XLA env at matched config.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_common import (  # noqa: F401
    _pick_chunk,
    _policy_obs_spec,
    LANE,
    TWO_PI,
    _FUSED_OK_WRAPPERS,
    _FUSED_REF_KINDS,
    _WF_KINDS,
    _c2i,
    _c2u,
    _expand_ref_rows,
    _fused_check_system,
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
    _ref_configs,
    _ref_n_rows,
    _ref_needs_wf,
    _resolve_shard_map,
    _rotation_protocol,
    _step_noise,
    _uniform_from_bits,
    _wse_err,
)
from .pallas_srm import (  # noqa: F401
    _srm_family,
    make_fused_srm_cascade_rollout,
    make_fused_srm_rollout,
)
from .pallas_sync import (  # noqa: F401
    _PmsmCtx,
    _sync_family,
    make_fused_foc_rollout,
    make_fused_pmsm_record_rollout,
    make_fused_pmsm_rollout,
    make_fused_sync_rollout,
)
from .pallas_dc import (  # noqa: F401
    _PermExCtx,
    _dc_family,
    make_fused_dc_cascade_rollout,
    make_fused_dc_rollout,
    make_fused_dc_sc_rollout,
    make_fused_permex_record_rollout,
    make_fused_permex_rollout,
)
from .pallas_induction import (  # noqa: F401
    _induction_family,
    make_fused_induction_rollout,
    make_fused_scim_rollout,
)
from .pallas_eesm import (  # noqa: F401
    _eesm_family,
    make_fused_eesm_family_rollout,
    make_fused_eesm_rollout,
)
from .pallas_dfim import (  # noqa: F401
    _dfim_family,
    make_fused_dfim_family_rollout,
    make_fused_dfim_rollout,
)
from .pallas_policy import (  # noqa: F401
    fused_policy_init_planes,
    make_fused_policy_record_universal,
    policy_act_ns,
    policy_obs_dim,
    policy_obs_host,
    _policy_pmsm_ctx,
    flatten_policy_params,
    make_fused_policy_record_rollout,
    make_fused_policy_rollout,
    make_fused_reinforce_rollout,
    make_fused_reinforce_trainer,
    unflatten_policy_grads,
)


FUSED_FAMILY_BUILDERS = {
    "PermExDc": "dc", "SeriesDc": "dc", "ShuntDc": "dc", "ExtExDc": "dc",
    "PMSM": "sync", "SynRM": "sync",
    "SCIM": "induction",
    "EESM": "eesm", "DFIM": "dfim",
    "SRM": "srm",
}


def fused_state_arity(env, randomize=None):
    """Number of ``(R, LANE)`` state planes the universal fused rollout for
    ``env`` takes/returns: omega for dynamic-speed (poly/OU load) configs,
    plus two supply planes for AC1/RC supply modes ((phi, t) / (u_sup, t)
    — see ``_make_fused_supply``), plus one plane per domain-randomized
    motor parameter (``randomize`` — DC family, see ``_dc_family``)."""
    ps = env.physical_system
    kind = ps.motor.kind
    mech = 1 if ps.load.omega_fixed is None else 0
    base = {"PermExDc": 1, "SeriesDc": 1, "ShuntDc": 2, "ExtExDc": 2,
            "PMSM": 3, "SynRM": 3, "SCIM": 4, "EESM": 4, "DFIM": 5,
            "SRM": 4}[kind]
    sup = (2 if ps.supply.kind in ("AC1PhaseSupply", "AC3PhaseSupply",
                                   "RCVoltageSupply") else 0)
    # SCIM/DFIM psi_angle dq wrappers carry the flux observer as 2 planes
    obspsi, cur = 0, ps
    while hasattr(cur, "inner"):
        nm = type(cur).__name__
        if ((nm == "DqToAbcActionProcessor"
             and getattr(cur, "_angle_name", "") == "psi_angle")
                or nm == "_DFIMDqToAbcActionProcessor"):
            obspsi = 2
        cur = cur.inner
    return base + mech + sup + len(randomize or ()) + obspsi


def make_fused_rollout(env, n_steps, n_envs, action_mode="random",
                       interpret=False, randomize=None):
    """Universal fused-rollout dispatch: every one of the 54 catalog env
    ids (9 motors x {Finite,Cont} x {CC,TC,SC}) gets its family's
    VMEM-resident Pallas kernel, with all semantics read from the env spec.

    Returns the family rollout (see the family builders for signatures);
    the number of state planes is ``fused_state_arity(env)``.  Every
    scalar reference kind runs in-kernel (wiener / laplace / const /
    sinusoidal / step / triangle / sawtooth — AND switched compositions),
    as do interlocking dead time, AC1/RC supplies, the OU and
    ExternalSpeedLoad speed loads and the DeadTimeProcessor action delay.
    All TEN motor families are fused — including the SRM extension
    (upstream stubs it with NotImplementedError).  Raises
    ``NotImplementedError``/``AssertionError`` for the remaining
    non-fused configurations (reward_power != 1, >3 referenced states,
    non-catalog constraint sets): those run on the general XLA path.
    """
    family = FUSED_FAMILY_BUILDERS[env.physical_system.motor.kind]
    build = {
        "dc": make_fused_dc_rollout,
        "sync": make_fused_sync_rollout,
        "induction": make_fused_induction_rollout,
        "eesm": make_fused_eesm_family_rollout,
        "dfim": make_fused_dfim_family_rollout,
        "srm": make_fused_srm_rollout,
    }[family]
    if randomize:
        return build(env, n_steps, n_envs, action_mode=action_mode,
                     interpret=interpret, randomize=randomize)
    return build(env, n_steps, n_envs, action_mode=action_mode,
                 interpret=interpret)


def make_sharded_fused_rollout(env, n_steps, n_envs, mesh, kernel="pmsm",
                               interpret=False):
    """Fused kernel x device mesh: the env batch is laid out ``P('env')``
    over ``mesh`` and ONE fused rollout kernel runs per device on its local
    shard — the multi-chip execution mode of the fast path (each chip
    simulates its (n_envs / n_dev) envs fully on-core; the only collective
    is a final psum of the reward/termination sums).

    ``kernel`` selects the family: ``'pmsm'`` (also covers SynRM),
    ``'permex'``, ``'dc_sc'`` (SeriesDc/ShuntDc SC — state count follows the
    motor), ``'scim'``, ``'eesm'``, ``'dfim'``, or ``'auto'`` — the
    universal dispatch (``make_fused_rollout``) covering all 54 catalog
    ids.  Returns
    ``rollout(seed, *state_planes) -> (local outputs...,
    global_reward_sum, global_term_count)``; per-device seeds are
    decorrelated by folding in the mesh position.
    """
    from functools import partial as _partial

    from jax.sharding import NamedSharding, PartitionSpec as _P

    _shard_map = _resolve_shard_map()

    builders = {
        "pmsm": (make_fused_pmsm_rollout, 3),
        "permex": (make_fused_permex_rollout, 1),
        "dc_sc": (make_fused_dc_sc_rollout,
                  2 if env.physical_system.motor.kind == "SeriesDc" else 3),
        "scim": (make_fused_scim_rollout, 4),
        "eesm": (make_fused_eesm_rollout, 4),
        "dfim": (make_fused_dfim_rollout, 5),
        "srm": (make_fused_srm_rollout, fused_state_arity(env)),
        # the universal dispatch — any of the catalog ids (incl. SRM)
        "auto": (make_fused_rollout, fused_state_arity(env)),
    }
    build, n_state = builders[kernel]
    (axis,) = mesh.axis_names
    n_dev = mesh.size
    assert n_envs % (n_dev * LANE) == 0
    local_envs = n_envs // n_dev
    local = build(env, n_steps, local_envs, action_mode="random",
                  interpret=interpret)
    spec = _P(axis)

    # count the kernel's outputs (states..., reward, terms, wiener debug...)
    local_shape = (local_envs // LANE, LANE)
    abstract = [jax.ShapeDtypeStruct((), jnp.int32)] + [
        jax.ShapeDtypeStruct(local_shape, jnp.float32) for _ in range(n_state)
    ]
    n_out = len(jax.eval_shape(lambda se, *a: local(se, *a), *abstract))

    @_partial(_shard_map, mesh=mesh,
              in_specs=(_P(),) + (spec,) * n_state,
              out_specs=(spec,) * n_out + (_P(), _P()),
              check_vma=False)
    def run(seed, *planes):
        dev_seed = seed[0] * jnp.int32(n_dev) + jax.lax.axis_index(axis)
        out = local(dev_seed, *planes)
        reward, terms = out[n_state], out[n_state + 1]
        r_sum = jax.lax.psum(jnp.sum(reward), axis)[None]
        t_sum = jax.lax.psum(jnp.sum(terms), axis)[None]
        return tuple(out) + (r_sum, t_sum)

    shard = NamedSharding(mesh, spec)

    @jax.jit
    def rollout(seed, *planes):
        planes = tuple(jax.device_put(x, shard) for x in planes)
        return run(jnp.asarray([seed], jnp.int32), *planes)

    return rollout
