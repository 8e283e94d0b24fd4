"""Sharded vectorized environments.

Design (cf. SURVEY.md §5): each env is independent, so the only parallelism
axis with reference semantics to preserve is **data-parallel env sharding**.
The env batch is laid out ``P('env')`` over a 1-D mesh; per-shard actions are
produced locally; the only cross-chip communication is

* ``psum`` of scalar metrics (reward sums, violation counts) and
* ``psum`` of policy gradients in the training step,

both riding ICI inside a slice.  Per-env PRNG keys make trajectories
independent of shard placement (tests/test_seeding.py::test_batch_position_
invariance; the multi-chip equivalence is tested in tests/test_parallel.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_env_mesh(n_devices=None, devices=None, axis_name="env"):
    """1-D mesh over ``n_devices`` (default: all local devices)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


class ShardedVectorEnv:
    """``n_envs`` lockstep envs sharded ``P('env')`` over a mesh.

    The counterpart of :class:`~gym_electric_motor_tpu.core.VectorEnv` for
    multi-chip execution.  ``n_envs`` must be divisible by the mesh size.
    """

    def __init__(self, env, n_envs: int, mesh: Mesh | None = None):
        self.env = env
        self.mesh = mesh if mesh is not None else make_env_mesh()
        (self.axis_name,) = self.mesh.axis_names
        if n_envs % self.mesh.size != 0:
            raise ValueError(f"n_envs={n_envs} not divisible by mesh size {self.mesh.size}")
        self.n_envs = n_envs
        spec = P(self.axis_name)
        self._shard = NamedSharding(self.mesh, spec)

        vreset = jax.vmap(env.reset)
        vstep = jax.vmap(env.step_autoreset)

        @partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(spec,),
            out_specs=(spec, (spec, spec)),
            check_vma=False,
        )
        def reset_shard(keys):
            return vreset(keys)

        @partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(spec, spec),
            out_specs=(spec, (spec, spec), spec, spec, P(), P()),
            check_vma=False,
        )
        def step_shard(state, actions):
            state, obs, reward, term = vstep(state, actions)
            # metric reduction over ICI — the only cross-chip traffic
            reward_sum = jax.lax.psum(jnp.sum(reward), self.axis_name)
            term_sum = jax.lax.psum(jnp.sum(term.astype(jnp.int32)), self.axis_name)
            return state, obs, reward, term, reward_sum, term_sum

        self._reset = jax.jit(reset_shard)
        self._step = jax.jit(step_shard)

    def reset(self, key):
        keys = jax.device_put(
            jax.random.split(key, self.n_envs), self._shard
        )
        return self._reset(keys)

    def step(self, state, actions):
        return self._step(state, actions)

    def rollout(self, state, policy_fn, n_steps: int, key=None):
        """Scan ``n_steps`` inside one jitted program; returns final state and
        per-step global reward/termination sums."""
        spec = P(self.axis_name)
        vstep = jax.vmap(self.env.step_autoreset)
        filt = jnp.asarray(self.env._state_filter)
        axis = self.axis_name

        @partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(spec, P()),
            out_specs=(spec, P(), P()),
            check_vma=False,
        )
        def run(state, key):
            idx = jax.lax.axis_index(axis)

            def body(carry, _):
                state, k = carry
                k, k_act = jax.random.split(k)
                obs = (
                    state.system_state[:, filt],
                    jax.vmap(self.env.reference_generator.current_values)(state.refs),
                )
                actions = policy_fn(obs, k_act)
                state, _obs, reward, term = vstep(state, actions)
                r = jax.lax.psum(jnp.sum(reward), axis)
                t = jax.lax.psum(jnp.sum(term.astype(jnp.int32)), axis)
                return (state, k), (r, t)

            key = jax.random.fold_in(key, idx)
            (state, _), (rewards, terms) = jax.lax.scan(body, (state, key), None, length=n_steps)
            return state, rewards, terms

        key = key if key is not None else jax.random.PRNGKey(0)
        return jax.jit(run)(state, key)


# ---------------------------------------------------------------------------
# Training step (demonstrates the full dp-over-envs sharding with gradient
# collectives — used by __graft_entry__.dryrun_multichip)
# ---------------------------------------------------------------------------


def init_policy_params(key, obs_dim, n_actions, hidden=32, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "w1": jax.random.normal(k1, (obs_dim, hidden), dtype) * 0.1,
        "b1": jnp.zeros((hidden,), dtype),
        "w2": jax.random.normal(k2, (hidden, n_actions), dtype) * 0.1,
        "b2": jnp.zeros((n_actions,), dtype),
    }


def policy_logits(params, obs):
    h = jnp.tanh(obs @ params["w1"] + params["b1"])
    return h @ params["w2"] + params["b2"]


def _build_reinforce_step(env, mesh, lr):
    (axis,) = mesh.axis_names
    spec = P(axis)
    vstep = jax.vmap(env.step_autoreset)
    filt = jnp.asarray(env._state_filter)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), spec, P()),
        out_specs=(P(), spec, P()),
        check_vma=False,
    )
    def step(params, state, key):
        idx = jax.lax.axis_index(axis)
        key = jax.random.fold_in(key, idx)
        obs = jnp.concatenate(
            [
                state.system_state[:, filt],
                jax.vmap(env.reference_generator.current_values)(state.refs),
            ],
            axis=-1,
        )

        def loss_fn(params):
            logits = policy_logits(params, obs)
            actions = jax.random.categorical(key, logits)
            logp = jax.nn.log_softmax(logits)[jnp.arange(obs.shape[0]), actions]
            new_state, _o, reward, _t = vstep(state, actions)
            loss = -jnp.mean(jax.lax.stop_gradient(reward) * logp)
            return loss, (new_state, jnp.mean(reward))

        ((_loss, (new_state, mean_r)), grads) = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        grads = jax.lax.pmean(grads, axis)
        mean_r = jax.lax.pmean(mean_r, axis)
        params = jax.tree.map(lambda p_, g: p_ - lr * g, params, grads)
        return params, new_state, mean_r

    return step


def make_reinforce_train_step(env, mesh, lr=1e-3):
    """Build the jitted REINFORCE step once (``train_step_reinforce``
    re-jits per call — fine for a single dry-run, wasteful in a training
    loop).  Returns ``step(params, state, key) -> (params', state',
    mean_reward)``."""
    return jax.jit(_build_reinforce_step(env, mesh, lr))


def make_reinforce_trainer(env, mesh, lr=1e-3):
    """Whole-training-run compilation: ``train(params, state, key, n_iters)``
    scans the REINFORCE step over ``n_iters`` inside ONE jitted program —
    one dispatch for the entire run, the canonical TPU pattern (no per-step
    host round trips at all).  Returns (params', state', mean_reward[n_iters])."""
    step = _build_reinforce_step(env, mesh, lr)

    @partial(jax.jit, static_argnums=3)
    def train(params, state, key, n_iters):
        def body(carry, _):
            params, state, key = carry
            key, k = jax.random.split(key)
            params, state, mean_r = step(params, state, k)
            return (params, state, key), mean_r

        (params, state, _), rs = jax.lax.scan(
            body, (params, state, key), None, length=n_iters)
        return params, state, rs

    return train


def train_step_reinforce(env, mesh, params, state, key, lr=1e-3):
    """One REINFORCE step over a sharded env batch.

    Shardings: env state/obs ``P('env')`` (dp), policy params replicated;
    gradients are psum-reduced over the mesh before the SGD update, so the
    update is identical on every chip.  Returns (params', state', loss).
    """
    (axis,) = mesh.axis_names
    spec = P(axis)
    vstep = jax.vmap(env.step_autoreset)
    filt = jnp.asarray(env._state_filter)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), spec, P()),
        out_specs=(P(), spec, P()),
        check_vma=False,
    )
    def step(params, state, key):
        idx = jax.lax.axis_index(axis)
        key = jax.random.fold_in(key, idx)

        obs = jnp.concatenate(
            [
                state.system_state[:, filt],
                jax.vmap(env.reference_generator.current_values)(state.refs),
            ],
            axis=-1,
        )

        def loss_fn(params):
            logits = policy_logits(params, obs)
            actions = jax.random.categorical(key, logits)
            logp = jax.nn.log_softmax(logits)[jnp.arange(obs.shape[0]), actions]
            new_state, _o, reward, _t = vstep(state, actions)
            # REINFORCE surrogate; stop_gradient on the reward signal
            loss = -jnp.mean(jax.lax.stop_gradient(reward) * logp)
            return loss, (new_state, actions)

        (loss, (new_state, _a)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return params, new_state, loss

    return jax.jit(step)(params, state, key)
