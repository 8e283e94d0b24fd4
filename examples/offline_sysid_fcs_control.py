#!/usr/bin/env python
"""Offline system identification + finite-control-set control from fused replay.

The trajectory-recording rollout kernel
(``ops.pallas_rollout.make_fused_pmsm_record_rollout``) streams full
per-step transition records — state, rotor angle, references, action,
reward, done — to HBM at ~5 B transitions/s on one TPU chip. This example
closes the offline data->controller loop on that data:

  1. collect:  ONE kernel launch under the uniform-random behavior policy
               records hundreds of millions of transitions
  2. identify: the discrete-time PMSM current dynamics are exactly linear
               in [i_sd, i_sq, cos(eps)*u(a), sin(eps)*u(a), 1], so a
               per-action least-squares fit recovers the one-step map to
               float32 precision (residual ~1e-6) — pure data-driven, no
               motor parameters used
  3. deploy:   finite-control-set predictive control (FCS-MPC, horizon 1):
               per step, predict i_dq' for all 8 inverter vectors with the
               IDENTIFIED model and apply the argmin of the predicted
               reference error — the data-driven cousin of the reference's
               MPC notebooks (/root/reference/examples/
               model_predictive_controllers/)
  4. evaluate: vectorized closed-loop rollout vs the random baseline.

Measured (CPU smoke config, 256 envs x 2048 recorded steps): the
identified controller reaches ~ -0.024 reward/step with ZERO constraint
violations vs -0.20 for the random policy — an 8x tracking improvement
learned entirely from recorded data.

A cautionary counterpoint worth knowing: model-free Q-learning on this
dataset does NOT produce a useful greedy policy — at tau = 1e-5 the
one-step action gap in Q is ~0.006 reward while an offline-trained Q net
plateaus at ~0.04 residual, so the argmax is noise. Identifying the
(linear) model and planning through it extracts the signal the Q
regression cannot.

Run:  PYTHONPATH=.:$PYTHONPATH python examples/offline_sysid_fcs_control.py        # TPU
      PYTHONPATH=.:$PYTHONPATH python examples/offline_sysid_fcs_control.py --cpu  # small
(append, don't clobber: the default PYTHONPATH carries the TPU plugin path)
"""

import argparse
import sys

import jax

if "--cpu" in sys.argv:
    # must run before the first array op (the axon sitecustomize ignores
    # the JAX_PLATFORMS env var; the config route works)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.ops.pallas_rollout import (
    make_fused_pmsm_record_rollout,
)

ENV_ID = "Finite-CC-PMSM-v0"
N_ACTIONS = 8


# ---------------------------------------------------------------------------
# 1. collect transitions with the recording kernel
# ---------------------------------------------------------------------------


def collect_dataset(env, n_envs, n_steps, seed=0, interpret=False):
    """Record a rollout and return flat (M, ...) transition arrays.

    ``obs``/``next_obs`` columns: [i_sd_n, i_sq_n, cos(eps), sin(eps),
    ref_d, ref_q] — state entering the step (post-autoreset values from the
    previous record; zeros at t=0) with the reference the step's reward was
    computed against.
    """
    ps = env.physical_system
    names = list(ps.state_names)
    i_lim = float(np.asarray(ps.limits)[names.index("i_sd")])

    roll = make_fused_pmsm_record_rollout(env, n_steps, n_envs,
                                          interpret=interpret)
    z = jnp.zeros((n_envs // 128, 128), jnp.float32)
    isd, isq, eps, rd, rq, act, rew, done = roll(seed, z, z, z)

    T = n_steps
    flat = lambda x: np.asarray(x).reshape(T, -1)  # noqa: E731
    isd, isq, eps = flat(isd) / i_lim, flat(isq) / i_lim, flat(eps)
    rd, rq = flat(rd), flat(rq)
    act, rew, done = flat(act), flat(rew), flat(done)

    def obs_at(sd, sq, ep, d, q):
        return np.stack([sd, sq, np.cos(ep), np.sin(ep), d, q],
                        axis=-1).astype(np.float32)

    sd_in = np.concatenate([np.zeros_like(isd[:1]), isd[:-1]], axis=0)
    sq_in = np.concatenate([np.zeros_like(isq[:1]), isq[:-1]], axis=0)
    ep_in = np.concatenate([np.zeros_like(eps[:1]), eps[:-1]], axis=0)
    obs = obs_at(sd_in, sq_in, ep_in, rd, rq)
    next_obs = obs_at(isd[:-1], isq[:-1], eps[:-1], rd[1:], rq[1:])

    m = lambda x: x[:-1].reshape(-1)  # noqa: E731
    return dict(
        obs=obs[:-1].reshape(-1, 6),
        next_obs=next_obs.reshape(-1, 6),
        action=m(act).astype(np.int32),
        reward=m(rew).astype(np.float32),
        done=m(done).astype(np.float32),
    )


# ---------------------------------------------------------------------------
# 2. identify the per-action one-step current map by least squares
# ---------------------------------------------------------------------------


def identify_model(data):
    """Fit [i_sd', i_sq'] = W_a @ [i_sd, i_sq, cos eps, sin eps, 1] per
    inverter vector a. Returns (W, max_residual): W shaped
    (N_ACTIONS, 2, 5). Autoreset transitions are excluded (their next
    state is the reset distribution, not the dynamics)."""
    ok = data["done"] < 0.5
    obs, nxt, act = data["obs"][ok], data["next_obs"][ok], data["action"][ok]
    X = np.concatenate([obs[:, :4], np.ones((len(obs), 1), np.float32)],
                       axis=1)
    Y = nxt[:, :2]
    W = np.zeros((N_ACTIONS, 2, 5), np.float32)
    worst = 0.0
    for a in range(N_ACTIONS):
        m = act == a
        sol, *_ = np.linalg.lstsq(X[m], Y[m], rcond=None)
        W[a] = sol.T
        worst = max(worst, float(np.abs(X[m] @ sol - Y[m]).max()))
    return W, worst


# ---------------------------------------------------------------------------
# 3+4. FCS-MPC policy through the identified model + closed-loop evaluation
# ---------------------------------------------------------------------------


def make_fcs_policy(W):
    # keep W as host numpy: a device-array closure constant would need a
    # device->host read-back at trace time (see tests/test_no_device_constants)
    W = np.asarray(W)

    def policy(obs, key):
        sf, refs = obs
        # state_filter columns: omega, i_sd, i_sq, epsilon (normalized;
        # the actual angle is epsilon_n * pi)
        eps = sf[:, 3:4] * jnp.pi
        x = jnp.concatenate([sf[:, 1:3], jnp.cos(eps), jnp.sin(eps),
                             jnp.ones_like(eps)], axis=-1)
        pred = jnp.einsum("aos,ns->nao", W, x)  # (N, actions, [i_sd', i_sq'])
        err = (jnp.abs(pred[..., 0] - refs[:, :1])
               + jnp.abs(pred[..., 1] - refs[:, 1:2]))
        return jnp.argmin(err, axis=-1)

    return policy


def evaluate(env, policy, n_envs=256, n_steps=2000, seed=0):
    """Mean per-step reward (and violation count) of ``policy`` rolled out
    with VectorEnv inside one compiled program; None = uniform random."""
    venv = gemx.VectorEnv(env, n_envs)
    if policy is None:
        def policy(obs, key):  # noqa: F811
            return jax.random.randint(key, (n_envs,), 0, N_ACTIONS)
    state, _ = venv.reset(jax.random.PRNGKey(seed))
    state, rewards, terms = venv.rollout(state, policy, n_steps,
                                         jax.random.PRNGKey(seed + 1))
    return float(rewards.sum()) / (n_envs * n_steps), float(terms.sum())


def run(n_envs=16384, n_steps=2048, interpret=False, seed=0):
    # 16k envs x 2048 steps = 33.5M transitions (~1 GB fetched to host);
    # the kernel itself sustains ~5 B transitions/s — the host fetch and
    # least-squares are the wall-clock here, so collect only what the fit
    # needs (it is exact already at a few hundred k transitions)
    env = gemx.make_functional(
        ENV_ID, state_filter=("omega", "i_sd", "i_sq", "epsilon"))
    data = collect_dataset(env, n_envs, n_steps, seed=seed,
                           interpret=interpret)
    W, residual = identify_model(data)
    base, _ = evaluate(env, None, seed=seed)
    ctrl, violations = evaluate(env, make_fcs_policy(W), seed=seed)
    return dict(residual=residual, random_reward=base, fcs_reward=ctrl,
                violations=violations, n_transitions=len(data["obs"]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="small interpret-mode run on the local CPU")
    args = ap.parse_args()
    if args.cpu:
        out = run(n_envs=256, n_steps=2048, interpret=True)
    else:
        out = run()
    print(f"transitions recorded      : {out['n_transitions']:,}")
    print(f"model max |residual|      : {out['residual']:.2e}")
    print(f"random policy reward      : {out['random_reward']:.4f}/step")
    print(f"identified FCS controller : {out['fcs_reward']:.4f}/step "
          f"({out['violations']:.0f} violations)")


if __name__ == "__main__":
    main()
