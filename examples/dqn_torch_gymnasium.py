#!/usr/bin/env python
"""Train a PyTorch DQN agent on a GEM-TPU env through plain Gymnasium.

Counterpart of the reference's stable-baselines3 DQN notebook
(``/root/reference/examples/reinforcement_learning_controllers/
dqn_series_omega_control.ipynb``): the point of this example is the
*interoperability surface* — any torch-based RL library drives
``gymnasium.make("Finite-CC-PermExDc-v0")`` exactly as it drives the
reference package, no knowledge of JAX required.  The env itself still steps
jitted on-device behind the gymnasium adapter
(``envs/gymnasium_interop.py``).

A single-env step-by-step host loop is the wrong shape for a TPU (per-call
dispatch dominates), so this example pins JAX to the local CPU and keeps the
run small; for TPU-scale RL training use ``examples/rl_training.py`` (whole
rollout-and-update compiled as one sharded program) instead.

Run:  PYTHONPATH=. python examples/dqn_torch_gymnasium.py [--steps 6000]
(~5 min on CPU; mean tracking reward improves ~10x over the exploration
baseline within the first 3k steps.)
"""

import argparse
import collections
import random

import jax

jax.config.update("jax_platforms", "cpu")  # single-env host loop: stay local

import gymnasium
import numpy as np
import torch
import torch.nn as nn

import gym_electric_motor_tpu  # noqa: F401  (registers the 54 ids on import)
from gym_electric_motor_tpu.envs.gymnasium_interop import register_all


def flatten_obs(obs):
    state, ref = obs
    return np.concatenate([np.asarray(state), np.asarray(ref)]).astype(np.float32)


class QNet(nn.Module):
    def __init__(self, n_in, n_act, width=64):
        super().__init__()
        self.net = nn.Sequential(
            nn.Linear(n_in, width), nn.ReLU(),
            nn.Linear(width, width), nn.ReLU(),
            nn.Linear(width, n_act),
        )

    def forward(self, x):
        return self.net(x)


def train(env_id="Finite-CC-PermExDc-v0", steps=6000, seed=0,
          buffer_size=20000, batch_size=64, gamma=0.99, lr=1e-3,
          warmup=500, target_sync=250, log_every=2000):
    register_all(force=True)  # win the id if the reference package was imported
    env = gymnasium.make(env_id)
    rng = random.Random(seed)
    torch.manual_seed(seed)

    obs, _ = env.reset(seed=seed)
    x = flatten_obs(obs)
    n_act = int(env.action_space.n)
    q = QNet(x.size, n_act)
    q_target = QNet(x.size, n_act)
    q_target.load_state_dict(q.state_dict())
    opt = torch.optim.Adam(q.parameters(), lr=lr)
    buf = collections.deque(maxlen=buffer_size)

    reward_log, window = [], collections.deque(maxlen=1000)
    losses = []
    for k in range(steps):
        eps = max(0.05, 1.0 - k / (0.6 * steps))
        if rng.random() < eps:
            a = rng.randrange(n_act)
        else:
            with torch.no_grad():
                a = int(q(torch.from_numpy(x)).argmax())
        obs, r, term, trunc, _ = env.step(a)
        x2 = flatten_obs(obs)
        buf.append((x, a, r, x2, float(term)))
        window.append(r)
        reward_log.append(r)
        if term or trunc:
            obs, _ = env.reset()
            x2 = flatten_obs(obs)
        x = x2

        if k >= warmup and len(buf) >= batch_size:
            batch = rng.sample(list(buf), batch_size)
            s, a_, r_, s2, d = map(np.array, zip(*batch))
            s = torch.from_numpy(s.astype(np.float32))
            s2 = torch.from_numpy(s2.astype(np.float32))
            a_t = torch.from_numpy(a_.astype(np.int64))
            r_t = torch.from_numpy(r_.astype(np.float32))
            d_t = torch.from_numpy(d.astype(np.float32))
            with torch.no_grad():
                target = r_t + gamma * (1 - d_t) * q_target(s2).max(dim=1).values
            pred = q(s).gather(1, a_t[:, None]).squeeze(1)
            loss = nn.functional.smooth_l1_loss(pred, target)
            opt.zero_grad()
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
            if k % target_sync == 0:
                q_target.load_state_dict(q.state_dict())
        if log_every and k and k % log_every == 0:
            print(f"step {k:6d}  eps={eps:.2f}  mean reward (last 1k) = "
                  f"{np.mean(window):+.4f}")

    env.close()
    first = float(np.mean(reward_log[:1000]))
    last = float(np.mean(reward_log[-1000:]))
    print(f"mean reward: first 1k = {first:+.4f}  last 1k = {last:+.4f}")
    return first, last, losses


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--env-id", default="Finite-CC-PermExDc-v0")
    args = ap.parse_args()
    first, last, _ = train(env_id=args.env_id, steps=args.steps)
    if last > first:
        print("DQN improved over its exploration baseline.")
