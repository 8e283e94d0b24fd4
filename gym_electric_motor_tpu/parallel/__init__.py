"""Multi-chip scale-out: env batches sharded over TPU meshes.

The reference is strictly single-process/single-env
(``/root/reference/src/gym_electric_motor`` contains no multiprocessing or
communication backend); this package is the scale-out layer the TPU build
adds on top: data-parallel env sharding over a ``jax.sharding.Mesh`` with
XLA collectives (psum over ICI) for metric/gradient reduction.
"""

from .sharded import ShardedVectorEnv, make_env_mesh, train_step_reinforce

__all__ = ["ShardedVectorEnv", "make_env_mesh", "train_step_reinforce"]
