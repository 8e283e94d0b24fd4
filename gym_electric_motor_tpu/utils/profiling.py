"""Profiling and checkpoint helpers.

The reference has no tracing/profiling subsystem (SURVEY §5); the TPU build
gets the native JAX equivalents:

* :func:`trace` — a context manager around ``jax.profiler`` writing a
  TensorBoard/XProf trace of everything executed inside it.
* :func:`save_checkpoint` / :func:`load_checkpoint` — env/controller state
  is an explicit pytree, so checkpoint/resume is a plain pytree round-trip
  (orbax when available, a numpy archive otherwise).
"""

from __future__ import annotations

import contextlib
import os

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir="/tmp/gemx_trace"):
    """Capture a device trace of the enclosed block::

        with profiling.trace("/tmp/rollout_trace"):
            state, rewards, terms = venv.rollout(state, policy, 1000)
            jax.block_until_ready(rewards)

    View with TensorBoard (profile plugin) or xprof.  Remember to block on
    the results inside the block — dispatch is async.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def save_checkpoint(path, tree):
    """Persist any pytree (env state, policy params, controller state).

    Uses orbax if importable, else a flat ``.npz`` archive with the treedef
    stored alongside."""
    tree = jax.device_get(tree)
    try:
        import orbax.checkpoint as ocp

        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(os.path.abspath(path), tree, force=True)
        return path
    except Exception:
        # orbax absent — or unable to store this tree (e.g. it rejects the
        # zero-size conv_state leaves of continuous converters)
        leaves, treedef = jax.tree.flatten(tree)
        np.savez(path if path.endswith(".npz") else path + ".npz",
                 __treedef__=np.frombuffer(repr(treedef).encode(), dtype=np.uint8),
                 **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)})
        return path


def load_checkpoint(path, like=None):
    """Restore a pytree saved by :func:`save_checkpoint`.

    ``like``: an example pytree with the target structure — required for the
    npz fallback (and recommended for orbax restore typing)."""
    try:
        import orbax.checkpoint as ocp

        if os.path.isdir(path):
            ckpt = ocp.PyTreeCheckpointer()
            if like is not None:
                return ckpt.restore(os.path.abspath(path), item=jax.device_get(like))
            return ckpt.restore(os.path.abspath(path))
    except ImportError:
        pass
    npz_path = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz_path)
    leaves = [data[f"leaf_{i}"] for i in range(sum(1 for k in data.files
                                                  if k.startswith("leaf_")))]
    if like is None:
        raise ValueError("npz restore needs `like=` (an example pytree)")
    treedef = jax.tree.structure(like)
    return jax.tree.unflatten(treedef, leaves)
