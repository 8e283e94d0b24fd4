"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so that the multi-chip
sharding path (``jax.sharding.Mesh`` over the env axis) can be validated
without TPU pod hardware, mirroring how the driver dry-runs
``__graft_entry__.dryrun_multichip``.
"""

import os
import sys

# Must be set before jax initializes its backends.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_parallel_codegen_split_count" not in _flags:
    # XLA-CPU's parallel LLVM codegen intermittently aborts in this image;
    # serializing codegen trades a little compile time for stability.
    _flags += " --xla_cpu_parallel_codegen_split_count=1"
if "xla_cpu_max_isa" not in _flags:
    # XLA-CPU JIT intermittently segfaults on this host's AMX/AVX512 paths;
    # capping the ISA avoids the crashy codegen.
    _flags += " --xla_cpu_max_isa=AVX2"
os.environ["XLA_FLAGS"] = _flags.strip()

import jax  # noqa: E402

# The axon TPU tunnel (sitecustomize in this image) force-registers itself as
# the default platform; override it so tests run on the local CPU backend with
# the 8 virtual devices requested above.
jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402

REFERENCE_SRC = "/root/reference/src"


@pytest.fixture(scope="session")
def reference_gem():
    """Import the reference ``gym_electric_motor`` package (oracle for parity
    tests).  Skips if the read-only reference mount is unavailable.

    Both frameworks register the same 54 gymnasium ids, and any test that
    calls ``register_all(force=True)`` (e.g. the gymnasium-interop ones)
    re-points the shared registry at the TPU package for the rest of the
    worker process.  ``reference_gem.make`` must therefore pin the registry
    entry back to the reference's spec before every make — otherwise parity
    tests would silently construct the wrong framework's env."""
    if not os.path.isdir(REFERENCE_SRC):
        pytest.skip("reference repo not mounted")
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    import gymnasium
    import gym_electric_motor as gem

    ref_specs = {
        eid: spec
        for eid, spec in list(gymnasium.registry.items())
        if "gym_electric_motor." in str(getattr(spec, "entry_point", ""))
        and "_tpu" not in str(getattr(spec, "entry_point", ""))
    }

    class _RefGem:
        def __getattr__(self, name):
            return getattr(gem, name)

        @staticmethod
        def make(env_id, **kwargs):
            spec = ref_specs.get(env_id)
            if spec is None:
                # never silently fall through to whatever framework currently
                # owns the id — that is the wrong-oracle bug this fixture
                # exists to prevent
                raise RuntimeError(
                    f"reference spec for {env_id!r} missing from the "
                    f"import-time registry snapshot ({len(ref_specs)} ids)"
                )
            gymnasium.registry[env_id] = spec
            return gem.make(env_id, **kwargs)

    return _RefGem()
