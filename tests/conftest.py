"""Test configuration: CPU backend with 8 virtual devices, float64.

Mirrors the reference's serial/parallel-equivalence discipline
(reference parareal.py:28-33): tests must run anywhere, so the TPU mesh is
emulated with xla_force_host_platform_device_count. The environment may
pin JAX_PLATFORMS to a remote TPU plugin — tests force CPU and drop any
other registered PJRT backend factory so no tunnel handshake happens.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_ENABLE_X64"] = "True"

import jax  # noqa: E402

# sitecustomize may have imported jax already (locking in the env's
# JAX_PLATFORMS) — override through the live config instead.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent XLA-CPU compile cache: the suite's wall time is dominated by
# recompiling the same sweep/fan-out programs every run
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# import pallas (and its checkify lowering registration) while the tpu
# platform alias from the sitecustomize plugin is still registered —
# importing it after the factory drop below raises "unknown platform tpu"
try:
    import jax.experimental.pallas  # noqa: F401
    import jax.experimental.pallas.tpu  # noqa: F401
except Exception:  # pragma: no cover
    pass

try:  # drop non-CPU PJRT plugins registered by sitecustomize (slow init)
    from jax._src import xla_bridge as _xb

    for _name in list(_xb._backend_factories):
        if _name != "cpu":
            _xb._backend_factories.pop(_name, None)
except Exception:  # pragma: no cover - registry layout may change
    pass
