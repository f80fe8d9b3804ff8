"""Force tests onto a virtual 8-device CPU mesh (no TPU needed).

The session environment pins JAX to a TPU platform plugin that ignores
JAX_PLATFORMS, so the config override below (which wins because backends
initialize lazily) is the load-bearing part. Opt out with SEGS_TEST_TPU=1 to
run the suite on real TPU hardware.
"""

import os

_USE_TPU = bool(os.environ.get("SEGS_TEST_TPU"))

if not _USE_TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
