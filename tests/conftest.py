import os

# Tests run on a virtual 8-device CPU mesh; the real TPU chip is reserved for
# benchmarks. The environment pins JAX_PLATFORMS=axon via sitecustomize, so we
# must override both the env var (before import) and the config (after).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
