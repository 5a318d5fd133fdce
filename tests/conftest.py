"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize imports jax (registering the TPU backend)
before pytest starts, so env vars are too late; jax.config.update still
works because no backend has been initialized yet at conftest import time.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
