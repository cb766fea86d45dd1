"""Test configuration: run all tests on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware.

Note: the axon TPU plugin in this image pins jax_platforms at import time,
so we must override via jax.config (env vars alone are ignored).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import os.path as osp  # noqa: E402

# asset pickles (mean shapes, abs scales, mug meta) ship with the reference
# dataset mount; point the data root there for tests
if "CATRE_DATA_ROOT" not in os.environ and osp.isdir("/root/reference/datasets"):
    os.environ["CATRE_DATA_ROOT"] = "/root/reference/datasets"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
