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

# persistent CPU compile cache across suite runs (the suite is rerun before
# every commit; the repeated jits dominate its wall time). The dir is keyed
# by a machine fingerprint because XLA:CPU AOT executables embed host CPU
# features — loading an executable compiled on a different machine type can
# SIGILL (xla cpu_aot_loader warns about exactly this). A new host gets a
# fresh cache; stale dirs are just disk.
import hashlib  # noqa: E402

try:
    with open("/proc/cpuinfo") as _f:
        _cpu = "".join(ln for ln in _f if ln.startswith(("model name", "flags")))
    _fp = hashlib.sha1(_cpu.encode()).hexdigest()[:12]
    jax.config.update("jax_compilation_cache_dir",
                      osp.join(osp.dirname(__file__), "..",
                               f".jax_cache_cpu_{_fp}"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass
