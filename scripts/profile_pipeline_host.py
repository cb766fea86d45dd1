"""cProfile the e2e pipeline's HOST side at the bench shape (TPU attached).

Round-4 finding driver: the A/B ladder measures ~78 img/s e2e while the
device sampler profile shows only 0.37 ms/img of sampler time and the
refine accounts for ~1.2 ms/img — so ~10+ ms/img is host/dispatch. This
script reproduces bench.py's pipeline pass 2 (warm device cache, warm
compile) under cProfile and prints the top cumulative host costs, plus a
plain wall breakdown (loader-only drain vs run_inference).

  python scripts/profile_pipeline_host.py [frames] [ims]
"""

import cProfile
import os
import pstats
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
if "CATRE_DATA_ROOT" not in os.environ and os.path.isdir("/root/reference/datasets"):
    os.environ["CATRE_DATA_ROOT"] = "/root/reference/datasets"

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench

FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 192
IMS = int(sys.argv[2]) if len(sys.argv) > 2 else 64

from catre_tpu.data.loader import CATRELoader, LoaderConfig
from catre_tpu.engine.refiner import make_refine_fn
from catre_tpu.eval.evaluator import CATREEvaluator, run_inference
from catre_tpu.models import CATREConfig, CATREDisRShared, init_params

root = tempfile.mkdtemp(prefix="catre_prof_")
records = bench._write_synthetic_frames(root, FRAMES, 8)
lcfg = LoaderConfig(num_pcl=1024, max_objs_per_image=8, aug_depth=False,
                    cache_decoded="device", sample_window=128)
mcfg = CATREConfig(num_pcl=1024, dtype=jnp.bfloat16, fused_heads=True)
model = CATREDisRShared(mcfg)
params = init_params(model, mcfg, jax.random.PRNGKey(0))
refine = make_refine_fn(model, mcfg, n_iter=4)


def one_pass(warmup):
    loader = CATRELoader(records, lcfg, phase="test", ims_per_batch=IMS,
                         num_workers=4, device_batches=True)
    ev = CATREEvaluator(records, n_iters=4, output_dir=None)
    t0 = time.perf_counter()
    run_inference(refine, params, iter(loader), ev, n_iters=4, warmup=warmup,
                  compute_probe_every=0, prefetch=2, packed_inputs=True)
    return time.perf_counter() - t0


print("pass1 (compile+cache):", round(one_pass(1), 2), "s", flush=True)
print("pass2 (warm):", round(one_pass(0), 2), "s", flush=True)

# loader-only drain, cached path (device_batches: nothing fetched)
loader = CATRELoader(records, lcfg, phase="test", ims_per_batch=IMS,
                     num_workers=4, device_batches=True)
t0 = time.perf_counter()
n = 0
for b in loader:
    n += 1
# sync: fetch one scalar of the last group's cloud
last = b["pcl"]
jax.device_get(last.ravel()[0])
print(f"loader-only drain (device_batches): {time.perf_counter()-t0:.2f} s "
      f"({n} batches)", flush=True)

prof = cProfile.Profile()
prof.enable()
wall = one_pass(0)
prof.disable()
print("profiled pass:", round(wall, 2), "s", flush=True)
st = pstats.Stats(prof)
st.sort_stats("cumulative")
st.print_stats(40)
