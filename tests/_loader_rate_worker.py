"""Worker for the multi-host input-path scaling test.

Run as:  python tests/_loader_rate_worker.py <rank> <world> <data_root> <out.json>

Times the HOST stage of a rank-sharded train loader (decode + gt assembly,
`data/loader.py _host_part`) over this rank's share of one epoch — the part
of the input path that the rank-strided partition (`my_distributed_sampler
.py:12-55` semantics) parallelizes across pod feeder processes. No jax
device work: the claim under test is host-feeding scalability."""

import itertools
import json
import os
import os.path as osp
import sys
import time


def main() -> None:
    rank, world, data_root, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                        sys.argv[3], sys.argv[4])
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault("CATRE_DATA_ROOT", "/root/reference/datasets")
    sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

    from catre_tpu.data.loader import CATRELoader, LoaderConfig
    from catre_tpu.data.nocs import NOCSDataset

    ds = NOCSDataset("nocs_train_real", image_root=data_root, use_cache=False)
    dicts = ds()
    cfg = LoaderConfig(num_pcl=256, max_objs_per_image=8, aug_depth=False)
    loader = CATRELoader(dicts, cfg, phase="train", ims_per_batch=4, seed=7,
                         rank=rank, world_size=world)

    n_take = len(range(rank, len(dicts), world))  # this rank's epoch share
    # warm one record (imports, cv2 init) outside the timed window
    g0, d0, r0 = next(iter(loader._train_records()))
    loader._host_part(g0, d0, r0)

    objs = 0
    per_record = []
    t0 = time.perf_counter()
    for g, didx, rec in itertools.islice(loader._train_records(), n_take):
        t1 = time.perf_counter()
        part = loader._host_part(g, didx, rec)
        per_record.append(time.perf_counter() - t1)
        objs += int(part["n_insts"])
    dt = time.perf_counter() - t0

    # median per-record cost: robust to background-load spikes on the 1-CPU
    # CI box (a concurrently-running TPU soak's host thread stole the CPU
    # for a few records and flipped the wall-total ratio once)
    per_record.sort()
    med = per_record[len(per_record) // 2]
    with open(out_path, "w") as f:
        json.dump({"rank": rank, "world": world, "records": n_take,
                   "objs": objs, "seconds": dt, "median_record_s": med}, f)
    print(f"rank {rank}/{world}: {objs} objs in {dt:.3f}s", flush=True)


if __name__ == "__main__":
    main()
