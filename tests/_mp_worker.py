"""Worker for the REAL multi-process tests: one of N processes joined via
``jax.distributed.initialize`` over localhost, each owning 2 virtual CPU
devices (the in-sandbox analog of one host of a multi-host TPU pod; ref:
mmdet/apis/env.py (_init_dist_pytorch) — one process per device group).

Runs 3 data-parallel train steps through the exact production wiring
(build_dataloader num_gpus=local_device_count, shard_batch's
make_array_from_process_local_data path, make_train_step over the global
mesh) and a sharded multi_host_test eval, then dumps params + eval results
for the parent to compare against the single-process run.

Usage: python _mp_worker.py <coordinator_port> <process_id> <num_processes>
       <out_pickle>
"""

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    port, pid, nproc, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                  int(sys.argv[3]), sys.argv[4])
    # 2 virtual CPU devices per process; must land before backend init
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags +
                                   " --xla_force_host_platform_device_count=2"
                                   ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "float32")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * nproc

    import jax.numpy as jnp
    import numpy as np
    from ioudet.apis.train import build_optimizer, make_train_step
    from ioudet.apis.test import multi_host_test
    from ioudet.data import build_dataloader
    from ioudet.models import build_detector
    from ioudet.parallel import local_device_count, make_mesh, shard_batch
    from mp_common import TRAIN_KEYS, TinyDataset, small_detector_cfgs

    cfg, train_cfg, test_cfg = small_detector_cfgs()
    det = build_detector(cfg, train_cfg, test_cfg)
    dataset = TinyDataset()
    mesh = make_mesh()
    assert local_device_count(mesh) == 2

    # ---- train: 3 steps, global batch 4 = 2 per process ----
    loader = build_dataloader(dataset, imgs_per_gpu=1, workers_per_gpu=1,
                              num_gpus=local_device_count(mesh),
                              shuffle=False, drop_last=False)
    params = jax.device_get(det.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1,) + TinyDataset.CANVAS + (3,)))["params"])
    tx = build_optimizer(dict(type="SGD", lr=0.01, momentum=0.9),
                         lambda s: 0.01)
    state = dict(params=params, opt_state=jax.device_get(tx.init(params)),
                 step=np.zeros((), np.int32))
    step_fn = make_train_step(det, tx, mesh)
    losses = []
    it = iter(loader)
    for _ in range(3):
        batch = {k: v for k, v in next(it).items() if k in TRAIN_KEYS}
        state, logs = step_fn(state, shard_batch(mesh, batch))
        losses.append(float(jax.device_get(logs["loss"])))
    final_params = jax.device_get(state["params"])

    # ---- eval: sharded inference + fixed-shape allgather merge ----
    results = multi_host_test(det, final_params, dataset, imgs_per_batch=2,
                              workers=1, progress=False)
    assert len(results) == len(dataset), \
        f"merged {len(results)} != {len(dataset)}"

    with open(out_path, "wb") as f:
        pickle.dump(dict(losses=losses, params=final_params,
                         results=results, process=pid), f)
    print(f"worker {pid} ok")


if __name__ == "__main__":
    main()
