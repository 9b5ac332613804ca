"""Worker for the real 2-process multi-host data fan-out exercise
(VERDICT r4 item 3).

Every prior test/dryrun ran `jax.make_array_from_process_local_data` with
`jax.process_count()==1` (degenerate sharded device_put). This worker runs
the REAL multi-process branch: two CPU processes x 4 virtual devices each,
`jax.distributed.initialize` over a localhost coordinator (Gloo
collectives), each process passing only ITS slab of the globally padded
sample order to `shard_device_dataset` — then one sharded-dataset train
epoch, whose loss must equal the single-process result.

Modes:
  --pid {0,1} --port P   distributed worker (4 local virtual devices)
  --single               one process, 8 virtual devices, same computation

Launched by tests/test_multiprocess.py (env-gated) and by hand:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/multiproc_fanout_worker.py --single --out /tmp/s.json
"""

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, default=None)
    ap.add_argument("--port", type=int, default=19734)
    ap.add_argument("--single", action="store_true")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    n_local = 8 if args.single else 4
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_local}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    # share the repo's persistent compile cache (1-vCPU container)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if not args.single:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{args.port}",
            num_processes=2, process_id=args.pid)
        # Establish the Gloo context while both processes are still within
        # seconds of each other: its first-connect window is 30s, and the
        # big epoch compile (minutes on this 1-vCPU host) would otherwise
        # desync the processes past it (observed DEADLINE_EXCEEDED).
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("coastline_mp_startup")
    assert jax.device_count() == 8, jax.devices()

    import jax.numpy as jnp
    import numpy as np

    from coastline.data.synthetic import synthetic_dataset_arrays
    from coastline.models.robust_unet import RobustUNet
    from coastline.parallel.mesh import (
        make_mesh,
        process_local_slab,
        replicated,
        shard_device_dataset,
        sharded_epoch_indices,
    )
    from coastline.train.loop import (
        TrainConfig,
        create_train_state,
        make_train_epoch,
    )

    size, batch, n = 32, 8, 12
    images, masks = synthetic_dataset_arrays(n, size=size, seed=0)
    mesh = make_mesh(8)  # pure DP: data=8

    if args.single:
        ds = shard_device_dataset(mesh, images, masks)
    else:
        # the multi-process contract: each process passes only its slab of
        # the globally padded order + the global real count
        li, lm, n_real = process_local_slab(images, masks, 8)
        assert li.shape[0] == 8, li.shape  # padded 16 -> 8 per process
        ds = shard_device_dataset(mesh, li, lm, n_valid=n_real)
    assert len(ds) == n and ds.images.shape[0] == 16, (
        len(ds), ds.images.shape)

    model = RobustUNet(base=16)
    cfg = TrainConfig(epochs=1, batch_size=batch, eval_batch_size=batch,
                      lr=3e-3)
    state = create_train_state(model, cfg, (1, size, size, 3))
    state = jax.device_put(state, replicated(mesh))

    idx, valid = sharded_epoch_indices(mesh, ds, batch, shuffle=True,
                                       rng=np.random.default_rng(0))
    epoch = make_train_epoch(model, cfg, mesh=mesh, sharded_dataset=True)
    state, loss = epoch(state, ds.images, ds.masks,
                        jnp.asarray(idx), jnp.asarray(valid))
    loss = float(loss)  # replicated scalar: fetchable on every process
    # a second step from the updated state (params now differ across the
    # all-reduced gradient path) — catches divergence the first step hides
    idx2, valid2 = sharded_epoch_indices(mesh, ds, batch, shuffle=True,
                                         rng=np.random.default_rng(1))
    state, loss2 = epoch(state, ds.images, ds.masks,
                         jnp.asarray(idx2), jnp.asarray(valid2))
    loss2 = float(loss2)

    if args.single or args.pid == 0:
        with open(args.out, "w") as f:
            json.dump({
                "mode": "single" if args.single else "2proc",
                "loss": loss, "loss2": loss2,
                "process_count": jax.process_count(),
                "local_devices": jax.local_device_count(),
                "global_devices": jax.device_count(),
            }, f, indent=2)
    print(f"{'single' if args.single else f'pid{args.pid}'}: "
          f"loss={loss:.6f} loss2={loss2:.6f}", file=sys.stderr)
    if not args.single:
        jax.distributed.shutdown()


if __name__ == "__main__":
    main()
