"""Hermetic multi-chip dryrun body (run in a scrubbed-env subprocess).

Jits the FULL training step over an n-device virtual CPU mesh and runs
one real step on tiny shapes, in BOTH supported parallelism regimes:
(1) pure data parallel (batch sharded over a 'data' mesh, params
replicated, XLA grad all-reduce over ICI) and (2) the 2-D
(data, spatial) mesh (--spatial_shard) where the image H axis
additionally shards and GSPMD halo-exchanges the backbone convolutions.
This validates the framework's multi-chip sharding story (SURVEY.md
§2.2) without TPU hardware.

MUST run in a process where the TPU plugin was never registered: the
launcher (`__graft_entry__.dryrun_multichip`) spawns this module via
`python -m codenet_tpu.parallel.dryrun N` with JAX_PLATFORMS=cpu and all
axon/TPU env vars scrubbed, so `import jax` here only ever sees the host
platform split into N virtual devices. Rounds 1 and 2 both failed by
letting the in-process TPU plugin initialize during what should be a
CPU-only check (r1: init-order ate the host-device-count flag; r2: a
libtpu client/terminal version skew raised FAILED_PRECONDITION).
"""

from __future__ import annotations

import os
import sys


def run(n_devices: int) -> None:
    # Belt-and-braces: if somehow invoked with the axon env intact, force
    # CPU before jax is imported. (The launcher already scrubs the env.)
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    # The dryrun validates SHARDING, not kernels: route the deform op
    # through its XLA formulation instead of the TPU-only Pallas kernels.
    os.environ["CODENET_FORCE_XLA_DEFORM"] = "1"

    import jax
    import numpy as onp

    from codenet_tpu import config as cfg
    from codenet_tpu.engine.trainer import Trainer
    from codenet_tpu.parallel import get_mesh, shard_batch

    devices = jax.devices()
    assert all(d.platform == "cpu" for d in devices), (
        "dryrun must run on the virtual CPU mesh, got "
        + repr({d.platform for d in devices}))
    devices = devices[:n_devices]
    assert len(devices) == n_devices, (
        f"need {n_devices} devices, have {len(devices)}")
    mesh = get_mesh(devices)

    opt = cfg.parse(
        "ctdet --dataset pascal --arch shufflenetv2 --input_res 64 "
        f"--batch_size {2 * n_devices} --num_epochs 1".split())
    opt = cfg.update_dataset_info_and_set_heads(
        opt, cfg.DATASET_SPECS["pascal"])

    trainer = Trainer(opt, mesh=mesh)
    trainer.init()

    b = 2 * n_devices
    out_res = 16
    rng = onp.random.RandomState(0)
    batch = {
        "input": rng.randn(b, 64, 64, 3).astype(onp.float32),
        "hm": onp.zeros((b, out_res, out_res, 20), onp.float32),
        "wh": onp.zeros((b, 50, 2), onp.float32),
        "reg": onp.zeros((b, 50, 2), onp.float32),
        "ind": onp.zeros((b, 50), onp.int64),
        "reg_mask": onp.ones((b, 50), onp.uint8),
    }
    batch["hm"][:, 8, 8, 0] = 1.0
    batch["ind"][:, 0] = 8 * out_res + 8
    batch = shard_batch(mesh, batch)

    variables, opt_state, stats = trainer.train_step(
        trainer.variables, trainer.opt_state, batch)
    loss = float(stats["loss"])
    assert onp.isfinite(loss), loss
    print(f"dryrun_multichip({n_devices}): dp loss={loss:.4f} OK",
          flush=True)

    # Phase 2 — the 2-D (data, spatial) mesh (--spatial_shard): batch over
    # n/2 devices, image H over 2; GSPMD spatially partitions the backbone
    # convs with halo exchange. Same full train step, one real step.
    if n_devices >= 2 and n_devices % 2 == 0:
        from codenet_tpu.parallel.mesh import get_mesh_2d
        mesh2 = get_mesh_2d(2, batch_size=b, devices=devices)
        trainer2 = Trainer(opt, mesh=mesh2)
        trainer2.init()
        batch2 = shard_batch(mesh2, {k: onp.asarray(v) for k, v in
                                     zip(batch, jax.device_get(
                                         list(batch.values())))})
        _, _, stats2 = trainer2.train_step(
            trainer2.variables, trainer2.opt_state, batch2)
        loss2 = float(stats2["loss"])
        assert onp.isfinite(loss2), loss2
        assert abs(loss2 - loss) < 0.05 * max(abs(loss), 1.0), (loss, loss2)
        print(f"dryrun_multichip({n_devices}): dp x sp loss={loss2:.4f} OK",
              flush=True)

    # Phase 3 — row-SHARDED HBM image cache (--device_cache_shard): the
    # raw-image stack partitions over the 'data' axis (each device holds
    # N/D rows), the per-device row gather runs under shard_map, and the
    # batch's slot-block s carries only shard-s indices (the
    # DataLoader(shard_ranges=...) routing contract). Validates that the
    # cache-scaling story compiles and executes multi-chip.
    from codenet_tpu.data.device_cache import ImageCache
    from codenet_tpu.data.device_aug import identity_aug_params

    opt3 = cfg.parse(
        "ctdet --dataset pascal --arch shufflenetv2 --input_res 64 "
        f"--batch_size {b} --num_epochs 1 --device_cache_shard".split())
    opt3 = cfg.update_dataset_info_and_set_heads(
        opt3, cfg.DATASET_SPECS["pascal"])
    trainer3 = Trainer(opt3, mesh=mesh)
    trainer3.init()

    images = rng.randint(0, 255, (b, 64, 64, 3)).astype(onp.uint8)
    cache = ImageCache(images, onp.full((b, 2), 64, onp.int32))
    cache_dev = cache.to_device(mesh, shard=True)
    rps = cache.shard_rows
    perm, alphas, light = identity_aug_params()
    batch3 = {
        "img_idx": onp.concatenate(  # slot-block s -> shard s's rows
            [onp.arange(s * rps, s * rps + b // n_devices)
             for s in range(n_devices)]).astype(onp.int32),
        "warp_ti": onp.tile(onp.array([[1, 0, 0], [0, 1, 0]], onp.float32),
                            (b, 1, 1)),
        "aug_perm": onp.full((b,), perm, onp.int32),
        "aug_alphas": onp.tile(onp.asarray(alphas, onp.float32), (b, 1)),
        "aug_light": onp.tile(onp.asarray(light, onp.float32), (b, 1)),
        **{k: onp.asarray(jax.device_get(v)) for k, v in batch.items()
           if k != "input"},
    }
    batch3 = shard_batch(mesh, batch3)
    batch3["cache_images"] = cache_dev
    _, _, stats3 = trainer3.train_step(
        trainer3.variables, trainer3.opt_state, batch3)
    loss3 = float(stats3["loss"])
    assert onp.isfinite(loss3), loss3
    print(f"dryrun_multichip({n_devices}): dp + sharded-cache "
          f"loss={loss3:.4f} OK", flush=True)


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
