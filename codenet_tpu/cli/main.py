"""FP32 training CLI (reference main.py:19-102).

seed -> dataset -> heads -> model -> Adam -> epoch loop with val/checkpoint
and step-LR decay (x0.1 at each lr_step epoch, reference main.py:91-97).
"""

from __future__ import annotations

import os

import numpy as np

from .. import config as cfg
from ..data.datasets import get_dataset
from ..data.loader import DataLoader
from ..engine import checkpoint
from ..engine.trainer import Trainer
from ..utils.logger import Logger


def run_training(opt, qspec=None, load_fp32_then_quantize=False):
    np.random.seed(opt.seed)
    Dataset = get_dataset(opt.dataset, opt.task)
    opt = cfg.update_dataset_info_and_set_heads(
        opt, cfg.DATASET_SPECS[opt.dataset])
    print(opt.heads)
    logger = Logger(opt)

    trainer = Trainer(opt, qspec=qspec)
    trainer.init()

    start_epoch = 0
    if opt.load_model:
        trainer.variables, ckpt_epoch, payload = checkpoint.load_model(
            opt.load_model, trainer.variables)
        if opt.resume:
            start_epoch = ckpt_epoch
            lr = checkpoint.resume_lr(opt.lr, opt.lr_step, start_epoch)
            trainer.set_lr(lr)
            print("Resumed optimizer with start lr", lr)

    val_loader = DataLoader(Dataset(opt, "val"), 1, shuffle=False,
                            num_workers=1)
    if getattr(opt, "test", False):
        # val-only: decode predictions and score them (reference
        # main.py:51-54)
        _, preds = trainer.val(0, val_loader)
        os.makedirs(opt.save_dir, exist_ok=True)
        val_loader.dataset.run_eval(preds, opt.save_dir)
        return trainer

    train_dataset = Dataset(opt, "train")
    if getattr(opt, "device_cache", False):
        # HBM-resident raw images: one bulk upload, then steps ship only
        # indices + warp matrices (data/device_cache.py)
        if opt.task != "ctdet" or not hasattr(train_dataset,
                                              "load_raw_image"):
            raise SystemExit(
                "--device_cache is only implemented for the ctdet task "
                "(the {} sampler has no cached-feed path); drop the flag"
                .format(opt.task))
        from ..data.device_cache import ImageCache
        cache = ImageCache.build(train_dataset)
        shard = getattr(opt, "device_cache_shard", False)
        print("device_cache: {} images, {:.1f} MB -> HBM{}".format(
            len(train_dataset), cache.nbytes / 1e6,
            " (sharded over {} devices)".format(
                trainer.mesh.shape.get("data", 1)) if shard else ""))
        train_dataset._image_cache_dims = cache.dims
        trainer.image_cache = cache.to_device(trainer.mesh, shard=shard)
        shard_ranges = cache.shard_ranges if shard else None
        trainer.cache_shard_rows = cache.shard_rows if shard else None
        del cache  # to_device dropped the host stack; free the wrapper too
    else:
        shard_ranges = None
    train_loader = DataLoader(train_dataset, opt.batch_size,
                              shuffle=True, num_workers=opt.num_workers,
                              seed=opt.seed, shard_ranges=shard_ranges)

    best = 1e10
    save_dir = opt.save_dir
    os.makedirs(save_dir, exist_ok=True)
    if getattr(opt, "trace", False):
        # --trace: jax.profiler capture of the train hot loop (view in
        # tensorboard/xprof) — the observability upgrade over the
        # reference's data/net wall-clock bar (base_trainer.py:56-87)
        from ..utils import profile as _profile
        tracer = _profile.trace(os.path.join(opt.debug_dir, "trace"))
    else:
        import contextlib
        tracer = contextlib.nullcontext()
    with tracer:
      for epoch in range(start_epoch + 1, opt.num_epochs + 1):
        # reference main.py:69 — --save_all checkpoints every epoch as
        # model_<epoch> instead of rolling model_last
        mark = str(epoch) if getattr(opt, "save_all", False) else "last"
        log_dict = trainer.train(epoch, train_loader)
        logger.write("epoch: {} |".format(epoch))
        for k, v in log_dict.items():
            logger.scalar_summary("train_{}".format(k), v, epoch)
            logger.write("{} {:8f} | ".format(k, v))
        if opt.val_intervals > 0 and epoch % opt.val_intervals == 0:
            checkpoint.save_model(
                os.path.join(save_dir, "model_{}.ckpt".format(mark)),
                epoch, trainer.variables, trainer.opt_state)
            val_dict, _ = trainer.val(epoch, val_loader)
            for k, v in val_dict.items():
                logger.scalar_summary("val_{}".format(k), v, epoch)
                logger.write("{} {:8f} | ".format(k, v))
            # model_best is written ONLY on metric improvement
            # (reference main.py:83-86)
            if val_dict[opt.metric] < best:
                best = val_dict[opt.metric]
                checkpoint.save_model(
                    os.path.join(save_dir, "model_best.ckpt"), epoch,
                    trainer.variables)
        else:
            save_every = max(1, getattr(opt, "save_intervals", 1))
            if (epoch % save_every == 0 or epoch == opt.num_epochs
                    or getattr(opt, "save_all", False)):
                checkpoint.save_model(
                    os.path.join(save_dir, "model_{}.ckpt".format(mark)),
                    epoch, trainer.variables, trainer.opt_state)
        logger.write("\n")
        if epoch in opt.lr_step:
            checkpoint.save_model(
                os.path.join(save_dir, "model_{}.ckpt".format(epoch)),
                epoch, trainer.variables, trainer.opt_state)
            lr = opt.lr * (0.1 ** (opt.lr_step.index(epoch) + 1))
            print("Drop LR to", lr)
            trainer.set_lr(lr)

    # final detection eval with the trained weights (reference
    # quant_main.py:104-107 forces this; useful for FP32 runs too)
    if opt.task in ("ctdet",) and opt.num_epochs > 0:
        try:
            trainer.image_cache = None  # free the train cache's HBM first
            from .test import prefetch_test
            eval_opt = opt
            last = ("model_{}.ckpt".format(opt.num_epochs)
                    if getattr(opt, "save_all", False) else "model_last.ckpt")
            eval_opt.load_model = os.path.join(save_dir, last)
            eval_opt.resume_quantize = qspec is not None
            print("Running final eval...")
            prefetch_test(eval_opt)
        except Exception as e:
            print("final eval skipped:", e)
    logger.close()
    return trainer


def main(argv=None):
    opt = cfg.parse(argv)
    return run_training(opt)


if __name__ == "__main__":
    main()
