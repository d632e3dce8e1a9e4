"""Training engine: one pjit-sharded train step + epoch loop.

Rebuild of reference lib/trains/base_trainer.py + per-task trainers: the
model+loss fusion (ModelWithLoss, base_trainer.py:12-21) becomes a single
jitted `train_step` whose batch is sharded over the 'data' mesh axis and
whose params are replicated — XLA inserts the gradient all-reduce over ICI
(replacing DataParallel scatter/gather). FP32 training updates batch_stats;
QAT (qspec set) trains against frozen folded BN and updates activation-range
EMA (`quant_stats`) instead, mirroring quant_main.py:43-47 semantics.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.device_aug import model_input, resolve_targets
from ..models import create_model
from ..models.losses import LOSS_FACTORY
from ..parallel import shard_batch, replicate_tree
from ..parallel.mesh import get_mesh_for_batch
from ..utils.meters import AverageMeter


class LossOpts:
    """Static, hashable subset of opt consumed inside the jitted loss."""

    FIELDS = ("mse_loss", "dense_wh", "cat_spec_wh", "norm_wh", "reg_loss",
              "reg_offset", "reg_bbox", "hm_weight", "wh_weight",
              "off_weight", "dep_weight", "dim_weight", "rot_weight",
              "hp_weight", "hm_hp_weight", "hm_hp", "reg_hp_offset",
              "dense_hp")

    def __init__(self, opt):
        for f in self.FIELDS:
            setattr(self, f, getattr(opt, f, None))
        self._key = tuple(getattr(self, f) for f in self.FIELDS)

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, LossOpts) and self._key == other._key


def make_train_step(model, loss_fn, loss_opts, tx, quantized, mean, std,
                    down_ratio=4, num_classes=None, input_hw=None,
                    cache_mesh=None):
    """Build the jitted train step.

    quantized=False: mutate batch_stats (BN running averages).
    quantized=True: BN frozen, mutate quant_stats (activation EMA).
    The input resolves via device_aug.model_input — device-side color aug
    + normalization when the sampler ships uint8 — and sparse heatmap
    targets render on device (resolve_targets).
    """

    import os

    from ..models.fused_heads import apply_fused_heads_train, can_fuse_heads
    fuse = (not quantized) and can_fuse_heads(model, None) \
        and os.environ.get("CODENET_FUSED_TRAIN_HEADS", "1") == "1"

    def step_body(variables, opt_state, batch):
        params = variables["params"]
        aux_vars = {k: v for k, v in variables.items() if k != "params"}
        inp = model_input(batch, mean, std, out_hw=input_hw,
                          cache_mesh=cache_mesh)
        batch = resolve_targets(batch, inp, down_ratio, num_classes)

        def compute_loss(p):
            model_vars = {"params": p, **aux_vars}
            if quantized:
                out, updates = model.apply(
                    model_vars, inp, train=False,
                    update_stats=True, mutable=["quant_stats"])
            elif fuse:
                # one widened head pipeline reading the neck once
                # (models/fused_heads.py — bit-identical per-channel BN)
                neck, updates = model.apply(
                    model_vars, inp, train=True, return_neck=True,
                    mutable=["batch_stats"])
                out, head_updates = apply_fused_heads_train(
                    model_vars, neck, model.heads, dtype=model.dtype)
                updates = {"batch_stats": {
                    **dict(updates["batch_stats"]), **head_updates}}
            else:
                out, updates = model.apply(
                    model_vars, inp, train=True,
                    mutable=["batch_stats"])
            outputs = out if isinstance(out, (list, tuple)) else [out]
            loss, stats = loss_fn(outputs, batch, loss_opts)
            return loss, (stats, updates)

        grads, (stats, updates) = jax.grad(compute_loss, has_aux=True)(params)
        updates_tx, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates_tx)
        new_vars = {"params": params, **aux_vars, **updates}
        return new_vars, opt_state, stats

    train_step = jax.jit(step_body, donate_argnums=(0, 1))
    train_step.raw = step_body  # for the scan-based multi-step
    return train_step


def make_multi_train_step(step_body, n_steps):
    """Scan `n_steps` train steps inside ONE jitted program.

    TPU-native epoch engine: with the raw images HBM-resident
    (--device_cache) a step's host<->device traffic is ~70 KB of sparse
    targets + a dispatch; through the axon tunnel each of those is a
    ~0.1 s network round trip, so a 12-step epoch pays ~2 s of RTTs for
    ~0.15 s of compute. lax.scan over the stacked (K, ...) batch pytree
    collapses an epoch to one upload + one dispatch + one stats fetch —
    the XLA-semantics answer (compiler-visible loop, static shapes) to
    what the reference solves with CUDA-stream prefetching
    (base_trainer.py:44-104 drives the torch DataLoader per step).

    `cache_images` rides as a loop-invariant argument, not part of the
    stacked pytree. Stats come back stacked (K,) per key."""

    @partial(jax.jit, donate_argnums=(0, 1))
    def multi_step(variables, opt_state, stacked, cache_images):
        def body(carry, batch):
            variables, opt_state = carry
            if cache_images is not None:
                batch = dict(batch, cache_images=cache_images)
            variables, opt_state, stats = step_body(
                variables, opt_state, batch)
            return (variables, opt_state), stats

        (variables, opt_state), stats = jax.lax.scan(
            body, (variables, opt_state), stacked, length=n_steps)
        return variables, opt_state, stats

    return multi_step


def _env_bytes(name, default):
    import os
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


def check_shard_routing(img_idx, d, rps):
    """Loud --device_cache_shard contract check (host-side, cheap): the
    shard_map gather maps idx % rps locally, so a mis-routed index would
    silently fetch the WRONG image — catch it before dispatch."""
    idx = np.asarray(img_idx).reshape(d, -1)
    if not (idx // rps == np.arange(d)[:, None]).all():
        raise ValueError(
            "--device_cache_shard: batch slot-block routing violates "
            "cache shard ownership; build the DataLoader with "
            "shard_ranges=cache.shard_ranges")


def make_val_step(model, loss_fn, loss_opts, mean, std, down_ratio=4,
                  num_classes=None, input_hw=None, cache_mesh=None):
    from ..models.fused_heads import apply_fused_heads, can_fuse_heads
    fuse = can_fuse_heads(model, None)

    @jax.jit
    def val_step(variables, batch):
        inp = model_input(batch, mean, std, out_hw=input_hw,
                          cache_mesh=cache_mesh)
        batch = resolve_targets(batch, inp, down_ratio, num_classes)
        if fuse:
            # single-stack models read the neck once (fused heads);
            # multi-stack models keep the full apply so val losses still
            # cover every stack (intermediate supervision)
            neck = model.apply(variables, inp, train=False,
                               return_neck=True)
            out = apply_fused_heads(variables, neck, model.heads,
                                    dtype=model.dtype)
        else:
            out = model.apply(variables, inp, train=False)
        outputs = out if isinstance(out, (list, tuple)) else [out]
        _, stats = loss_fn(outputs, batch, loss_opts)
        return stats
    return val_step


def make_oracle_val_step(model, loss_fn, loss_opts, opt, cache_mesh=None):
    """Unjitted val step with ground-truth head substitution — the
    --eval_oracle_* upper-bound probes (reference trains/ctdet.py:36-47,
    utils/oracle_utils.py)."""
    from ..utils.oracle import gen_oracle_map

    def val_step(variables, batch):
        inp = model_input(batch, opt.mean, opt.std,
                          out_hw=(opt.input_h, opt.input_w),
                          cache_mesh=cache_mesh)
        batch = resolve_targets(batch, inp, opt.down_ratio,
                                opt.num_classes)
        out = model.apply(variables, inp, train=False)
        outputs = list(out) if isinstance(out, (list, tuple)) else [out]
        subbed = []
        for output in outputs:
            output = dict(output)
            h, w = output[next(iter(output))].shape[1:3]
            if getattr(opt, "eval_oracle_hm", False) and "hm" in output:
                # heads are pre-sigmoid; substitute logits of the GT map
                gt = np.clip(np.asarray(batch["hm"]), 1e-4, 1 - 1e-4)
                output["hm"] = jnp.asarray(np.log(gt / (1 - gt)))
            if getattr(opt, "eval_oracle_wh", False) and "wh" in output:
                output["wh"] = jnp.asarray(gen_oracle_map(
                    np.asarray(batch["wh"]), np.asarray(batch["ind"]),
                    w, h))
            if getattr(opt, "eval_oracle_offset", False) and "reg" in output:
                output["reg"] = jnp.asarray(gen_oracle_map(
                    np.asarray(batch["reg"]), np.asarray(batch["ind"]),
                    w, h))
            if getattr(opt, "eval_oracle_dep", False) and "dep" in output:
                output["dep"] = jnp.asarray(gen_oracle_map(
                    np.asarray(batch["dep"]), np.asarray(batch["ind"]),
                    w, h))
            # multi_pose probes (reference trains/multi_pose.py:36-54)
            if getattr(opt, "eval_oracle_hmhp", False) and "hm_hp" in output:
                gt = np.clip(np.asarray(batch["hm_hp"]), 1e-4, 1 - 1e-4)
                output["hm_hp"] = jnp.asarray(np.log(gt / (1 - gt)))
            if getattr(opt, "eval_oracle_kps", False) and "hps" in output:
                if getattr(opt, "dense_hp", False):
                    output["hps"] = batch["dense_hps"]
                else:
                    output["hps"] = jnp.asarray(gen_oracle_map(
                        np.asarray(batch["hps"]), np.asarray(batch["ind"]),
                        w, h))
            if (getattr(opt, "eval_oracle_hp_offset", False)
                    and "hp_offset" in output):
                output["hp_offset"] = jnp.asarray(gen_oracle_map(
                    np.asarray(batch["hp_offset"]),
                    np.asarray(batch["hp_ind"]), w, h))
            subbed.append(output)
        _, stats = loss_fn(subbed, batch, loss_opts)
        return stats

    return val_step


class Trainer:
    """Epoch-loop engine (reference base_trainer.py:23-119)."""

    def __init__(self, opt, qspec=None, mesh=None):
        self.opt = opt
        self.qspec = qspec
        if mesh is not None:
            self.mesh = mesh
        elif getattr(opt, "spatial_shard", 1) > 1:
            from ..parallel.mesh import get_mesh_2d
            self.mesh = get_mesh_2d(opt.spatial_shard,
                                    batch_size=opt.batch_size)
        else:
            self.mesh = get_mesh_for_batch(opt.batch_size)
        dtype = jnp.bfloat16 if getattr(opt, "dtype", "") == "bfloat16" \
            else None
        self.model = create_model(opt.arch, opt.heads, opt.head_conv,
                                  w2=opt.w2, maxpool=opt.maxpool,
                                  qspec=qspec, dtype=dtype)
        self.loss_fn = LOSS_FACTORY[opt.task]
        self.loss_opts = LossOpts(opt)
        # --device_cache_shard: every model_input consumer (train/val/
        # oracle/hooks) must run the row gather as a shard_map local
        # lookup; a plain gather would all-gather the sharded stack
        self.cache_mesh = self.mesh if getattr(
            opt, "device_cache_shard", False) else None
        self.cache_shard_rows = None  # set by the CLI with the cache
        self.lr = opt.lr
        self.tx = optax.inject_hyperparams(optax.adam)(learning_rate=opt.lr)
        self.train_step = make_train_step(self.model, self.loss_fn,
                                          self.loss_opts, self.tx,
                                          quantized=qspec is not None,
                                          mean=np.asarray(opt.mean),
                                          std=np.asarray(opt.std),
                                          down_ratio=opt.down_ratio,
                                          num_classes=opt.num_classes,
                                          input_hw=(opt.input_h,
                                                    opt.input_w),
                                          cache_mesh=self.cache_mesh)
        # HBM-resident raw-image stack (data/device_cache.py); set by the
        # CLI when --device_cache — run_epoch attaches it to cache batches
        self.image_cache = None
        # scan-based epoch programs, keyed by (chunk length, has_cache)
        self._multi_steps = {}
        oracle_on = any(getattr(opt, f, False) for f in
                        ("eval_oracle_hm", "eval_oracle_wh",
                         "eval_oracle_offset", "eval_oracle_dep",
                         "eval_oracle_hmhp", "eval_oracle_kps",
                         "eval_oracle_hp_offset"))
        if oracle_on:
            self.val_step = make_oracle_val_step(self.model, self.loss_fn,
                                                 self.loss_opts, opt,
                                                 cache_mesh=self.cache_mesh)
        else:
            self.val_step = make_val_step(self.model, self.loss_fn,
                                          self.loss_opts,
                                          mean=np.asarray(opt.mean),
                                          std=np.asarray(opt.std),
                                          down_ratio=opt.down_ratio,
                                          num_classes=opt.num_classes,
                                          input_hw=(opt.input_h,
                                                    opt.input_w),
                                          cache_mesh=self.cache_mesh)
        self.variables = None
        self.opt_state = None
        self._hooks = None

    @property
    def hooks(self):
        """Lazily-built debug/save_result hooks (train_hooks.TrainHooks) —
        only paid for when --debug or --test is on."""
        if self._hooks is None:
            from .train_hooks import TrainHooks
            self._hooks = TrainHooks(self.opt, self.model,
                                     cache_mesh=self.cache_mesh)
        return self._hooks

    # -- state ---------------------------------------------------------
    def init(self, rng=None, input_shape=None):
        rng = rng if rng is not None else jax.random.PRNGKey(self.opt.seed)
        shape = input_shape or (1, self.opt.input_h, self.opt.input_w, 3)
        variables = self.model.init(rng, jnp.zeros(shape, jnp.float32))
        self.variables = replicate_tree(self.mesh, dict(variables))
        self.opt_state = self.tx.init(self.variables["params"])
        return self.variables

    def set_lr(self, lr):
        """Step-decay hook (reference main.py:91-97)."""
        self.lr = lr
        self.opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)

    # -- epochs ----------------------------------------------------------
    def _run_epoch_scan(self, epoch, loader, n_iters, meters):
        """One lax.scan dispatch per chunk of steps (make_multi_train_step).

        Streams the epoch chunk by chunk: buffer up to `chunk` host
        batches (bounded by CODENET_SCAN_CHUNK_BYTES, so an image-feed
        epoch never materializes on host — only the cache-mode ~70 KB
        batches stack into long scans), stack them on a new leading axis,
        and run the chunk as ONE jitted lax.scan. A chunk whose batches
        don't stack (ragged tail, mixed keys, mesh non-divisibility)
        falls back to the plain per-step calls."""
        from ..parallel.mesh import shard_batch_stacked

        d = self.mesh.shape.get("data", 1)
        rows = self.cache_shard_rows
        cap = int(_env_bytes("CODENET_SCAN_CHUNK_BYTES", 256 << 20))
        pending = []  # (stats_stacked_or_single, batch_size, n_steps)

        def flush():
            if not pending:
                return
            fetched = jax.device_get([st for st, _, _ in pending])
            for st, (_, bsz, k) in zip(fetched, pending):
                for key, v in st.items():
                    for x in np.asarray(v).reshape(-1):
                        meters.setdefault(key, AverageMeter()).update(
                            float(x), bsz)
            pending.clear()

        def run_single(batch, bs):
            if bs % d == 0:
                batch = shard_batch(self.mesh, batch)
            else:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
            if "img_idx" in batch and self.image_cache is not None:
                batch["cache_images"] = self.image_cache
            self.variables, self.opt_state, stats = self.train_step(
                self.variables, self.opt_state, batch)
            pending.append((stats, bs, 1))

        def run_chunk(chunk):
            bs = chunk[0][next(iter(chunk[0]))].shape[0]
            keys = set(chunk[0].keys())
            stackable = bs % d == 0 and all(
                b[next(iter(b))].shape[0] == bs and set(b) == keys
                for b in chunk[1:])
            if not stackable or len(chunk) == 1:
                for b in chunk:
                    run_single(b, b[next(iter(b))].shape[0])
                return
            use_cache = "img_idx" in keys and self.image_cache is not None
            key = (len(chunk), use_cache)
            if key not in self._multi_steps:
                self._multi_steps[key] = make_multi_train_step(
                    self.train_step.raw, len(chunk))
            stacked = shard_batch_stacked(self.mesh, chunk)
            cache = self.image_cache if use_cache else None
            self.variables, self.opt_state, stats = self._multi_steps[key](
                self.variables, self.opt_state, stacked, cache)
            pending.append((stats, bs, len(chunk)))

        buf, buf_bytes, chunk_len = [], 0, None
        for it, batch in enumerate(loader):
            if it >= n_iters:
                break
            batch.pop("meta", None)
            if rows and "img_idx" in batch:
                check_shard_routing(batch["img_idx"], d, rows)
            if chunk_len is None:
                per_batch = sum(np.asarray(v).nbytes
                                for v in batch.values())
                chunk_len = max(1, min(n_iters,
                                       cap // max(per_batch, 1)))
                # one program for the whole (short) epoch beats two
                chunk_len = min(chunk_len, max(1, n_iters))
            buf.append(batch)
            buf_bytes += sum(np.asarray(v).nbytes for v in batch.values())
            if len(buf) >= chunk_len or buf_bytes >= cap:
                run_chunk(buf)
                buf, buf_bytes = [], 0
        if buf:
            run_chunk(buf)
        flush()
        return {k: m.avg for k, m in meters.items()}

    def run_epoch(self, phase, epoch, loader, num_iters=-1, print_iter=0,
                  on_batch=None, results=None):
        meters = {}
        data_time = AverageMeter()
        batch_time = AverageMeter()
        end = time.time()
        n_iters = len(loader) if num_iters < 0 else num_iters

        # Stats materialize lazily: a per-scalar float(stats) is a device
        # sync, and through the axon tunnel every individual fetch is a
        # full network round trip (~0.1-0.8 s EACH) — fetching the loss
        # scalar per step made the tunnel, not the chip, the training
        # critical path. Buffer the device dicts and drain them with ONE
        # jax.device_get over the whole pending list (a single batched
        # RPC: measured 1 ms for 48 scalars vs 37 s as float() calls),
        # only when printing or at epoch end.
        pending = []

        def flush():
            if not pending:
                return
            fetched = jax.device_get([st for st, _ in pending])
            for st, (_, bs) in zip(fetched, pending):
                for k, v in st.items():
                    meters.setdefault(k, AverageMeter()).update(
                        float(v), bs)
            pending.clear()

        # Scan-based epoch (make_multi_train_step): when no per-step host
        # hook needs to observe intermediate state, run the whole epoch
        # (chunked) as one jitted lax.scan — one upload + one dispatch +
        # one stats fetch per chunk instead of per step.
        import os as _os
        if (phase == "train" and on_batch is None
                and not getattr(self.opt, "debug", 0) > 0
                and not (results is not None
                         and getattr(self.opt, "test", False))
                and print_iter <= 0
                and _os.environ.get("CODENET_SCAN_EPOCH", "1") == "1"):
            return self._run_epoch_scan(epoch, loader, n_iters, meters)

        for it, batch in enumerate(loader):
            if it >= n_iters:
                break
            meta = batch.pop("meta", None)
            bs = batch[("img_idx" if "img_idx" in batch else
                        "input_u8" if "input_u8" in batch
                        else "input")].shape[0]
            if "img_idx" in batch and self.cache_shard_rows:
                check_shard_routing(batch["img_idx"],
                                    self.mesh.shape.get("data", 1),
                                    self.cache_shard_rows)
            if bs % self.mesh.shape.get("data", 1) == 0:
                batch = shard_batch(self.mesh, batch)
            else:
                # e.g. the reference's batch-1 val loader on a multi-chip
                # mesh: batch dim not divisible -> default placement
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
            if "img_idx" in batch and self.image_cache is not None:
                # already device-resident + mesh-replicated: no transfer
                batch["cache_images"] = self.image_cache
            data_time.update(time.time() - end)

            if phase == "train":
                self.variables, self.opt_state, stats = self.train_step(
                    self.variables, self.opt_state, batch)
            else:
                stats = self.val_step(self.variables, batch)
            pending.append((stats, bs))
            if len(pending) > 64:  # bound in-flight steps (one RPC/drain)
                flush()
            batch_time.update(time.time() - end)
            end = time.time()
            if print_iter and it % print_iter == 0:
                flush()
                msg = " ".join("{} {:.4f}".format(k, m.avg)
                               for k, m in meters.items())
                # --hide_data_time drops the timer suffix (reference
                # base_trainer.py:80-84 Bar suffix gating)
                if getattr(self.opt, "hide_data_time", False):
                    times = ""
                else:
                    times = " | data {:.3f}s net {:.3f}s".format(
                        data_time.avg, batch_time.avg)
                print("{} epoch {} [{}/{}] {}{}"
                      .format(phase, epoch, it, n_iters, msg, times))
            # training-time debug rendering (reference base_trainer.py:93-94)
            # + decoded val predictions for mAP-during-training (reference
            # base_trainer.py:96-97, gated on --test). Both hooks share one
            # jitted eval forward per batch.
            want_debug = getattr(self.opt, "debug", 0) > 0
            want_save = (results is not None
                         and getattr(self.opt, "test", False))
            if want_debug or want_save:
                fwd_out = self.hooks.forward(self.variables, batch)
                if want_debug:
                    self.hooks.debug(self.variables, batch, meta, it,
                                     phase=phase, fwd_out=fwd_out)
                if want_save:
                    self.hooks.save_result(self.variables, batch, meta,
                                           results, fwd_out=fwd_out)
            if on_batch is not None:
                on_batch(it, batch, meta)
        flush()
        return {k: m.avg for k, m in meters.items()}

    def train(self, epoch, loader, **kw):
        return self.run_epoch("train", epoch, loader,
                              num_iters=self.opt.num_iters,
                              print_iter=self.opt.print_iter, **kw)

    def val(self, epoch, loader, **kw):
        """Returns (stats, results) like the reference trainer.val
        (base_trainer.py:115-116 + main.py:51-54): `results` holds decoded
        per-image predictions when --test is set, else stays empty."""
        results = {}
        stats = self.run_epoch("val", epoch, loader, results=results, **kw)
        return stats, results
