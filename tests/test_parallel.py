"""Multi-chip data parallelism on the 8-device virtual CPU mesh — the
TPU-world fake cluster the reference never had (SURVEY.md §4)."""

import jax
import numpy as np
import pytest


def test_eight_devices():
    assert len(jax.devices()) == 8, jax.devices()


def test_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_sharded_batch_matches_single_device():
    """Same loss whether the batch is sharded over 8 devices or 1."""
    from codenet_tpu import config as cfg
    from codenet_tpu.engine.trainer import Trainer
    from codenet_tpu.parallel import get_mesh, shard_batch

    opt = cfg.parse(
        "ctdet --dataset pascal --arch shufflenetv2 --input_res 64 "
        "--batch_size 8".split())
    opt = cfg.update_dataset_info_and_set_heads(
        opt, cfg.DATASET_SPECS["pascal"])

    rng = np.random.RandomState(0)
    b, out_res = 8, 16
    batch = {
        "input": rng.randn(b, 64, 64, 3).astype(np.float32),
        "hm": np.zeros((b, out_res, out_res, 20), np.float32),
        "wh": np.ones((b, 50, 2), np.float32),
        "reg": np.zeros((b, 50, 2), np.float32),
        "ind": np.zeros((b, 50), np.int64),
        "reg_mask": np.ones((b, 50), np.uint8),
    }
    batch["hm"][:, 8, 8, 0] = 1.0

    losses = {}
    for ndev in (1, 8):
        mesh = get_mesh(jax.devices()[:ndev])
        tr = Trainer(opt, mesh=mesh)
        tr.init(rng=jax.random.PRNGKey(7))
        sharded = shard_batch(mesh, batch)
        _, _, stats = tr.train_step(tr.variables, tr.opt_state, sharded)
        losses[ndev] = float(stats["loss"])
    np.testing.assert_allclose(losses[1], losses[8], rtol=2e-4)
