import os

import jax
import numpy as np
import pytest

from singa_tpu.config import OptimizerConfig, SchedulerConfig
from singa_tpu.data.batch import synthetic_batch
from singa_tpu.data.dataset import SyntheticDataset
from singa_tpu.train.loop import Trainer
from singa_tpu.train.optim import (
    EarlyStopping,
    PlateauState,
    get_learning_rate,
    make_optimizer,
    set_learning_rate,
)

from tests.test_model import TGT_LEN, tiny_config


def test_plateau_scheduler():
    st = PlateauState.create(SchedulerConfig(factor=0.5, patience=2, min_lr=1e-5), 1e-3)
    # improving: lr stays
    for m in (1.0, 0.9, 0.8):
        st = st.step_metric(m)
    assert st.lr == 1e-3
    # stall for patience+1 validations -> decay
    for m in (0.8, 0.8, 0.8):
        st = st.step_metric(m)
    assert np.isclose(st.lr, 5e-4)
    # decay floors at min_lr
    for _ in range(40):
        st = st.step_metric(0.8)
    assert st.lr >= 1e-5


def test_early_stopping():
    es = EarlyStopping(patience=3, delta=0.0)
    assert es.update(1.0)
    assert not es.update(1.0)
    es.update(1.0)
    es.update(1.0)
    assert es.should_stop


def test_optimizer_lr_injection():
    opt = make_optimizer(OptimizerConfig(lr=1e-4))
    params = {"w": np.zeros(3, np.float32)}
    state = opt.init(params)
    assert np.isclose(get_learning_rate(state), 1e-4)
    state = set_learning_rate(state, 5e-5)
    assert np.isclose(get_learning_rate(state), 5e-5)


@pytest.mark.slow
def test_trainer_loss_decreases_and_resumes(tmp_path):
    cfg = tiny_config()
    data = SyntheticDataset(8, cfg.shapes, TGT_LEN, seed=0, num_distinct=2)
    logdir = str(tmp_path / "run")

    trainer = Trainer(cfg, logdir=logdir, use_mesh=True)
    trainer.init_state(next(iter(data)))
    losses = []
    it = iter(data)
    for _ in range(8):
        trainer.step += 1
        batch = trainer._put(next(it))
        trainer.params, trainer.opt_state, loss, _ = trainer._train_step(
            trainer.params, trainer.opt_state, batch
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    trainer.save()
    trainer.ckpt.wait()

    # resume into a fresh trainer
    trainer2 = Trainer(cfg, logdir=logdir, use_mesh=True)
    step = trainer2.init_state(next(iter(data)))
    assert step == trainer.step
    # one more step works after restore
    batch = trainer2._put(next(iter(data)))
    p, o, loss2, _ = trainer2._train_step(trainer2.params, trainer2.opt_state, batch)
    assert np.isfinite(float(loss2))


def test_microbatch_grads_match_monolithic(tmp_path):
    """Gradient accumulation (TrainConfig.microbatch) produces the same loss
    and the same first-step update as the monolithic batch."""
    import dataclasses

    cfg = tiny_config()
    cfg_mono = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, microbatch=None)
    )
    cfg_micro = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, microbatch=2)
    )
    data = SyntheticDataset(4, cfg.shapes, TGT_LEN, seed=3)
    batch = next(iter(data.epoch()))

    losses = {}
    params_after = {}
    for name, c in [("mono", cfg_mono), ("micro", cfg_micro)]:
        tr = Trainer(c, logdir=str(tmp_path / name), use_mesh=False)
        tr.init_state(batch, seed=7)
        p, o, loss, gn = tr._train_step(tr.params, tr.opt_state, batch)
        losses[name] = float(loss)
        params_after[name] = p
    assert abs(losses["mono"] - losses["micro"]) < 2e-3, losses
    flat_m = jax.tree_util.tree_leaves(params_after["mono"])
    flat_u = jax.tree_util.tree_leaves(params_after["micro"])
    for a, b in zip(flat_m, flat_u):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=5e-4
        )


def test_bucketed_dataset_two_shapes_train(tmp_path):
    """Graph-size scaling (SURVEY §5.7): mixed pocket-size shards batch
    homogeneously per bucket, and the same Trainer steps both bucket shapes
    (one jit-cached executable each) with finite losses."""
    import dataclasses

    from singa_tpu.data.dataset import BucketedNpzDataset, save_complex

    cfg = tiny_config()
    small = cfg.shapes
    large = dataclasses.replace(
        small, num_protein_nodes=32, num_pp_edges=64
    )
    root = tmp_path / "ds" / "train"
    os.makedirs(root)
    for i in range(4):
        save_complex(
            str(root / f"s{i}.npz"), synthetic_batch(i, 1, small, TGT_LEN)
        )
    for i in range(2):
        save_complex(
            str(root / f"l{i}.npz"), synthetic_batch(10 + i, 1, large, TGT_LEN)
        )

    ds = BucketedNpzDataset(str(root), batch_size=2, seed=0)
    assert len(ds.buckets) == 2
    assert len(ds) == 3  # 2 small batches + 1 large batch per epoch
    shapes_seen = {b.protein.x.shape[1] for b in ds.epoch()}
    assert shapes_seen == {small.num_protein_nodes, large.num_protein_nodes}

    trainer = Trainer(cfg, logdir=str(tmp_path / "run"), use_mesh=False)
    batches = list(ds.epoch())
    trainer.init_state(batches[0])
    for b in batches:
        trainer.params, trainer.opt_state, loss, _ = trainer._train_step(
            trainer.params, trainer.opt_state, b
        )
        assert np.isfinite(float(loss))


def test_dataset_smaller_than_batch_upsamples(tmp_path):
    """Datasets/buckets with fewer complexes than batch_size upsample with
    replacement to one full batch per epoch. Regression: every bucket below
    batch_size used to yield an EMPTY epoch, and the endless __iter__ spun
    forever (hung the real-data overfit run on the 4 bundled complexes)."""
    from singa_tpu.data.dataset import (
        BucketedNpzDataset,
        NpzDataset,
        save_complex,
    )

    cfg = tiny_config()
    root = tmp_path / "ds" / "train"
    os.makedirs(root)
    for i in range(3):
        save_complex(
            str(root / f"c{i}.npz"), synthetic_batch(i, 1, cfg.shapes, TGT_LEN)
        )

    for ds in (
        NpzDataset(str(root), batch_size=4, seed=0),
        BucketedNpzDataset(str(root), batch_size=4, seed=0),
    ):
        assert len(ds) == 1
        batches = list(ds.epoch())
        assert len(batches) == 1
        assert batches[0].protein.x.shape[0] == 4
        # endless iterator makes progress (used to hang before the first item)
        it = iter(ds)
        assert next(it).protein.x.shape[0] == 4

    # bucket signature keys on the [E, 2] edge COUNT axis, not the pair axis
    bd = BucketedNpzDataset(str(root), batch_size=4, seed=0)
    (sig,) = bd.buckets.keys()
    assert sig == (cfg.shapes.num_protein_nodes, cfg.shapes.num_pp_edges)
