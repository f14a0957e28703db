"""Trainer tests: losses vs oracles, data-parallel equivalence on the
8-device CPU mesh, training smoke (loss decreases), checkpoint/resume."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spalign_tpu.config import TrainConfig
from spalign_tpu.train import (Trainer, create_train_state, get_loss_fn,
                               make_train_step, mean_squared_error,
                               soft_label_cross_entropy,
                               softmax_cross_entropy)
from spalign_tpu.train.checkpoints import (SnapshotCallback, find_snapshot,
                                           load_predictor, load_snapshot)
from spalign_tpu.train.evaluator import Evaluator, summarize_confusion
from spalign_tpu.parallel import make_mesh, shard_batch


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


class TestLosses:
    def test_ce_ignores_void(self, rng):
        logits = rng.randn(2, 4, 4, 3).astype(np.float32)
        labels = rng.randint(-1, 3, size=(2, 4, 4)).astype(np.int32)
        got = float(softmax_cross_entropy(jnp.asarray(logits),
                                          jnp.asarray(labels)))
        p = _softmax(logits)
        valid = labels >= 0
        want = -np.log(np.take_along_axis(
            p, np.maximum(labels, 0)[..., None], axis=-1)[..., 0])
        want = want[valid].mean()
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_ce_all_void_is_finite(self):
        logits = jnp.zeros((1, 2, 2, 3))
        labels = -jnp.ones((1, 2, 2), jnp.int32)
        assert np.isfinite(float(softmax_cross_entropy(logits, labels)))

    def test_soft_label_matches_chainer_average(self, rng):
        logits = rng.randn(2, 4, 4, 3).astype(np.float32)
        t = _softmax(rng.randn(2, 4, 4, 3).astype(np.float32))
        got = float(soft_label_cross_entropy(jnp.asarray(logits),
                                             jnp.asarray(t)))
        logp = np.log(_softmax(logits))
        want = -(t * logp).mean()  # F.average over every element
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_mse_on_logits(self, rng):
        y = rng.randn(2, 3, 3, 2).astype(np.float32)
        t = rng.randn(2, 3, 3, 2).astype(np.float32)
        got = float(mean_squared_error(jnp.asarray(y), jnp.asarray(t)))
        np.testing.assert_allclose(got, ((y - t) ** 2).mean(), rtol=1e-5)


def tiny_cfg(**kw):
    base = dict(model="basic", batchsize=8, input_shape=(32, 64),
                eval_shape=(32, 64), train_iters=8, log_interval=4,
                val_interval=8, optimizer="Adam", loss="ce",
                result_dir="/tmp/spalign_test_train")
    base.update(kw)
    return TrainConfig(**base)


def synthetic_batch(rng, n, h, w, seedable=True):
    """Images whose left half is class 0 and right half class 1 — a
    trivially learnable task."""
    labels = np.zeros((n, h, w), np.int32)
    labels[:, :, w // 2:] = 1
    imgs = np.where(labels[..., None] == 1, 1.0, -1.0).astype(np.float32)
    imgs = imgs + rng.randn(n, h, w, 3).astype(np.float32) * 0.1
    return imgs, labels


class TestTrainStep:
    def test_loss_decreases(self, rng):
        cfg = tiny_cfg()
        step = make_train_step(cfg)
        state = create_train_state(cfg, sample_batch_shape=(32, 64))
        imgs, labels = synthetic_batch(rng, 8, 32, 64)
        losses = []
        for _ in range(12):
            state, m = step(state, jnp.asarray(imgs), jnp.asarray(labels))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.8, losses

    def test_data_parallel_equals_single_device(self, rng):
        """The load-bearing distributed test: one jitted step on an
        8-device sharded batch must equal the single-device step
        (gradient allreduce + GLOBAL batch-norm statistics)."""
        cfg = tiny_cfg(optimizer="MomentumSGD", lr=0.1)
        step = make_train_step(cfg)
        imgs, labels = synthetic_batch(rng, 8, 32, 64)

        state1 = create_train_state(cfg, sample_batch_shape=(32, 64))
        state1, m1 = step(state1, jnp.asarray(imgs), jnp.asarray(labels))

        mesh = make_mesh(8)
        state8 = create_train_state(cfg, sample_batch_shape=(32, 64))
        bi, bl = shard_batch(mesh, (jnp.asarray(imgs), jnp.asarray(labels)))
        state8, m8 = step(state8, bi, bl)

        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                                   rtol=1e-5)
        flat1 = jax.tree_util.tree_leaves(state1.params)
        flat8 = jax.tree_util.tree_leaves(state8.params)
        for a, b in zip(flat1, flat8):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
        # batch stats identical too (sync-BN)
        s1 = jax.tree_util.tree_leaves(state1.batch_stats)
        s8 = jax.tree_util.tree_leaves(state8.batch_stats)
        for a, b in zip(s1, s8):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_bfloat16_compute_path(self, rng):
        """compute_dtype='bfloat16' must train (finite, decreasing loss)
        with f32 params — the MXU mixed-precision option."""
        cfg = tiny_cfg(compute_dtype="bfloat16")
        step = make_train_step(cfg)
        state = create_train_state(cfg, sample_batch_shape=(32, 64))
        assert state.params["conv1"]["kernel"].dtype == jnp.float32
        imgs, labels = synthetic_batch(rng, 8, 32, 64)
        losses = []
        for _ in range(12):
            state, m = step(state, jnp.asarray(imgs), jnp.asarray(labels))
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.9, losses

    def test_mse_and_soft_paths_run(self, rng):
        for loss in ("soft", "mse"):
            cfg = tiny_cfg(loss=loss, train_iters=2)
            step = make_train_step(cfg)
            state = create_train_state(cfg, sample_batch_shape=(32, 64))
            imgs, hard = synthetic_batch(rng, 4, 32, 64)
            soft = np.stack([1.0 - hard, hard], axis=-1).astype(np.float32)
            state, m = step(state, jnp.asarray(imgs), jnp.asarray(soft))
            assert np.isfinite(float(m["loss"]))


class TestTrainerLoop:
    def test_fit_evaluator_checkpoint(self, rng, tmp_path):
        cfg = tiny_cfg(result_dir=str(tmp_path), train_iters=6,
                       val_interval=3, log_interval=3)
        trainer = Trainer(cfg, mesh=make_mesh(8))
        imgs, labels = synthetic_batch(rng, 8, 32, 64)

        def train_iter():
            while True:
                yield imgs, labels

        def val_batches():
            yield imgs, labels

        ev = Evaluator(trainer.model, val_batches, cfg.eval_shape,
                       mesh=trainer.mesh)
        ckpt = SnapshotCallback(str(tmp_path))
        trainer.fit(train_iter(), evaluator=ev, checkpointer=ckpt)

        # snapshots written at val_interval multiples
        path = find_snapshot(str(tmp_path))
        assert path.endswith("snapshot_iter_6")
        state = load_snapshot(path)
        assert int(state.step) == 6
        pred = load_predictor(path)
        assert "params" in pred and "batch_stats" in pred
        # args.txt provenance
        import os
        assert os.path.exists(os.path.join(str(tmp_path), "args.txt"))
        assert os.path.exists(os.path.join(str(tmp_path), "log"))
        # log records carry ProgressBar-analog keys (train_segnet.py:290)
        # and val records the raw FP/FN counts (train_segnet.py:138-141)
        import json
        with open(os.path.join(str(tmp_path), "log")) as f:
            log = json.load(f)
        train_recs = [r for r in log if "main/loss" in r]
        assert train_recs, log
        for r in train_recs:
            assert r["iters_per_sec"] > 0
            assert r["eta_seconds"] >= 0
            assert 0 < r["progress"] <= 1
        val_recs = [r for r in log if "val/main/FP" in r]
        assert val_recs, log
        for r in val_recs:
            assert r["val/main/FP"] >= 0 and r["val/main/FN"] >= 0

    def test_resume_from_snapshot(self, rng, tmp_path):
        cfg = tiny_cfg(result_dir=str(tmp_path), train_iters=4,
                       val_interval=2, log_interval=2)
        trainer = Trainer(cfg)
        imgs, labels = synthetic_batch(rng, 8, 32, 64)

        def it():
            while True:
                yield imgs, labels

        trainer.fit(it(), checkpointer=SnapshotCallback(str(tmp_path)))
        state = load_snapshot(find_snapshot(str(tmp_path), 4))
        trainer2 = Trainer(tiny_cfg(result_dir=str(tmp_path / "r2"),
                                    train_iters=6))
        trainer2.state = state
        trainer2.fit(it())
        assert int(trainer2.state.step) == 6


class TestEvaluator:
    def test_confusion_summary(self):
        conf = np.array([[50, 10], [5, 35]])
        s = summarize_confusion(conf)
        np.testing.assert_allclose(s["main/iou/road"], 35 / 50)
        np.testing.assert_allclose(s["main/precision"], 35 / 45)
        np.testing.assert_allclose(s["main/recall"], 35 / 40)

    def test_val_loss_sharded_equals_unsharded(self, rng):
        """val/main/loss (train_segnet.py:291-293) is the hard-CE of the
        full-res score; sharded evaluation must reproduce the unsharded
        metrics (incl. the loss) and the loss must equal the loss
        function applied to the same score by hand."""
        from spalign_tpu.train.trainer import build_model

        cfg = tiny_cfg()
        model = build_model(cfg)
        variables = model.init(jax.random.key(0),
                               jnp.zeros((1, 32, 64, 3)), train=False)
        imgs, labels = synthetic_batch(rng, 8, 32, 64)
        # eval_shape == input_shape here so the hand-check needs no resize
        batches = lambda: iter([(imgs, labels)])
        res_u = Evaluator(model, batches, (32, 64))(variables)
        res_s = Evaluator(model, batches, (32, 64),
                          mesh=make_mesh(8))(variables)
        assert np.isfinite(res_u["main/loss"])
        np.testing.assert_allclose(res_u["main/loss"], res_s["main/loss"],
                                   rtol=1e-5)
        for k in ("main/iou/road", "main/pixel_accuracy"):
            np.testing.assert_allclose(res_u[k], res_s[k], rtol=1e-6)
        score = model.apply(variables, jnp.asarray(imgs), train=False)
        want = float(softmax_cross_entropy(score, jnp.asarray(labels)))
        np.testing.assert_allclose(res_u["main/loss"], want, rtol=1e-5)


class TestOrbaxBackend:
    def test_orbax_roundtrip(self, rng, tmp_path):
        import pytest as _pytest

        try:
            import orbax.checkpoint  # noqa: F401
        except Exception:
            _pytest.skip("orbax not available")
        from spalign_tpu.train.checkpoints import (load_snapshot,
                                                   save_snapshot)

        cfg = tiny_cfg(result_dir=str(tmp_path))
        state = create_train_state(cfg, sample_batch_shape=(32, 64))
        path = save_snapshot(str(tmp_path), 7, state, backend="orbax")
        assert path.endswith(".orbax")
        restored = load_snapshot(path, template=state)
        a = jax.tree_util.tree_leaves(state.params)
        b = jax.tree_util.tree_leaves(restored.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        assert int(restored.step) == int(state.step)
