"""Data-parallel SegNet trainer (replaces train_segnet.py + ChainerMN).

One jit-compiled train step over a 1-D ``data`` mesh:
  * the global batch is sharded over devices (parallel.shard_batch);
  * gradients reduce over ICI automatically (XLA inserts the psum);
  * batch norm sees the GLOBAL batch — the sync-BN the reference needed
    MultiNodeBatchNormalization for comes free from pjit semantics;
  * optimizer states and params are replicated.

Optimizers match the reference recipes (train_segnet.py:230-240, 260-263):
Adam (the README recipe) or MomentumSGD(lr, momentum=0.9) with coupled
weight decay and x0.1 lr decay every decay_iteration.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict
from typing import Any, Callable, Iterable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from spalign_tpu.config import TrainConfig
from spalign_tpu.models import SegNet, SegNetBasic
from spalign_tpu.parallel import make_mesh, replicate, shard_batch
from spalign_tpu.train.losses import get_loss_fn


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def build_model(cfg: TrainConfig):
    # compute_dtype='bfloat16' runs convs/BN in bf16 on the MXU with f32
    # params (flax mixed precision); the loss/grad transforms stay f32
    dtype = {"float32": None,
             "bfloat16": jnp.bfloat16}[cfg.compute_dtype]
    if cfg.model == "basic":
        return SegNetBasic(n_class=cfg.n_class, dtype=dtype)
    if cfg.model == "normal":
        return SegNet(n_class=cfg.n_class, dtype=dtype)
    raise ValueError(f"unknown model {cfg.model!r}")


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    if cfg.optimizer == "Adam":
        # chainer Adam defaults: alpha=1e-3, b1=.9, b2=.999, eps=1e-8
        return optax.adam(1e-3)
    if cfg.optimizer == "MomentumSGD":
        sched = optax.exponential_decay(
            init_value=cfg.lr,
            transition_steps=max(1, cfg.decay_iteration),
            decay_rate=0.1, staircase=True) \
            if cfg.decay_iteration > 0 else cfg.lr
        chain = []
        if cfg.weight_decay > 0:
            # chainer WeightDecay hook: grad += wd * param (coupled L2)
            chain.append(optax.add_decayed_weights(cfg.weight_decay))
        chain.append(optax.sgd(sched, momentum=0.9))
        return optax.chain(*chain)
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")


def create_train_state(cfg: TrainConfig, model=None,
                       sample_batch_shape=None) -> TrainState:
    model = model or build_model(cfg)
    h, w = cfg.input_shape if sample_batch_shape is None \
        else sample_batch_shape
    variables = model.init(jax.random.key(cfg.seed),
                           jnp.zeros((1, h, w, 3), jnp.float32),
                           train=False)
    tx = make_optimizer(cfg)
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params=variables["params"],
                      batch_stats=variables["batch_stats"],
                      opt_state=tx.init(variables["params"]))


def make_train_step(cfg: TrainConfig, model=None) -> Callable:
    """Returns jitted step(state, images, labels) -> (state, metrics).

    jit over sharded inputs = the whole distributed train step; donates
    the state buffers so params update in place on device."""
    model = model or build_model(cfg)
    tx = make_optimizer(cfg)
    loss_fn = get_loss_fn(cfg.loss)

    def step(state: TrainState, images, labels):
        def compute_loss(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"])
            return loss_fn(out, labels), mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_stats, opt_state=new_opt), metrics

    return jax.jit(step, donate_argnums=(0,))


class Trainer:
    """Training loop with the reference's observability surface:
    JSONL log (LogReport), stdout rows (PrintReport), snapshots every
    val_interval, evaluation via train.evaluator, args.txt provenance
    (train_segnet.py:253-303)."""

    def __init__(self, cfg: TrainConfig, model=None, mesh=None):
        self.cfg = cfg
        self.model = model or build_model(cfg)
        if mesh is None:
            n = cfg.num_devices
            if n is None:
                # auto: the most devices that evenly divide the global
                # batch (the reference requires the same of mpiexec -np)
                n = len(jax.devices())
                while cfg.batchsize % n != 0:
                    n -= 1
            mesh = make_mesh(n)
        self.mesh = mesh
        self.step_fn = make_train_step(cfg, self.model)
        self.state = create_train_state(cfg, self.model)
        # replicate state over the mesh
        rep = replicate(self.mesh)
        self.state = jax.tree.map(lambda x: jax.device_put(x, rep),
                                  self.state)
        os.makedirs(cfg.result_dir, exist_ok=True)
        with open(os.path.join(cfg.result_dir, "args.txt"), "w") as f:
            json.dump(asdict(cfg), f, indent=4, sort_keys=True, default=str)
        self._log_path = os.path.join(cfg.result_dir, "log")
        self._log: list = []
        self._t0 = time.time()

    def variables(self):
        return {"params": self.state.params,
                "batch_stats": self.state.batch_stats}

    def fit(self, train_iter: Iterable, evaluator=None,
            checkpointer=None, start_step: int = 0):
        """train_iter yields (images (B,H,W,3) float32, labels) host
        arrays with the GLOBAL batch size."""
        cfg = self.cfg
        last_loss = float("nan")
        # track the step on host: reading state.step every iteration
        # would be a device sync in the middle of the training loop
        step = int(self.state.step)
        self._dump_graph()
        fit_t0, fit_step0 = time.time(), step
        for images, labels in train_iter:
            if step >= cfg.train_iters:
                break
            batch = shard_batch(self.mesh, (jnp.asarray(images),
                                            jnp.asarray(labels)))
            self.state, metrics = self.step_fn(self.state, *batch)
            step += 1

            if step % cfg.log_interval == 0 or step == cfg.train_iters:
                last_loss = float(metrics["loss"])
                # ProgressBar analog (train_segnet.py:290): rate since
                # fit start (first interval includes the compile) + ETA
                rate = (step - fit_step0) / max(time.time() - fit_t0,
                                                1e-9)
                rec = {"iteration": step, "main/loss": last_loss,
                       "grad_norm": float(metrics["grad_norm"]),
                       "lr": self._current_lr(step),
                       "elapsed_time": time.time() - self._t0,
                       "iters_per_sec": rate,
                       "eta_seconds": max(cfg.train_iters - step, 0)
                       / max(rate, 1e-9),
                       "progress": step / max(cfg.train_iters, 1)}
                self._report(rec)
            if step % cfg.val_interval == 0 or step == cfg.train_iters:
                if evaluator is not None:
                    ev = evaluator(self.variables())
                    self._report({"iteration": step,
                                  **{f"val/{k}": v for k, v in ev.items()}})
                    self._plots()
                if checkpointer is not None:
                    checkpointer(step, self.state)
                self._flush_log()
        self._flush_log()
        return self.state

    def _dump_graph(self):
        """Write the compiled train step's StableHLO once (the analog of
        chainer extensions.dump_graph, train_segnet.py:279)."""
        try:
            h, w = self.cfg.input_shape
            b = self.cfg.batchsize
            lab_shape = ((b, h, w) if self.cfg.loss == "ce"
                         else (b, h, w, self.cfg.n_class))
            lab_dtype = jnp.int32 if self.cfg.loss == "ce" else jnp.float32
            lowered = self.step_fn.lower(
                self.state,
                jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32),
                jax.ShapeDtypeStruct(lab_shape, lab_dtype))
            with open(os.path.join(self.cfg.result_dir,
                                   "train_step.stablehlo.txt"), "w") as f:
                f.write(lowered.as_text())
        except Exception:
            pass  # observability only; never block training

    def _current_lr(self, step: int) -> float:
        """Effective learning rate (the reference's observe_lr)."""
        cfg = self.cfg
        if cfg.optimizer == "Adam":
            return 1e-3
        if cfg.decay_iteration > 0:
            return cfg.lr * 0.1 ** (step // cfg.decay_iteration)
        return cfg.lr

    def _plots(self):
        """PNG training curves, mirroring the reference's PlotReport set
        (train_segnet.py:291-303: loss / accuracy / ious / prerec)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return

        def series(key):
            pts = [(e["iteration"], e[key]) for e in self._log if key in e]
            return ([p[0] for p in pts], [p[1] for p in pts])

        panels = {
            "loss.png": ["main/loss", "val/main/loss"],
            "ious.png": ["val/main/iou/road", "val/main/iou/non_road"],
            "prerec.png": ["val/main/precision", "val/main/recall"],
            "accuracy.png": ["val/main/class_accuracy/road",
                             "val/main/class_accuracy/non_road"],
        }
        for fn, keys in panels.items():
            data = [(k, *series(k)) for k in keys]
            if not any(xs for _, xs, _ in data):
                continue
            fig, ax = plt.subplots()
            for k, xs, ys in data:
                if xs:
                    ax.plot(xs, ys, marker=".", label=k)
            ax.set_xlabel("iteration")
            ax.legend(fontsize=7)
            ax.grid(True, alpha=0.3)
            fig.savefig(os.path.join(self.cfg.result_dir, fn),
                        bbox_inches="tight")
            plt.close(fig)

    def _report(self, rec):
        """O(1) per entry: stream a JSONL line (log.jsonl); the
        reference-format `log` JSON array is rewritten only at eval
        points and at the end of fit (_flush_log), not per report."""
        self._log.append(rec)
        with open(self._log_path + ".jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(" ".join(f"{k}={v:.6g}" if isinstance(v, float) else
                       f"{k}={v}" for k, v in rec.items()))

    def _flush_log(self):
        """Chainer-LogReport-format dump (one JSON array named `log`),
        the file make_table/eval.tables consume (train_segnet.py:278)."""
        with open(self._log_path, "w") as f:
            json.dump(self._log, f, indent=2)
