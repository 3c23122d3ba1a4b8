"""The explicit training loop — Lightning replaced by ~300 visible lines.

What Lightning did for the reference (SURVEY.md §7 design stance) — loop +
DDP + checkpoints + LR plateau + early stop + logging — is explicit here:

- one jitted train step: global-batch mean loss → XLA inserts the gradient
  ``psum`` over the ``dp`` mesh axis (no NCCL, no DDP wrapper);
- donated params/opt-state buffers (no per-step HBM churn);
- host-side ReduceLROnPlateau + EarlyStopping state machines fed by the
  epoch val loss;
- CheckpointManager: top-k/.last/best_k_models.json/best_model.pth;
- TensorBoard scalars (torch SummaryWriter when available, CSV always):
  train_loss / val_loss / test_loss / learning_rate, matching the
  reference's stream names (audio_litmodule.py:79-148).

Validation runs every epoch; the test loader additionally every 10 epochs
(reference audio_litmodule.py:109-123).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import serialize, save_serialized
from ..parallel import local_mesh, make_mesh, replicate, shard_batch
from .checkpoints import CheckpointManager
from .loggers import BaseLogger, make_default_logger
from .optimizers import set_learning_rate
from .schedulers import NoamLR


class EarlyStopping:
    """monitor/mode/patience state machine (reference audio_train.py:106-108)."""

    def __init__(self, monitor="val_loss", mode="min", patience=30, verbose=False, **_):
        self.monitor = monitor
        self.mode = mode
        self.patience = patience
        self.verbose = verbose
        self.best: Optional[float] = None
        self.bad_epochs = 0

    def step(self, metric: float) -> bool:
        """Returns True when training should stop."""
        better = (
            self.best is None
            or (metric < self.best if self.mode == "min" else metric > self.best)
        )
        if better:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
        return self.bad_epochs >= self.patience

    def state_dict(self):
        return dict(self.__dict__)

    def load_state_dict(self, state):
        self.__dict__.update(state)


class Trainer:
    def __init__(
        self,
        exp_dir: str,
        epochs: int = 500,
        early_stop: Optional[dict] = None,
        mesh=None,
        logger_dir: Optional[str] = None,
        checkpoint: Optional[dict] = None,
        test_every: int = 10,
        seed: int = 42,
        donate: bool = True,
        precision: str = "float32",
        remat: bool = False,
        logger: Optional[BaseLogger] = None,
        fused_forward: bool = False,
    ):
        self.exp_dir = exp_dir
        self.epochs = epochs
        self.mesh = mesh if mesh is not None else make_mesh()
        self.seed = seed
        self.test_every = test_every
        self.donate = donate
        assert precision in ("float32", "bfloat16")
        self.precision = precision
        self.remat = remat
        # opt-in: bf16 training forward through the fused separator kernel
        # (custom VJP, XLA-recompute backward) where a model supports it
        self.fused_forward = fused_forward
        es = dict(early_stop or {})
        es.setdefault("monitor", "val_loss/dataloader_idx_0")
        self.early_stop = EarlyStopping(**es)
        ck = dict(checkpoint or {})
        ck.setdefault("monitor", "val_loss/dataloader_idx_0")
        self.ckpt = CheckpointManager(os.path.join(exp_dir, ""), **{
            k: v for k, v in ck.items() if k in (
                "monitor", "mode", "save_top_k", "save_last", "filename")
        })
        # multi-host DP: process 0 owns checkpoints/logs (the explicit
        # analog of Lightning's @rank_zero_only, reference
        # utils/lightning_utils.py:19-21); eval runs on a host-local mesh
        # because per-host loader shards differ in batch count and global
        # collectives inside the eval loop would deadlock
        self.is_main = jax.process_index() == 0
        self.eval_mesh = local_mesh() if jax.process_count() > 1 else self.mesh
        self.logger = logger or make_default_logger(
            logger_dir or os.path.join(exp_dir, "logs")
        )
        self.state: Dict[str, Any] = {}

    # ---------------------------------------------------------------- steps
    def _build_steps(self, system):
        model = system.audio_model
        tx = system.optimizer
        train_loss = system.loss_func["train"]
        val_loss = system.loss_func["val"]

        bf16 = self.precision == "bfloat16"

        # train-mode apply: dropout/DropPath active, fed from the per-step
        # fold of the base key (reference models train with dropout —
        # tdanet.py:198-213, sepformer.py:507, bsrnn.py:14-31)
        def train_apply(p, m, r):
            return model.apply(p, m, train=True, rngs={"dropout": r})

        eval_apply = model.apply
        if self.remat:
            # rematerialize activations in the backward pass: trades FLOPs
            # for HBM — lets long-utterance/large-batch configs fit
            train_apply = jax.checkpoint(train_apply)

        fused_apply = None
        if bf16 and self.fused_forward:
            from ..models.convtasnet import (
                ConvTasNet,
                make_fused_train_apply,
                make_kernel_train_apply,
            )

            if isinstance(model, ConvTasNet):
                # best available: fused Pallas forward AND backward for the
                # TCN chain (round 5: 94 -> 28 ms/step at the lrs3 config,
                # docs/BENCHMARKS.md training table); falls back to the
                # fused-forward/XLA-recompute pairing if unavailable.
                # ConvTasNet has no dropout: either path serves both train
                # and eval.
                fused_apply = make_kernel_train_apply(model)
                if fused_apply is None:
                    fused_apply = make_fused_train_apply(model)

        base_key = jax.random.PRNGKey(self.seed + 1)

        def _loss(params, batch, loss_func, rng=None):
            mix, sources = batch
            if fused_apply is not None:
                fwd = fused_apply
            else:
                fwd = eval_apply if rng is None else partial(train_apply, r=rng)
            if bf16:
                # mixed precision: bf16 forward/backward, f32 master params,
                # loss always in f32 (the cast has a well-defined VJP)
                p = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16)
                    if hasattr(x, "dtype") and x.dtype == jnp.float32
                    else x,
                    params,
                )
                est = fwd(p, mix.astype(jnp.bfloat16))
                est = est.astype(jnp.float32)
            else:
                est = fwd(params, mix)
            return loss_func(est, sources)

        @partial(jax.jit, donate_argnums=(0, 1) if self.donate else ())
        def train_step(params, opt_state, batch, step):
            rng = jax.random.fold_in(base_key, step)
            loss, grads = jax.value_and_grad(_loss)(
                params, batch, train_loss, rng
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        @jax.jit
        def val_step(params, batch):
            return _loss(params, batch, val_loss)

        return train_step, val_step

    def _device_batch(self, np_batch, for_eval: bool = False):
        mix, sources, _keys = np_batch
        mesh = self.eval_mesh if for_eval else self.mesh
        batch = (np.asarray(mix), np.asarray(sources))
        # a tail batch (drop_last=False eval) may not divide the dp mesh:
        # place it replicated — every device computes it redundantly, but
        # the loss is exact and it's at most one batch per epoch
        if len(mix) % mesh.devices.size != 0:
            if for_eval and jax.process_count() > 1:
                # host-local replication (replicate() would assemble a
                # global array and deadlock on unequal shard sizes)
                from jax.sharding import NamedSharding, PartitionSpec as P

                s = NamedSharding(mesh, P())
                return jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, s), batch
                )
            return replicate(batch, mesh)
        return shard_batch(batch, mesh)

    def _eval_epoch(self, val_step, params, loader) -> float:
        """Batch-size-weighted mean loss over a loader.

        Device scalars accumulate lazily — one host sync at the end, not
        one per batch.  With host-sharded eval loaders the per-host
        weighted sums are combined across processes, so the global mean
        is exact even when shards differ in size."""
        if jax.process_count() > 1:
            # host-local view of the (replicated) params: eval batches live
            # on the local mesh, and jit rejects mixed-mesh inputs
            from jax.sharding import NamedSharding, PartitionSpec as P

            s = NamedSharding(self.eval_mesh, P())
            params = jax.tree_util.tree_map(
                lambda x: jax.device_put(np.asarray(x), s), params
            )
        tot = None
        wsum = 0
        for b in loader:
            n = len(b[0])
            loss = val_step(params, self._device_batch(b, for_eval=True)) * n
            tot = loss if tot is None else tot + loss
            wsum += n
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            sums = multihost_utils.process_allgather(
                jnp.asarray(
                    [float(tot) if tot is not None else 0.0, float(wsum)]
                )
            )
            return float(sums[:, 0].sum() / max(sums[:, 1].sum(), 1.0))
        if tot is None:
            return float("nan")
        return float(tot) / wsum

    # ----------------------------------------------------------------- fit
    def fit(self, system):
        model = system.audio_model
        tx = system.optimizer
        train_loader = system.train_loader
        val_loader = system.val_loader
        test_loader = system.test_loader
        scheduler = system.scheduler

        # init or resume
        start_epoch = 0
        resume = self.ckpt.maybe_resume()
        if resume is not None:
            params = jax.tree_util.tree_map(jnp.asarray, resume["params"])
            opt_state = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x,
                resume["opt_state"],
            )
            start_epoch = resume["epoch"] + 1
            if scheduler is not None and resume.get("scheduler"):
                scheduler.load_state_dict(resume["scheduler"])
            if resume.get("early_stop"):
                self.early_stop.load_state_dict(resume["early_stop"])
        else:
            sample = next(iter(val_loader if val_loader is not None else train_loader))
            mix = jnp.asarray(sample[0][:1])
            # jitted init: eager init materializes intermediate buffers on
            # device (complex64 ones crash the axon runtime — see BSRNN)
            params = jax.jit(model.init)(jax.random.PRNGKey(self.seed), mix)
            warm = getattr(system, "warm_start", None)
            if warm is not None:
                pre_params, merge_fn = warm
                params = merge_fn(params, pre_params)
            opt_state = tx.init(params)
        params = replicate(params, self.mesh)
        opt_state = jax.tree_util.tree_map(
            lambda x: replicate(x, self.mesh) if hasattr(x, "shape") else x, opt_state
        )

        train_step, val_step = self._build_steps(system)
        self.logger.log_hyperparams(getattr(system, "hparams", None) or {})

        stop = False
        global_step = start_epoch * max(1, len(train_loader))
        current_lr = getattr(scheduler, "lr", None)
        for epoch in range(start_epoch, self.epochs):
            if stop:
                break
            t0 = time.time()
            train_loader.set_epoch(epoch)
            loss_sum, nseen = None, 0
            for np_batch in train_loader:
                batch = self._device_batch(np_batch)
                n = len(np_batch[0])
                params, opt_state, loss = train_step(
                    params, opt_state, batch, global_step
                )
                global_step += 1
                if isinstance(scheduler, NoamLR):
                    current_lr = scheduler.step_batch()
                    opt_state = set_learning_rate(opt_state, current_lr)
                loss = loss * n
                loss_sum = loss if loss_sum is None else loss_sum + loss
                nseen += n
            train_loss = (
                float(loss_sum) / nseen if loss_sum is not None else float("nan")
            )

            val_loss = self._eval_epoch(val_step, params, val_loader)

            test_loss = None
            if test_loader is not None and epoch % self.test_every == 0:
                test_loss = self._eval_epoch(val_step, params, test_loader)

            # scheduler + logging (reference scalar names:
            # audio_litmodule.py:79-148 — train/val/test_loss,
            # learning_rate, val_pit_sisnr, test_pit_sisnr)
            if scheduler is not None and not isinstance(scheduler, NoamLR):
                current_lr = scheduler.step(val_loss)
                opt_state = set_learning_rate(opt_state, current_lr)
            if self.is_main:
                self.logger.log_scalar("train_loss", train_loss, epoch)
                self.logger.log_scalar("val_loss", val_loss, epoch)
                self.logger.log_scalar("val_pit_sisnr", -val_loss, epoch)
                if test_loss is not None:
                    self.logger.log_scalar("test_loss", test_loss, epoch)
                    self.logger.log_scalar("test_pit_sisnr", -test_loss, epoch)
                if current_lr is not None:
                    self.logger.log_scalar("learning_rate", current_lr, epoch)
            dt = time.time() - t0
            if self.is_main:
                print(
                    f"epoch {epoch}: train_loss={train_loss:.4f} val_loss={val_loss:.4f}"
                    + (f" test_loss={test_loss:.4f}" if test_loss is not None else "")
                    + (f" lr={current_lr:.2e}" if current_lr is not None else "")
                    + f" ({dt:.1f}s)"
                )

            # checkpoint + early stop (process 0 owns the files; the stop
            # decision derives from the globally-agreed val_loss, so every
            # host stops on the same epoch)
            if self.is_main:
                self.ckpt.save(
                    {
                        "params": params,
                        "opt_state": opt_state,
                        "scheduler": scheduler.state_dict() if scheduler else None,
                        "early_stop": self.early_stop.state_dict(),
                        "config": getattr(system, "config", None),
                    },
                    epoch,
                    val_loss,
                )
            stop = self.early_stop.step(val_loss)

        # post-fit: portable best model (reference audio_train.py:139-148)
        if self.is_main:
            self.ckpt.write_best_k()
            best = self.ckpt.load() if self.ckpt.best_k else None
            if best is not None:
                best_params = jax.tree_util.tree_map(jnp.asarray, best["params"])
                conf = serialize(model, best_params)
                save_serialized(conf, os.path.join(self.exp_dir, "best_model.pth"))
        self.logger.close()
        self.state = {"params": params, "opt_state": opt_state}
        return self.state
