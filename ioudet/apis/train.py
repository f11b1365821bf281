"""Training API (ref: mmdet/apis/train.py (train_detector, batch_processor,
parse_losses, build_optimizer) + mmcv Runner/hooks).

TPU-native training loop:
  * one jitted ``train_step(state, batch) -> state, metrics`` with donated
    state, batch sharded over the mesh's ``data`` axis, params replicated —
    GSPMD emits the gradient AllReduce (the DDP analog);
  * SGD + momentum + weight decay with torch-ordering (decay added to the
    gradient before the momentum buffer), mmcv step LR policy with linear
    warmup;
  * frozen parameters (backbone frozen stages, FrozenBN statistics) are
    masked out of the optimizer — the requires_grad=False analog;
  * bf16 compute / fp32 params comes from the model dtype policy; the loss
    and optimizer state are always fp32 (no loss scaling needed on TPU).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..parallel import make_mesh, shard_batch, replicated
from ..utils.logging import get_root_logger
from .checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint


# --------------------------------------------------------------------------
# optimizer / schedule
# --------------------------------------------------------------------------

def make_lr_schedule(base_lr: float, lr_config: dict, iters_per_epoch: int,
                     total_epochs: int) -> Callable:
    """mmcv LrUpdaterHook semantics: per-iter linear warmup
    (k = (1 - t/warmup_iters) * (1 - ratio); lr = base * (1 - k)), then the
    'step' policy by epoch."""
    policy = lr_config.get("policy", "step")
    warmup = lr_config.get("warmup", None)
    warmup_iters = lr_config.get("warmup_iters", 500)
    warmup_ratio = lr_config.get("warmup_ratio", 1.0 / 3)
    steps = lr_config.get("step", [])
    gamma = lr_config.get("gamma", 0.1)

    def sched(step):
        epoch = step // max(iters_per_epoch, 1)
        if policy == "step":
            mult = 1.0
            for s in steps:
                mult = jnp.where(epoch >= s, mult * gamma, mult)
        elif policy == "cosine":
            total = total_epochs * iters_per_epoch
            mult = 0.5 * (1 + jnp.cos(jnp.pi * step / max(total, 1)))
        else:
            mult = 1.0
        lr = base_lr * mult
        if warmup == "linear":
            k = (1.0 - step / warmup_iters) * (1.0 - warmup_ratio)
            lr = jnp.where(step < warmup_iters, lr * (1.0 - k), lr)
        elif warmup == "constant":
            lr = jnp.where(step < warmup_iters, lr * warmup_ratio, lr)
        elif warmup == "exp":
            lr = jnp.where(step < warmup_iters,
                           lr * warmup_ratio ** (1 - step / warmup_iters), lr)
        return lr

    return sched


def make_trainable_mask(params: dict, frozen_stages: int = -1) -> dict:
    """False for params that must never be updated: FrozenBN running stats
    everywhere, and everything in backbone frozen stages (incl. the stem)."""

    frozen_prefixes = set()
    if frozen_stages >= 0:
        frozen_prefixes.update({"conv1", "bn1"})
    for s in range(1, frozen_stages + 1):
        frozen_prefixes.add(f"layer{s}_")

    def walk(tree, path):
        out = {}
        for k, v in tree.items():
            p = path + (k,)
            if isinstance(v, dict):
                out[k] = walk(v, p)
            else:
                trainable = True
                if k in ("mean", "var"):  # frozen BN statistics
                    trainable = False
                if len(p) >= 2 and p[0] == "backbone":
                    mod = p[1]
                    if any(mod == f or mod.startswith(f) for f in frozen_prefixes):
                        trainable = False
                out[k] = trainable
        return out

    return walk(params, ())


def build_optimizer(optimizer_cfg: dict, lr_schedule: Callable,
                    trainable_mask: Optional[dict] = None,
                    grad_clip: Optional[dict] = None) -> optax.GradientTransformation:
    cfg = dict(optimizer_cfg)
    opt_type = cfg.pop("type", "SGD")
    cfg.pop("lr", None)
    wd = cfg.pop("weight_decay", 0.0)
    parts = []
    if grad_clip:
        parts.append(optax.clip_by_global_norm(grad_clip.get("max_norm", 35)))
    if opt_type == "SGD":
        momentum = cfg.pop("momentum", 0.9)
        if wd:
            parts.append(optax.add_decayed_weights(wd))  # torch order
        if momentum:
            parts.append(optax.trace(decay=momentum, nesterov=cfg.pop("nesterov", False)))
    elif opt_type in ("Adam", "AdamW"):
        parts.append(optax.scale_by_adam(b1=cfg.pop("beta1", 0.9),
                                         b2=cfg.pop("beta2", 0.999)))
        if wd:
            parts.append(optax.add_decayed_weights(wd))
    else:
        raise KeyError(f"unsupported optimizer {opt_type}")
    parts.append(optax.scale_by_learning_rate(lr_schedule))
    tx = optax.chain(*parts)
    if trainable_mask is not None:
        # NOTE: optax.masked passes raw gradients through for masked-out
        # leaves (they would be applied verbatim!) — frozen parameters must
        # get a hard zero update instead.
        labels = jax.tree.map(lambda t: "train" if t else "freeze",
                              trainable_mask)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels)
    return tx


def parse_losses(losses: Dict[str, jnp.ndarray]):
    """ref: mmdet/apis/train.py (parse_losses): total = sum of every entry
    whose key contains 'loss' (so rpn_loss_* / s0_loss_* stages count)."""
    total = sum(v for k, v in losses.items() if "loss" in k)
    log_vars = dict(losses)
    log_vars["loss"] = total
    return total, log_vars


# --------------------------------------------------------------------------
# train step
# --------------------------------------------------------------------------

def _needs_sampler_rng(detector) -> bool:
    """Two-stage proposal sampling AND RPN-style anchor subsampling
    (non-focal cls losses) draw per-step randomness; an unused rng stream is
    harmless, so every detector gets one."""
    return True


def make_train_step(detector, tx: optax.GradientTransformation,
                    mesh=None) -> Callable:
    """Builds the jitted SPMD train step.  ``state`` = {params, opt_state,
    step}; batch keys: img, gt_bboxes, gt_labels, gt_valid, img_shape,
    pad_shape (+ gt_masks for mask detectors).  Two-stage samplers get a
    per-step folded rng."""

    def step_fn(state, batch):
        # extra mutable collections (e.g. GHM's EMA bin counts under 'ghm')
        # ride the train state like the reference's torch-module buffers
        model_state = state.get("model_state", {})

        def loss_fn(params):
            args = [batch["img"], batch["gt_bboxes"], batch["gt_labels"],
                    batch["gt_valid"], batch["img_shape"], batch["pad_shape"]]
            kwargs = {}
            if "proposals" in batch:  # FastRCNN family (pipeline proposals)
                kwargs["proposals"] = batch["proposals"]
                kwargs["prop_valid"] = batch["prop_valid"]
                if "gt_masks" in batch:
                    kwargs["gt_masks"] = batch["gt_masks"]
            elif "gt_masks" in batch:  # mask-branch detectors
                args.append(batch["gt_masks"])
            if "gt_bboxes_ignore" in batch:  # crowd/ignore regions
                kwargs.update(gt_bboxes_ignore=batch["gt_bboxes_ignore"],
                              gt_ignore_valid=batch["gt_ignore_valid"])
            if "gt_semantic_seg" in batch:  # HTC semantic branch
                kwargs["gt_semantic_seg"] = batch["gt_semantic_seg"]
            kwargs["method"] = detector.forward_train
            kwargs["rngs"] = ({"sampler": jax.random.fold_in(
                jax.random.PRNGKey(0), state["step"])}
                if _needs_sampler_rng(detector) else None)
            variables = {"params": params, **model_state}
            if model_state:
                losses, new_model_state = detector.apply(
                    variables, *args, **kwargs,
                    mutable=list(model_state.keys()))
            else:
                losses = detector.apply(variables, *args, **kwargs)
                new_model_state = model_state
            total, log_vars = parse_losses(losses)
            return total, (log_vars, new_model_state)

        (_, (log_vars, new_model_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        new_state = dict(params=params, opt_state=opt_state,
                         step=state["step"] + 1)
        if "model_state" in state:
            new_state["model_state"] = new_model_state
        return new_state, log_vars

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(step_fn, donate_argnums=(0,),
                   in_shardings=(repl, data), out_shardings=(repl, repl))


def init_train_state(detector, tx, rng, sample_batch) -> dict:
    variables = detector.init(rng, sample_batch["img"][:1])
    params = variables["params"]
    opt_state = tx.init(params)
    return dict(params=params, opt_state=opt_state,
                step=jnp.zeros((), jnp.int32),
                model_state={k: v for k, v in variables.items()
                             if k != "params"})


# --------------------------------------------------------------------------
# runner (epoch-based, hook-driven like mmcv Runner)
# --------------------------------------------------------------------------

class Runner:
    """Minimal epoch runner with the reference's hook points: per-iter
    logging, per-epoch checkpointing, optional eval hook."""

    def __init__(self, detector, train_step, state, work_dir: str,
                 logger=None, log_interval: int = 50,
                 checkpoint_interval: int = 1, mesh=None,
                 eval_hook: Optional[Callable] = None,
                 lr_schedule: Optional[Callable] = None,
                 meta: Optional[dict] = None,
                 tensorboard: bool = False):
        self.detector = detector
        self.train_step = train_step
        self.state = state
        self.work_dir = work_dir
        self.logger = logger or get_root_logger()
        self.log_interval = log_interval
        self.checkpoint_interval = checkpoint_interval
        self.mesh = mesh
        self.eval_hook = eval_hook
        self.lr_schedule = lr_schedule
        self.meta = meta or {}
        self.epoch = 0
        os.makedirs(work_dir, exist_ok=True)
        self.log_file = os.path.join(work_dir, "log.json")
        self.tb_writer = None
        if tensorboard:
            # optional TensorBoard sink (ref: TensorboardLoggerHook)
            try:
                import tensorflow as tf
                self.tb_writer = tf.summary.create_file_writer(
                    os.path.join(work_dir, "tf_logs"))
            except ImportError:
                self.logger.warning("tensorflow unavailable; TB logging off")

    def resume(self, path: Optional[str] = None) -> bool:
        path = path or latest_checkpoint(self.work_dir)
        if not path or not os.path.isdir(path):
            return False
        self.state, meta = load_checkpoint(path, self.state)
        self.epoch = int(meta.get("epoch", 0))
        self.logger.info(f"resumed from {path} at epoch {self.epoch}")
        return True

    def _log(self, record: dict):
        self.logger.info(" ".join(f"{k}={v:.4f}" if isinstance(v, float)
                                  else f"{k}={v}" for k, v in record.items()))
        if jax.process_index() == 0:
            with open(self.log_file, "a") as f:
                f.write(json.dumps(record, default=float) + "\n")
            if self.tb_writer is not None:
                step = record.get("step", 0)
                for k, v in record.items():
                    if isinstance(v, (int, float)) and k not in ("epoch",
                                                                 "iter",
                                                                 "step"):
                        with self.tb_writer.as_default():
                            import tensorflow as tf
                            tf.summary.scalar(
                                f"{record.get('mode', 'train')}/{k}",
                                float(v), step=int(step))

    def run(self, loader, total_epochs: int):
        for epoch in range(self.epoch, total_epochs):
            self.epoch = epoch
            loader.set_epoch(epoch)
            t_data = time.time()
            window: Dict[str, list] = {}
            for i, batch in enumerate(loader):
                batch = self._to_device(batch)
                data_time = time.time() - t_data
                self.state, log_vars = self.train_step(self.state, batch)
                if (i + 1) % self.log_interval == 0:
                    log_vars = jax.device_get(log_vars)
                    step = int(jax.device_get(self.state["step"]))
                    iter_time = (time.time() - t_data)
                    rec = dict(mode="train", epoch=epoch + 1, iter=i + 1,
                               step=step, data_time=round(data_time, 4),
                               time=round(iter_time, 4))
                    if self.lr_schedule is not None:
                        rec["lr"] = float(self.lr_schedule(step))
                    rec.update({k: float(v) for k, v in log_vars.items()})
                    self._log(rec)
                t_data = time.time()
            if (epoch + 1) % self.checkpoint_interval == 0:
                self.save(f"epoch_{epoch + 1}")
            if self.eval_hook is not None:
                metrics = self.eval_hook(self.detector, self.state["params"])
                self._log(dict(mode="val", epoch=epoch + 1, **metrics))
        return self.state

    def _to_device(self, batch):
        keep = ("img", "gt_bboxes", "gt_labels", "gt_valid", "img_shape",
                "pad_shape", "gt_masks", "gt_bboxes_ignore",
                "gt_ignore_valid", "gt_semantic_seg", "proposals",
                "prop_valid")
        batch = {k: batch[k] for k in keep if k in batch}
        if self.mesh is not None:
            return shard_batch(self.mesh, batch)
        return batch

    def save(self, name: str):
        if jax.process_index() != 0:
            return
        meta = dict(epoch=self.epoch + 1,
                    step=int(jax.device_get(self.state["step"])), **self.meta)
        path = save_checkpoint(self.work_dir, name, self.state, meta)
        self.logger.info(f"saved checkpoint {path}")


# --------------------------------------------------------------------------
# top-level entry (ref: train_detector)
# --------------------------------------------------------------------------

def train_detector(detector, dataset, cfg, work_dir: str,
                   validate: bool = False, val_dataset=None,
                   resume_from: Optional[str] = None,
                   load_from: Optional[str] = None,
                   auto_resume: bool = True, seed: int = 0,
                   n_devices: Optional[int] = None):
    from ..data import build_dataloader

    logger = get_root_logger()
    mesh = make_mesh(n_devices)
    data_cfg = cfg["data"]
    # Per-PROCESS batch = imgs_per_gpu x this process's devices; the loader
    # additionally shards the batch stream by process_index, and shard_batch
    # assembles the global array from the per-process shards — using the
    # GLOBAL device count here would double-book the batch (each process
    # loading a full global batch of different images).
    from ..parallel import local_device_count
    loader = build_dataloader(dataset, data_cfg.get("imgs_per_gpu", 2),
                              data_cfg.get("workers_per_gpu", 2),
                              num_gpus=local_device_count(mesh),
                              shuffle=True, seed=seed)
    iters_per_epoch = len(loader)
    total_epochs = cfg.get("total_epochs", 12)
    base_lr = cfg["optimizer"]["lr"]
    sched = make_lr_schedule(base_lr, dict(cfg.get("lr_config", {})),
                             iters_per_epoch, total_epochs)

    sample = next(iter(loader))
    rng = jax.random.PRNGKey(seed)
    # init through forward_train: traces EVERY branch (incl. second-stage /
    # mask heads) so the param tree is complete for any detector family
    init_args = [jnp.asarray(sample["img"][:1]),
                 jnp.asarray(sample["gt_bboxes"][:1]),
                 jnp.asarray(sample["gt_labels"][:1]),
                 jnp.asarray(sample["gt_valid"][:1]),
                 jnp.asarray(sample["img_shape"][:1]),
                 jnp.asarray(sample["pad_shape"][:1])]
    init_kwargs = {}
    if "proposals" in sample:  # FastRCNN family
        init_kwargs["proposals"] = jnp.asarray(sample["proposals"][:1])
        init_kwargs["prop_valid"] = jnp.asarray(sample["prop_valid"][:1])
        if "gt_masks" in sample:
            init_kwargs["gt_masks"] = jnp.asarray(sample["gt_masks"][:1])
    elif "gt_masks" in sample:
        init_args.append(jnp.asarray(sample["gt_masks"][:1]))
    if "gt_semantic_seg" in sample:
        init_kwargs["gt_semantic_seg"] = jnp.asarray(
            sample["gt_semantic_seg"][:1])
    variables = detector.init(
        {"params": rng, "sampler": jax.random.PRNGKey(seed + 1)},
        *init_args, method=detector.forward_train, **init_kwargs)
    load_from = load_from or cfg.get("load_from")
    if load_from:
        # weights only (ref: cfg.load_from vs resume_from): partial trees
        # (e.g. a converted pretrained backbone) merge over the random init
        from .checkpoint import load_checkpoint as _load
        state0, _ = _load(load_from)
        loaded = state0.get("params", state0)

        def merge(init_tree, new_tree):
            out = dict(init_tree)
            for k, v in new_tree.items():
                if k in out and isinstance(v, dict) and isinstance(out[k], dict):
                    out[k] = merge(out[k], v)
                else:
                    out[k] = jnp.asarray(v)
            return out

        variables = {**variables, "params": merge(variables["params"],
                                                  loaded)}
        get_root_logger().info(f"loaded weights from {load_from}")
    frozen_stages = getattr(detector.backbone, "frozen_stages", -1)
    mask = make_trainable_mask(variables["params"], frozen_stages)
    tx = build_optimizer(dict(cfg["optimizer"]), sched, mask,
                         grad_clip=dict(cfg.get("optimizer_config", {})).get(
                             "grad_clip"))
    state = dict(params=variables["params"], opt_state=tx.init(variables["params"]),
                 step=jnp.zeros((), jnp.int32),
                 model_state={k: v for k, v in variables.items()
                              if k != "params"})
    step_fn = make_train_step(detector, tx, mesh)

    eval_hook = None
    if validate and val_dataset is not None:
        from .test import make_eval_hook
        eval_hook = make_eval_hook(val_dataset, cfg)

    log_cfg = dict(cfg.get("log_config", {}))
    runner = Runner(detector, step_fn, state, work_dir, logger=logger,
                    log_interval=log_cfg.get("interval", 50),
                    checkpoint_interval=dict(cfg.get("checkpoint_config", {})).get("interval", 1),
                    mesh=mesh, eval_hook=eval_hook, lr_schedule=sched,
                    meta=dict(config=getattr(cfg, "text", ""),
                              CLASSES=getattr(dataset, "CLASSES", None)),
                    tensorboard=log_cfg.get("tensorboard", False))
    if resume_from:
        runner.resume(resume_from)
    elif auto_resume:
        runner.resume()
    return runner.run(loader, total_epochs)
