"""Optimizers, LR schedules, EMA.

Parity:
- exponential staircase decay (0.94 / 5000) + Adam:
  /root/reference/multigpu_train.py:103-107
- Momentum 0.9 + tf.case piecewise-constant staircase:
  /root/reference/train_pixellink.py:218-243 (its sum-of-tower-grads
  becomes a mean over the data axis times axis size if wanted; we keep the
  mean like multigpu_train.py:70-85)
- EMA with TF warmup schedule min(decay, (1+t)/(10+t)):
  tf.train.ExponentialMovingAverage(decay, global_step) as used at
  multigpu_train.py:137-139
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from tensorflow_ocr_tpu.config import TrainConfig


def exponential_staircase(lr: float, decay_steps: int, decay_rate: float,
                          staircase: bool = True) -> optax.Schedule:
    def sched(step):
        p = step / decay_steps
        if staircase:
            p = jnp.floor(p)
        return lr * decay_rate ** p
    return sched


def piecewise_staircase(lr: float, breakpoints: Sequence[int],
                        decays: Sequence[float]) -> optax.Schedule:
    """train_pixellink.py-style tf.case LR table."""
    bps = list(breakpoints)
    rates = [lr * d for d in decays]

    def sched(step):
        out = jnp.asarray(rates[0], jnp.float32)
        for bp, r in zip(bps, rates[1:]):
            out = jnp.where(step >= bp, r, out)
        return out

    return sched


def kernel_mask(params):
    """True for conv/dense kernels — the set slim's l2_regularizer covered
    (weights only, not biases/BN; reference resnet_utils.py:230)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "kernel" in str(path[-1]), params
    )


def make_optimizer(cfg: TrainConfig,
                   weight_decay: float = 0.0) -> optax.GradientTransformation:
    """LR schedule + optional L2 + Adam/Momentum.

    L2 is applied as grad += wd * w inside the chain (before the optimizer
    transform), which is mathematically identical to adding
    wd/2*sum(w^2) to the loss — but avoids materializing ~100 per-kernel
    scalar reductions every step (measured ~15 ms/step at 512px batch 32).
    """
    if getattr(cfg, "lr_breakpoints", ()):
        sched = piecewise_staircase(
            cfg.learning_rate, cfg.lr_breakpoints,
            list(cfg.lr_decays) or [1.0] * (len(cfg.lr_breakpoints) + 1),
        )
    else:
        sched = exponential_staircase(
            cfg.learning_rate, cfg.lr_decay_steps, cfg.lr_decay_rate,
            cfg.lr_staircase,
        )
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay, mask=kernel_mask))
    if cfg.optimizer == "adam":
        parts.append(optax.adam(sched))
    elif cfg.optimizer == "momentum":
        parts.append(optax.sgd(sched, momentum=cfg.momentum))
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer}")
    return optax.chain(*parts)


def ema_decay_schedule(base_decay: float, step: jnp.ndarray) -> jnp.ndarray:
    """TF ExponentialMovingAverage(num_updates=step) warmup."""
    t = step.astype(jnp.float32)
    return jnp.minimum(base_decay, (1.0 + t) / (10.0 + t))


def ema_update(ema_params, new_params, decay):
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, new_params
    )


def l2_regularization(params, weight_decay: float) -> jnp.ndarray:
    """slim l2_regularizer semantics: wd * sum(w^2)/2 over conv kernels
    (reference resnet_utils.py:230, model.py:53)."""
    if weight_decay == 0.0:
        return jnp.float32(0.0)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = jnp.float32(0.0)
    for path, leaf in flat:
        name = str(path[-1])
        if "kernel" in name:
            total = total + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return weight_decay * 0.5 * total
