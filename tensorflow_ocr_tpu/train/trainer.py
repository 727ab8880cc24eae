"""Train state, shard_map data-parallel train step, checkpointing.

TPU-native rebuild of /root/reference/multigpu_train.py:

- tf.split multi-tower + average_gradients (multigpu_train.py:70-133)
  -> one jitted shard_map step over a 1-D mesh; grads/BN stats pmean over
     ICI; state replicated; input batch sharded on its leading dim.
- placeholders + feed_dict session loop (:98-101, :169-194)
  -> device-resident TrainState donated through jit; labels generated ON
     DEVICE inside the step from padded polygon arrays (ops/labels.py), so
     each step's host->device traffic is images + tiny poly tensors.
- EMA of trainables, decay min(0.997, (1+t)/(10+t)) (:136-139)
- NaN-divergence abort (:175-177), steps/sec + examples/sec meter (:179-184)
- Saver/latest_checkpoint/pretrained warm-start with ignore_missing_vars
  (:144-162) -> Orbax checkpoints of the full state + merge-by-path
  warm start.
"""

from __future__ import annotations

import logging
import os
import time
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tensorflow_ocr_tpu.config import Config
from tensorflow_ocr_tpu.models import build_model
from tensorflow_ocr_tpu.ops import labels as label_ops
from tensorflow_ocr_tpu.ops import losses as loss_ops
from tensorflow_ocr_tpu.parallel.mesh import DATA_AXIS, make_mesh
from tensorflow_ocr_tpu.train import optim


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any


def create_train_state(cfg: Config, rng: jax.Array,
                       sample_image: np.ndarray) -> Tuple[Any, TrainState, optax.GradientTransformation]:
    from tensorflow_ocr_tpu.models import resnet as resnet_mod

    # always apply (including "xla") so a prior in-process selection of
    # the fused/ghost paths cannot leak into this trainer
    resnet_mod.set_bottleneck_impl(
        getattr(cfg.model, "bottleneck_impl", "xla"))
    model = build_model(cfg.model.name, text_scale=cfg.model.text_scale,
                        geometry=cfg.data.geometry)
    tx = optim.make_optimizer(cfg.train, weight_decay=cfg.model.weight_decay)

    # One jitted program for the whole init: eager per-op dispatch is
    # pathologically slow on remote/tunneled backends.
    @jax.jit
    def init_state(rng, img):
        variables = model.init(rng, img)
        params = variables["params"]
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
        )

    img = jnp.asarray(sample_image[:1], jnp.float32)
    state = init_state(rng, img)
    return model, state, tx


# --------------------------------------------------------------------------
# Loss dispatch: labels on device + model-family-specific loss
# --------------------------------------------------------------------------


def _pixellink_link_probs(link_logits):
    """(B,h,w,16) logits -> (B,h,w,8) P(link) via per-pair softmax
    (reference test.py:144-147)."""
    b, h, w, _ = link_logits.shape
    pairs = link_logits.reshape(b, h, w, 8, 2)
    return jax.nn.softmax(pairs, axis=-1)[..., 1]


def make_loss_fn(cfg: Config) -> Callable:
    """Returns loss(outputs, batch) -> (total, aux) for the configured
    model family + loss."""
    from tensorflow_ocr_tpu.models.detector import model_output_stride

    stride = model_output_stride(cfg.model.name)
    out_hw = cfg.data.input_size // stride
    min_ts = cfg.data.min_text_size
    lcfg = cfg.loss
    head = "east" if cfg.model.name.startswith("east") else (
        "link8" if cfg.model.name.startswith("link8") else "pixellink"
    )

    def pixellink_labels(batch):
        if "score" in batch:  # precomputed label cache (DeviceDataset)
            return batch["score"], batch["link"], batch["mask"]
        def one(p, ig, va):
            return label_ops.pixellink_labels_stride(
                p, ig, va, out_hw, out_hw, stride, min_ts
            )
        s, l, m = jax.vmap(one)(batch["polys"], batch["tags"], batch["valid"])
        return s[..., None], l, m[..., None]

    def loss_fn(outputs, batch):
        if head == "pixellink":
            score, link, mask = pixellink_labels(batch)
            if lcfg.name == "ohem":
                return loss_ops.ohem_pixel_link_loss(
                    score, outputs["pixel_logits"], link,
                    outputs["link_logits"], mask,
                    max_neg_pos_ratio=lcfg.max_neg_pos_ratio,
                    pixel_loss_weight=lcfg.pixel_loss_weight,
                    bg_neg_budget=getattr(lcfg, "bg_neg_budget", 0),
                    compute_dtype=getattr(lcfg, "compute_dtype", None),
                )
            if lcfg.name == "dice":
                pixel_probs = jax.nn.softmax(
                    outputs["pixel_logits"], axis=-1
                )[..., 1:2]
                link_probs = _pixellink_link_probs(outputs["link_logits"])
                return loss_ops.dice_pixel_link_loss(
                    score, pixel_probs, link, link_probs, mask
                )
            if lcfg.name == "positive":
                return loss_ops.positive_pixel_link_loss(
                    score, outputs["pixel_logits"], link,
                    outputs["link_logits"],
                    pixel_loss_weight=lcfg.pixel_loss_weight,
                )
            if lcfg.name == "focal":
                fl = loss_ops.focal_loss(
                    score, outputs["pixel_logits"], mask,
                    alpha=lcfg.focal_alpha, gamma=lcfg.focal_gamma,
                )
                _, aux = loss_ops.positive_pixel_link_loss(
                    score, outputs["pixel_logits"], link,
                    outputs["link_logits"],
                )
                total = fl * lcfg.pixel_loss_weight + aux["link_loss"]
                return total, {"pixel_loss": fl, "link_loss": aux["link_loss"]}
            raise ValueError(f"loss {lcfg.name} unsupported for pixellink")

        if head == "link8":
            score, link, mask = pixellink_labels(batch)
            return loss_ops.dice_pixel_link_loss(
                score, outputs["score"], link, outputs["link_probs"], mask
            )

        # EAST
        if "geo" in batch:  # precomputed label cache (DeviceDataset)
            score, geo, mask = batch["score"], batch["geo"], batch["mask"]
        else:
            score, geo, mask = label_ops.east_labels_batch(
                batch["polys"], batch["shrunk"], batch["rects"],
                batch["angles"], batch["tags"], batch["valid"],
                out_hw, out_hw, stride, min_ts,
                geometry=cfg.data.geometry,
            )
        if cfg.data.geometry == "QUAD":
            total, aux = loss_ops.east_quad_loss(
                score, outputs["score"], geo, outputs["geometry"], mask,
            )
            return (aux["cls_loss"]
                    + aux["geo_loss"] * lcfg.east_geo_weight), aux
        if lcfg.name == "focal":
            cls = loss_ops.focal_loss_binary(
                score, outputs["score"], mask,
                alpha=lcfg.focal_alpha, gamma=lcfg.focal_gamma,
            )
            _, aux = loss_ops.east_loss(
                score, outputs["score"], geo, outputs["geometry"], mask,
                angle_weight=lcfg.east_angle_weight,
            )
            total = cls + aux["geo_loss"] * lcfg.east_geo_weight
            return total, {"cls_loss": cls, "geo_loss": aux["geo_loss"]}
        return loss_ops.east_loss(
            score, outputs["score"], geo, outputs["geometry"], mask,
            angle_weight=lcfg.east_angle_weight,
        )

    return loss_fn


BATCH_KEYS = ("images", "polys", "tags", "valid", "shrunk", "rects", "angles")


def _make_step_core(model, tx, cfg: Config, include_l2_metric: bool = True):
    """Per-shard (state, batch) -> (state, metrics) step body, shared by
    the single-step and the scan'd multi-step builders.

    include_l2_metric: add the L2 value to total_loss inside the step (the
    multi-step builder sets False and adds it once per dispatch instead).
    """
    loss_fn = make_loss_fn(cfg)
    freeze_bn = cfg.model.freeze_bn

    def step_shard(state: TrainState, batch: Dict[str, jnp.ndarray]):
        def loss_of(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            if freeze_bn:
                # train=False only switches BatchNorm to running stats
                # (no dropout in these models) — batch reductions vanish.
                out = model.apply(variables, batch["images"], train=False)
                mutated = {}
            else:
                out, mutated = model.apply(
                    variables, batch["images"], train=True,
                    mutable=["batch_stats"],
                )
            model_loss, aux = loss_fn(out, batch)
            # L2 weight decay lives in the optimizer chain
            # (optim.make_optimizer); the reported total adds the L2 value
            # outside the scan, once per dispatch.
            return model_loss, (model_loss, aux, mutated.get("batch_stats", {}))

        (total, (model_loss, aux, new_bs)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(state.params)

        if cfg.train.grad_reduce == "sum":
            # train_pixellink.py:179-194 sum_gradients semantics
            grads = jax.lax.psum(grads, DATA_AXIS)
        else:
            grads = jax.lax.pmean(grads, DATA_AXIS)
        total = jax.lax.pmean(total, DATA_AXIS)
        if include_l2_metric:
            total = total + optim.l2_regularization(
                state.params, cfg.model.weight_decay
            )
        model_loss = jax.lax.pmean(model_loss, DATA_AXIS)
        new_bs = jax.lax.pmean(new_bs, DATA_AXIS) if new_bs else new_bs

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        decay = optim.ema_decay_schedule(
            cfg.train.moving_average_decay, state.step
        )
        new_ema = optim.ema_update(state.ema_params, new_params, decay)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs if new_bs else state.batch_stats,
            opt_state=new_opt,
            ema_params=new_ema,
        )
        metrics = {"total_loss": total, "model_loss": model_loss}
        for k, v in aux.items():
            metrics[k] = jax.lax.pmean(v, DATA_AXIS)
        return new_state, metrics

    return step_shard


def _compiler_options(cfg: Config) -> Optional[Dict[str, str]]:
    """XLA backend options for the train step (cfg.train.xla_options plus
    the OCR_XLA_OPTS env, comma-separated k=v pairs). Passed per-jit via
    compiler_options — the tunneled TPU client rejects TPU flags in
    XLA_FLAGS, so this is the only working channel."""
    opts: Dict[str, str] = dict(cfg.train.xla_options or {})
    env = os.environ.get("OCR_XLA_OPTS", "")
    for pair in env.split(","):
        if "=" in pair:
            k, v = pair.split("=", 1)
            opts[k.strip()] = v.strip()
    return opts or None


def make_train_step(model, tx, cfg: Config, mesh: Mesh):
    """Builds the jitted shard_map data-parallel train step.

    Batch arrays are sharded on dim 0 over the 'data' axis; state is
    replicated. Gradients and fresh BN stats are pmean'ed over ICI —
    the XLA-collective equivalent of average_gradients
    (multigpu_train.py:70-85).
    """
    step_shard = _make_step_core(model, tx, cfg)

    rep = P()
    shard = P(DATA_AXIS)
    batch_specs = {k: shard for k in BATCH_KEYS}

    sharded = shard_map(
        step_shard,
        mesh=mesh,
        in_specs=(rep, batch_specs),
        out_specs=(rep, rep),
        check_vma=False,
    )
    donate = (0,) if cfg.train.donate_state else ()
    return jax.jit(sharded, donate_argnums=donate,
                   compiler_options=_compiler_options(cfg))


def make_multi_train_step(model, tx, cfg: Config, mesh: Mesh,
                          extra_keys: tuple = (), augment: bool = False):
    """In-device multi-step training: one dispatch runs S steps via
    lax.scan over index batches gathered from an HBM-resident dataset
    (data/device_cache.DeviceDataset).

    Signature of the returned fn: (state, dataset_arrays, idx) where idx is
    (S, B_global) int32; idx is sharded on its batch dim over the data
    axis, dataset arrays are replicated, gradients pmean'ed per step.
    Amortizes host dispatch + transfer across S steps — the difference
    between ~220 and >2000 images/sec/chip through the tunneled runtime.

    augment=True applies per-image on-device similarity augmentation
    (data/device_augment) inside the scan body, keyed off state.step —
    the TPU-native replacement for the reference's host-process
    random_scale/crop_area workers (datasets/icdar.py:576-619). Labels
    must then NOT be precomputed (pass no extra_keys).
    """
    step_shard = _make_step_core(model, tx, cfg, include_l2_metric=False)

    keys = tuple(BATCH_KEYS) + tuple(extra_keys)
    if augment:
        from tensorflow_ocr_tpu.data import device_augment as DA

        assert not extra_keys, (
            "on-device augmentation rasterizes labels per step; "
            "precomputed label caches are incompatible")
        want_east = cfg.model.name.startswith("east")
        base_key = jax.random.PRNGKey(cfg.train.seed ^ 0x5EED)

    def multi(state: TrainState, dataset: Dict[str, jnp.ndarray],
              idx: jnp.ndarray):
        def body(carry, idx_s):
            batch = {k: dataset[k][idx_s] for k in keys}
            if augment:
                k = jax.random.fold_in(base_key, carry.step)
                # decorrelate across data-axis shards
                k = jax.random.fold_in(k, jax.lax.axis_index(DATA_AXIS))
                batch = DA.augment_batch(
                    k, batch, cfg.data, want_east=want_east)
            new_state, metrics = step_shard(carry, batch)
            return new_state, metrics

        # OCR_SCAN_UNROLL>1 unrolls the scan body (A/B lever for the
        # scan-carry copy overhead in the frozen-BN profile, PERF.md §4.4)
        unroll = int(os.environ.get("OCR_SCAN_UNROLL", "1"))
        state, ms = jax.lax.scan(body, state, idx, unroll=unroll)
        last = jax.tree_util.tree_map(lambda x: x[-1], ms)
        # L2 value once per dispatch (reporting-only; the decay itself is
        # applied in the optimizer chain every step)
        last["total_loss"] = last["total_loss"] + optim.l2_regularization(
            state.params, cfg.model.weight_decay
        )
        return state, last

    rep = P()
    ds_specs = {k: rep for k in keys}
    sharded = shard_map(
        multi,
        mesh=mesh,
        in_specs=(rep, ds_specs, P(None, DATA_AXIS)),
        out_specs=(rep, rep),
        check_vma=False,
    )
    donate = (0,) if cfg.train.donate_state else ()
    return jax.jit(sharded, donate_argnums=donate,
                   compiler_options=_compiler_options(cfg))


def device_batch(batch: Dict[str, np.ndarray], mesh: Mesh,
                 want_east: bool) -> Dict[str, jnp.ndarray]:
    """Pad the host batch to the full key set and shard it on the mesh."""
    out = {}
    b = batch["images"].shape[0]
    k = batch["polys"].shape[1]
    sh = NamedSharding(mesh, P(DATA_AXIS))
    defaults = {
        "shrunk": np.zeros((b, k, 4, 2), np.float32),
        "rects": np.zeros((b, k, 4, 2), np.float32),
        "angles": np.zeros((b, k), np.float32),
    }
    for key in BATCH_KEYS:
        v = batch.get(key)
        if v is None:
            v = defaults[key]
        out[key] = jax.device_put(v, sh)
    return out


# --------------------------------------------------------------------------
# Checkpointing (Orbax) — reference multigpu_train.py:144-162
# --------------------------------------------------------------------------


def _ckpt_dir(path: str, step: int) -> str:
    return os.path.join(os.path.abspath(path), f"ckpt_{step}")


DATA_ITER_STATE_FILE = "grain_iter_state.bin"


_PENDING_SAVE: Optional[Any] = None
_PENDING_SAVE_ERROR: Optional[BaseException] = None


def wait_for_pending_save() -> None:
    """Join the in-flight async checkpoint write, if any.

    Re-raises any exception the writer thread hit, so a failed async save
    cannot masquerade as success (a silently missing/partial checkpoint).
    """
    global _PENDING_SAVE, _PENDING_SAVE_ERROR
    if _PENDING_SAVE is not None:
        _PENDING_SAVE.join()
        _PENDING_SAVE = None
    if _PENDING_SAVE_ERROR is not None:
        err, _PENDING_SAVE_ERROR = _PENDING_SAVE_ERROR, None
        raise RuntimeError("async checkpoint write failed") from err


def prune_checkpoints(path: str, max_to_keep: int) -> list:
    """Delete the oldest ``ckpt_*`` dirs beyond ``max_to_keep`` (by step).

    Reference keeps at most 500 (train_pixellink.py:380 Saver
    max_to_keep); 0 disables. Returns the removed directory paths.
    """
    if not max_to_keep or not os.path.isdir(path):
        return []
    steps = []
    for name in os.listdir(path):
        if name.startswith("ckpt_"):
            try:
                steps.append(int(name.split("_")[1]))
            except ValueError:
                continue
    steps.sort()
    removed = []
    import shutil

    for s in steps[:-max_to_keep] if len(steps) > max_to_keep else []:
        d = _ckpt_dir(path, s)
        shutil.rmtree(d, ignore_errors=True)
        removed.append(d)
    return removed


def save_checkpoint(path: str, state: TrainState, data_iter=None,
                    block: bool = True, max_to_keep: int = 0) -> str:
    """Save the train state; if ``data_iter`` exposes ``get_state()``
    (data/grain_pipeline.CheckpointableLoader), persist the exact data
    position next to it so resume replays the remaining sample sequence
    (beyond the reference's step-only --restore, multigpu_train.py:152-158).

    ``block=False`` snapshots the state to host synchronously (required:
    the donated device buffers are reused by the next step) but performs
    the disk write on a background thread so training keeps dispatching.
    Saves are strictly ordered (a new one joins the previous first); call
    :func:`wait_for_pending_save` before reading the checkpoint or
    exiting. The thread is non-daemon, so an in-flight save completes
    even if the main thread returns.
    """
    import orbax.checkpoint as ocp

    step = int(state.step)
    d = _ckpt_dir(path, step)
    host_state = jax.device_get(state)
    iter_state = (data_iter.get_state()
                  if data_iter is not None and hasattr(data_iter, "get_state")
                  else None)

    def write():
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(d, host_state, force=True)
        ckptr.wait_until_finished()
        if iter_state is not None:
            with open(os.path.join(d, DATA_ITER_STATE_FILE), "wb") as f:
                f.write(iter_state)
        prune_checkpoints(path, max_to_keep)

    def write_async():
        global _PENDING_SAVE_ERROR
        try:
            write()
        except BaseException as e:  # surfaced by wait_for_pending_save()
            logging.getLogger(__name__).exception(
                "async checkpoint write to %s failed", d)
            _PENDING_SAVE_ERROR = e

    wait_for_pending_save()
    if block:
        write()
    else:
        import threading

        global _PENDING_SAVE
        _PENDING_SAVE = threading.Thread(
            target=write_async, daemon=False, name="ckpt-writer")
        _PENDING_SAVE.start()
    return d


def restore_data_iter(ckpt_dir: str, data_iter) -> bool:
    """Restore a checkpointable data iterator's position, if saved."""
    p = os.path.join(ckpt_dir, DATA_ITER_STATE_FILE)
    if data_iter is None or not hasattr(data_iter, "set_state"):
        return False
    if not os.path.exists(p):
        return False
    with open(p, "rb") as f:
        data_iter.set_state(f.read())
    return True


def latest_checkpoint(path: str) -> Optional[str]:
    if not os.path.isdir(path):
        return None
    steps = []
    for name in os.listdir(path):
        if name.startswith("ckpt_"):
            try:
                steps.append(int(name.split("_")[1]))
            except ValueError:
                continue
    if not steps:
        return None
    return _ckpt_dir(path, max(steps))


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        template,
    )
    return ckptr.restore(path, abstract)


def restore_checkpoint_for_inference(path: str, template: TrainState) -> TrainState:
    """Restore only what inference needs (params/EMA/BN stats/step).

    Skips opt_state entirely, so checkpoints stay loadable across
    optimizer changes (e.g. the adam -> chained-weight-decay migration).
    """
    import orbax.checkpoint as ocp

    def abstract(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
            tree,
        )

    target = {
        "step": abstract(template.step),
        "params": abstract(template.params),
        "batch_stats": abstract(template.batch_stats),
        "ema_params": abstract(template.ema_params),
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(
            path,
            args=ocp.args.PyTreeRestore(
                item=target,
                partial_restore=True,
            ),
        )
    return template.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        ema_params=restored["ema_params"],
    )


def warm_start(params, pretrained_params, exclude_scopes=()):
    """Merge pretrained leaves whose path+shape match — the
    slim.assign_from_checkpoint_fn(ignore_missing_vars=True) semantics
    (multigpu_train.py:149-151). ``exclude_scopes`` skips subtrees by
    top-level module name, like train_pixellink.py:301-354's
    checkpoint_exclude_scopes (e.g. the 'pixellink_layers' heads)."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    flat_pre = dict(jax.tree_util.tree_flatten_with_path(pretrained_params)[0])
    out = []
    n_loaded = 0
    for path, leaf in flat[0]:
        names = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        if any(s in names for s in exclude_scopes):
            out.append(leaf)
            continue
        pre = flat_pre.get(path)
        if pre is not None and jnp.shape(pre) == jnp.shape(leaf):
            out.append(jnp.asarray(pre, leaf.dtype))
            n_loaded += 1
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(flat[1], out), n_loaded


# --------------------------------------------------------------------------
# Trainer loop
# --------------------------------------------------------------------------


class StallWatchdog:
    """Logs when no train step completes within ``interval_s`` seconds.

    A hung device RPC (dropped TPU-tunnel connection, stuck collective)
    or a dead input-pipeline worker blocks the train loop inside a fetch
    with no Python traceback — the process sits at load 0 forever, the
    same silent failure mode as the reference's ``sess.run`` loop.
    Blocked JAX calls release the GIL, so a daemon thread can still
    report. Diagnostic only: it never kills anything. Repeated warnings
    back off linearly (1x, 2x, 3x the interval).
    """

    def __init__(self, interval_s: float, name: str = "train"):
        import threading

        self.interval = float(interval_s or 0)
        self.name = name
        self._last = time.time()
        self._last_step = -1
        self._warned = 0
        self._stop = threading.Event()
        self._thread = None
        if self.interval > 0:
            self._thread = threading.Thread(
                target=self._loop, daemon=True,
                name=f"stall-watchdog-{name}")
            self._thread.start()

    def beat(self, step: int):
        self._last = time.time()
        self._last_step = step
        self._warned = 0

    def _loop(self):
        poll = min(self.interval, 30.0)
        while not self._stop.wait(poll):
            idle = time.time() - self._last
            if idle > self.interval * (self._warned + 1):
                self._warned += 1
                if self._last_step < 0:
                    # before the first heartbeat the likeliest cause is
                    # the first-dispatch XLA compile (minutes on remote
                    # runtimes) — say so instead of crying hang
                    print(
                        f"[watchdog:{self.name}] first step not complete "
                        f"after {idle:.0f}s — XLA compile in progress, or "
                        f"the backend is hung", flush=True)
                else:
                    print(
                        f"[watchdog:{self.name}] no step completed for "
                        f"{idle:.0f}s (last step {self._last_step}; "
                        f"heartbeats fire every log window); device RPC "
                        f"or input pipeline may be hung", flush=True)

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=1.0)


class Trainer:
    """Session-loop equivalent (multigpu_train.py:152-194) with NaN guard,
    throughput meter, periodic checkpoint + summaries, and preemption
    handling (SIGTERM -> checkpoint + clean stop; the reference had no
    preemption story, SURVEY.md §5.3)."""

    def __init__(self, cfg: Config, mesh: Optional[Mesh] = None,
                 summary_writer=None, install_signal_handler: bool = False):
        self.cfg = cfg
        self.mesh = mesh or make_mesh(cfg.train.num_devices)
        self.want_east = cfg.model.name.startswith("east")
        self.summary_writer = summary_writer
        self.model = None
        self.state = None
        self.tx = None
        self._step_fn = None
        self._preempted = False
        self._restored_from = None
        self.eval_hook = None
        if cfg.train.eval_every_steps and cfg.eval.gt_path:
            from tensorflow_ocr_tpu.train.eval_hook import EvalDuringTraining

            self.eval_hook = EvalDuringTraining(cfg, cfg.eval.gt_path)
        self._calib_hook = None  # built lazily on first checkpoint save
        if install_signal_handler:
            self.install_preemption_handler()

    def _maybe_calibrate(self):
        """Checkpoint-time decode-threshold calibration on a train slice.

        Stores the swept operating point with the checkpoint
        (train/calibrate.py); infer.Predictor adopts it by default, so
        the served thresholds track the training recipe instead of the
        reference's fixed 0.8/0.9. Never allowed to break training.
        """
        tcfg = self.cfg.train
        if not getattr(tcfg, "calibrate_at_checkpoint", False):
            return None
        try:
            from tensorflow_ocr_tpu.train.calibrate import (
                calibrate_and_store,
            )
            from tensorflow_ocr_tpu.train.eval_hook import (
                EvalDuringTraining,
            )

            if self._calib_hook is None:
                self._calib_hook = EvalDuringTraining(
                    self.cfg, self.cfg.data.training_data_path,
                    max_images=getattr(tcfg, "calibrate_max_images", 8))
            if self._calib_hook.images is None:
                return None
            op = calibrate_and_store(
                self.model, self.state, self.cfg,
                self.cfg.data.training_data_path, tcfg.checkpoint_path,
                hook=self._calib_hook)
            if op:
                print(f"calibrated decode thresholds @ step "
                      f"{int(self.state.step)}: {op}")
            return op
        except Exception as e:  # calibration is best-effort observability
            logging.getLogger(__name__).warning(
                "threshold calibration failed: %s: %s",
                type(e).__name__, e)
            return None

    def install_preemption_handler(self):
        import signal

        def handler(signum, frame):
            self._preempted = True

        signal.signal(signal.SIGTERM, handler)

    def _maybe_handle_preemption(self, data_iter=None) -> bool:
        if self._preempted:
            path = save_checkpoint(
                self.cfg.train.checkpoint_path, self.state, data_iter
            )
            print(f"preempted: checkpoint saved to {path}")
            return True
        return False

    def setup(self, sample_batch: Dict[str, np.ndarray]):
        rng = jax.random.PRNGKey(self.cfg.train.seed)
        img = sample_batch["images"][:1]
        self.model, self.state, self.tx = create_train_state(
            self.cfg, rng, img
        )
        tcfg = self.cfg.train
        if tcfg.restore:
            ck = latest_checkpoint(tcfg.checkpoint_path)
            if ck:
                self.state = restore_checkpoint(ck, self.state)
                self._restored_from = ck
                print(f"restored from {ck} at step {int(self.state.step)}")
        elif tcfg.pretrained_model_path:
            if tcfg.pretrained_model_path.endswith(".npz"):
                # slim ImageNet checkpoint converted to .npz
                from tensorflow_ocr_tpu.train.pretrained import import_backbone

                variables = {"params": self.state.params}
                if self.state.batch_stats:
                    variables["batch_stats"] = self.state.batch_stats
                new_vars, n = import_backbone(
                    variables, tcfg.pretrained_model_path
                )
                self.state = self.state.replace(
                    params=new_vars["params"],
                    batch_stats=new_vars.get(
                        "batch_stats", self.state.batch_stats
                    ),
                    ema_params=jax.tree_util.tree_map(
                        jnp.asarray, new_vars["params"]
                    ),
                )
            else:
                ck = latest_checkpoint(tcfg.pretrained_model_path) or tcfg.pretrained_model_path
                pre = restore_checkpoint(ck, self.state)
                merged, n = warm_start(self.state.params, pre.params)
                # running BN statistics come along too — freeze_bn
                # fine-tuning normalizes with them (the reference's slim
                # restore carried moving_mean/variance the same way)
                bs = pre.batch_stats if pre.batch_stats else self.state.batch_stats
                self.state = self.state.replace(params=merged,
                                                batch_stats=bs)
            print(f"warm-started {n} tensors from {tcfg.pretrained_model_path}")
        self._step_fn = make_train_step(self.model, self.tx, self.cfg, self.mesh)
        # replicate state across the mesh
        rep = NamedSharding(self.mesh, P())
        self.state = jax.device_put(self.state, rep)

    def run(self, batches, max_steps: Optional[int] = None) -> Dict[str, float]:
        cfg = self.cfg.train
        max_steps = max_steps or cfg.max_steps
        if self._restored_from is not None:
            if restore_data_iter(self._restored_from, batches):
                print(f"data iterator resumed from {self._restored_from}")
            self._restored_from = None
        t0 = time.time()
        last_metrics: Dict[str, float] = {}
        window = cfg.log_every_steps
        last_log_step = -1  # first window holds a single step, not `window`
        last_save_t = time.time()
        dog = StallWatchdog(cfg.stall_warn_secs)
        try:
            for step in range(max_steps):
                batch = next(batches) if hasattr(batches, "__next__") else batches[step]
                db = device_batch(batch, self.mesh, self.want_east)
                self.state, metrics = self._step_fn(self.state, db)
                if step % window == 0:
                    metrics = jax.device_get(metrics)
                    dog.beat(step)
                    last_metrics = {k: float(v) for k, v in metrics.items()}
                    tl = last_metrics.get("total_loss", float("nan"))
                    if np.isnan(tl):
                        print("Loss diverged, stop training")
                        break
                    dt = time.time() - t0
                    t0 = time.time()
                    n_steps = step - last_log_step
                    last_log_step = step
                    n_img = batch["images"].shape[0] * n_steps
                    print(
                        f"Step {step:06d}, model loss {last_metrics.get('model_loss', 0):.4f}, "
                        f"total loss {tl:.4f}, {dt / n_steps:.3f} s/step, "
                        f"{n_img / dt:.1f} examples/s"
                    )
                    if self.summary_writer is not None:
                        for k, v in last_metrics.items():
                            self.summary_writer.add_scalar(k, v, step)
                if (self.summary_writer is not None
                        and cfg.save_summary_steps
                        and step % cfg.save_summary_steps == 0
                        and hasattr(self.summary_writer, "add_detection_summaries")):
                    self._emit_image_summaries(batch, step)
                step_due = (cfg.save_checkpoint_steps and step > 0
                            and step % cfg.save_checkpoint_steps == 0)
                time_due = (cfg.save_interval_secs
                            and time.time() - last_save_t
                            >= cfg.save_interval_secs)
                if step_due or time_due:
                    save_checkpoint(cfg.checkpoint_path, self.state, batches,
                                    block=False,
                                    max_to_keep=cfg.max_checkpoints_to_keep)
                    last_save_t = time.time()
                    self._maybe_calibrate()
                if self._maybe_handle_preemption(batches):
                    break
        finally:
            dog.stop()
            wait_for_pending_save()
        return last_metrics

    def run_device_cached(self, max_steps: Optional[int] = None) -> Dict[str, float]:
        """In-device training loop over an HBM-staged dataset.

        One dispatch per ``cfg.train.scan_steps`` steps (lax.scan); the host
        only draws shuffle indices. Requires augmentation off.
        """
        from tensorflow_ocr_tpu.data.device_cache import DeviceDataset

        cfg = self.cfg
        augment = bool(cfg.data.use_crop or cfg.data.use_rotate
                       or cfg.data.use_random_scale)
        from tensorflow_ocr_tpu.models.detector import model_output_stride

        # With augmentation on, stage raw frames only (transforms + label
        # rasterization happen on device inside the scan body); the staging
        # loader must not consume the augmentation flags.
        stage_cfg = cfg.data
        if augment:
            import dataclasses as _dc

            stage_cfg = _dc.replace(cfg.data, use_crop=False,
                                    use_rotate=False,
                                    use_random_scale=False)
        ds = DeviceDataset(stage_cfg, want_east=self.want_east,
                           precompute_labels=not augment,
                           label_stride=model_output_stride(cfg.model.name))
        if self.model is None:
            self.setup({k: v[:1] for k, v in ds.arrays().items()
                        if k in ("images", "polys", "tags", "valid")})
        rep = NamedSharding(self.mesh, P())
        ds_dev = {k: jax.device_put(v, rep) for k, v in ds.arrays().items()}
        idx_sh = NamedSharding(self.mesh, P(None, DATA_AXIS))
        multi = make_multi_train_step(
            self.model, self.tx, cfg, self.mesh,
            extra_keys=tuple(ds.labels.keys()), augment=augment,
        )
        rng = np.random.RandomState(cfg.train.seed)
        s = cfg.train.scan_steps
        batch = cfg.data.batch_size
        max_steps = max_steps or cfg.train.max_steps
        dog = StallWatchdog(cfg.train.stall_warn_secs, name="scan")
        try:
            return self._device_cached_loop(
                cfg, ds, ds_dev, idx_sh, multi, rng, s, batch, max_steps,
                dog)
        finally:
            dog.stop()
            wait_for_pending_save()

    def _device_cached_loop(self, cfg, ds, ds_dev, idx_sh, multi, rng, s,
                            batch, max_steps, dog):
        last: Dict[str, float] = {}
        last_save_t = time.time()
        step = 0
        dispatch_dts = []  # post-compile dispatch walls (first excluded)
        while step < max_steps:
            # t0 here (not at loop end) so dt covers only index draw +
            # dispatch + sync — host work from the previous iteration
            # (prints, summaries, checkpoint enqueue, eval hook) must not
            # pollute the steady-state dispatch timing.
            t0 = time.time()
            idx = ds.index_batches(batch, s, rng)
            self.state, metrics = multi(
                self.state, ds_dev, jax.device_put(idx, idx_sh)
            )
            step += s
            last = {k: float(v) for k, v in jax.device_get(metrics).items()}
            dog.beat(step)
            if np.isnan(last.get("total_loss", 0.0)):
                print("Loss diverged, stop training")
                break
            dt = time.time() - t0
            if step > s:  # first dispatch pays the XLA compile
                dispatch_dts.append(dt)
            print(
                f"Step {step:06d}, model loss {last.get('model_loss', 0):.4f}, "
                f"total loss {last.get('total_loss', 0):.4f}, "
                f"{dt / s:.4f} s/step, {s * batch / dt:.1f} examples/s"
            )
            if self.summary_writer is not None:
                for k, v in last.items():
                    self.summary_writer.add_scalar(k, v, step)
            step_due = (cfg.train.save_checkpoint_steps
                        and step % max(cfg.train.save_checkpoint_steps, s) == 0)
            time_due = (cfg.train.save_interval_secs
                        and time.time() - last_save_t
                        >= cfg.train.save_interval_secs)
            if step_due or time_due:
                save_checkpoint(
                    cfg.train.checkpoint_path, self.state, block=False,
                    max_to_keep=cfg.train.max_checkpoints_to_keep)
                last_save_t = time.time()
                self._maybe_calibrate()
            if (self.eval_hook is not None and cfg.train.eval_every_steps
                    and step % max(cfg.train.eval_every_steps, s) == 0):
                r = self.eval_hook(self.model, self.state)
                if r:
                    print(
                        f"eval @ step {step}: P {r['precision']:.3f} "
                        f"R {r['recall']:.3f} F {r['fmean']:.3f}"
                    )
                    if self.summary_writer is not None:
                        for k in ("precision", "recall", "fmean"):
                            self.summary_writer.add_scalar(
                                f"val/{k}", r[k], step
                            )
            if self._maybe_handle_preemption():
                break
        if dispatch_dts:
            # steady-state throughput, compile excluded (median dispatch).
            # Unit: whole-mesh images/sec (divide by mesh size for the
            # per-chip number bench.py reports); wall-clock img/s stays
            # the caller's job (quality harness reports both)
            last["images_per_sec_steady"] = (
                s * batch / float(np.median(dispatch_dts)))
        return last

    def _emit_image_summaries(self, batch, step: int):
        """Reference's TB image panel (multigpu_train.py:50-63): input frame,
        GT text-score map, and predicted score map for the first sample."""
        try:
            variables = {"params": self.state.params}
            bs = self.state.batch_stats
            if bs:
                variables["batch_stats"] = bs
            img = jnp.asarray(batch["images"][:1], jnp.float32)
            out = jax.jit(lambda v, x: self.model.apply(v, x))(variables, img)
            if "pixel_logits" in out:
                pred = jax.nn.softmax(out["pixel_logits"], axis=-1)[..., 1:]
            else:
                pred = out["score"]
            gt_score = None
            if "score" in batch:
                gt_score = np.asarray(batch["score"][:1], np.float32)
            elif "polys" in batch:
                from tensorflow_ocr_tpu.models.detector import (
                    model_output_stride,
                )

                stride = model_output_stride(self.cfg.model.name)
                s, _, _ = jax.jit(
                    partial(
                        label_ops.pixellink_labels_stride,
                        out_height=img.shape[1] // stride,
                        out_width=img.shape[2] // stride, stride=stride,
                        min_text_size=self.cfg.data.min_text_size,
                    )
                )(
                    jnp.asarray(batch["polys"][0]),
                    jnp.asarray(batch["tags"][0]),
                    jnp.asarray(batch["valid"][0]),
                )
                gt_score = np.asarray(s, np.float32)[None, ..., None]
            self.summary_writer.add_detection_summaries(
                step,
                images=np.asarray(batch["images"][:1], np.float32),
                gt_score=gt_score,
                pred_score=np.asarray(pred),
            )
        except Exception as e:  # observability must never take down training
            logging.getLogger(__name__).warning(
                "image summaries failed at step %d: %s: %s",
                step, type(e).__name__, e)
