"""Losses: dice, OHEM pixel+link CE, focal, EAST geometry.

All functions are pure, static-shape, jit/vmap-friendly rebuilds of the
reference losses:

- dice_loss              -> /root/reference/nets/model.py:145-159 (identical
                            formula in nets/model_vgg_16.py:179-193)
- ohem_pixel_link_loss   -> nets/model.py:161-261 (OHNM_single_image /
                            OHNM_batch / loss). The reference hardcodes
                            batch 14 (model.py:220) and loops per image; we
                            vmap. The reference's tf.nn.top_k selection is
                            reproduced with a full sort + rank threshold
                            (static shapes; SURVEY.md §7 'OHEM inside jit').
- dice_pixel_link_loss   -> nets/model_vgg_16.py:196-225 (dice on score +
                            8 per-direction link dices)
- positive_pixel_link_loss -> nets/model_vgg_16.py:227-282 (ohem_loss:
                            positive-masked pixel CE x2 + balanced link CE)
- focal_loss             -> capability named in reference README.md:3 (no
                            code exists there; standard Lin et al. form)
- east_loss              -> classic EAST formulation consumed by the
                            surviving EAST heads (nets/model.py:33-82): dice
                            score + IoU distance loss + angle cosine loss.

Reference quirk note: model.loss() accepts training_mask but never applies
it (model.py:204-261) — ignored regions leak into its positives. We default
to the intended semantics (mask applied); ``apply_training_mask=False``
reproduces the reference exactly.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

EPS = 1e-5


def _safe_div(num, den):
    """tool/math.py:25-38 semantics: 0 where denominator <= 0."""
    return jnp.where(den > 0, num / jnp.maximum(den, 1e-12), 0.0)


def effective_loss_compute_dtype(compute_dtype=None, loss_name="ohem"):
    """Resolve the CE-term compute dtype the OHEM loss will actually use.

    Single source of truth for the ``OCR_LOSS_BF16`` env override (1/true/on
    -> bfloat16, any other value -> float32, unset -> the config knob) so
    recording code (scripts/holdout_eval.py) can never diverge from the
    kernel's own parsing in :func:`ohem_pixel_link_loss`. Only the OHEM loss
    consumes compute_dtype; for every other loss the answer is float32.
    """
    if loss_name != "ohem":
        return "float32"
    env = os.environ.get("OCR_LOSS_BF16")
    if env is not None:
        return "bfloat16" if env in ("1", "true", "on") else "float32"
    if compute_dtype is not None and jnp.dtype(compute_dtype) == jnp.bfloat16:
        return "bfloat16"
    return "float32"


def dice_loss(y_true, y_pred, training_mask):
    """1 - 2*sum(t*p*m) / (sum(t*m) + sum(p*m) + eps)."""
    inter = jnp.sum(y_true * y_pred * training_mask)
    union = (
        jnp.sum(y_true * training_mask) + jnp.sum(y_pred * training_mask) + EPS
    )
    return 1.0 - 2.0 * inter / union


def softmax_ce_with_logits(logits, labels):
    """Sparse softmax CE over a 2-class last axis.

    Branch-free closed form (logsumexp - picked logit) instead of
    take_along_axis: gathers (and their scatter gradients) are slow on TPU
    and measured at ~45 ms/step on 512px batch-16 maps.
    """
    l0 = logits[..., 0]
    l1 = logits[..., 1]
    m = jnp.maximum(l0, l1)
    lse = m + jnp.log(jnp.exp(l0 - m) + jnp.exp(l1 - m))
    picked = jnp.where(labels == 1, l1, l0)
    return lse - picked


def _kth_smallest_threshold(scores, mask, k, iters: int = 32):
    """Largest t with count(masked scores <= t) <= max(k, ties-at-t).

    Bisection on the value range instead of a full sort: TPU sorts of
    (B, 16k) maps cost ~45 ms/step (measured); 32 masked-count reductions
    cost <1 ms and give the k-th smallest to float32 resolution.
    """
    big = jnp.float32(3.4e38)
    lo = jnp.min(jnp.where(mask, scores, big))
    hi = jnp.max(jnp.where(mask, scores, -big))

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((scores <= mid) & mask)
        # keep the k-th smallest inside (lo, hi]
        return jnp.where(cnt >= k, lo, mid), jnp.where(cnt >= k, mid, hi)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return hi


def ohnm_mask(neg_scores, pos_mask, neg_mask, max_neg_pos_ratio: int = 3,
              bg_neg_budget: int = 0):
    """Per-image Online Hard Negative Mining mask (model.py:161-184).

    neg_scores: (N,) predicted probability of the NEGATIVE class — hard
    negatives are where this is smallest. Selection rule matches the
    reference's tf.top_k + `scores <= -threshold` (ties included,
    model.py:176-178), computed sort-free via value bisection.
    Returns float (N,) selected-negative mask.

    The reference selects NOTHING when an image has no positives
    (model.py:169 "if n_pos == 0, no negative samples will be selected"),
    which makes `background_ratio` crops a no-op under OHEM.
    ``bg_neg_budget > 0`` (off by default for parity) selects that many
    hardest negatives on positive-free images so background crops train
    as real negatives.
    """
    n_pos = jnp.sum(pos_mask.astype(jnp.int32))
    n_neg_avail = jnp.sum(neg_mask.astype(jnp.int32))
    want = jnp.where(n_pos > 0, n_pos * max_neg_pos_ratio,
                     jnp.int32(bg_neg_budget))
    n_neg = jnp.minimum(want, n_neg_avail)
    kth = _kth_smallest_threshold(neg_scores, neg_mask, n_neg)
    selected = neg_mask & (neg_scores <= kth) & (n_neg > 0)
    return selected.astype(jnp.float32)


def ohem_pixel_link_loss(
    pixel_labels,      # (B,h,w,1) or (B,h,w) float/int {0,1}
    pixel_logits,      # (B,h,w,2)
    link_labels,       # (B,h,w,8) {0,1}
    link_logits,       # (B,h,w,16)
    training_mask=None,  # (B,h,w,1) or (B,h,w)
    max_neg_pos_ratio: int = 3,
    pixel_loss_weight: float = 2.0,
    apply_training_mask: bool = True,
    bg_neg_budget: int = 0,
    compute_dtype=None,
):
    """Reference nets/model.py:204-261, vectorized. Returns (total, aux).

    ``compute_dtype="bfloat16"`` computes the CE terms and selection
    weights in bfloat16 with float32 reductions — a measured +1.5%
    frozen-BN / +1.1% batch-BN lever against the f32 loss traffic in the
    step profile (PERF.md §4.5); the OHNM sort/selection and every final
    reduction stay f32. The ``OCR_LOSS_BF16`` env var (1/0) overrides the
    argument for A/B runs; default (no arg, no env) is float32.
    """
    cdt = jnp.dtype(effective_loss_compute_dtype(compute_dtype))
    b = pixel_logits.shape[0]
    labels = pixel_labels.reshape(b, -1).astype(jnp.int32)
    logits = pixel_logits.reshape(b, -1, 2).astype(cdt)
    if training_mask is None or not apply_training_mask:
        valid = jnp.ones_like(labels, jnp.bool_)
    else:
        valid = training_mask.reshape(b, -1) > 0

    scores = jax.nn.softmax(logits, axis=-1)
    neg_scores = scores[..., 0]
    pos_mask = (labels == 1) & valid
    neg_mask = (labels == 0) & valid

    selected_neg = jax.vmap(
        lambda s, p, n: ohnm_mask(s, p, n, max_neg_pos_ratio,
                                  bg_neg_budget)
    )(neg_scores, pos_mask, neg_mask)
    w_pixel = pos_mask.astype(cdt) + selected_neg.astype(cdt)  # (B, N)

    n_pos = jnp.sum(pos_mask.astype(jnp.float32))
    # negatives selected on positive-free images (bg_neg_budget) widen
    # the normalizer; zero when the budget is off (reference semantics)
    has_pos = jnp.sum(pos_mask.astype(jnp.float32), axis=1) > 0  # (B,)
    n_bg = jnp.sum(
        jnp.where(has_pos[:, None], 0.0, selected_neg))
    ce = softmax_ce_with_logits(logits, labels)
    pixel_loss = _safe_div(
        jnp.sum(ce * w_pixel, dtype=jnp.float32), n_pos + n_bg)

    # link loss, all 8 directions at once (model.py:238-254)
    link_lbl = link_labels.reshape(b, -1, 8).astype(jnp.int32)
    link_lgt = link_logits.reshape(b, -1, 8, 2).astype(cdt)
    link_ce = softmax_ce_with_logits(link_lgt, link_lbl)  # (B,N,8)
    wp = w_pixel[..., None]
    w_link_pos = (link_lbl == 1).astype(cdt) * wp
    w_link_neg = (link_lbl == 0).astype(cdt) * wp
    pos_n = jnp.sum(w_link_pos, axis=(0, 1), dtype=jnp.float32)
    neg_n = jnp.sum(w_link_neg, axis=(0, 1), dtype=jnp.float32)
    link_pos = _safe_div(
        jnp.sum(link_ce * w_link_pos, axis=(0, 1), dtype=jnp.float32),
        pos_n)
    link_neg = _safe_div(
        jnp.sum(link_ce * w_link_neg, axis=(0, 1), dtype=jnp.float32),
        neg_n)
    link_loss = jnp.sum(link_pos + link_neg)

    total = link_loss + pixel_loss_weight * pixel_loss
    aux = {
        "pixel_loss": pixel_loss,
        "link_loss": link_loss,
        "n_pos": n_pos,
    }
    # Per-direction link-loss scalars (reference nets/model.py:258-259
    # emits one summary per direction).
    per_dir = link_pos + link_neg  # (8,)
    for d in range(8):
        aux[f"link_loss/dir{d}"] = per_dir[d]
    return total, aux


def dice_pixel_link_loss(
    pixel_labels,   # (B,h,w,1)
    pixel_probs,    # (B,h,w,1) — sigmoid score or softmax pos-prob
    link_labels,    # (B,h,w,8)
    link_probs,     # (B,h,w,8)
    training_mask,  # (B,h,w,1)
):
    """Reference nets/model_vgg_16.py:196-225. Returns (total, aux)."""
    cls = dice_loss(pixel_labels, pixel_probs, training_mask) * 2.0
    # 8 per-direction dices at once
    def one(i):
        return dice_loss(link_labels[..., i:i + 1], link_probs[..., i:i + 1],
                         training_mask)
    link = jnp.sum(jnp.stack([one(i) for i in range(8)]))
    return link + cls, {"pixel_loss": cls, "link_loss": link}


def positive_pixel_link_loss(
    pixel_labels, pixel_logits, link_labels, link_logits,
    pixel_loss_weight: float = 2.0,
):
    """Reference nets/model_vgg_16.py:227-282 (its 'ohem_loss').

    Pixel CE restricted to positives; per-direction link CE pos/neg
    normalized with pixel-positive weights.
    """
    b = pixel_logits.shape[0]
    labels = pixel_labels.reshape(-1).astype(jnp.int32)
    logits = pixel_logits.reshape(-1, 2)
    w_pixel = (labels == 1).astype(jnp.float32)
    ce = softmax_ce_with_logits(logits, labels)
    pixel_loss = _safe_div(jnp.sum(ce * w_pixel), jnp.sum(w_pixel))

    link_lbl = link_labels.reshape(-1, 8).astype(jnp.int32)
    link_lgt = link_logits.reshape(-1, 8, 2)
    link_ce = softmax_ce_with_logits(link_lgt, link_lbl)
    wp = w_pixel[:, None]
    w_pos = (link_lbl == 1).astype(jnp.float32) * wp
    w_neg = (link_lbl == 0).astype(jnp.float32) * wp
    link_loss = jnp.sum(
        _safe_div(jnp.sum(link_ce * w_pos, axis=0), jnp.sum(w_pos, axis=0))
        + _safe_div(jnp.sum(link_ce * w_neg, axis=0), jnp.sum(w_neg, axis=0))
    )
    del b
    return pixel_loss * pixel_loss_weight + link_loss, {
        "pixel_loss": pixel_loss,
        "link_loss": link_loss,
    }


def focal_loss(labels, logits, training_mask=None,
               alpha: float = 0.25, gamma: float = 2.0):
    """Focal loss over 2-class pixel logits (Lin et al. 2017).

    Named as a capability in reference README.md:3; no reference code
    exists — this is the standard form, normalized by positive count.
    labels (B,h,w,1) {0,1}; logits (B,h,w,2).
    """
    lbl = labels.reshape(labels.shape[0], -1).astype(jnp.int32)
    lgt = logits.reshape(logits.shape[0], -1, 2)
    logpt = -softmax_ce_with_logits(lgt, lbl)
    pt = jnp.exp(logpt)
    at = jnp.where(lbl == 1, alpha, 1.0 - alpha)
    fl = -at * (1.0 - pt) ** gamma * logpt
    if training_mask is not None:
        fl = fl * (training_mask.reshape(training_mask.shape[0], -1) > 0)
    n_pos = jnp.maximum(jnp.sum((lbl == 1).astype(jnp.float32)), 1.0)
    return jnp.sum(fl) / n_pos


def focal_loss_binary(labels, probs, training_mask=None,
                      alpha: float = 0.25, gamma: float = 2.0):
    """Binary focal loss on sigmoid probabilities (EAST score head,
    BASELINE config #4). labels/probs (B,h,w,1)."""
    p = jnp.clip(probs, 1e-7, 1.0 - 1e-7)
    pt = jnp.where(labels == 1, p, 1.0 - p)
    at = jnp.where(labels == 1, alpha, 1.0 - alpha)
    fl = -at * (1.0 - pt) ** gamma * jnp.log(pt)
    if training_mask is not None:
        fl = fl * (training_mask > 0)
    n_pos = jnp.maximum(jnp.sum((labels == 1).astype(jnp.float32)), 1.0)
    return jnp.sum(fl) / n_pos


def east_quad_loss(
    y_true_cls,     # (B,h,w,1)
    y_pred_cls,     # (B,h,w,1) sigmoid score
    y_true_geo,     # (B,h,w,9) 8 corner offsets + short-edge norm N_Q
    y_pred_geo,     # (B,h,w,8)
    training_mask,  # (B,h,w,1)
    cls_weight: float = 1.0,
):
    """EAST QUAD loss: dice score + scale-normalized smoothed-L1 over the
    8 corner offsets (EAST paper §3.4.2: L_g = SmoothedL1((p−p*)/(8·N_Q))
    averaged over positive pixels). Labels from
    ops/labels.east_quad_geo_maps; the reference declares QUAD
    (datasets/icdar.py:30) but never implements it. Returns (total, aux).
    """
    cls_loss = dice_loss(y_true_cls, y_pred_cls, training_mask) * cls_weight

    gt = y_true_geo[..., :8]
    nq = jnp.maximum(y_true_geo[..., 8:9], 1.0)
    diff = (y_pred_geo - gt) / (8.0 * nq)
    ad = jnp.abs(diff)
    smooth = jnp.where(ad < 1.0, 0.5 * ad * ad, ad - 0.5)
    per_pix = jnp.sum(smooth, axis=-1, keepdims=True)
    w = y_true_cls * training_mask
    geo_loss = _safe_div(jnp.sum(per_pix * w), jnp.sum(w))
    return geo_loss + cls_loss, {
        "cls_loss": cls_loss,
        "geo_loss": geo_loss,
    }


def east_loss(
    y_true_cls,     # (B,h,w,1)
    y_pred_cls,     # (B,h,w,1) sigmoid score
    y_true_geo,     # (B,h,w,5) d1..d4, angle
    y_pred_geo,     # (B,h,w,5)
    training_mask,  # (B,h,w,1)
    angle_weight: float = 20.0,
    cls_weight: float = 1.0,
):
    """Classic EAST loss: dice score + RBOX IoU + angle cosine.

    The geometry channel convention matches restore_rectangle
    (icdar.py:410-483): d = (top, right, bottom, left). Returns (total, aux).
    """
    cls_loss = dice_loss(y_true_cls, y_pred_cls, training_mask) * cls_weight

    d1_gt, d2_gt, d3_gt, d4_gt, theta_gt = jnp.split(y_true_geo, 5, axis=-1)
    d1_p, d2_p, d3_p, d4_p, theta_p = jnp.split(y_pred_geo, 5, axis=-1)
    area_gt = (d1_gt + d3_gt) * (d2_gt + d4_gt)
    area_p = (d1_p + d3_p) * (d2_p + d4_p)
    w_union = jnp.minimum(d2_gt, d2_p) + jnp.minimum(d4_gt, d4_p)
    h_union = jnp.minimum(d1_gt, d1_p) + jnp.minimum(d3_gt, d3_p)
    area_intersect = w_union * h_union
    area_union = area_gt + area_p - area_intersect
    aabb = -jnp.log((area_intersect + 1.0) / (area_union + 1.0))
    theta = 1.0 - jnp.cos(theta_p - theta_gt)
    geo = aabb + angle_weight * theta
    w = y_true_cls * training_mask
    geo_loss = _safe_div(jnp.sum(geo * w), jnp.sum(w))
    return geo_loss + cls_loss, {
        "cls_loss": cls_loss,
        "geo_loss": geo_loss,
    }
