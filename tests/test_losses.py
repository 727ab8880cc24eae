"""Loss functions vs hand-computed values and NumPy spec re-executions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflow_ocr_tpu.ops import losses as L


def test_dice_perfect_prediction_zero():
    y = jnp.ones((1, 4, 4, 1))
    m = jnp.ones_like(y)
    assert float(L.dice_loss(y, y, m)) == pytest.approx(0.0, abs=1e-4)


def test_dice_hand_value():
    # t = [1,1,0,0], p = [1,0,0,0] -> dice = 1 - 2*1/(2+1+eps) = 1/3
    t = jnp.array([1.0, 1, 0, 0]).reshape(1, 2, 2, 1)
    p = jnp.array([1.0, 0, 0, 0]).reshape(1, 2, 2, 1)
    m = jnp.ones_like(t)
    assert float(L.dice_loss(t, p, m)) == pytest.approx(1 - 2 / 3, abs=1e-4)


def test_dice_mask_excludes():
    t = jnp.array([1.0, 1, 0, 0]).reshape(1, 2, 2, 1)
    p = jnp.array([1.0, 0, 0, 0]).reshape(1, 2, 2, 1)
    m = jnp.array([1.0, 0, 1, 1]).reshape(1, 2, 2, 1)  # hide the miss
    assert float(L.dice_loss(t, p, m)) == pytest.approx(0.0, abs=1e-4)


def test_ohnm_selects_hardest_k():
    # 2 positives, 10 negatives -> select 6 hardest (lowest neg score)
    n = 12
    pos = np.zeros(n, bool)
    pos[:2] = True
    neg = ~pos
    neg_scores = np.linspace(0.1, 0.9, n).astype(np.float32)  # low = hard
    sel = np.asarray(
        L.ohnm_mask(jnp.array(neg_scores), jnp.array(pos), jnp.array(neg), 3)
    )
    assert sel.sum() == 6
    # the selected are the 6 lowest-scoring negatives (indices 2..7)
    assert sel[2:8].all() and not sel[8:].any() and not sel[:2].any()


def test_ohnm_no_positives_selects_none():
    n = 8
    pos = np.zeros(n, bool)
    neg = np.ones(n, bool)
    sel = np.asarray(
        L.ohnm_mask(jnp.full(n, 0.5, np.float32), jnp.array(pos), jnp.array(neg))
    )
    assert sel.sum() == 0


def test_ohnm_caps_at_available():
    n = 8
    pos = np.zeros(n, bool)
    pos[:6] = True  # 18 wanted, only 2 available
    neg = ~pos
    sel = np.asarray(
        L.ohnm_mask(jnp.full(n, 0.5, np.float32), jnp.array(pos), jnp.array(neg))
    )
    assert sel.sum() == 2


def _rand_case(rng, b=2, h=8, w=8):
    pixel_labels = (rng.rand(b, h, w, 1) > 0.7).astype(np.float32)
    pixel_logits = rng.randn(b, h, w, 2).astype(np.float32)
    link_labels = (rng.rand(b, h, w, 8) > 0.5).astype(np.float32)
    link_logits = rng.randn(b, h, w, 16).astype(np.float32)
    mask = np.ones((b, h, w, 1), np.float32)
    return pixel_labels, pixel_logits, link_labels, link_logits, mask


def _np_ohem_loss(pl, pg, ll, lg, ratio=3):
    """NumPy spec re-execution of reference nets/model.py:204-261."""
    b = pg.shape[0]
    labels = pl.reshape(b, -1).astype(np.int64)
    logits = pg.reshape(b, -1, 2)
    ex = np.exp(logits - logits.max(-1, keepdims=True))
    sm = ex / ex.sum(-1, keepdims=True)
    neg_scores = sm[..., 0]
    w_pixel = np.zeros_like(neg_scores)
    for i in range(b):
        posm = labels[i] == 1
        negm = labels[i] == 0
        n_pos = posm.sum()
        w_pixel[i][posm] = 1.0
        if n_pos > 0:
            n_neg = min(3 * n_pos, negm.sum())
            if n_neg > 0:
                kth = np.sort(neg_scores[i][negm])[n_neg - 1]
                w_pixel[i][negm & (neg_scores[i] <= kth)] = 1.0
    n_pos_tot = (labels == 1).sum()
    ce = -np.log(np.take_along_axis(sm, labels[..., None], -1)[..., 0] + 1e-30)
    pixel_loss = (ce * w_pixel).sum() / n_pos_tot if n_pos_tot else 0.0

    link_lbl = ll.reshape(b, -1, 8).astype(np.int64)
    link_lgt = lg.reshape(b, -1, 8, 2)
    ex = np.exp(link_lgt - link_lgt.max(-1, keepdims=True))
    sml = ex / ex.sum(-1, keepdims=True)
    cel = -np.log(np.take_along_axis(sml, link_lbl[..., None], -1)[..., 0] + 1e-30)
    total_link = 0.0
    for i in range(8):
        wp = w_pixel.reshape(b, -1)
        w_pos = (link_lbl[..., i] == 1) * wp
        w_neg = (link_lbl[..., i] == 0) * wp
        lp = (cel[..., i] * w_pos).sum() / w_pos.sum() if w_pos.sum() else 0.0
        ln = (cel[..., i] * w_neg).sum() / w_neg.sum() if w_neg.sum() else 0.0
        total_link += lp + ln
    return total_link + 2 * pixel_loss


def test_ohem_pixel_link_matches_numpy_spec(rng):
    pl, pg, ll, lg, m = _rand_case(rng)
    got, aux = L.ohem_pixel_link_loss(
        jnp.array(pl), jnp.array(pg), jnp.array(ll), jnp.array(lg),
        jnp.array(m),
    )
    want = _np_ohem_loss(pl, pg, ll, lg)
    assert float(got) == pytest.approx(want, rel=1e-4)
    assert float(aux["n_pos"]) == (pl == 1).sum()


def test_ohem_bf16_optin_close_to_f32(rng, monkeypatch):
    """OCR_LOSS_BF16=1 (opt-in perf lever) must track the f32 loss to
    bf16 tolerance — the OHNM selection and final reductions stay f32,
    so only CE rounding differs."""
    pl, pg, ll, lg, m = _rand_case(rng)
    args = (jnp.array(pl), jnp.array(pg), jnp.array(ll), jnp.array(lg),
            jnp.array(m))
    f32, _ = L.ohem_pixel_link_loss(*args)
    monkeypatch.setenv("OCR_LOSS_BF16", "1")
    bf16, aux = L.ohem_pixel_link_loss(*args)
    assert float(bf16) == pytest.approx(float(f32), rel=2e-2)
    assert np.isfinite(float(bf16))
    g = jax.grad(
        lambda lgt: L.ohem_pixel_link_loss(args[0], lgt, *args[2:])[0]
    )(args[1])
    assert bool(jnp.all(jnp.isfinite(g)))


def test_ohem_compute_dtype_arg_matches_env_path(rng, monkeypatch):
    """compute_dtype='bfloat16' (the config knob) must produce exactly
    the env-var lever's value; env overrides the arg for A/B runs."""
    pl, pg, ll, lg, m = _rand_case(rng)
    args = (jnp.array(pl), jnp.array(pg), jnp.array(ll), jnp.array(lg),
            jnp.array(m))
    via_arg, _ = L.ohem_pixel_link_loss(*args, compute_dtype="bfloat16")
    monkeypatch.setenv("OCR_LOSS_BF16", "1")
    via_env, _ = L.ohem_pixel_link_loss(*args)
    assert float(via_arg) == float(via_env)
    # env wins over the arg: OCR_LOSS_BF16=0 forces f32 despite the arg
    monkeypatch.setenv("OCR_LOSS_BF16", "0")
    forced_f32, _ = L.ohem_pixel_link_loss(*args, compute_dtype="bfloat16")
    monkeypatch.delenv("OCR_LOSS_BF16")
    plain_f32, _ = L.ohem_pixel_link_loss(*args)
    assert float(forced_f32) == float(plain_f32)


def test_ohem_loss_no_positives_is_finite_zero_pixel(rng):
    pl, pg, ll, lg, m = _rand_case(rng)
    pl[:] = 0
    total, aux = L.ohem_pixel_link_loss(
        jnp.array(pl), jnp.array(pg), jnp.array(ll), jnp.array(lg), jnp.array(m)
    )
    assert np.isfinite(float(total))
    assert float(aux["pixel_loss"]) == 0.0


def test_ohem_loss_grad_finite(rng):
    pl, pg, ll, lg, m = _rand_case(rng)

    def f(pg_, lg_):
        t, _ = L.ohem_pixel_link_loss(
            jnp.array(pl), pg_, jnp.array(ll), lg_, jnp.array(m)
        )
        return t

    g1, g2 = jax.grad(f, argnums=(0, 1))(jnp.array(pg), jnp.array(lg))
    assert np.isfinite(np.asarray(g1)).all()
    assert np.isfinite(np.asarray(g2)).all()


def test_dice_pixel_link_loss_value(rng):
    b, h, w = 1, 4, 4
    pl = (rng.rand(b, h, w, 1) > 0.5).astype(np.float32)
    pp = rng.rand(b, h, w, 1).astype(np.float32)
    ll = (rng.rand(b, h, w, 8) > 0.5).astype(np.float32)
    lp = rng.rand(b, h, w, 8).astype(np.float32)
    m = np.ones((b, h, w, 1), np.float32)
    got, _ = L.dice_pixel_link_loss(
        jnp.array(pl), jnp.array(pp), jnp.array(ll), jnp.array(lp), jnp.array(m)
    )

    def np_dice(t, p):
        inter = (t * p).sum()
        return 1 - 2 * inter / (t.sum() + p.sum() + 1e-5)

    want = 2 * np_dice(pl, pp) + sum(
        np_dice(ll[..., i], lp[..., i]) for i in range(8)
    )
    assert float(got) == pytest.approx(want, rel=1e-4)


def test_focal_loss_down_weights_easy(rng):
    lbl = np.ones((1, 2, 2, 1), np.float32)
    easy = np.zeros((1, 2, 2, 2), np.float32)
    easy[..., 1] = 10.0  # confident correct
    hard = np.zeros((1, 2, 2, 2), np.float32)
    hard[..., 0] = 10.0  # confident wrong
    le = float(L.focal_loss(jnp.array(lbl), jnp.array(easy)))
    lh = float(L.focal_loss(jnp.array(lbl), jnp.array(hard)))
    assert le < 1e-4 and lh > 1.0


def test_east_loss_perfect_pred():
    b, h, w = 1, 4, 4
    cls = np.ones((b, h, w, 1), np.float32)
    geo = np.tile(np.array([4, 8, 4, 8, 0.1], np.float32), (b, h, w, 1))
    m = np.ones((b, h, w, 1), np.float32)
    total, aux = L.east_loss(
        jnp.array(cls), jnp.array(cls), jnp.array(geo), jnp.array(geo), jnp.array(m)
    )
    assert float(aux["geo_loss"]) == pytest.approx(0.0, abs=1e-5)
    assert float(total) == pytest.approx(0.0, abs=1e-3)


def test_east_loss_iou_value():
    b, h, w = 1, 1, 1
    cls = np.ones((b, h, w, 1), np.float32)
    m = np.ones((b, h, w, 1), np.float32)
    gt = np.array([2, 2, 2, 2, 0.0], np.float32).reshape(1, 1, 1, 5)
    pred = np.array([2, 2, 2, 2, 0.0], np.float32).reshape(1, 1, 1, 5)
    pred[..., 0] = 4  # taller box: gt area 16, pred area 24, inter 16, union 24
    _, aux = L.east_loss(
        jnp.array(cls), jnp.array(cls), jnp.array(gt), jnp.array(pred), jnp.array(m)
    )
    want = -np.log((16 + 1) / (24 + 1))
    assert float(aux["geo_loss"]) == pytest.approx(want, rel=1e-4)


def test_ohem_bg_neg_budget():
    """Reference parity: an image with NO positives contributes nothing
    (model.py:169); bg_neg_budget>0 opts background crops into training
    as hard negatives."""
    import numpy as np
    import jax.numpy as jnp
    from tensorflow_ocr_tpu.ops.losses import ohem_pixel_link_loss

    rng = np.random.RandomState(0)
    b, h, w = 2, 8, 8
    labels = jnp.zeros((b, h, w), jnp.int32)          # all background
    pixel_logits = jnp.asarray(rng.randn(b, h, w, 2), jnp.float32)
    link_labels = jnp.zeros((b, h, w, 8), jnp.int32)
    link_logits = jnp.asarray(rng.randn(b, h, w, 16), jnp.float32)

    total0, aux0 = ohem_pixel_link_loss(
        labels, pixel_logits, link_labels, link_logits, None)
    assert float(aux0["pixel_loss"]) == 0.0          # reference semantics

    total1, aux1 = ohem_pixel_link_loss(
        labels, pixel_logits, link_labels, link_logits, None,
        bg_neg_budget=16)
    assert float(aux1["pixel_loss"]) > 0.0           # negatives now train
