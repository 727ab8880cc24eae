"""Reference-API compatibility shims (nets/, datasets/, tool/)."""

import numpy as np
import jax.numpy as jnp
import pytest


def test_nets_model_api():
    from nets import model as M

    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    pixel, link = M.model(img, is_training=False)
    assert pixel.shape == (1, 16, 16, 2)
    assert link.shape == (1, 16, 16, 16)

    # loss with reference argument order
    rng = np.random.RandomState(0)
    yt = (rng.rand(2, 8, 8, 1) > 0.5).astype(np.float32)
    yp = rng.randn(2, 8, 8, 2).astype(np.float32)
    lt = (rng.rand(2, 8, 8, 8) > 0.5).astype(np.float32)
    lp = rng.randn(2, 8, 8, 16).astype(np.float32)
    m = np.ones((2, 8, 8, 1), np.float32)
    total = M.loss(jnp.array(yt), jnp.array(yp), jnp.array(lt),
                   jnp.array(lp), jnp.array(m))
    assert np.isfinite(float(total))

    d = M.dice_coefficient(jnp.array(yt), jnp.array(yt), jnp.array(m))
    assert float(d) == pytest.approx(0.0, abs=1e-4)


def test_nets_model_vgg16_api():
    from nets import model_vgg_16 as MV

    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    pixel, link = MV.model_vgg(img, is_training=False)
    assert pixel.shape == (1, 16, 16, 2) and link.shape == (1, 16, 16, 16)
    score, links8 = MV.model(img, is_training=False)
    assert score.shape == (1, 16, 16, 1) and links8.shape == (1, 16, 16, 8)


def test_nets_backbones_api():
    from nets import resnet_v1, vgg

    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    net, ep = resnet_v1.resnet_v1_50(img, is_training=False)
    assert set(ep) >= {"pool2", "pool3", "pool4", "pool5"}
    net, ep = vgg.basenet(img)
    assert "fc7" in ep and "conv3_3" in ep


def test_nets_pixellink_class():
    from nets.pixellink import PixelLinkNet

    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    net = PixelLinkNet(img)
    assert net.pixel_cls.shape == (1, 16, 16, 2)
    assert net.link_cls.shape == (1, 16, 16, 16)
    labels = jnp.zeros((1, 16, 16, 1))
    links = jnp.zeros((1, 16, 16, 8))
    loss = net.build_loss(labels, links)
    assert np.isfinite(float(loss))


def test_datasets_icdar_generate_rbox():
    from datasets import icdar as DI

    polys = np.array([[[4, 4], [40, 4], [40, 20], [4, 20]]], np.float32)
    tags = np.array([False])
    score, link, mask = DI.generate_rbox((64, 64), polys, tags)
    assert score.shape == (64, 64) and link.shape == (64, 64, 8)
    assert score[10, 10] == 1 and mask[10, 10] == 1


def test_tool_pixellink_fn():
    from tool import pixellink_fn as PF

    xs = np.array([[0.1, 0.6, 0.6, 0.1]], np.float32)
    ys = np.array([[0.1, 0.1, 0.4, 0.4]], np.float32)
    score, link, show = PF.generate_rbox(64, 64, xs, ys)
    assert score.shape == (16, 16) and link.shape == (16, 16, 8)
    assert show.shape == (200, 4)
    res = PF.pixel_detect(score, link, 0.5, 0.5)
    assert res.shape == (16, 16) and res.max() <= 1


def test_tool_data_util_enqueuer():
    from tool.data_util import GeneratorEnqueuer

    def gen():
        for i in range(5):
            yield i

    e = GeneratorEnqueuer(gen())
    e.start(workers=2, max_queue_size=4)
    got = sorted(e.get_one() for _ in range(5))
    assert got == [0, 1, 2, 3, 4]
    e.stop()


def test_tool_data_util_enqueuer_factory_parallel():
    """Factory form: each worker gets its own PRIVATE RandomState stream
    (reference data_util.py:62-81 forks per worker; threads must not
    race on or clobber the process-global numpy RNG)."""
    import threading

    import numpy as np

    from tool.data_util import GeneratorEnqueuer

    seen_seeds = []
    lock = threading.Lock()

    def factory(rng):
        seed = int(rng.randint(0, 1 << 30))
        with lock:
            seen_seeds.append(seed)

        def gen():
            while True:
                yield seed

        return gen()

    np.random.seed(123)
    before = np.random.randint(0, 1 << 30)
    np.random.seed(123)
    e = GeneratorEnqueuer(factory, random_seed=7)
    e.start(workers=3, max_queue_size=8)
    vals = {e.get_one() for _ in range(12)}
    e.stop()
    # three independent streams with deterministic distinct derived seeds
    assert sorted(seen_seeds) == sorted(
        int(np.random.RandomState(7 + i).randint(0, 1 << 30))
        for i in range(3))
    assert vals <= set(seen_seeds)
    # the process-global RNG was not touched by the workers
    assert np.random.randint(0, 1 << 30) == before

    # a zero-arg factory still works (no reseeding applied)
    e2 = GeneratorEnqueuer(lambda: iter([1, 2, 3]), random_seed=7)
    e2.start(workers=1, max_queue_size=4)
    assert e2.get_one() in (1, 2, 3)
    e2.stop()


def test_tool_metrics_and_math():
    from tool.math import safe_divide
    from tool.metrics import precision_recall, fmean, streaming_tp_fp_arrays

    assert safe_divide(1, 0) == 0
    p, r = precision_recall(2, [1, 0, 1], [0, 1, 0])
    assert p[-1] == pytest.approx(2 / 3)
    assert r[-1] == pytest.approx(1.0)
    assert fmean(0.5, 0.5) == pytest.approx(0.5)
    prf = streaming_tp_fp_arrays()
    assert prf.matching_threshold == 0.5


def test_tool_bboxes():
    from tool.bboxes import bboxes_matching, np_bboxes_jaccard

    bbox = np.array([0, 0, 10, 0, 10, 10, 0, 10], np.float32)
    gxs = np.array([[0, 10, 10, 0]], np.float32)
    gys = np.array([[0, 0, 10, 10]], np.float32)
    iou = np_bboxes_jaccard(bbox, gxs, gys)
    assert iou[0] == pytest.approx(1.0)


def test_tool_bboxes_resize_crop_frame():
    """bboxes_resize expresses boxes relative to a crop window
    (reference tool/bboxes.py:22-44): the window maps to [0,0,1,1]."""
    from tool.bboxes import bboxes_resize

    ref = np.array([0.25, 0.25, 0.75, 0.75], np.float32)  # ymin xmin ymax xmax
    boxes = np.array([[0.25, 0.25, 0.75, 0.75],
                      [0.5, 0.5, 0.75, 0.625]], np.float32)
    xs = np.array([[0.25, 0.75, 0.75, 0.25]], np.float32)
    ys = np.array([[0.25, 0.25, 0.75, 0.75]], np.float32)
    out, oxs, oys = bboxes_resize(ref, boxes, xs, ys)
    np.testing.assert_allclose(out[0], [0, 0, 1, 1], atol=1e-6)
    np.testing.assert_allclose(out[1], [0.5, 0.5, 1.0, 0.75], atol=1e-6)
    np.testing.assert_allclose(oxs[0], [0, 1, 1, 0], atol=1e-6)
    np.testing.assert_allclose(oys[0], [0, 0, 1, 1], atol=1e-6)


def test_tool_bboxes_intersection_and_filter():
    """bboxes_intersection = area(box ∩ ref)/area(box); filter drops or
    negates by threshold (reference tool/bboxes.py:69-128)."""
    from tool.bboxes import bboxes_filter_overlap, bboxes_intersection

    boxes = np.array([
        [0.1, 0.1, 0.5, 0.5],     # fully inside -> 1.0
        [-0.5, 0.0, 0.5, 1.0],    # half inside  -> 0.5
        [1.5, 1.5, 2.0, 2.0],     # outside      -> 0.0
        [0.2, 0.2, 0.2, 0.8],     # degenerate   -> 0.0 (safe divide)
    ], np.float32)
    scores = bboxes_intersection(np.array([0, 0, 1, 1], np.float32), boxes)
    np.testing.assert_allclose(scores, [1.0, 0.5, 0.0, 0.0], atol=1e-6)

    labels = np.array([1, 2, 3, 4])
    xs = np.zeros((4, 4), np.float32)
    ys = np.zeros((4, 4), np.float32)
    l2, b2, x2, y2 = bboxes_filter_overlap(labels, boxes, xs, ys, 0.4)
    assert list(l2) == [1, 2] and b2.shape == (2, 4)
    l3, b3, _, _ = bboxes_filter_overlap(labels, boxes, xs, ys, 0.4,
                                         assign_negative=True)
    assert list(l3) == [1, 2, -3, -4] and b3.shape == (4, 4)
