"""ResNet-v2 backbone, staircase LR, grad-sum reduce, scope exclusion."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tensorflow_ocr_tpu.config import Config, TrainConfig
from tensorflow_ocr_tpu.models import build_model
from tensorflow_ocr_tpu.models.resnet_v2 import resnet_v2
from tensorflow_ocr_tpu.train import optim
from tensorflow_ocr_tpu.train.trainer import warm_start


def test_resnet_v2_pyramid():
    model = resnet_v2(50)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    ep = model.apply(model.init(jax.random.PRNGKey(0), img), img)
    assert ep["pool2"].shape == (1, 16, 16, 64)
    assert ep["pool3"].shape == (1, 8, 8, 256)
    assert ep["pool4"].shape == (1, 4, 4, 512)
    assert ep["pool5"].shape == (1, 2, 2, 2048)


def test_resnetv2_detector_builds():
    model = build_model("pixellink_resnetv2_50")
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    out = model.apply(model.init(jax.random.PRNGKey(0), img), img)
    assert out["pixel_logits"].shape == (1, 16, 16, 2)


def test_piecewise_staircase_schedule():
    sched = optim.piecewise_staircase(0.1, [100, 200], [1.0, 0.1, 0.01])
    assert float(sched(0)) == pytest.approx(0.1)
    assert float(sched(150)) == pytest.approx(0.01)
    assert float(sched(250)) == pytest.approx(0.001)


def test_make_optimizer_uses_breakpoints():
    cfg = TrainConfig(
        learning_rate=0.1, lr_breakpoints=(10,), lr_decays=(1.0, 0.5),
        optimizer="momentum",
    )
    tx = optim.make_optimizer(cfg)
    params = {"kernel": jnp.ones((2, 2))}
    state = tx.init(params)
    g = {"kernel": jnp.ones((2, 2))}
    updates, _ = tx.update(g, state, params)
    # momentum sgd first step: update = -lr * g = -0.1
    np.testing.assert_allclose(np.asarray(updates["kernel"]), -0.1, rtol=1e-5)


def test_warm_start_exclude_scopes():
    params = {
        "backbone": {"conv": {"kernel": jnp.ones((2,))}},
        "head": {"kernel": jnp.ones((2,))},
    }
    pre = jax.tree_util.tree_map(jnp.zeros_like, params)
    merged, n = warm_start(params, pre, exclude_scopes=("head",))
    assert n == 1
    assert float(merged["backbone"]["conv"]["kernel"][0]) == 0.0
    assert float(merged["head"]["kernel"][0]) == 1.0


@pytest.mark.slow  # trains/initializes a full model (pytest.ini)
def test_grad_reduce_sum_config_smoke(tmp_path):
    from tensorflow_ocr_tpu.data import icdar
    from tensorflow_ocr_tpu.data.pipeline import batch_generator
    from tensorflow_ocr_tpu.parallel.mesh import make_mesh
    from tensorflow_ocr_tpu.train import trainer as T

    path = str(tmp_path / "ds")
    icdar.make_synthetic_dataset(path, num_images=2, size=(128, 128), seed=51)
    cfg = Config()
    cfg.data.training_data_path = path
    cfg.data.input_size = 64
    cfg.data.batch_size = 2
    cfg.data.max_polys = 8
    cfg.model.name = "pixellink_vgg16"
    cfg.train.grad_reduce = "sum"
    mesh = make_mesh(2)
    batch = next(batch_generator(cfg.data, seed=0))
    tr = T.Trainer(cfg, mesh)
    tr.setup(batch)
    db = T.device_batch(batch, mesh, False)
    _, m = tr._step_fn(tr.state, db)
    assert np.isfinite(float(m["total_loss"]))


def test_summary_histogram(tmp_path):
    from tensorflow_ocr_tpu.utils.summary import SummaryWriter

    w = SummaryWriter(str(tmp_path))
    w.add_histogram("grads", np.random.randn(100), 0)
    w.close()
