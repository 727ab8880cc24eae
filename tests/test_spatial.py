"""Spatially-sharded inference == single-device inference (GSPMD halos)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tensorflow_ocr_tpu.models import build_model
from tensorflow_ocr_tpu.parallel.spatial import (
    make_spatial_mesh,
    spatial_forward,
)

pytestmark = pytest.mark.slow  # compile-heavy: full-model/shard_map/Pallas programs (pytest.ini)


def test_spatial_sharded_forward_matches_single_device(cpu_devices):
    # f32 model so the comparison isn't dominated by bf16 fusion-order noise
    model = build_model("pixellink_vgg16", dtype=jnp.float32)
    rng = np.random.RandomState(0)
    img = (rng.rand(1, 128, 64, 3) * 255).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img))

    ref = model.apply(variables, jnp.asarray(img))

    mesh = make_spatial_mesh(8)
    run = spatial_forward(model, variables, mesh)
    out = run(img)

    for k in ref:
        a = np.asarray(ref[k])
        b = np.asarray(out[k])
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-3)


def test_spatial_mesh_axis_name(cpu_devices):
    mesh = make_spatial_mesh(4)
    assert mesh.axis_names == ("space",)
    assert mesh.devices.size == 4


def test_hybrid_mesh_forward_matches_single_device(cpu_devices):
    """2x4 (data, space) mesh: batch DP x H sharding in one program."""
    from tensorflow_ocr_tpu.parallel.spatial import (
        hybrid_forward,
        make_hybrid_mesh,
    )

    model = build_model("pixellink_vgg16", dtype=jnp.float32)
    rng = np.random.RandomState(1)
    img = (rng.rand(2, 128, 64, 3) * 255).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img[:1]))

    ref = model.apply(variables, jnp.asarray(img))

    mesh = make_hybrid_mesh(2, 4)
    assert mesh.devices.shape == (2, 4)
    run = hybrid_forward(model, variables, mesh)
    out = run(img)

    for k in ref:
        a, b = np.asarray(ref[k]), np.asarray(out[k])
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-3)


def test_hybrid_mesh_needs_enough_devices(cpu_devices):
    from tensorflow_ocr_tpu.parallel.spatial import make_hybrid_mesh

    import pytest

    with pytest.raises(ValueError):
        make_hybrid_mesh(4, 4)
