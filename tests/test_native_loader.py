"""Native C++ batch loader vs cv2 golden."""

import cv2
import numpy as np
import pytest

from tensorflow_ocr_tpu.data.icdar import make_synthetic_dataset
from tensorflow_ocr_tpu.data.native_loader import (
    NativeBatchLoader,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native loader not built"
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("native_ds"))
    return make_synthetic_dataset(path, num_images=4, size=(200, 300), seed=1)


def test_native_matches_cv2(dataset):
    loader = NativeBatchLoader(num_threads=2)
    imgs, ok, src_hw = loader.load_batch(dataset, 128, 96)
    assert imgs.shape == (4, 96, 128, 3)
    assert ok.all()
    np.testing.assert_array_equal(src_hw[0], [200, 300])
    for i, fn in enumerate(dataset):
        want = cv2.imread(fn)
        want = cv2.resize(want, (128, 96), interpolation=cv2.INTER_LINEAR)
        want = want[:, :, ::-1]  # BGR -> RGB
        diff = np.abs(imgs[i].astype(int) - want.astype(int))
        assert diff.mean() < 2.0  # identical up to resize rounding
    loader.close()


def test_native_bad_path_flagged(dataset):
    loader = NativeBatchLoader(num_threads=2)
    imgs, ok, _ = loader.load_batch([dataset[0], "/nonexistent.jpg"], 64, 64)
    assert ok.tolist() == [True, False]
    loader.close()


def test_native_throughput_smoke(dataset):
    import time

    loader = NativeBatchLoader(num_threads=4)
    loader.load_batch(dataset * 4, 512, 512)
    t0 = time.time()
    loader.load_batch(dataset * 4, 512, 512)
    dt = time.time() - t0
    assert dt < 5.0  # 16 images well under 5s even on one core
    loader.close()
