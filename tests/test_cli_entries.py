"""CLI entry points invoked in-process (train -> checkpoint -> test)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tensorflow_ocr_tpu.data import icdar

pytestmark = pytest.mark.slow  # compile-heavy: full-model/shard_map/Pallas programs (pytest.ini)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("icdar_cli"))
    icdar.make_synthetic_dataset(path, num_images=3, size=(128, 128), seed=41)
    return path


def test_multigpu_train_then_test_entry(dataset, tmp_path):
    import multigpu_train
    import test as test_entry

    ckpt = str(tmp_path / "ckpt") + "/"
    out = str(tmp_path / "res") + "/"
    multigpu_train.main([
        f"--training_data_path={dataset}",
        "--input_size=64",
        "--batch_size_per_gpu=2",
        "--max_steps=2",
        f"--checkpoint_path={ckpt}",
        "--save_checkpoint_steps=0",
        "--model.name=pixellink_vgg16",
        "--data.max_polys=8",
        "--train.num_devices=1",
    ])
    assert any(d.startswith("ckpt_") for d in os.listdir(ckpt))

    test_entry.main([
        f"--test_data_path={dataset}",
        f"--checkpoint_path={ckpt}",
        f"--output_dir={out}",
        "--model.name=pixellink_vgg16",
        "--infer.max_side_len=128",
    ])
    res = [f for f in os.listdir(out) if f.startswith("res_")]
    assert len(res) == 3


def test_flag_parsing_reference_names():
    from tensorflow_ocr_tpu.config import Config, parse_flags

    cfg = parse_flags(
        [
            "--gpu_list=0,1",  # accepted, ignored
            "--input_size=768",
            "--batch_size_per_gpu=7",
            "--learning_rate=0.001",
            "--moving_average_decay=0.99",
            "--restore",
            "--geometry=RBOX",
            "--min_text_size=12",
            "--train.scan_steps=8",
        ],
        Config(),
    )
    assert cfg.data.input_size == 768
    assert cfg.data.batch_size == 7
    assert cfg.train.learning_rate == 0.001
    assert cfg.train.moving_average_decay == 0.99
    assert cfg.train.restore is True
    assert cfg.data.min_text_size == 12
    assert cfg.train.scan_steps == 8


def test_unknown_flag_raises():
    from tensorflow_ocr_tpu.config import Config, parse_flags

    with pytest.raises(ValueError):
        parse_flags(["--not_a_flag=1"], Config())
