"""End-to-end REAL-data-pipeline rehearsal on the synthetic ScanObjectNN
stand-in (zero-egress substitute for the actual downloads, VERDICT.md
round-1 item 2): generates h5s in the exact on-disk format, then drives the
real ScanObjectNNHardest/ScanObjectNNC loaders + the adaptpoint mode with
the shipped cfg (shrunk), including the corruption sweep + outcorruption.txt
aggregation."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_adaptpoint_on_synthetic_scanobjectnn(tmp_path):
    gen = subprocess.run(
        [sys.executable, os.path.join(REPO,
                                      "scripts/make_synthetic_scanobjectnn.py"),
         "--root", str(tmp_path / "data"), "--train", "48", "--test", "32"],
        capture_output=True, text=True)
    assert gen.returncode == 0, gen.stderr

    from adaptpoint_tpu.utils import EasyConfig
    cfg = EasyConfig()
    cfg.load(os.path.join(REPO,
                          "cfgs/scanobjectnn/pointnext-s_adaptpoint_1.yaml"),
             recursive=True)
    cfg.update_opts([
        f"dataset.common.data_dir={tmp_path/'data'/'ScanObjectNN'/'h5_files'/'main_split'}",
        f"scanobjectnn_c_dir={tmp_path/'data'/'ScanObjectNN_C'/'scanobjectnn_c'}",
        "dataset.common.num_points=256", "num_points=128",
        "epochs=1", "batch_size=16", "val_batch_size=16",
        "model.encoder_args.width=16", "model.encoder_args.blocks=[1,1,1,1]",
        "model.encoder_args.strides=[1,2,2,1]",
        "model.encoder_args.nsample=8", "model.cls_args.mlps=[32]",
        "dataloader.num_workers=2",
    ])
    cfg.run_dir = str(tmp_path / "run")
    cfg.run_name = "sonn_synth"
    cfg.ckpt_dir = str(tmp_path / "run" / "checkpoint")
    os.makedirs(cfg.ckpt_dir, exist_ok=True)

    from adaptpoint_tpu.engine.adapt_main import main
    best_val = main(cfg)
    assert best_val > 0
    # the corruption sweep must have produced the aggregated report with
    # every corruption (parity: outcorruption.txt, scanobjectnn_c.py:101)
    report = os.path.join(cfg.run_dir, "outcorruption.txt")
    assert os.path.exists(report)
    txt = open(report).read()
    for c in ["clean", "scale", "jitter", "rotate", "dropout_global",
              "dropout_local", "add_global", "add_local"]:
        assert c in txt, c
    assert "mOA" in txt and "mCE" in txt and "RmCE" in txt


@pytest.mark.slow
def test_test_fps_precompute_pkl(tmp_path):
    """The test-split FPS 2048->1024 precompute + pickle cache
    (scanobjectnn.py:59-71 parity) runs against the generated h5."""
    subprocess.run(
        [sys.executable, os.path.join(REPO,
                                      "scripts/make_synthetic_scanobjectnn.py"),
         "--root", str(tmp_path / "data"), "--train", "4", "--test", "8"],
        check=True, capture_output=True)
    from adaptpoint_tpu.datasets.scanobjectnn import ScanObjectNNHardest
    d = str(tmp_path / "data" / "ScanObjectNN" / "h5_files" / "main_split")
    ds = ScanObjectNNHardest(data_dir=d, split="test", uniform_sample=True)
    assert ds.points.shape == (8, 1024, 3)
    pkl = os.path.join(
        d, "test_objectdataset_augmentedrot_scale75_1024_fps.pkl")
    assert os.path.exists(pkl)
    # second load hits the cache
    ds2 = ScanObjectNNHardest(data_dir=d, split="test", uniform_sample=True)
    np.testing.assert_array_equal(ds.points, ds2.points)
