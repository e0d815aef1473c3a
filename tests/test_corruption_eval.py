"""Corruption-benchmark plumbing with tiny synthetic -C h5 splits:
exercises ScanObjectNN-C dataset loading, the 36-pass eval wrapper, the
OA/CE/RCE -> mOA/mCE/RmCE math, and the outcorruption.txt report."""
import os

import h5py
import numpy as np
import pytest

from adaptpoint_tpu.datasets.scanobjectnn import (CORRUPTIONS,
                                                  DGCNN_OA_SCANOBJECTNN_C,
                                                  ScanObjectNNC,
                                                  eval_corrupt_wrapper)


@pytest.fixture
def corrupt_dir(tmp_path, rng_np):
    d = tmp_path / "scanobjectnn_c"
    d.mkdir()
    for c in CORRUPTIONS:
        splits = ["clean"] if c == "clean" else [f"{c}_{i}" for i in range(5)]
        for s in splits:
            with h5py.File(d / f"{s}.h5", "w") as f:
                f["data"] = rng_np.standard_normal((8, 64, 3)).astype(np.float32)
                f["label"] = rng_np.integers(0, 15, (8, 1))
    return str(d)


def test_scanobjectnnc_dataset_loads(corrupt_dir, rng_np):
    ds = ScanObjectNNC(data_dir=corrupt_dir, split="jitter_2")
    assert len(ds) == 8
    s = ds.get(0, rng_np)
    assert s["pos"].shape == (64, 3)
    assert s["x"].shape == (64, 3)  # no height without transform


def test_eval_wrapper_aggregation(corrupt_dir, tmp_path):
    calls = []

    def fake_eval(split, **kwargs):
        calls.append(split)
        # clean high, corrupted degraded per level
        if split == "clean":
            return {"acc": 0.9}
        level = int(split[-1])
        return {"acc": 0.8 - 0.05 * level}

    out = eval_corrupt_wrapper(fake_eval, {}, str(tmp_path), epoch=7)
    # 1 clean + 7 corruptions x 5 levels
    assert len(calls) == 1 + 7 * 5
    agg = out["aggregate"]
    # per-corruption OA = mean(0.8,0.75,...,0.6) = 0.7
    assert abs(out["scale"]["OA"] - 0.7) < 1e-6
    expected_ce = np.mean([(1 - 0.7) / (1 - DGCNN_OA_SCANOBJECTNN_C[c])
                           for c in CORRUPTIONS if c != "clean"])
    assert abs(agg["mCE"] - round(float(expected_ce), 3)) < 2e-3
    assert agg["OA_clean"] == 0.9
    report = (tmp_path / "outcorruption.txt").read_text()
    assert "epoch: 7" in report and "mCE" in report
