"""e2e for scripts/replay_reference.py (VERDICT r4 #5): a reference-layout
.pth (synthesized at the exact published PointNeXt-S state_dict layout,
tests/fixtures/ref_pointnext_s_cls_state_dict.json) goes through
convert -> mode=test -> zoo-delta JSON in ONE command. Real checkpoints
follow the identical path the day they are provisioned."""
import importlib.util
import json
import os

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _load_script(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_replay_reference_end_to_end(tmp_path, capsys):
    torch = pytest.importorskip("torch")
    from test_torch_convert import _synth_state_dict

    sd = _synth_state_dict(seed=5)
    pth = tmp_path / "ref_ckpt_best.pth"
    torch.save({"model": {k: torch.from_numpy(np.asarray(v))
                          for k, v in sd.items()}, "epoch": 42}, str(pth))

    # tiny synthetic ScanObjectNN h5s (the deterministic generator the
    # hard-protocol evidence runs use, scaled down)
    gen = _load_script("make_synthetic_scanobjectnn")
    gen.generate_cls(
        str(tmp_path / "data"), 48, 32, 0, gen._make_cloud, 15,
        "ScanObjectNN/h5_files/main_split/"
        "training_objectdataset_augmentedrot_scale75.h5",
        "ScanObjectNN/h5_files/main_split/"
        "test_objectdataset_augmentedrot_scale75.h5",
        "ScanObjectNN_C/scanobjectnn_c")

    replay = _load_script("replay_reference")
    import sys
    argv_old = sys.argv
    sys.argv = [
        "replay_reference.py", "--pth", str(pth),
        "--cfg", os.path.join(REPO, "cfgs/scanobjectnn/pointnext-s.yaml"),
        "--out", str(tmp_path / "conv.msgpack"),
        "--corruptions",
        f"root_dir={tmp_path / 'runs'}",
        "dataset.common.data_dir="
        + str(tmp_path / "data/ScanObjectNN/h5_files/main_split"),
        "scanobjectnn_c_dir="
        + str(tmp_path / "data/ScanObjectNN_C/scanobjectnn_c"),
        "val_batch_size=16",
    ]
    try:
        replay.main()
    finally:
        sys.argv = argv_old

    lines = [l for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert lines, "no JSON result line printed"
    res = json.loads(lines[-1])
    # untrained random weights: OA is chance-level, but the machinery —
    # conversion, restore, mode=test eval, zoo lookup + delta — all ran
    assert set(res) >= {"cfg", "pth", "oa", "expected_oa", "delta"}
    assert res["expected_oa"] == 88.20
    assert abs(res["oa"] - (res["expected_oa"] + res["delta"])) < 1e-6
    assert os.path.exists(tmp_path / "conv.msgpack")
    # --corruptions wrote the ScanObjectNN-C sweep into the replay run dir
    import glob
    outs = glob.glob(str(tmp_path / "runs" / "**" / "outcorruption.txt"),
                     recursive=True)
    assert outs, "corruption sweep did not write outcorruption.txt"
    assert "mCE" in open(outs[0]).read()
