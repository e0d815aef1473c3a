"""Serving artifacts: AOT export/load parity, bucket routing, the HTTP
server, and raw-cloud preprocessing (adaptpoint_tpu/serving/)."""
import json
import os
import threading
import urllib.error
import urllib.request

import numpy as np
import jax
import pytest

from adaptpoint_tpu.utils import EasyConfig
from adaptpoint_tpu.models import build_model_from_cfg
from adaptpoint_tpu.serving import (ServingModel, export_serving_artifact,
                                    load_serving_artifact, preprocess_clouds)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N, CIN = 128, 4


@pytest.fixture(scope="module")
def tiny_model():
    cfg = EasyConfig()
    cfg.load(os.path.join(REPO, "cfgs/synthetic/pointnext-tiny.yaml"),
             recursive=True)
    model = build_model_from_cfg(cfg.model)
    rng = np.random.default_rng(0)
    pos = rng.standard_normal((1, N, 3)).astype(np.float32)
    x = rng.standard_normal((1, N, CIN)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), pos, x, training=False)
    return model, {"params": variables["params"],
                   "batch_stats": variables["batch_stats"]}


@pytest.fixture(scope="module")
def artifact(tiny_model, tmp_path_factory):
    model, variables = tiny_model
    out = str(tmp_path_factory.mktemp("artifact"))
    manifest = export_serving_artifact(
        model, variables, out, num_points=N, in_channels=CIN,
        batch_sizes=(1, 4), model_name="BaseCls")
    return out, manifest


def _clouds(n, rng_seed=1, extra_pts=0, extra_ch=0):
    rng = np.random.default_rng(rng_seed)
    return rng.standard_normal((n, N + extra_pts, CIN + extra_ch)).astype(
        np.float32)


def test_export_manifest(artifact):
    out, manifest = artifact
    assert manifest["batch_sizes"] == [1, 4]
    assert manifest["num_classes"] == 5
    assert os.path.exists(os.path.join(out, "b1.stablehlo"))
    assert os.path.exists(os.path.join(out, "b4.stablehlo"))
    on_disk = json.load(open(os.path.join(out, "manifest.json")))
    assert on_disk == manifest


def test_load_predict_parity_with_live_model(artifact, tiny_model):
    model, variables = tiny_model
    served = load_serving_artifact(artifact[0])
    x = _clouds(3)  # 3 -> padded into the 4-bucket
    logits = served.predict(x)
    live = np.asarray(model.apply(variables, x[..., :3], x, training=False))
    np.testing.assert_allclose(logits, live, rtol=1e-5, atol=1e-5)


def test_slices_extra_points_and_channels(artifact, tiny_model):
    model, variables = tiny_model
    served = load_serving_artifact(artifact[0])
    x = _clouds(2, extra_pts=16, extra_ch=2)
    logits = served.predict(x)
    xs = x[:, :N, :CIN]
    live = np.asarray(model.apply(variables, xs[..., :3], xs, training=False))
    np.testing.assert_allclose(logits, live, rtol=1e-5, atol=1e-5)


def test_chunking_matches_per_cloud(artifact):
    served = load_serving_artifact(artifact[0])
    x = _clouds(9)  # chunks of 4, 4, 1 over the (1, 4) buckets
    batched = served.predict(x)
    singles = np.stack([served.predict(x[i]) for i in range(9)])
    np.testing.assert_allclose(batched, singles, rtol=1e-5, atol=1e-5)
    labels = served.predict_labels(x)
    assert labels.shape == (9,)
    np.testing.assert_array_equal(labels, np.argmax(batched, -1))


def test_single_cloud_and_bad_shapes(artifact):
    served = load_serving_artifact(artifact[0])
    single = served.predict(_clouds(1)[0])
    assert single.shape == (5,)
    with pytest.raises(ValueError):
        served.predict(np.zeros((2, N // 2, CIN), np.float32))
    with pytest.raises(ValueError):
        served.predict(np.zeros((2, N, 2), np.float32))


def test_preprocess_matches_transform():
    from adaptpoint_tpu.transforms import build_transforms_from_cfg
    tf = build_transforms_from_cfg(
        "val", EasyConfig({"val": ["PointCloudCenterAndNormalize"],
                           "kwargs": {"gravity_dim": 1}}))
    rng = np.random.default_rng(3)
    raw = (rng.standard_normal((2, N, 3)) * 2 + 1).astype(np.float32)
    ours = preprocess_clouds(raw, gravity_dim=1)
    for i in range(2):
        data = tf({"pos": raw[i].copy()}, np.random.default_rng(0))
        ref = np.concatenate([data["pos"], data["heights"]], axis=1)
        np.testing.assert_allclose(ours[i], ref, rtol=1e-6, atol=1e-6)


def test_http_server_roundtrip(artifact):
    import io
    from adaptpoint_tpu.serving.server import make_server

    served = ServingModel(artifact[0])
    srv = make_server(served, port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz") as r:
            health = json.loads(r.read())
        assert health["ok"] and health["num_classes"] == 5

        x = _clouds(3)
        buf = io.BytesIO()
        np.save(buf, x)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict?logits=1", data=buf.getvalue())
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        np.testing.assert_array_equal(out["labels"],
                                      served.predict_labels(x))
        np.testing.assert_allclose(np.asarray(out["logits"]),
                                   served.predict(x), rtol=1e-4, atol=1e-4)

        # JSON body with server-side preprocessing of raw xyz clouds
        raw = np.random.default_rng(5).standard_normal((1, N, 3))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=json.dumps({"points": raw.tolist(),
                             "preprocess": True}).encode())
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        expect = served.predict_labels(preprocess_clouds(raw))
        np.testing.assert_array_equal(out["labels"], expect)

        # malformed body -> 400 with the error surfaced
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b"not a payload")
        try:
            urllib.request.urlopen(req)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.loads(e.read())
    finally:
        srv.shutdown()
        srv.server_close()


@pytest.mark.slow
def test_serve_cli_export_e2e(tiny_model, tmp_path):
    """examples/serve.py export: checkpoint -> artifact, loadable + correct."""
    import subprocess
    import sys

    from adaptpoint_tpu.utils.ckpt import save_pytree

    model, variables = tiny_model
    ckpt = str(tmp_path / "tiny_ckpt_best.msgpack")
    save_pytree({"params": variables["params"],
                 "batch_stats": variables["batch_stats"], "epoch": 3}, ckpt)
    out = str(tmp_path / "artifact")
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               ADAPTPOINT_TPU_KERNELS="xla")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples/serve.py"), "export",
         "--cfg", os.path.join(REPO, "cfgs/synthetic/pointnext-tiny.yaml"),
         f"pretrained_path={ckpt}", "--out", out, "--batch-sizes", "1,2"],
        capture_output=True, text=True, env=env, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    served = load_serving_artifact(out)
    assert served.manifest["checkpoint_epoch"] == 3
    x = _clouds(2)
    live = np.asarray(model.apply(variables, x[..., :3], x, training=False))
    np.testing.assert_allclose(served.predict(x), live, rtol=1e-5, atol=1e-5)
