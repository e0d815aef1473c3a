"""The S3DIS PointNeXt-B/L zoo cfgs build and hit the published sizes.

The reference model zoo (docs/modelzoo.md:46-47) lists PointNeXt-B at 3.8M
params / TP 158 and PointNeXt-L at 7.1M / TP 115 (V100, 16x15000). The
stage recipes (width 32, blocks [1,2,3,2,2] / [1,3,5,3,3]) come from the
PointNeXt paper; these tests pin the cfgs to the published param counts so
a recipe regression can't ship silently (scripts/bench_zoo.py benchmarks
the same cfgs on TPU).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adaptpoint_tpu.utils import EasyConfig
from adaptpoint_tpu.models import build_model_from_cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("cfg_name,ref_params", [
    ("pointnext-b", 3.8e6),
    ("pointnext-l", 7.1e6),
])
def test_s3dis_zoo_cfg_builds_at_published_size(cfg_name, ref_params):
    cfg = EasyConfig()
    cfg.load(os.path.join(REPO, f"cfgs/s3dis/{cfg_name}.yaml"),
             recursive=True)
    cfg.model.in_channels = cfg.model.encoder_args.in_channels
    model = build_model_from_cfg(cfg.model)
    B, N = 2, 256
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    x = jnp.concatenate([pos, jnp.abs(pos[..., 1:2])], -1)
    variables = model.init(jax.random.PRNGKey(0), pos, x, training=False)
    logits = model.apply(variables, pos, x, training=False)
    assert logits.shape == (B, N, 13)
    total = sum(p.size for p in jax.tree_util.tree_leaves(
        variables["params"]))
    # the zoo table rounds to 0.1M; allow 5%
    assert abs(total - ref_params) / ref_params < 0.05, f"params {total}"
