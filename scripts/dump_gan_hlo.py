"""Dump the optimized HLO of gan_step and print the definitions of the
big anonymous fusions seen in traces (fusion.2-5, copies, convert_reduce)."""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from adaptpoint_tpu.utils import EasyConfig
from adaptpoint_tpu.models import build_model_from_cfg
from adaptpoint_tpu.parallel import get_mesh, shard_batch
from adaptpoint_tpu.engine.cls_trainer import build_train_tools, init_state
from adaptpoint_tpu.engine.adapt_trainer import build_gan, make_gan_step


def main():
    rng = np.random.default_rng(0)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = EasyConfig()
    cfg.load(os.path.join(repo,
                          "cfgs/scanobjectnn/pointnext-s_adaptpoint_1.yaml"),
             recursive=True)
    cfg.model.in_channels = cfg.model.encoder_args.in_channels
    model = build_model_from_cfg(cfg.model)
    mesh = get_mesh()
    B, N = 32, 2048
    batch = {"x": rng.standard_normal((B, N, 4)).astype(np.float32),
             "y": rng.integers(0, 15, B).astype(np.int64)}
    key = jax.random.PRNGKey(0)
    criterion, tx, _ = build_train_tools(cfg, model)
    state = init_state(cfg, model, tx, key, batch)
    generator, discriminator, tx_g, tx_d, gan_state = build_gan(
        cfg, jnp.asarray(batch["x"][:2, :, :3]), key)
    gan_step = make_gan_step(generator, discriminator, tx_g, tx_d, model, cfg)
    sb = shard_batch(mesh, batch)
    compiled = jax.jit(gan_step).lower(
        gan_state, state, sb, key, jnp.float32(3.0)).compile()
    txt = compiled.as_text()
    path = "/tmp/gan_step_hlo.txt"
    with open(path, "w") as f:
        f.write(txt)
    print("bytes:", len(txt), "->", path)
    # print the header line (op shapes) of the named fusions of interest
    want = sys.argv[1:] or ["fusion.2 ", "fusion.3 ", "fusion.4 ",
                            "fusion.5 ", "fusion.1 ", "fusion.24 ",
                            "copy.18", "convert_reduce_fusion"]
    for line in txt.splitlines():
        ls = line.strip()
        if ls.startswith("%fusion") or " = " in ls and ("fusion" in ls.split(" = ")[0] or ls.split(" = ")[0].strip("%").startswith("copy")):
            name = ls.split(" = ")[0].strip().strip("%")
            for w in want:
                if name.startswith(w.strip()):
                    print(ls[:400])
                    break
    print("DONE")


if __name__ == "__main__":
    main()
