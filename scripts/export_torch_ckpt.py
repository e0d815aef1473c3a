"""Export an adaptpoint-tpu msgpack checkpoint as a reference (torch
OpenPoints/AdaptPoint) ``.pth`` — the migration escape hatch: models
trained here load straight into the reference code via its
``load_checkpoint`` (openpoints/utils/ckpt_util.py:137-180).

  python scripts/export_torch_ckpt.py \
      --src log/.../checkpoint/..._ckpt_best.msgpack \
      --cfg cfgs/scanobjectnn/pointnext-s.yaml \
      --layout tests/fixtures/ref_layout_pointnext_s_cls.json \
      --out pointnext-s_exported.pth

``--layout`` is the reference state_dict layout ([key, shape] pairs) the
export targets — one of the shipped ``tests/fixtures/ref_layout_*.json``
(regenerate for other architectures with scripts/dump_ref_layouts.py).
The cfg is used to rebuild our model and structurally validate the
checkpoint before export. Inverse-mapping rules (incl. the exact fold of
our head Dense biases into BN running means):
adaptpoint_tpu/utils/torch_convert.py export_reference_state_dict.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _export_gan(args):
    """our model_gan.msgpack -> reference model_gan.pth
    ({'generator': sd, 'discriminator': sd}, train_autoaug.py:71-78)."""
    import torch

    from adaptpoint_tpu.utils.ckpt import load_pytree
    from adaptpoint_tpu.utils.torch_convert import (
        export_reference_generator, export_reference_discriminator)

    payload = load_pytree(args.src)
    layout = json.load(open(args.layout))
    g_sd, g_rep = export_reference_generator(
        payload["generator"], layout["generator"], strict=not args.tolerant)
    print("generator:", g_rep.summary())
    d_sd, d_rep = export_reference_discriminator(
        payload["discriminator"], layout["discriminator"],
        strict=not args.tolerant)
    print("discriminator:", d_rep.summary())
    torch.save({part: {k: torch.from_numpy(v.copy()) if v.ndim else
                       torch.tensor(int(v)) for k, v in sd.items()}
                for part, sd in (("generator", g_sd),
                                 ("discriminator", d_sd))}, args.out)
    print(f"wrote {args.out}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="our .msgpack checkpoint")
    ap.add_argument("--cfg", default=None, help="our cfg for the model "
                    "(unused with --gan)")
    ap.add_argument("--layout", required=True,
                    help="reference layout fixture (ref_layout_*.json)")
    ap.add_argument("--out", required=True, help="output .pth path")
    ap.add_argument("--gan", action="store_true",
                    help="export a model_gan.msgpack G/D pair instead of a "
                         "task-model checkpoint")
    ap.add_argument("--tolerant", action="store_true")
    args = ap.parse_args(argv)

    if args.gan:
        _export_gan(args)
        return
    if not args.cfg:
        raise SystemExit("--cfg is required for task-model export")

    import torch

    import jax
    import jax.numpy as jnp

    from adaptpoint_tpu.utils import EasyConfig
    from adaptpoint_tpu.models import build_model_from_cfg
    from adaptpoint_tpu.utils.ckpt import load_checkpoint
    from adaptpoint_tpu.utils.torch_convert import (
        export_reference_state_dict)

    cfg = EasyConfig()
    cfg.load(args.cfg, recursive=True)
    cfg.model.in_channels = cfg.model.get("in_channels", None) \
        or cfg.model.encoder_args.in_channels
    model = build_model_from_cfg(cfg.model)
    in_ch = int(cfg.model.in_channels)
    n = 256 if cfg.model.NAME in ("BaseSeg", "VariableSeg") else 64
    pos = jnp.zeros((2, n, 3), jnp.float32)
    x = jnp.zeros((2, n, in_ch), jnp.float32)
    if cfg.model.NAME == "BasePartSeg":
        variables = model.init(jax.random.PRNGKey(0), pos, x,
                               jnp.zeros((2,), jnp.int32), training=False)
    else:
        variables = model.init(jax.random.PRNGKey(0), pos, x, training=False)

    target = {"params": variables["params"],
              "batch_stats": variables.get("batch_stats", {}), "epoch": 0}
    merged, epoch, _ = load_checkpoint(target, args.src)

    # a silently-partial load would export freshly-initialized weights as
    # if they were trained — verify the checkpoint actually covered the cfg
    import numpy as np
    import jax.tree_util as jtu
    from adaptpoint_tpu.utils.ckpt import load_pytree
    raw = load_pytree(args.src)
    raw_leaves = {jtu.keystr(p): tuple(np.shape(v)) for p, v in
                  jtu.tree_leaves_with_path({c: raw.get(c, {}) for c in
                                             ("params", "batch_stats")})}
    uncovered = []
    for p, v in jtu.tree_leaves_with_path(
            {c: variables.get(c, {}) for c in ("params", "batch_stats")}):
        k = jtu.keystr(p)
        if raw_leaves.get(k) != tuple(np.shape(v)):
            uncovered.append(k)
    if uncovered and not args.tolerant:
        raise SystemExit(
            f"checkpoint does not cover the cfg's model: {len(uncovered)} "
            f"leaves missing/mismatched, e.g. {uncovered[:5]} "
            f"(pass --tolerant to export anyway)")
    variables = {"params": merged["params"],
                 "batch_stats": merged["batch_stats"]}

    layout = json.load(open(args.layout))
    sd, report = export_reference_state_dict(
        variables, layout, strict=not args.tolerant)
    print("export:", report.summary())
    if report.unhandled:
        print("  unhandled:", report.unhandled[:20])
    if report.missing:
        print("  uncovered source leaves:", report.missing[:20])
    if report.errors:
        print("  errors:", report.errors[:20])

    torch.save({"model": {k: torch.from_numpy(v.copy()) if v.ndim else
                          torch.tensor(int(v)) for k, v in sd.items()},
                "epoch": int(epoch)}, args.out)
    print(f"wrote {args.out} (epoch={epoch})")


if __name__ == "__main__":
    main()
