"""Convert a reference (torch OpenPoints/AdaptPoint) .pth checkpoint into
an adaptpoint-tpu msgpack checkpoint.

Model checkpoints (classification, part-seg, scene-seg — the reference's
save_checkpoint format, openpoints/utils/ckpt_util.py:61-91):

  python scripts/convert_torch_ckpt.py \
      --src scanobjectnn-train-pointnext-s_ckpt_best.pth \
      --cfg cfgs/scanobjectnn/pointnext-s.yaml \
      --out pointnext-s_converted.msgpack

The output loads through the normal path:
  python examples/classification/main.py \
      --cfg cfgs/scanobjectnn/pointnext-s.yaml \
      mode=test pretrained_path=pointnext-s_converted.msgpack

GAN pair (the reference trainer's per-epoch model_gan.pth,
examples/classification/train_autoaug.py:71-78):

  python scripts/convert_torch_ckpt.py --gan \
      --src model_gan.pth \
      --cfg cfgs/scanobjectnn/pointnext-s_adaptpoint_1.yaml \
      --out model_gan.msgpack

Drop the output into a run dir and resume the adversarial loop with
``mode=resume`` (engine/adapt_main.py restores G/D params + batch stats
from model_gan.msgpack).

Mapping rules, covered layouts, and the zero-filled-bias equivalence
argument: adaptpoint_tpu/utils/torch_convert.py.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _to_numpy_sd(sd):
    import numpy as np
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v) for k, v in sd.items()}


def _convert_model(args, blob):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from adaptpoint_tpu.utils import EasyConfig
    from adaptpoint_tpu.models import build_model_from_cfg
    from adaptpoint_tpu.utils.ckpt import save_pytree
    from adaptpoint_tpu.utils.torch_convert import (
        convert_reference_state_dict)

    epoch = 0
    sd = blob
    if isinstance(blob, dict) and not any(
            hasattr(v, "shape") for v in blob.values()):
        epoch = int(blob.get("epoch", 0) or 0)
        for key in ([args.sd_key] if args.sd_key else
                    ["model", "state_dict", "base_model"]):
            if key and key in blob:
                sd = blob[key]
                break
        else:
            raise SystemExit(f"no state_dict under {list(blob.keys())}; "
                             f"pass --sd-key")
    sd = _to_numpy_sd(sd)

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
        cls0 = jnp.zeros((2,), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), pos, x, cls0,
                               training=False)
    else:
        variables = model.init(jax.random.PRNGKey(0), pos, x, training=False)

    new_vars, report = convert_reference_state_dict(
        sd, variables, strict=not args.tolerant)
    print("conversion:", report.summary())
    if report.unhandled:
        print("  unhandled:", report.unhandled[:20])
    if report.missing:
        print("  missing:", report.missing[:20])
    if report.errors:
        print("  errors:", report.errors[:20])

    payload = {"params": new_vars["params"],
               "batch_stats": new_vars.get("batch_stats", {}),
               "epoch": epoch}

    if args.optimizer:
        from adaptpoint_tpu.utils.torch_convert import (
            convert_reference_optimizer_state)
        opt_sd = blob.get("optimizer") if isinstance(blob, dict) else None
        if not opt_sd:
            raise SystemExit("--optimizer: checkpoint has no 'optimizer' "
                             "state (reference save_checkpoint stores it "
                             "when training saved one)")
        # named_parameters order == state_dict key order minus buffers
        param_names = [k for k in sd if not k.endswith(
            ("running_mean", "running_var", "num_batches_tracked"))]
        mu, nu, count = convert_reference_optimizer_state(
            opt_sd, param_names, new_vars, strict=not args.tolerant)
        payload["opt_moments"] = {"mu": mu, "nu": nu,
                                  "count": np.asarray(count, np.int32)}
        print(f"optimizer moments converted (count={count})")

    save_pytree(payload, args.out)
    print(f"wrote {args.out} (epoch={epoch})")


def _convert_gan(args, blob):
    import jax
    import jax.numpy as jnp

    from adaptpoint_tpu.utils import EasyConfig
    from adaptpoint_tpu.adapt import build_adaptpointmodels_from_cfg
    from adaptpoint_tpu.utils.ckpt import save_pytree
    from adaptpoint_tpu.utils.torch_convert import (
        convert_reference_generator, convert_reference_discriminator)

    if not (isinstance(blob, dict)
            and {"generator", "discriminator"} <= set(blob)):
        raise SystemExit("--gan expects the reference save_ganmodel format: "
                         "{'generator': sd, 'discriminator': sd}")
    cfg = EasyConfig()
    cfg.load(args.cfg, recursive=True)
    gen = build_adaptpointmodels_from_cfg(cfg.adaptmodel_gan)
    dis = build_adaptpointmodels_from_cfg(cfg.adaptmodel_dis)

    cloud = jnp.zeros((2, 64, 3), jnp.float32)
    g_vars = gen.init({"params": jax.random.PRNGKey(0),
                       "wolf": jax.random.PRNGKey(1),
                       "gumbel": jax.random.PRNGKey(2)}, cloud,
                      training=False)
    d_vars = dis.init({"params": jax.random.PRNGKey(0)}, cloud,
                      training=False)

    g_new, g_rep = convert_reference_generator(
        _to_numpy_sd(blob["generator"]), g_vars, strict=not args.tolerant)
    print("generator:", g_rep.summary())
    d_new, d_rep = convert_reference_discriminator(
        _to_numpy_sd(blob["discriminator"]), d_vars,
        strict=not args.tolerant)
    print("discriminator:", d_rep.summary())
    for rep in (g_rep, d_rep):
        if rep.unhandled:
            print("  unhandled:", rep.unhandled[:20])
        if rep.missing:
            print("  missing:", rep.missing[:20])
        if rep.errors:
            print("  errors:", rep.errors[:20])

    # engine/adapt_main.py model_gan.msgpack layout
    save_pytree({"generator": {"params": g_new["params"],
                               "batch_stats": g_new.get("batch_stats", {})},
                 "discriminator": {"params": d_new["params"],
                                   "batch_stats": d_new.get("batch_stats",
                                                            {})}},
                args.out)
    print(f"wrote {args.out}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="reference .pth checkpoint")
    ap.add_argument("--cfg", required=True,
                    help="OUR cfg matching the checkpointed architecture "
                         "(for --gan: a cfg with adaptmodel_gan/_dis)")
    ap.add_argument("--out", required=True, help="output .msgpack path")
    ap.add_argument("--gan", action="store_true",
                    help="convert a model_gan.pth generator/discriminator "
                         "pair instead of a task-model checkpoint")
    ap.add_argument("--optimizer", action="store_true",
                    help="also convert the torch Adam/AdamW moments into "
                         "'opt_moments' (mid-training migration; mode="
                         "resume splices them into the optax state)")
    ap.add_argument("--sd-key", default=None,
                    help="key holding the state_dict inside the .pth "
                         "(auto: tries 'model', 'state_dict', bare)")
    ap.add_argument("--tolerant", action="store_true",
                    help="keep going past unhandled/missing keys "
                         "(prints the report instead of failing)")
    args = ap.parse_args(argv)

    import torch

    blob = torch.load(args.src, map_location="cpu", weights_only=True)
    if args.gan:
        _convert_gan(args, blob)
    else:
        _convert_model(args, blob)


if __name__ == "__main__":
    main()
