"""Convert a reference (torch OpenPoints/AdaptPoint) .pth checkpoint into
an adaptpoint-tpu msgpack checkpoint.

Usage:
  python scripts/convert_torch_ckpt.py \
      --src scanobjectnn-train-pointnext-s_ckpt_best.pth \
      --cfg cfgs/scanobjectnn/pointnext-s.yaml \
      --out pointnext-s_converted.msgpack

The output loads through the normal path:
  python examples/classification/main.py \
      --cfg cfgs/scanobjectnn/pointnext-s.yaml \
      mode=test pretrained_path=pointnext-s_converted.msgpack

Mapping rules, scope, and the zero-filled-bias equivalence argument:
adaptpoint_tpu/utils/torch_convert.py. Reference .pth layout:
{'model': state_dict, 'epoch': ..., ...} or a bare state_dict
(openpoints save_checkpoint).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="reference .pth checkpoint")
    ap.add_argument("--cfg", required=True,
                    help="OUR cfg matching the checkpointed architecture")
    ap.add_argument("--out", required=True, help="output .msgpack path")
    ap.add_argument("--sd-key", default=None,
                    help="key holding the state_dict inside the .pth "
                         "(auto: tries 'model', 'state_dict', bare)")
    ap.add_argument("--tolerant", action="store_true",
                    help="keep going past unhandled/missing keys "
                         "(prints the report instead of failing)")
    args = ap.parse_args(argv)

    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    from adaptpoint_tpu.utils import EasyConfig
    from adaptpoint_tpu.models import build_model_from_cfg
    from adaptpoint_tpu.utils.ckpt import save_pytree
    from adaptpoint_tpu.utils.torch_convert import (
        convert_reference_state_dict)

    blob = torch.load(args.src, map_location="cpu", weights_only=True)
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
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                        else v) for k, v in sd.items()}

    cfg = EasyConfig()
    cfg.load(args.cfg, recursive=True)
    cfg.model.in_channels = cfg.model.get("in_channels", None) \
        or cfg.model.encoder_args.in_channels
    model = build_model_from_cfg(cfg.model)
    in_ch = int(cfg.model.in_channels)
    pos = jnp.zeros((2, 64, 3), jnp.float32)
    x = jnp.zeros((2, 64, in_ch), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), pos, x, training=False)

    new_vars, report = convert_reference_state_dict(
        sd, variables, strict=not args.tolerant)
    print("conversion:", report.summary())
    if report.unhandled:
        print("  unhandled:", report.unhandled[:20])
    if report.missing:
        print("  missing:", report.missing[:20])

    payload = {"params": new_vars["params"],
               "batch_stats": new_vars.get("batch_stats", {}),
               "epoch": epoch}
    save_pytree(payload, args.out)
    print(f"wrote {args.out} (epoch={epoch})")


if __name__ == "__main__":
    main()
