"""Standalone profiler (parity: reference examples/profile.py:22-120):
params / FLOPs (XLA cost analysis) / throughput for a cfg's model.

    python examples/profile.py --cfg cfgs/scanobjectnn/pointnext-s.yaml
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adaptpoint_tpu.utils import EasyConfig, setup_logger


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--num_points", type=int, default=None)
    args, opts = parser.parse_known_args()
    cfg = EasyConfig()
    cfg.load(args.cfg, recursive=True)
    cfg.update_opts(opts)
    setup_logger(None, 0)
    from adaptpoint_tpu.engine.profiler import profile_model
    profile_model(cfg, batch_size=args.batch_size, num_points=args.num_points)


if __name__ == "__main__":
    main()
