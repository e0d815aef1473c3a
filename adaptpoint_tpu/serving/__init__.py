"""Production serving: AOT-compiled inference artifacts + a batching server.

The reference deploys by loading a torch checkpoint into the full training
code base and calling the model in eval mode (script/test_all_in_one.sh
replays ``mode=test pretrained_path=...`` per released ckpt). For TPU
production serving we go further: :func:`export_serving_artifact` AOT-exports
the jitted eval forward (``jax.export`` → StableHLO) with the trained
parameters baked in as constants, one compiled unit per batch-size bucket.
The resulting artifact directory is self-contained — serving it needs
neither the model code, the config system, nor the checkpoint, only jax —
and is immune to model-code drift between training and serving.

:class:`ServingModel` loads an artifact and routes requests to the smallest
bucket that fits (padding with duplicate clouds — eval-mode forwards are
per-sample independent, so pad rows never perturb real rows), chunking
requests larger than the biggest bucket. :mod:`adaptpoint_tpu.serving.server`
wraps it in a dependency-free HTTP server.
"""
from .artifact import (ServingModel, export_serving_artifact,
                       load_serving_artifact, preprocess_clouds)

__all__ = ["export_serving_artifact", "load_serving_artifact",
           "ServingModel", "preprocess_clouds"]
