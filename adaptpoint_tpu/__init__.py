"""adaptpoint_tpu: TPU-native (JAX/XLA/Pallas/pjit) framework for
corruption-robust point-cloud recognition — sample-adaptive adversarial
augmentation (AdaptPoint) on the PointNeXt/openpoints model stack.

See SURVEY.md for the reference blueprint this framework rebuilds TPU-first.
"""

__version__ = "0.1.0"
