from . import base_seg  # noqa: F401
