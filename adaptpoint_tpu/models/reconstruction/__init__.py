from . import masked_point  # noqa: F401
