from . import cls_base  # noqa: F401
