from . import cls_base, point_bert  # noqa: F401
