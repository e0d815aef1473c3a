from . import cls_trainer, cls_main  # noqa: F401
