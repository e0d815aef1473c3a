from . import pointnext, dgcnn  # noqa: F401
