from . import pointnext, dgcnn, pointnetv2, pointnet, pointmlp, pointvit  # noqa: F401
