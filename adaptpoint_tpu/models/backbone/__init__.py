from . import pointnext, dgcnn, pointnetv2, pointnet, pointmlp  # noqa: F401
