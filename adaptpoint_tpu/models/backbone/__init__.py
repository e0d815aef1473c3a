from . import pointnext, dgcnn, pointnetv2, pointnet, pointmlp, pointvit, deepgcn  # noqa: F401
