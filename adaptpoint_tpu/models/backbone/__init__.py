from . import pointnext, dgcnn, pointnetv2, pointnet, pointmlp, pointvit, deepgcn, curvenet, pointtransformer, simpleview, randlanet, grouppointnet, baafnet  # noqa: F401
