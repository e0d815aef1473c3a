from . import pointnext, dgcnn, pointnetv2, pointnet, pointmlp, pointvit, deepgcn, curvenet, pointtransformer, simpleview, randlanet, grouppointnet, baafnet, stratified_transformer  # noqa: F401
