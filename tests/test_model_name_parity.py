"""Registered-name parity with the reference MODELS registry.

REFERENCE_REGISTERED is every class under a live (uncommented)
``@MODELS.register_module()`` in /root/reference/openpoints/models, minus the
PyG-only pair (PyGPointNextEncoder/Decoder — N/A by design: the native
PointNext IS the TPU path, SURVEY.md SS2.5) and minus names that are dead
code in the reference itself (DistillBaseSeg is fully commented out).
PointVitSeg/SceneSegHeadPointNet are dead code there too (vit_seg.py cannot
import) but ARE implemented and registered here.
"""
from adaptpoint_tpu.models import MODELS
import adaptpoint_tpu.models.segmentation  # noqa: F401 (registers vit_seg)

REFERENCE_REGISTERED = [
    "BAAFNet", "BallDGCNN", "BaseCls", "BasePartSeg", "BaseSeg", "ClsHead",
    "CurveNet", "DGCNN", "DeepGCN", "DistillCls", "FoldingNet",
    "GroupPointNet", "MVFC", "MVModel", "MaskedPoint", "MaskedPointGroup",
    "MaskedPointViT", "MaskedTransformerDecoder", "MultiSegHead",
    "NodeShuffle", "P3Embed", "PTSeg", "PointMLP", "PointMLPEncoder",
    "PointNet2Decoder", "PointNet2Encoder", "PointNet2PartDecoder",
    "PointNetEncoder", "PointNextDecoder", "PointNextEncoder",
    "PointNextPartDecoder", "PointPatchEmbed", "PointTransformer",
    "PointViT", "PointViTDecoder", "PointViTPartDecoder", "PointVitSeg",
    "RandLANet", "SegHead", "StratifiedDecoder", "StratifiedEncoder",
    "VariableSeg", "VariableSegHead",
]


def test_every_reference_model_name_registered():
    missing = [n for n in REFERENCE_REGISTERED
               if n not in MODELS.module_dict]
    assert not missing, f"unregistered reference model names: {missing}"
