"""Full registry-name parity with the reference's live registries.

Each REFERENCE_* list below is every NAME under a live (uncommented)
``register_module`` in the corresponding /root/reference/openpoints
subpackage, minus justified exclusions:

- models: PyGPointNextEncoder/Decoder (PyG-only — the native PointNext IS
  the TPU path, SURVEY.md §2.5) and DistillBaseSeg (fully commented out in
  the reference).
- datasets: the PCQM4Mv2*/Atom* graph-molecule family (vestigial per
  SURVEY.md §2.7 — imported by no point-cloud cfg; the reference's own
  point pipelines never touch them).

Losses are additionally BUILT (they take no data-dependent ctor args);
models/datasets/transforms assert registration (construction needs cfgs /
on-disk data, covered by the per-family tests).
"""
import pytest

from adaptpoint_tpu.models import MODELS
import adaptpoint_tpu.models.segmentation  # noqa: F401 (registers vit_seg)
import adaptpoint_tpu.models.reconstruction  # noqa: F401
from adaptpoint_tpu.loss import LOSS, build_criterion_from_cfg
from adaptpoint_tpu.datasets.build import DATASETS
import adaptpoint_tpu.datasets  # noqa: F401 (registers all loaders)
from adaptpoint_tpu.transforms import DataTransforms
from adaptpoint_tpu.utils.config import EasyConfig

REFERENCE_MODELS = [
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

# openpoints/loss/build.py + cross_entropy.py + distill_loss.py
REFERENCE_LOSSES = [
    "BCELogits", "BCEWithLogitsLoss", "CrossEntropy", "CrossEntropyLoss",
    "DistillLoss", "FocalLoss", "LabelSmoothingCrossEntropy",
    "MaskedCrossEntropy", "MultiShapeCrossEntropy", "Poly1CrossEntropyLoss",
    "Poly1FocalLoss", "SmoothCrossEntropy", "SoftTargetCrossEntropy",
]

# openpoints/dataset/**, minus the graph-molecule family (see module doc)
REFERENCE_DATASETS = [
    "MP40", "ModelNet", "ModelNet40Ply2048", "S3DIS", "S3DISSphere",
    "ScanNet", "ScanObjectNNHardest", "SemanticKITTI", "ShapeNet",
    "ShapeNetPart", "ShapeNetPartCurve", "ShapeNetPartNormal",
]

# openpoints/transforms/point_transform_cpu.py + point_transformer_gpu.py
REFERENCE_TRANSFORMS = [
    "ChromaticAutoContrast", "ChromaticDropGPU", "ChromaticJitter",
    "ChromaticNormalize", "ChromaticPerDropGPU", "ChromaticTranslation",
    "HueSaturationTranslation", "NumpyChromaticNormalize",
    "PointCloudCenterAndNormalize", "PointCloudJitter", "PointCloudRotation",
    "PointCloudScaleAndJitter", "PointCloudScaleAndTranslate",
    "PointCloudScaling", "PointCloudToTensor", "PointCloudTranslation",
    "PointCloudXYZAlign", "PointsToTensor", "RandomDropFeature",
    "RandomDropout", "RandomFlip", "RandomHorizontalFlip", "RandomJitter",
    "RandomRotate", "RandomRotateZ", "RandomScale", "RandomScaleAndJitter",
    "RandomScaleAndTranslate", "RandomShift",
]


def test_every_reference_model_name_registered():
    missing = [n for n in REFERENCE_MODELS if n not in MODELS.module_dict]
    assert not missing, f"unregistered reference model names: {missing}"


def test_every_reference_dataset_name_registered():
    missing = [n for n in REFERENCE_DATASETS if n not in DATASETS.module_dict]
    assert not missing, f"unregistered reference dataset names: {missing}"


def test_every_reference_transform_name_registered():
    missing = [n for n in REFERENCE_TRANSFORMS
               if n not in DataTransforms.module_dict]
    assert not missing, f"unregistered reference transform names: {missing}"


@pytest.mark.parametrize("name", REFERENCE_LOSSES)
def test_every_reference_loss_builds(name):
    cfg = {"NAME": name}
    if name in ("MultiShapeCrossEntropy", "DistillLoss"):
        cfg["criterion_args" if name == "MultiShapeCrossEntropy"
            else "base_criterion_args"] = {"NAME": "CrossEntropy"}
    crit = build_criterion_from_cfg(EasyConfig(cfg))
    assert callable(crit)
