from . import base_seg  # noqa: F401
from . import vit_seg  # noqa: F401
