from .blocks import ConvBlock, LinearBlock, NormAct, create_act, CHANNEL_MAP
from .group_layers import (QueryAndGroup, KNNGroup, GroupAll, create_grouper,
                           get_aggregation_features)
