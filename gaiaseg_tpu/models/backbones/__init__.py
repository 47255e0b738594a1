from .dynamic_resnet import DynamicResNet, DynResLayer
from .dynamic_convnext import DynamicConvNeXt, DynamicConvNeXtBlock
from .elastic_transformer import ElasticMHA, ElasticTransformer
from .beit import BEiT
from .elastic_convformer import ElasticConvformer

__all__ = ["DynamicResNet", "DynResLayer", "DynamicConvNeXt",
           "DynamicConvNeXtBlock", "ElasticTransformer", "ElasticMHA", "BEiT", "ElasticConvformer"]
