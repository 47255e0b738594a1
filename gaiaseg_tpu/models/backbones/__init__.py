from .dynamic_resnet import DynamicResNet, DynResLayer
from .dynamic_convnext import DynamicConvNeXt, DynamicConvNeXtBlock
from .elastic_transformer import ElasticMHA, ElasticTransformer
from .beit import BEiT
from .elastic_convformer import ElasticConvformer
from .elastic_mixvit import ElasticMixViT

__all__ = ["DynamicResNet", "DynResLayer", "DynamicConvNeXt",
           "DynamicConvNeXtBlock", "ElasticTransformer", "ElasticMHA", "BEiT", "ElasticConvformer", "ElasticMixViT"]
