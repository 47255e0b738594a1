from .dynamic_resnet import DynamicResNet, DynResLayer

__all__ = ["DynamicResNet", "DynResLayer"]
