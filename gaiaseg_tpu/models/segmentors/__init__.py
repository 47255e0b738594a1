from .encoder_decoder import DynamicEncoderDecoder
from .dynamic_distiller import DynamicDistiller, frozen_param_labels

__all__ = ["DynamicEncoderDecoder", "DynamicDistiller",
           "frozen_param_labels"]
