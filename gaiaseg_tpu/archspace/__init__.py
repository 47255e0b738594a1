from .meta import (dl_to_ld, fold_dict, ld_to_dl, meta_hash, meta_json,
                   unfold_dict)
from .samplers import (AnchorSampler, BaseSampler, CandidateSampler,
                       CompositeSampler, ConcatSampler, RangeSampler,
                       RepeatSampler, build_model_sampler)
from .rules import BaseRule, build_sample_rule
from .model_space import ModelSpace, ModelSpaceManager
from .complexity import get_model_complexity_info

__all__ = [
    "fold_dict", "unfold_dict", "dl_to_ld", "ld_to_dl", "meta_hash",
    "meta_json", "build_model_sampler", "BaseSampler", "AnchorSampler",
    "RangeSampler", "CandidateSampler", "CompositeSampler", "RepeatSampler",
    "ConcatSampler", "build_sample_rule", "BaseRule", "ModelSpace",
    "ModelSpaceManager",
]
