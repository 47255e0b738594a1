"""gaiaseg_tpu: a TPU-native (JAX/XLA/Pallas/pjit) weight-sharing-NAS
semantic-segmentation framework with the capabilities of GAIA-seg.

Architecture overview (see SURVEY.md for the reference blueprint):
- ``archspace``: arch metas, samplers (sandwich rule), rules, model space,
  analytic FLOPs — the host-side control plane.
- ``ops``: masked dynamic layers (shape-stable elasticity: one XLA
  compilation serves every subnet) + Pallas kernels for the hot paths.
- ``models``: supernet backbones / decode heads / necks / segmentors /
  losses, registered into string-keyed registries driven by configs.
- ``parallel``: device-mesh + sharding helpers (data axis today; named axes
  reserved for tp/pp).
- ``data``: datasets, on-device augmentation pipeline, mIoU.
- ``engine``: train/eval loops, hooks, checkpointing, subnet tooling.
"""

__version__ = "0.1.0"

from . import archspace, ops, utils  # noqa: F401
