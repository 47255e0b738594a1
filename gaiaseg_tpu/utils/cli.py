"""Shared CLI plumbing for tools/.

Every tool accepts ``--device cpu|tpu`` (the reference relies on
``CUDA_VISIBLE_DEVICES``; here the jax platform is a config flag because
this image's sitecustomize pins ``jax_platforms`` and plain env vars are
ignored — see .claude/skills/verify/SKILL.md).
"""
from __future__ import annotations


def add_device_arg(parser) -> None:
    parser.add_argument("--device", default=None,
                        help="force a jax platform, e.g. cpu / tpu")


def apply_device(args) -> None:
    """Apply ``--device`` BEFORE the first jax backend touch."""
    if getattr(args, "device", None):
        import jax
        jax.config.update("jax_platforms", args.device)
