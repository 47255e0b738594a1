"""Native (C++) host-side components, built on demand with g++."""
from .build import load_packio  # noqa: F401
