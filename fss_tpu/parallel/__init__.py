"""Mesh-level parallelism (data + domain axes, collectives)."""

from fss_tpu.parallel import mesh

__all__ = ["mesh"]
