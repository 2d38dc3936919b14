"""Small-domain PRPs (reference include/fss/prp*)."""

from fss_tpu.prp.feistel import Aes128Feistel

__all__ = ["Aes128Feistel"]
