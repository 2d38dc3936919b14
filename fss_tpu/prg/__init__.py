"""PRGs over 128-bit blocks: ChaCha (the reference's nonstandard
single-block variant) and AES-128-MMO (covers the reference's OpenSSL,
AES-NI, and T-table soft variants — one function)."""

from fss_tpu.prg.aes import Aes128Mmo
from fss_tpu.prg.chacha import ChaCha

__all__ = ["Aes128Mmo", "ChaCha"]
