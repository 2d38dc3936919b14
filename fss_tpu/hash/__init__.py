"""Hash primitives: BLAKE3 (device-native) and SHA-256 (device-native here,
host-only in the reference). Both expose ``hash64`` (H': 64B -> 32B) and
``xor_hash`` (H: (x, s) -> 64B) as used by VDPF/VDMPF."""

from fss_tpu.hash.blake3 import Blake3
from fss_tpu.hash.sha256 import Sha256

__all__ = ["Blake3", "Sha256"]
