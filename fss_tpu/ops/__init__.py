"""Pallas TPU kernels: fused tree-scheme evals (dpf/dcf/ht/vdpf), hybrid
full-domain expansion, batched BLAKE3 hashes. Import submodules directly
(they pull in jax.experimental.pallas)."""
