"""Pallas TPU kernels: fused tree-scheme evals (dpf/dcf/ht/vdpf) and gen
(dpf/dcf/ht/vdpf) on the ChaCha PRG, the plane-domain bitsliced AES-MMO
kernels (dpf/dcf/ht/vdpf eval; aes_pallas), hybrid full-domain expansion
(eval_all_pallas), and batched BLAKE3 hashes. Import submodules directly
(they pull in jax.experimental.pallas)."""
