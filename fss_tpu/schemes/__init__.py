"""FSS scheme cores: pure functions over key pytrees.

dpf, dcf, half_tree_dpf, grotto_dcf, vdpf, vdmpf, cuckoo. Prefer the
config-cached wrappers in fss_tpu.api for application code.
"""
