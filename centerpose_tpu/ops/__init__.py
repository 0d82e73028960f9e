from centerpose_tpu.ops.dcn import dcn_v2  # noqa: F401
