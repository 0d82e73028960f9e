from centerpose_tpu.ops.dcn import dcn_v2  # noqa: F401
from centerpose_tpu.ops.psroi import dcn_v2_psroi_pooling  # noqa: F401
