from centerpose_tpu.models.factory import create_model  # noqa: F401
