from datmo_using_optical_flow_tpu.utils.padding import compact_masked, pad_to  # noqa: F401
