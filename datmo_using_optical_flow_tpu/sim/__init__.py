from datmo_using_optical_flow_tpu.sim.synthetic import SyntheticScene, synthetic_frame  # noqa: F401
