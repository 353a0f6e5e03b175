from antmmf_tpu.modules.encoders import graph_encoders  # noqa: F401
