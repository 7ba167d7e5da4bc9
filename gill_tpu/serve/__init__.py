from gill_tpu.serve.engine import DecodeEngine, ServeRequest  # noqa: F401
