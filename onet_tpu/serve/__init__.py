from onet_tpu.serve.tiles import infer_tiled  # noqa: F401
