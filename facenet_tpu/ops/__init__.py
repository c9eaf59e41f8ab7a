from facenet_tpu.ops import preprocessing  # noqa: F401
