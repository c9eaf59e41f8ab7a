from facenet_tpu.utils import tfrecord  # noqa: F401
