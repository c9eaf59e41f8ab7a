from facenet_tpu.models import inception_resnet_v1  # noqa: F401
