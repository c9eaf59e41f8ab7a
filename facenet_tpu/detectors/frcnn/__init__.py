from facenet_tpu.detectors.frcnn.detector import FasterRCNN  # noqa: F401
