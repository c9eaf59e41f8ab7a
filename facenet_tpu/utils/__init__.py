from facenet_tpu.utils import tfrecord  # noqa: F401
from facenet_tpu.utils import debug  # noqa: F401
from facenet_tpu.utils.debug import (ConcatenateImages, file2text,  # noqa: F401
                                     generate_filename, label_array)
