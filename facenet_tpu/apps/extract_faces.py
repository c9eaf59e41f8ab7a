"""Detect + align faces for a whole dataset into per-class PNG thumbnails.

Parity: reference apps/extract_faces.py — but the detection runs BATCHED
through the jitted TPU cascade instead of one sess.run per image
(the reference hot loop, SURVEY.md §3.2).
"""

import click
from pathlib import Path

import numpy as np

from facenet_tpu import config, dataset, h5utils, ioutils
from facenet_tpu.detectors.face_detector import FaceDetector, image_processing

DETECT_BATCH = 32


@click.command()
@click.option('--config', 'config_file', default=None, type=Path,
              help='Path to yaml config file with used options of the application.')
def main(**options):
    options = config.extract_faces(__file__, {'config': options['config_file']})

    dbase = dataset.DBase(options.dataset)
    ioutils.write_text_log(options.logfile, dbase)
    print('input dataset:', dbase)

    print('output directory', options.outdir)
    print('output h5 file  ', options.h5file)

    detector = FaceDetector(detector=options.detector or 'mtcnn',
                            weights=options.detector_weights or None)
    ioutils.write_text_log(options.logfile, detector)
    print(detector)

    detect_multiple = bool(options.detect_multiple_faces)

    nrof_extracted_faces = 0
    nrof_unread_files = 0

    for cls in dbase.classes:
        output_class_dir = options.outdir.joinpath(cls.name)
        ioutils.makedirs(output_class_dir)

        # read a batch of images, then detect them all in one cascade call
        for start in range(0, cls.nrof_images, DETECT_BATCH):
            chunk = cls.files[start:start + DETECT_BATCH]
            images, pil_images, paths = [], [], []
            for image_path in chunk:
                try:
                    img = ioutils.read_image(image_path)
                    arr = ioutils.pil2array(img, mode=detector.mode)
                except Exception:
                    nrof_unread_files += 1
                    continue
                images.append(arr)
                pil_images.append(img)
                paths.append(image_path)

            if not images:
                continue

            all_boxes = detector.detect_images(images)

            for img, image_path, boxes in zip(pil_images, paths, all_boxes):
                nrof_faces = len(boxes)
                if nrof_faces == 0:
                    continue
                if nrof_faces > 1 and not detect_multiple:
                    continue

                nrof_extracted_faces += 1
                out_filename = output_class_dir.joinpath(
                    Path(image_path).stem + '.png')

                for n, box in enumerate(boxes):
                    output = image_processing(img, box, options.image)

                    out_filename_n = out_filename
                    if n > 0:
                        out_filename_n = out_filename.parent.joinpath(
                            '{}_{}{}'.format(out_filename.stem, n,
                                             out_filename.suffix))

                    ioutils.write_image(output, out_filename_n)
                    size = np.uint32((box.height, box.width))
                    h5utils.write(options.h5file,
                                  h5utils.filename2key(out_filename_n, 'size'),
                                  size)

    out_dbase = dataset.DBase(dataset.DefaultConfig(options.outdir))
    ioutils.write_text_log(options.logfile, out_dbase)

    ioutils.write_text_log(
        options.logfile, f'Number of files that cannot be read {nrof_unread_files}')
    ioutils.write_text_log(
        options.logfile, f'Number of extracted faces {nrof_extracted_faces}')

    print('Number of extracted faces', nrof_extracted_faces)
    print('Logs have been written to the file', options.logfile)


if __name__ == '__main__':
    main()
