"""Host-side IO utilities.

Same capability surface as the reference ioutils
(/root/reference/facenet/ioutils.py): PIL image read/write, PIL<->numpy
conversion, directory creation, append-only text logs, elapsed-time capture,
and git provenance recording for every run directory.
"""

from __future__ import annotations

import datetime
import platform
import sys
import time
from functools import partial
from pathlib import Path
from subprocess import PIPE, Popen

import numpy as np
from PIL import Image

from facenet_tpu import h5utils

makedirs = partial(Path.mkdir, parents=True, exist_ok=True)


def end(start, stop):
    return '\n' if (start + 1) == stop else ''


def get_time():
    return time.monotonic()


def write_elapsed_time(files, start_time):
    """Append elapsed minutes to text log(s) or h5 file(s)."""
    if not isinstance(files, list):
        files = [files]

    for file in files:
        file = Path(str(file)).expanduser()
        elapsed_time = (time.monotonic() - start_time) / 60

        if file.suffix == '.h5':
            h5utils.write(file, 'elapsed_time', elapsed_time)
        else:
            file.parent.mkdir(parents=True, exist_ok=True)
            with file.open('at') as f:
                f.write('elapsed time: {:.3f}\n'.format(elapsed_time))


def store_revision_info(output_filename, mode='a'):
    """Write provenance (python/jax versions, argv, git hash+diff) to a run dir."""
    output_filename = Path(str(output_filename)).expanduser()

    if output_filename.suffix != '.txt':
        output_filename.mkdir(parents=True, exist_ok=True)
        output_filename = output_filename / 'revision_info.txt'
    else:
        output_filename.parent.mkdir(parents=True, exist_ok=True)

    arg_string = ' '.join(sys.argv)

    try:
        import jax
        jax_version = jax.__version__
    except ImportError:  # pragma: no cover
        jax_version = 'not installed'

    with open(str(output_filename), mode) as f:
        f.write(64 * '-' + '\n')
        f.write('{} {}\n'.format('store_revision_info', datetime.datetime.now()))
        f.write('release version: {}\n'.format(platform.version()))
        f.write('python version: {}\n'.format(sys.version))
        f.write('jax version: {}\n'.format(jax_version))
        f.write('arguments: {}\n'.format(arg_string))
        f.write('git hash: {}\n'.format(git_hash()))
        f.write('git diff: {}\n'.format(git_diff()))
        f.write('\n')


def _git(cmd):
    src_path = Path(__file__).resolve().parent
    try:
        gitproc = Popen(cmd, stdout=PIPE, cwd=str(src_path))
        (stdout, _) = gitproc.communicate()
        return stdout.decode('utf-8', errors='replace').strip()
    except OSError as e:  # pragma: no cover
        return ' '.join(cmd) + ': ' + e.strerror


def git_hash():
    return _git(['git', 'rev-parse', 'HEAD'])


def git_diff():
    return _git(['git', 'diff', 'HEAD'])


def write_arguments(args, path, mode='a'):
    """Write the config repr into <path> (a yaml file path or a directory)."""
    path = Path(str(path)).expanduser()

    if path.suffix in ('.yaml', '.yml'):
        file = path
    else:
        name = Path(sys.argv[0]).stem + '.yaml'
        file = path / name

    makedirs(file.parent)

    with file.open(mode=mode) as f:
        f.write('{}\n'.format(str(args)))


def write_image(image, filename, prefix=None, mode='RGB'):
    if prefix is not None:
        filename = Path(prefix).joinpath(filename)
    filename = Path(str(filename)).expanduser()

    if isinstance(image, np.ndarray):
        image = array2pil(image, mode=mode)
    else:
        # normalize via numpy round-trip to avoid format oddities
        image = array2pil(pil2array(image))

    if image.save(str(filename)):
        raise IOError('while writing the file {}'.format(filename))


def read_image(file, prefix=None):
    file = Path(file)
    if prefix is not None:
        file = Path(prefix).joinpath(file)

    image = Image.open(file)
    if image is None:
        raise IOError('while reading the file {}'.format(file))

    return image


class ImageLoader:
    """Iterator over image files yielding numpy arrays (reference ioutils.py:137-185)."""

    def __init__(self, input, prefix=None, display=100, log=False):
        if not isinstance(input, (Path, list)):
            raise IOError("Input '{}' must be directory or list of files".format(input))

        if isinstance(input, list):
            self.files = input
        elif input.is_dir():
            prefix = input.expanduser()
            self.files = sorted(prefix.glob('*'))
        else:
            raise IOError("Directory '{}' does not exist".format(input))

        self.counter = 0
        self.start_time = time.time()
        self.display = display
        self.size = len(self.files)
        self.prefix = str(prefix) if prefix is not None else None
        self.log = log
        self.filename = None

    def __iter__(self):
        return self

    def __next__(self):
        if self.counter < self.size:
            image = read_image(self.files[self.counter], prefix=self.prefix)
            self.filename = getattr(image, 'filename', str(self.files[self.counter]))
            self.counter += 1
            return pil2array(image)
        raise StopIteration

    def reset(self):
        self.counter = 0
        return self


def pil2array(image, mode='RGB'):
    return np.array(image.convert(mode.upper()))


def array2pil(image, mode='RGB'):
    default_mode = 'RGB'
    index = [default_mode.index(sym) for sym in mode.upper()]
    return Image.fromarray(image[:, :, index], mode=default_mode)


def write_to_file(file, s, mode='w'):
    file = Path(str(file)).expanduser()
    file.parent.mkdir(parents=True, exist_ok=True)
    with file.open(mode=mode) as f:
        f.write(s)


def write_text_log(file, info):
    file = Path(str(file)).expanduser()
    file.parent.mkdir(parents=True, exist_ok=True)

    info_str = 64 * '-' + '\n' + str(info)
    if info_str[-1] != '\n':
        info_str += '\n'

    with file.open(mode='a') as f:
        f.write(info_str)


def glob_single_file(model_dir, pattern):
    files = list(Path(model_dir).glob(pattern))
    if len(files) != 1:
        raise ValueError(
            f'There should be exactly one file matching {pattern} in {model_dir}.')
    return files[0]
