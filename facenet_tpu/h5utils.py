"""HDF5 helpers.

Same capability surface as the reference h5utils
(/root/reference/facenet/h5utils.py): gzip'd datasets, an append-resizable
dict writer used for per-epoch metric history, `filename2key` mapping an image
path to an h5 key, and introspection helpers.
"""

from __future__ import annotations

from pathlib import Path

import h5py
import numpy as np


def write_dict(file, dct, group=None):
    """Append a (nested) dict of scalars/arrays into resizable gzip datasets."""
    file = Path(str(file)).expanduser()
    file.parent.mkdir(parents=True, exist_ok=True)

    with h5py.File(str(file), mode='a') as hf:
        def _write(dct, group=None):
            prefix = group + '/' if group else ''

            for key, item in dct.items():
                name = prefix + str(key)
                if isinstance(item, dict):
                    _write(item, name)
                else:
                    data = np.atleast_1d(item)
                    if name in hf:
                        hf[name].resize(hf[name].shape[0] + data.shape[0], axis=0)
                        hf[name][-data.shape[0]:] = data
                    else:
                        hf.create_dataset(name, data=data, maxshape=(None,),
                                          compression='gzip', dtype=data.dtype)

        _write(dct, group=group)


def filename2key(filename, key):
    """Map <...>/<class>/<image>.<ext> to '<class>/<image>/<key>'."""
    file = Path(filename)
    return str(Path(file.parent.stem).joinpath(file.stem, key))


def write_image(hf, name, image, mode='a', check_name=True):
    with h5py.File(str(hf), mode) as f:
        if name in f and check_name:
            raise IOError('data set {} has already existed'.format(name))

        if name in f:
            f[name][...] = image
        else:
            f.create_dataset(name=name, data=image, dtype='uint8',
                             compression='gzip', compression_opts=9)


def write(file, name, data, mode='a'):
    file = Path(str(file)).expanduser()
    file.parent.mkdir(parents=True, exist_ok=True)
    name = str(name)
    data = np.atleast_1d(data)

    with h5py.File(file, mode=mode) as hf:
        if name in hf:
            del hf[name]
        hf.create_dataset(name, data=data, compression='gzip', dtype=data.dtype)


def read(file, name, default=None):
    with h5py.File(str(Path(str(file)).expanduser()), mode='r') as hf:
        if name in hf:
            return hf[name][...]
        if default is not None:
            return default
        raise KeyError(f'Invalid key {name} in H5 file {file}')


def keys(file):
    with h5py.File(str(file), mode='r') as f:
        return list(f.keys())


def visit(file, func=print):
    with h5py.File(str(file), mode='r') as f:
        f.visit(func)


def visititems(file, func=None):
    items = []
    if func is None:
        def func(name, obj):
            if isinstance(obj, h5py.Dataset):
                items.append({'name': name, 'shape': obj.shape, 'type': obj.dtype})

    with h5py.File(str(file), mode='r') as f:
        f.visititems(func)

    return items
