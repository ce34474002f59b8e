"""HDF5 checkpoint / diagnostics serialization (h5py backend).

Re-design of the reference's I/O stack (src/core_hdf5.hpp, src/app_serialize.hpp,
src/app_serialize_tree.hpp) producing *byte-layout-compatible* files so the
reference's plotting tools (tools/plot_*.py) work unmodified:

- numbered filenames ``chkpt.%04d.h5`` (app_serialize.hpp:183-188)
- ``run_config`` group: one typed scalar dataset per parameter
  (app_serialize.hpp:129-141)
- ``schedule`` group: per-task subgroup with name / num_times_performed /
  last_performed (app_serialize.hpp:69-94)
- trees stored flat with ``"level:ii-jj"`` keys, zero-padded to the level's
  digit count (app_serialize_tree.hpp:72-121)

h5py supplies the RAII/exception-safe object model the reference hand-built
over the HDF5 C API (core_hdf5.hpp:81-104); numpy arrays cross the host
boundary once per scheduled task, never inside the jit-compiled step.
"""

from __future__ import annotations

import math
import os
from typing import Dict, Tuple

import numpy as np

from mara3_tpu.app.config import Config
from mara3_tpu.app.schedule import Schedule, Task


def create_numbered_filename(prefix: str, count: int, extension: str = "h5",
                             directory: str = ".") -> str:
    """'chkpt', 4 -> 'chkpt.0004.h5' (reference app_serialize.hpp:183-188)."""
    name = f"{prefix}.{count:04d}.{extension}"
    return name if directory in (".", "") else os.path.join(directory, name)


# -----------------------------------------------------------------------------
# config round-trip
# -----------------------------------------------------------------------------

def write_config(group, config: Config):
    for key, value in config:
        if isinstance(value, str):
            group[key] = np.bytes_(value)
        elif isinstance(value, int):
            group[key] = np.int32(value)
        else:
            group[key] = np.float64(value)


def read_config(group) -> Dict[str, object]:
    """Read a run_config group back into a plain dict of python values."""
    out: Dict[str, object] = {}
    for key in group:
        v = group[key][()]
        if isinstance(v, bytes):
            out[key] = v.decode()
        elif np.issubdtype(np.asarray(v).dtype, np.integer):
            out[key] = int(v)
        elif np.issubdtype(np.asarray(v).dtype, np.floating):
            out[key] = float(v)
        else:
            out[key] = v
    return out


# -----------------------------------------------------------------------------
# schedule round-trip
# -----------------------------------------------------------------------------

def write_schedule(group, schedule: Schedule):
    for task in schedule:
        g = group.require_group(task.name)
        for k in ("name", "num_times_performed", "last_performed"):
            if k in g:
                del g[k]
        g["name"] = np.bytes_(task.name)
        g["num_times_performed"] = np.int32(task.num_times_performed)
        g["last_performed"] = np.float64(task.last_performed)


def read_schedule(group) -> Schedule:
    tasks = {}
    for name in group:
        g = group[name]
        tasks[name] = Task(
            name=name,
            num_times_performed=int(g["num_times_performed"][()]),
            last_performed=float(g["last_performed"][()]),
            is_due=False)
    return Schedule(tasks)


# -----------------------------------------------------------------------------
# tree (flat "level:ii-jj" keys) round-trip
# -----------------------------------------------------------------------------

def format_tree_index(level: int, coordinates) -> str:
    """'level:ii-jj' with zero padding to the digit count of 2^level
    (reference format_tree_index, app_serialize_tree.hpp:72-87)."""
    width = 1 + int(math.log10(1 << level)) if level > 0 else 1
    coords = "-".join(f"{c:0{width}d}" for c in coordinates)
    return f"{level}:{coords}"


def read_tree_index(key: str) -> Tuple[int, Tuple[int, ...]]:
    """Inverse of format_tree_index (reference app_serialize_tree.hpp:95-121)."""
    level_str, coords_str = key.split(":", 1)
    return int(level_str), tuple(int(c) for c in coords_str.split("-"))


def write_tree(group, indexes, blocks):
    """Write per-block arrays under flat tree-index keys.

    `indexes` is a sequence of (level, (i, j, ...)) and `blocks` the matching
    sequence of numpy-convertible arrays (reference write_tree,
    app_serialize_tree.hpp:166-180).
    """
    for (level, coords), block in zip(indexes, blocks):
        group[format_tree_index(level, coords)] = np.asarray(block)


def read_tree(group):
    """Read a flat tree group -> (indexes, blocks) sorted by key order."""
    indexes, blocks = [], []
    for key in group:
        indexes.append(read_tree_index(key))
        blocks.append(np.asarray(group[key][()]))
    return indexes, blocks


# -----------------------------------------------------------------------------
# extendable time-series tables (reference subprog_sedov.cpp:518-530, 600-614)
# -----------------------------------------------------------------------------

def require_time_series(h5file, name: str, dtype):
    """Create (if absent) an unlimited-length 1d compound dataset, chunked —
    the reference's extendable time_series.h5 layout."""
    if name in h5file:
        return h5file[name]
    return h5file.create_dataset(name, shape=(0,), maxshape=(None,),
                                 chunks=(256,), dtype=dtype)


def append_time_series(dataset, row):
    """Append one compound row via set_extent + hyperslab write (reference
    subprog_sedov.cpp:518-530)."""
    n = dataset.shape[0]
    dataset.resize((n + 1,))
    dataset[n] = row
