"""Config/schedule/performance/serialize tests (model: reference app_test.cpp,
tutorial/tut1.cpp)."""

import os

import h5py
import numpy as np
import pytest

from mara3_tpu.app import serialize
from mara3_tpu.app.config import Config, ConfigTemplate, argv_to_string_map
from mara3_tpu.app.performance import compose, kzps, time_execution
from mara3_tpu.app.schedule import Schedule, mark_tasks


def make_template():
    return (ConfigTemplate()
            .item("num_cells", 100)
            .item("tfinal", 1.0)
            .item("outdir", "data"))


def test_config_defaults_and_types():
    cfg = make_template().create()
    assert cfg.get_int("num_cells") == 100
    assert cfg.get_double("tfinal") == 1.0
    assert cfg.get_string("outdir") == "data"


def test_config_string_coercion():
    cfg = make_template().create().update(
        {"num_cells": "256", "tfinal": "2.5"})
    assert cfg.get_int("num_cells") == 256
    assert cfg.get_double("tfinal") == 2.5


def test_config_unknown_key_raises():
    cfg = make_template().create()
    with pytest.raises(KeyError):
        cfg.set("nope", 1)


def test_config_wrong_type_raises():
    cfg = make_template().create()
    with pytest.raises(TypeError):
        cfg.set("num_cells", "not_a_number")
    with pytest.raises(TypeError):
        cfg.get_int("tfinal")


def test_argv_to_string_map():
    m = argv_to_string_map(["binary", "restart=chkpt.0001.h5", "tfinal=2.0"])
    assert m == {"restart": "chkpt.0001.h5", "tfinal": "2.0"}


def test_schedule_mark_and_complete_no_drift():
    s = Schedule.create("write_checkpoint")
    s = mark_tasks(s, 1.05, [("write_checkpoint", 0.5)])
    assert s.is_due("write_checkpoint")
    # last_performed advanced by exactly the interval (no drift)
    assert s.last_performed("write_checkpoint") == 0.5
    s = s.mark_as_completed("write_checkpoint")
    assert s.num_times_performed("write_checkpoint") == 1
    assert not s.is_due("write_checkpoint")


def test_time_execution_and_compose():
    out, perf = time_execution(lambda x: x + 1, 1)
    assert out == 2
    assert perf.execution_time_ms >= 0.0
    assert compose(lambda x: x * 2, lambda x: x + 1)(3) == 8
    assert kzps(1000, 1.0) == 1000.0


def test_numbered_filename():
    assert serialize.create_numbered_filename("chkpt", 4) == "chkpt.0004.h5"


def test_config_hdf5_round_trip(tmp_path):
    cfg = make_template().create().update({"num_cells": 64})
    path = os.path.join(tmp_path, "t.h5")
    with h5py.File(path, "w") as f:
        serialize.write_config(f.require_group("run_config"), cfg)
    with h5py.File(path, "r") as f:
        back = serialize.read_config(f["run_config"])
    assert back["num_cells"] == 64
    assert back["tfinal"] == 1.0
    assert back["outdir"] == "data"


def test_schedule_hdf5_round_trip(tmp_path):
    s = Schedule.create("chk", "diag")
    s = mark_tasks(s, 3.0, [("chk", 1.0)]).mark_as_completed("chk")
    path = os.path.join(tmp_path, "t.h5")
    with h5py.File(path, "w") as f:
        serialize.write_schedule(f.require_group("schedule"), s)
    with h5py.File(path, "r") as f:
        back = serialize.read_schedule(f["schedule"])
    assert back.num_times_performed("chk") == 1
    assert back.last_performed("chk") == 1.0
    assert back.num_times_performed("diag") == 0


def test_tree_index_format_round_trip():
    # zero padding follows digit count of 2^level
    # (reference app_serialize_tree.hpp:72-87)
    assert serialize.format_tree_index(0, (0, 0)) == "0:0-0"
    assert serialize.format_tree_index(4, (3, 12)) == "4:03-12"
    assert serialize.read_tree_index("4:03-12") == (4, (3, 12))


def test_tree_hdf5_round_trip(tmp_path):
    idxs = [(1, (0, 1)), (2, (3, 2))]
    blocks = [np.ones((4, 4)), np.zeros((4, 4)) + 2.0]
    path = os.path.join(tmp_path, "t.h5")
    with h5py.File(path, "w") as f:
        serialize.write_tree(f.require_group("solution"), idxs, blocks)
    with h5py.File(path, "r") as f:
        back_idx, back_blocks = serialize.read_tree(f["solution"])
    assert set(back_idx) == set(idxs)
    total = sum(b.sum() for b in back_blocks)
    assert total == 16.0 + 32.0


def test_time_series_append(tmp_path):
    path = os.path.join(tmp_path, "ts.h5")
    dtype = np.dtype([("time", "f8"), ("shock_radius", "f8")])
    with h5py.File(path, "w") as f:
        ds = serialize.require_time_series(f, "time_series", dtype)
        serialize.append_time_series(ds, (0.0, 1.0))
        serialize.append_time_series(ds, (0.1, 1.5))
    with h5py.File(path, "r") as f:
        data = f["time_series"][()]
    assert len(data) == 2
    assert data["shock_radius"][1] == 1.5
