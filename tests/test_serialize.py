"""Serialization-layer tests (app/serialize.py).

The checkpoint round-trip and layout tests live with each subprogram;
this file covers the generic typed-dispatch registry (the reference's
hdf5_type_info<T> extension point, core_hdf5.hpp:62-68).
"""

def test_type_registry_round_trips(tmp_path):
    """The hdf5_type_info-style extension point (core_hdf5.hpp:62-68):
    built-in types round-trip through the generic write/read dispatch, and
    a user type plugs in with one register_type call."""
    from dataclasses import dataclass
    from fractions import Fraction

    import h5py
    import numpy as np

    from mara3_tpu.app import serialize as S
    from mara3_tpu.app.config import ConfigTemplate

    with h5py.File(tmp_path / "t.h5", "w") as f:
        S.write(f, "s", "hello")
        S.write(f, "i", 42)
        S.write(f, "x", 2.5)
        S.write(f, "b", True)
        S.write(f, "arr", np.arange(6.0).reshape(2, 3))
        S.write(f, "q", Fraction(22, 8))   # auto-reduces like the reference
        cfg = ConfigTemplate().item("a", 1).item("b", 0.5).create()
        S.write(f, "cfg", cfg)

        assert S.read(f, "s", str) == "hello"
        assert S.read(f, "i", int) == 42
        assert S.read(f, "x", float) == 2.5
        assert S.read(f, "b", bool) is True
        np.testing.assert_array_equal(S.read(f, "arr", np.ndarray),
                                      np.arange(6.0).reshape(2, 3))
        assert S.read(f, "q", Fraction) == Fraction(11, 4)
        assert S.read(f, "cfg", type(cfg)) == {"a": 1, "b": 0.5}

        # user extension point: a custom struct type
        @dataclass
        class Sample:
            t: float
            n: int

        S.register_type(
            Sample,
            lambda g, n, v: g.__setitem__(
                n, np.array([(v.t, v.n)],
                            dtype=[("t", "f8"), ("n", "i8")])),
            lambda g, n: Sample(t=float(g[n][0]["t"]),
                                n=int(g[n][0]["n"])))
        S.write(f, "sample", Sample(1.5, 7))
        got = S.read(f, "sample", Sample)
        assert got == Sample(1.5, 7)


def test_tree_index_format_matches_reference_exactly():
    """The exact strings the reference's Catch2 case asserts
    (app_test.cpp:375 'trees can be written to HDF5'): zero padding to
    the digit count of 2^level."""
    from mara3_tpu.app.serialize import format_tree_index, read_tree_index
    assert format_tree_index(0, (0, 0, 0)) == "0:0-0-0"
    assert format_tree_index(3, (5, 6, 7)) == "3:5-6-7"
    assert format_tree_index(5, (1, 16, 17)) == "5:01-16-17"
    assert format_tree_index(8, (1, 2)) == "8:001-002"
    assert read_tree_index("8:000-000-000") == (8, (0, 0, 0))
    assert read_tree_index("8:001-002-255") == (8, (1, 2, 255))
