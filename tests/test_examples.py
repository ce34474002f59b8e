"""The examples/ scripts run and validate themselves.

The reference ships examples/advect_{1,2}d.cpp as empty stubs; ours are
filled in (plus the rank-3 octree demo riding mesh/tree_nd.py) and each
returns a scalar error its docstring defines. These tests pin them green
so the demo surface can't rot.
"""

import pathlib
import sys


EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


def _load(name):
    import importlib.util
    spec = importlib.util.spec_from_file_location(name, EXAMPLES / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_advect_1d_small():
    err = _load("advect_1d").main(n=100, tfinal=0.5)
    assert err < 0.15          # first-order upwind on a square wave


def test_advect_2d_small():
    err = _load("advect_2d").main(n=64, tfinal=0.25)
    assert err < 0.05          # peak lands on the exact translate


def test_advect_3d_octree_matches_global_grid():
    # 8 blocks of 12^3; the octree guard plumbing must reproduce the
    # single global periodic grid at round-off, and conserve mass
    err = _load("advect_3d").main(depth=1, bs=12, tfinal=0.2)
    assert err < 1e-10


def test_tutorial_5_runs():
    # tut5 asserts its own claims (round-trip exactness, extrinsic
    # totals, zero mass drift); run it in-process like the examples
    import subprocess
    out = subprocess.run(
        [sys.executable, str(EXAMPLES.parent / "tutorial" / "tut5.py")],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "tut5 OK" in out.stdout
