"""Tests for the batch tools (reference tools/run_suite.py semantics)."""

import os
import subprocess
import sys

import h5py
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_run_suite_generates_submit_scripts(tmp_path):
    suite_file = tmp_path / "mysuite.py"
    suite_file.write_text(
        "suite = {\n"
        "  'name': 'demo',\n"
        f"  'root_dir': '{tmp_path}',\n"
        "  'subprog': 'sedov',\n"
        "  'comment': 'test suite',\n"
        "  'job_params': {'nodes': 1, 'hours': 2},\n"
        "  'mara_opts': {'nr': 64},\n"
        "  'runs': {'a': {'tfinal': 1.0}, 'b': {'tfinal': 2.0}},\n"
        "}\n")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_suite.py"),
         str(suite_file)],
        capture_output=True, text=True, cwd=tmp_path)
    assert out.returncode == 0, out.stderr
    for runid, tf in (("a", "1.0"), ("b", "2.0")):
        run_dir = tmp_path / "demo" / runid
        submit = (run_dir / "submit.sh").read_text()
        assert "sedov" in submit
        assert "nr=64" in submit
        assert f"tfinal={tf}" in submit
        assert f"outdir={run_dir}" in submit
        assert "test suite" in (run_dir / "README").read_text()


def test_run_suite_restart_resumes_latest(tmp_path):
    run_dir = tmp_path / "demo" / "a"
    os.makedirs(run_dir)
    for n in (0, 1, 2):
        (run_dir / f"chkpt.000{n}.h5").write_bytes(b"")
    suite_file = tmp_path / "mysuite.py"
    suite_file.write_text(
        "suite = {\n"
        "  'name': 'demo',\n"
        f"  'root_dir': '{tmp_path}',\n"
        "  'subprog': 'sedov',\n"
        "  'job_params': {'nodes': 1, 'hours': 2},\n"
        "  'runs': {'a': {}},\n"
        "}\n")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_suite.py"),
         str(suite_file), "--restart", "-q"],
        capture_output=True, text=True, cwd=tmp_path)
    assert out.returncode == 0, out.stderr
    submit = (run_dir / "submit.sh").read_text()
    assert "chkpt.0002.h5" in submit


def test_copy_latest(tmp_path):
    src_dir = tmp_path / "run1"
    os.makedirs(src_dir)
    for n in (0, 1):
        with h5py.File(src_dir / f"chkpt.000{n}.h5", "w") as f:
            f["x"] = np.float64(n)
    dest = tmp_path / "harvest"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "copy_latest.py"),
         str(src_dir), "-d", str(dest)],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    with h5py.File(dest / "run1.0001.h5") as f:
        assert float(f["x"][()]) == 1.0
