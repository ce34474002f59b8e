"""Run the test suite as a subprogram (reference subprog_test.cpp:41-59:
`mara test` runs the vendored Catch2 session; here it runs pytest over
tests/, passing through extra CLI args)."""

from __future__ import annotations

import os
import sys

from mara3_tpu.app.subprogram import register


@register("test")
def main(argv) -> int:
    import pytest
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    tests_dir = os.path.join(repo_root, "tests")
    extra = [a for a in argv[1:] if "=" not in a]
    return pytest.main([tests_dir, "-q", *extra])
