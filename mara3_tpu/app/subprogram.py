"""Subprogram registry and CLI dispatch.

Re-design of the reference's app shell (src/app_subprogram.hpp:40-46,
src/app_main.cpp:53-95): each workload registers a named subprogram; the CLI
dispatches on argv[1], times the whole run, and prints the total execution
time. Usage: ``python -m mara3_tpu <subprogram> [key=val ...]``.
"""

from __future__ import annotations

import sys
from typing import Callable, Dict

_REGISTRY: Dict[str, Callable] = {}


def register(name: str):
    """Decorator registering fn(argv) -> int as a subprogram."""
    def wrap(fn):
        _REGISTRY[name] = fn
        return fn
    return wrap


def registered() -> Dict[str, Callable]:
    _load_all()
    return dict(_REGISTRY)


def _load_all():
    # import for registration side effects (reference app_main.cpp:41-47
    # collects make_subprog_* constructors, each gated by a
    # MARA_COMPILE_SUBPROGRAM_* flag; here the gate is module existence)
    import importlib
    import importlib.util
    for name in ("boilerplate", "partdom", "sedov", "cloud", "binary",
                 "amrsand", "sand3d", "blast3d", "kh", "test"):
        mod = f"mara3_tpu.subprograms.{name}"
        if importlib.util.find_spec(mod) is not None:
            importlib.import_module(mod)


def main(argv=None) -> int:
    argv = list(sys.argv if argv is None else argv)
    _load_all()

    if len(argv) < 2 or argv[1] not in _REGISTRY:
        print("subprograms are:")
        for name in sorted(_REGISTRY):
            print(f"    {name}")
        return 0

    from mara3_tpu.app.performance import time_execution
    result, perf = time_execution(_REGISTRY[argv[1]], argv[1:])
    print(f"total execution time: {perf.execution_time_ms / 1e3:.8f}s")
    return int(result or 0)
