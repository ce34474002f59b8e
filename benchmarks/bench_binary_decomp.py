"""Attribute the flagship full-step overhead (VERDICT r3 item 3).

Measures the d6b96 rk1 fast-scan step with pieces disabled:
  full        — stock scan step (CFL + advance + bookkeeping + info)
  fixed_dt    — no CFL reduce (cfg fixed_dt=1; reference comment says ~10%)
  no_book     — CFL + advance only (bookkeeping=False)
  advance     — bare advance kernel in a scan (no CFL, no bookkeeping)

Long marginal windows (5 vs 205 steps) to get under the tunnel noise.
Run detached: nohup python benchmarks/bench_binary_decomp.py > /tmp/bdecomp.log 2>&1 &
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run as `python benchmarks/x.py`)
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def marginal(f, n1, n2, reps=3):
    # scalar-sum fence (bench.py rationale: full-state tunnel readbacks
    # carry ~0.3 s of jitter that swamps ms-scale marginals)
    def g(n):
        return np.asarray(jnp.sum(jax.tree.leaves(f(n))[0]))

    g(n1)
    g(n2)

    def once(n):
        t0 = time.perf_counter()
        g(n)
        return time.perf_counter() - t0

    rates = []
    for _ in range(reps):
        t1 = min(once(n1) for _ in range(2))
        t2 = min(once(n2) for _ in range(2))
        rates.append((t2 - t1) / (n2 - n1))
    rates.sort()
    return rates[len(rates) // 2]


def main():
    from mara3_tpu.schemes import binary_step
    from mara3_tpu.subprograms import binary as B

    for label, over in (("full", {}), ("fixed_dt", {"fixed_dt": 1})):
        cfg = B.create_config_template().create().update(
            {"depth": 6, "block_size": 96, "rk_order": 1, **over})
        sd = B.create_solver_data(cfg)
        sol = B.create_solution(cfg, sd)
        s0 = binary_step.solution_to_arrays(
            sol, jnp.asarray(sd.initial_conserved).dtype)
        nz = (s0["conserved"].shape[0] * s0["conserved"].shape[2]
              * s0["conserved"].shape[3])
        scan_steps = binary_step.make_fast_scan(sd)

        def f(n):
            s, rows = scan_steps(s0, n)
            return s["conserved"]

        per = marginal(f, 5, 205)
        print(json.dumps({"case": label, "ms_per_step": per * 1e3,
                          "zps": nz / per}), flush=True)

    # no bookkeeping (CFL + advance), and bare advance
    cfg = B.create_config_template().create().update(
        {"depth": 6, "block_size": 96, "rk_order": 1})
    sd = B.create_solver_data(cfg)
    sol = B.create_solution(cfg, sd)
    s0 = binary_step.solution_to_arrays(
        sol, jnp.asarray(sd.initial_conserved).dtype)
    nz = (s0["conserved"].shape[0] * s0["conserved"].shape[2]
          * s0["conserved"].shape[3])

    step_nb = binary_step.make_fast_step(sd, bookkeeping=False, retry=False)

    @partial(jax.jit, static_argnames=("n",))
    def scan_nb(s, n: int):
        def body(s, _):
            s1, _ = step_nb.traced(s)
            return s1, None
        s2, _ = jax.lax.scan(body, s, length=n)
        return s2

    per = marginal(lambda n: scan_nb(s0, n)["conserved"], 5, 205)
    print(json.dumps({"case": "no_book", "ms_per_step": per * 1e3,
                      "zps": nz / per}), flush=True)

    # bare advance: fixed dt, fixed bodies
    from mara3_tpu.models import two_body
    bodies = jnp.asarray(B._bodies_array(two_body.compute_two_body_state(
        sol.orbital_elements, 0.0)))
    adv = sd.advance.traced_soa
    dt = jnp.asarray(sd.recommended_time_step, s0["conserved"].dtype)
    th = jnp.asarray(sd.plm_theta, s0["conserved"].dtype)

    @partial(jax.jit, static_argnames=("n",))
    def scan_adv(uT, n: int):
        def body(u, _):
            u1, t, inv = adv(u, bodies, dt, th)
            return u1, None
        u2, _ = jax.lax.scan(body, uT, length=n)
        return u2

    per = marginal(lambda n: scan_adv(s0["conserved"], n), 5, 205)
    print(json.dumps({"case": "advance", "ms_per_step": per * 1e3,
                      "zps": nz / per}), flush=True)

    # multi-step kernel at two launch chunks (K complete steps/launch;
    # kernels/binary_multi.py) — the r4 full-step vehicle
    for k in (8, 16):
        # any failure (Mosaic lowering, VMEM budget at compile time) must
        # not kill the remaining cases — bdecomp2 lost multi_k16 to the
        # k=8 OOM this way
        try:
            scan_multi = binary_step.make_multi_scan(sd, k_chunk=k)

            def fm(n, _scan=scan_multi):
                s, rows = _scan(s0, n)
                return s["conserved"]

            per = marginal(fm, k, k * 13)
        except Exception as e:
            print(json.dumps({"case": f"multi_k{k}",
                              "error": repr(e)[:300]}), flush=True)
            continue
        print(json.dumps({"case": f"multi_k{k}", "ms_per_step": per * 1e3,
                          "zps": nz / per,
                          "path": f"pallas:binary_multi(k={k})"}),
              flush=True)


if __name__ == "__main__":
    main()
