"""Compiled-on-TPU validation + timing of the whole-CR Pallas kernel
(solver/pallas_cr.py) against the XLA lane-minor engine (solver/lanes.py).

tests/test_pallas.py proves bit-level agreement in interpret mode on CPU;
this script is the real-hardware leg: compile both engines on the TPU at the
headline-bench chain shape (N=100 trapeze double-integrator -> P=128 padded,
bs=5, wb=5, B=512 lanes in f32, the mixed-precision solve path), check
agreement, and time them. If the Pallas kernel wins, flip the
CTDIRECT_TPU_PALLAS default to "auto" (solver/lanes.py:_use_pallas).

Usage: python benchmarks/pallas_tpu_check.py [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _random_chain(P, bs, wb, B, seed=0):
    """Same construction as tests/test_pallas.py: symmetric diagonally-dominant
    A/F (the CR recurrences exploit KKT symmetry), general couplings."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)

    def rnd(*s):
        return rng.standard_normal(s).astype(np.float32)

    A = rnd(P, bs, bs, B) * 0.3
    A = A + np.swapaxes(A, 1, 2) + np.eye(bs, dtype=np.float32)[None, :, :, None] * 4.0
    Bp = rnd(P, bs, bs, B) * 0.3
    Bp[-1] = 0.0
    E = rnd(P, bs, wb, B) * 0.2
    F = rnd(wb, wb, B) * 0.2
    F = F + np.swapaxes(F, 0, 1) + np.eye(wb, dtype=np.float32)[:, :, None] * (4.0 + P)
    r = rnd(P, bs, B)
    rb = rnd(wb, B)
    return tuple(jnp.asarray(x) for x in (A, Bp, E, F, r, rb))


def time_fn(fn, chain, reps=50):
    import jax

    f = jax.jit(fn)
    t0 = time.time()
    out = f(*chain)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = f(*chain)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps, compile_s, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    import jax

    from ctdirect_tpu.solver import lanes
    from ctdirect_tpu.solver.pallas_cr import cr_solve_lanes_pallas, fits_vmem

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}", flush=True)

    rows = []
    # (P, bs, wb, B): headline MPC shape, a GL2-sized block, and a long chain
    for P, bs, wb, B in [(128, 5, 5, 512), (128, 8, 8, 512), (512, 5, 5, 512)]:
        if not fits_vmem(P, bs, wb):
            print(f"P={P} bs={bs} wb={wb}: outside VMEM envelope, skipped", flush=True)
            rows.append(dict(P=P, bs=bs, wb=wb, B=B, skipped="vmem"))
            continue
        chain = _random_chain(P, bs, wb, B)
        xla_s, xla_c, (Xr, xbr) = time_fn(lanes.cr_solve_lanes, chain, args.reps)
        pal_s, pal_c, (Xp, xbp) = time_fn(
            lambda *c: cr_solve_lanes_pallas(*c, interpret=False), chain, args.reps
        )
        dx = float(np.max(np.abs(np.asarray(Xp) - np.asarray(Xr))))
        db = float(np.max(np.abs(np.asarray(xbp) - np.asarray(xbr))))
        row = dict(
            P=P, bs=bs, wb=wb, B=B,
            xla_us=round(xla_s * 1e6, 1), pallas_us=round(pal_s * 1e6, 1),
            speedup=round(xla_s / pal_s, 2),
            xla_compile_s=round(xla_c, 1), pallas_compile_s=round(pal_c, 1),
            max_abs_diff_X=dx, max_abs_diff_xb=db,
            agree=bool(dx < 2e-4 and db < 2e-4),
        )
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(rows, fh, indent=1)
        print(f"wrote {args.json}")
    # nonzero exit on any real-hardware Pallas/XLA disagreement so automation
    # wrapping this check cannot report success on a numerical mismatch
    bad = [r for r in rows if not r.get("skipped") and not r.get("agree")]
    if bad:
        print(f"FAIL: {len(bad)} row(s) disagree", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
