"""Pallas TPU kernel: whole-solve block cyclic reduction in VMEM.

The XLA lane-minor CR engine (solver/lanes.py) is bandwidth-bound: every one
of the log2(P) reduction levels materializes its level arrays (A', B', E', r')
to HBM and reads them back, so the solve streams ~2x the block data per level
even though the arithmetic per level is tiny. This kernel runs the ENTIRE
cyclic reduction — all levels, the border Schur root solve, and the
back-substitution — inside one `pallas_call`, holding every level's data in
VMEM: HBM traffic collapses to one read of the block data and one write of the
solution.

Feasibility envelope (why this fits): for the production MPC shapes (N <= 256
steps, super-block bs <= 8, border wb <= 8) the padded chain plus all
back-substitution residuals occupy
    ~ 2 * P * (3*bs^2 + bs*wb + bs) * C * 4 bytes
which for P=128, bs=5, wb=5, C=128 lanes is ~5 MB — comfortably inside the
~16 MB/core VMEM budget. The kernel grids over lane chunks of C=128 (one VPU
lane tile); each program is independent, so the grid also pipelines HBM loads
against compute. `fits_vmem()` guards the envelope; callers fall back to the
XLA path outside it.

The kernel is f32-only by design: it serves the mixed-precision solve path
(StructuredKKT.solve_dtype == float32 — the headline-bench default), where the
f64 Newton loop already treats the block solve as an inexact direction. TPU
has no native f64 and Mosaic does not emulate it.

Verification: tests/test_pallas.py checks bit-level agreement with the XLA
lane-minor engine (same arithmetic, same order) in interpret mode on CPU and
compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic requires the last two block dims be divisible by (8, 128) or equal to
# the array dims — the lane-chunk axis is last, so it must be a multiple of
# 128 (a 64-lane chunk fails to lower on real TPU; caught r4)
LANE_CHUNK = 128
_VMEM_BUDGET = int(
    __import__("os").environ.get("CTDIRECT_TPU_PALLAS_VMEM", 12 * 1024 * 1024)
)


def _vmem_bytes(P, bs, wb, C):
    """Rough VMEM footprint of one grid program: pipelined inputs (2x for the
    prefetch double-buffer), the per-level back-substitution saves (sum of the
    halving level sizes ~= P blocks of Ainv_o/Bl/Br/Eo/ro), and one level of
    working temporaries."""
    inputs = P * (2 * bs * bs + bs * wb + bs) * C * 4 + (wb * wb + wb) * C * 4
    saves = P * (3 * bs * bs + bs * wb + bs) * C * 4
    temps = (P // 2) * (3 * bs * bs + bs * wb + bs) * C * 4
    return 2 * inputs + saves + temps


def fits_vmem(P, bs, wb, C=LANE_CHUNK):
    return _vmem_bytes(P, bs, wb, C) <= _VMEM_BUDGET


def _take(X, idx, axis):
    """X[..., idx, ...] on a STATIC index via slice + squeeze — Mosaic lowers
    pure slices/reshapes, while jnp integer indexing mixed with `...`/newaxis
    can fall into the (unsupported >2-D) gather path."""
    s = jax.lax.slice_in_dim(X, idx, idx + 1, axis=axis)
    return jnp.squeeze(s, axis=axis)


def _bmm(X, Y):
    """(P, i, j, C) @ (P, j, k, C) -> (P, i, k, C), unrolled over j."""
    j = X.shape[-2]
    # X[..., :, t:t+1, :] (P,i,1,C) * Y[..., t:t+1, :, :] (P,1,k,C)
    return sum(
        jax.lax.slice_in_dim(X, t, t + 1, axis=X.ndim - 2)
        * jax.lax.slice_in_dim(Y, t, t + 1, axis=Y.ndim - 3)
        for t in range(j)
    )


def _bmm_tn(X, Y):
    """X^T @ Y: (P, j, i, C), (P, j, k, C) -> (P, i, k, C)."""
    j = X.shape[-3]
    return sum(
        jnp.expand_dims(_take(X, t, X.ndim - 3), -2)  # (P, i, 1, C)
        * jax.lax.slice_in_dim(Y, t, t + 1, axis=Y.ndim - 3)  # (P, 1, k, C)
        for t in range(j)
    )


def _bmv(X, y):
    """(P, i, j, C) @ (P, j, C) -> (P, i, C)."""
    j = X.shape[-2]
    return sum(
        _take(X, t, X.ndim - 2) * jnp.expand_dims(_take(y, t, y.ndim - 2), -2)
        for t in range(j)
    )


def _bmv_tn(X, y):
    """X^T @ y: (P, j, i, C), (P, j, C) -> (P, i, C)."""
    j = X.shape[-3]
    return sum(
        _take(X, t, X.ndim - 3) * jnp.expand_dims(_take(y, t, y.ndim - 2), -2)
        for t in range(j)
    )


def _gj_inverse(A):
    """Per-lane pivoted Gauss-Jordan inverse, (P, n, n, C) -> (P, n, n, C).
    Same elimination order as lanes._gj_eliminate_lanes so results match the
    XLA engine bit-for-bit; pivot row chosen independently per lane."""
    P, n, _, C = A.shape
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype)[None, :, :, None], A.shape)
    M = jnp.concatenate([A, eye], axis=-2)  # (P, n, 2n, C)
    rsel = jax.lax.broadcasted_iota(jnp.int32, (P, n, 1), 1)
    for j in range(n):
        colj = jnp.abs(_take(M, j, 2))  # (P, n, C)
        colj = jnp.where(rsel >= j, colj, -jnp.inf)
        # pivot-row one-hot WITHOUT argmax or cumsum (neither lowers in
        # Mosaic: argmax indices are int64 under x64, cumsum is unimplemented):
        # max + first-occurrence via an unrolled exclusive prefix over the
        # tiny row dim (n <= ~13, static)
        mx = jnp.max(colj, axis=1, keepdims=True)  # (P, 1, C)
        hit = (colj == mx).astype(M.dtype)  # (P, n, C), >=1 rows set
        acc = jnp.zeros_like(hit[:, 0, :])
        prev_rows = []
        for rr in range(n):
            prev_rows.append(acc)
            acc = acc + hit[:, rr, :]
        prev = jnp.stack(prev_rows, axis=1)  # exclusive prefix count
        oh = hit * (prev < 0.5).astype(M.dtype)  # first max row only
        # pivot row (P, 2n, C): sum_r oh[r] * M[r, :]
        ohx = jnp.expand_dims(oh, 2)  # (P, n, 1, C)
        rowp = jnp.sum(ohx * M, axis=1)  # (P, 2n, C)
        rowj = _take(M, j, 1)  # (P, 2n, C)
        M = M + ohx * jnp.expand_dims(rowj - rowp, 1)
        M = _set_row(M, j, rowp)
        piv = _take(_take(M, j, 1), j, 1)  # (P, C)
        row = _take(M, j, 1) / jnp.expand_dims(piv, 1)  # (P, 2n, C)
        colv = _zero_row(_take(M, j, 2), j)  # (P, n, C)
        M = M - jnp.expand_dims(colv, 2) * jnp.expand_dims(row, 1)
        M = _set_row(M, j, row)
    return jax.lax.slice_in_dim(M, n, 2 * n, axis=2)


def _set_row(M, j, row):
    """M[:, j, :, :] = row without .at[] (static j): masked select."""
    n = M.shape[1]
    mask = (jax.lax.broadcasted_iota(jnp.int32, (1, n, 1, 1), 1) == j)
    return jnp.where(mask, row[:, None, :, :], M)


def _zero_row(V, j):
    """V[:, j, :] = 0 with static j on a (P, n, C) value."""
    n = V.shape[1]
    mask = (jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1) == j)
    return jnp.where(mask, jnp.zeros((), V.dtype), V)


def _halves(X):
    """Split the leading (even-length) block axis into evens/odds without
    strided slicing: (M, ...) -> (M//2, ...) x2 via reshape + static slice."""
    M = X.shape[0]
    Y = X.reshape((M // 2, 2) + X.shape[1:])
    return _take(Y, 0, 1), _take(Y, 1, 1)


def _interleave(E, O):
    """Inverse of _halves: (m, ...) x2 -> (2m, ...)."""
    m = E.shape[0]
    return jnp.stack([E, O], axis=1).reshape((2 * m,) + E.shape[1:])


def _shift_up(X):
    """X[1:] padded with zeros at the end (drop first block). Single-block
    inputs short-circuit to zeros: a 0-length slice is an invalid (zero-size)
    vector type in Mosaic."""
    if X.shape[0] == 1:
        return jnp.zeros_like(X)
    z = jnp.zeros((1,) + X.shape[1:], X.dtype)
    return jnp.concatenate([X[1:], z], axis=0)


def _shift_down(X):
    """zeros-prepended X[:-1] (drop last block)."""
    if X.shape[0] == 1:
        return jnp.zeros_like(X)
    z = jnp.zeros((1,) + X.shape[1:], X.dtype)
    return jnp.concatenate([z, X[:-1]], axis=0)


def _cr_kernel(P, bs, wb, A_ref, Bp_ref, E_ref, F_ref, r_ref, rb_ref, X_ref, xb_ref):
    """Whole cyclic reduction for one lane chunk. Shapes inside the kernel:
    A (P,bs,bs,C), Bp (P,bs,bs,C), E (P,bs,wb,C), F (wb,wb,C), r (P,bs,C),
    rb (wb,C); outputs X (P,bs,C), xb (wb,C)."""
    A = A_ref[:]
    Bp = Bp_ref[:]
    E = E_ref[:]
    F = F_ref[:]
    r = r_ref[:]
    rb = rb_ref[:]
    dtype = A.dtype
    C = A.shape[-1]

    levels = []
    M = P
    while M > 1:
        Ae, Ao = _halves(A)
        Bl, Br = _halves(Bp)  # Bl: even_j->odd_j; Br: odd_j->even_{j+1}
        Ee, Eo = _halves(E)
        re_, ro = _halves(r)
        Ainv_o = _gj_inverse(Ao)

        CL = _bmm(Bl, Ainv_o)
        CR = _bmm_tn(Br, Ainv_o)

        A_new = Ae - _bmm(CL, jnp.swapaxes(Bl, -3, -2))
        A_new = A_new - _shift_down(_bmm(CR, Br))
        E_new = Ee - _bmm(CL, Eo)
        E_new = E_new - _shift_down(_bmm(CR, Eo))
        r_new = re_ - _bmv(CL, ro)
        r_new = r_new - _shift_down(_bmv(CR, ro))
        B_new = -_bmm(CL, Br)
        # zero the last coupling slot (pairs with the chain end)
        m2 = M // 2
        lmask = jax.lax.broadcasted_iota(jnp.int32, (m2, 1, 1, 1), 0) == (m2 - 1)
        B_new = jnp.where(lmask, jnp.zeros((), dtype), B_new)

        # border Schur updates: F -= Eo^T Ainv_o Eo ; rb -= Eo^T Ainv_o ro
        AiE = _bmm(Ainv_o, Eo)  # (m2, bs, wb, C)
        Air = _bmv(Ainv_o, ro)  # (m2, bs, C)
        # contract over (m2, bs): loop bs (tiny), reduce m2 with jnp.sum
        for s_ in range(bs):
            Eo_s = _take(Eo, s_, 1)  # (m2, wb, C)
            AiE_s = _take(AiE, s_, 1)  # (m2, wb, C)
            F = F - jnp.sum(
                jnp.expand_dims(Eo_s, 2) * jnp.expand_dims(AiE_s, 1), axis=0
            )
            rb = rb - jnp.sum(Eo_s * jnp.expand_dims(_take(Air, s_, 1), 1), axis=0)

        levels.append((Ainv_o, Bl, Br, Eo, ro))
        A, Bp, E, r = A_new, B_new, E_new, r_new
        M = m2

    # root solve: [[A0, E0], [E0^T, F]] [x0; xb] = [r0; rb]
    A0, E0, r0 = _take(A, 0, 0), _take(E, 0, 0), _take(r, 0, 0)
    top = jnp.concatenate([A0, E0], axis=-2)  # (bs, bs+wb, C)
    bot = jnp.concatenate([jnp.swapaxes(E0, -3, -2), F], axis=-2)
    root = jnp.concatenate([top, bot], axis=-3)[None]  # (1, bs+wb, bs+wb, C)
    rootinv = _take(_gj_inverse(root), 0, 0)
    rhs = jnp.concatenate([r0, rb], axis=-2)  # (bs+wb, C)
    sol = sum(
        _take(rootinv, t, 1) * jnp.expand_dims(_take(rhs, t, 0), 0)
        for t in range(bs + wb)
    )
    X = jax.lax.slice_in_dim(sol, 0, bs, axis=0)[None]  # (1, bs, C)
    xb = jax.lax.slice_in_dim(sol, bs, bs + wb, axis=0)  # (wb, C)

    for Ainv_o, Bl, Br, Eo, ro in reversed(levels):
        m = Ainv_o.shape[0]
        x_e = X
        x_e_next = _shift_up(x_e)
        rhs = (
            ro
            - _bmv_tn(Bl, x_e)
            - _bmv(Br, x_e_next)
            - _bmv(Eo, jnp.broadcast_to(xb[None], (m, wb, C)))
        )
        x_o = _bmv(Ainv_o, rhs)
        X = _interleave(x_e, x_o)

    X_ref[:] = X
    xb_ref[:] = xb


@functools.partial(jax.jit, static_argnames=("interpret",))
def cr_solve_lanes_pallas(A, Bp, E, F, r, rb, *, interpret=False):
    """Drop-in for lanes.cr_solve_lanes (pre-padded power-of-two chain, lane-
    minor layout), f32 only. Grids over lane chunks of LANE_CHUNK; the caller
    is responsible for the fits_vmem() check."""
    P, bs, _, B = A.shape
    wb = E.shape[-2]
    if A.dtype != jnp.float32:
        raise TypeError("pallas CR kernel is f32-only (mixed-precision path)")
    C = min(LANE_CHUNK, B)
    if B % C:
        raise ValueError(f"batch {B} not divisible by lane chunk {C}")
    grid = (B // C,)

    def lane_spec(*shape):
        # block covers full block axes, one lane chunk; index map picks chunk
        # g. Zeros must be int32: under jax_enable_x64 Python-int zeros trace
        # as i64 index constants, which crash Mosaic's layout assignment
        # (bitwidth <= 32 check).
        ndim = len(shape)
        zero = np.int32(0)
        return pl.BlockSpec(
            shape + (C,),
            lambda g, _nd=ndim, _z=zero: (_z,) * _nd + (g,),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(_cr_kernel, P, bs, wb)
    X, xb = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            lane_spec(P, bs, bs),
            lane_spec(P, bs, bs),
            lane_spec(P, bs, wb),
            lane_spec(wb, wb),
            lane_spec(P, bs),
            lane_spec(wb),
        ],
        out_specs=[lane_spec(P, bs), lane_spec(wb)],
        out_shape=[
            jax.ShapeDtypeStruct((P, bs, B), A.dtype),
            jax.ShapeDtypeStruct((wb, B), A.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            # the whole-solve-in-VMEM design intentionally exceeds the 16 MB
            # default scoped limit at C=128 (17.05 MB at the headline shape);
            # v5e VMEM accommodates more
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        interpret=interpret,
    )(A, Bp, E, F, r, rb)
    return X, xb
