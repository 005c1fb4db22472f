"""Pallas TPU kernel: fused batched Riccati backward sweep.

This is the hot kernel of the NMPC engine — the structured-KKT solve that
replaces IPOPT's MUMPS factorization (SURVEY.md §7.1 layer `qp`). The blocks
are tiny (nx = 3m <= 30), so per-scenario the sweep is latency-bound, not
FLOP-bound; the kernel therefore lays the *scenario batch* along the 128-wide
lane dimension and performs the small-matrix algebra as unrolled vector FMAs:
every (i, j) entry of every matrix product is one lane-vector op over 128
scenarios (SURVEY.md §7.3 hard part 4). One kernel instance sweeps all N
stages for its batch tile, keeping V_x / V_xx in VMEM scratch — the whole
backward pass is a single fused kernel instead of ~15 small XLA ops per
stage.

Sizing: the per-tile VMEM footprint is ~N * (2 n^2 + 2 n m + m^2) * 512 B
(the bench shape N = 10 uses ~10 MB). Long horizons are ADMITTED in
production via the structured sweep inside the megakernel
(ops/megasolve_pallas.py), whose gate (`mega_fits`) is calibrated against
measured compiler demand — e.g. five_robot runs at N = 70 and tb3_1 at
N = 200 on v5e (docs/PARITY.md). Stage-streaming DMA was never needed: the
fleet-throughput shapes (N <= 20) and the reference's longest horizons all
fit VMEM as-is.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _mm(X, Y):
    """Lane-major matmul: X [a, b, T] @ Y [b, c, T] -> [a, c, T], unrolled
    over the tiny contraction dim. (Slice + expand_dims, never `arr[:, k,
    None, :]` — mixing int and None indices lowers to an unsupported >2D
    gather in Mosaic.)"""
    b = X.shape[1]
    acc = jnp.expand_dims(X[:, 0], 1) * jnp.expand_dims(Y[0], 0)
    for k in range(1, b):
        acc = acc + jnp.expand_dims(X[:, k], 1) * jnp.expand_dims(Y[k], 0)
    return acc


def _mtm(X, Y):
    """X^T @ Y lane-major: X [b, a, T], Y [b, c, T] -> [a, c, T]."""
    b = X.shape[0]
    acc = jnp.expand_dims(X[0], 1) * jnp.expand_dims(Y[0], 0)
    for k in range(1, b):
        acc = acc + jnp.expand_dims(X[k], 1) * jnp.expand_dims(Y[k], 0)
    return acc


def _chol(Quu, reg):
    """Lane-wise Cholesky of [m, m, T] SPD blocks (+reg I).

    Column-blocked: each elimination step updates the whole remaining
    column as ONE [m, T] sublane-packed op (v -= col_k * col_k[i]) instead
    of the entry-wise [1, T] form, which left 7/8 of every vreg idle and
    made the factorization a large share of the backward sweep's fixed
    cost — the same sublane-packing fix the round-2 merit rewrite applied
    to the line search. Rows above the diagonal of a stored column are
    never read (step i only consumes rows >= i), so no masking is needed.
    Returns (L, invs): the list-of-lists of [1, T] entries plus the
    per-column diagonal reciprocals (consumed by `_chol_solve` so the
    substitutions multiply instead of re-dividing)."""
    m = Quu.shape[0]
    cols = []
    invs = []
    for i in range(m):
        v = Quu[:, i]                               # [m, T]
        for k in range(i):
            v = v - cols[k] * cols[k][i : i + 1]
        d = jnp.sqrt(v[i : i + 1] + reg)            # [1, T]
        inv = 1.0 / d
        invs.append(inv)
        # zero-size slices are invalid Mosaic vector types — build the
        # column from only the parts that exist at this i
        parts = []
        if i > 0:
            parts.append(jnp.zeros_like(v[:i]))
        parts.append(d)
        if i + 1 < m:
            parts.append(v[i + 1 :] * inv)
        cols.append(jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0])
    L = [[None] * m for _ in range(m)]
    for i in range(m):
        for j in range(i, m):
            L[j][i] = cols[i][j : j + 1]
    return L, invs


def _chol_solve(L_inv, RHS):
    """Solve (L L^T) X = RHS, RHS [m, r, T]; rows substituted unrolled.

    L_inv = (L, invs) from `_chol`. The diagonal divisions use the
    reciprocals already computed during factorization: a broadcast [r, T]
    divide is a multi-cycle VPU op, and the 2m of them per stage were a
    measurable slice of the solve phase's 38.9% kernel-time share
    (tools/exp_mega_phases.py ablation, post-blocked-expansions)."""
    L, invs = L_inv
    m = len(L)
    y = [None] * m
    for i in range(m):
        s = RHS[i]                       # [r, T]
        for k in range(i):
            s = s - L[i][k] * y[k]       # [1,T] * [r,T]
        y[i] = s * invs[i]
    x = [None] * m
    for i in reversed(range(m)):
        s = y[i]
        for k in range(i + 1, m):
            s = s - L[k][i] * x[k]
        x[i] = s * invs[i]
    return jnp.stack(x, axis=0)          # [m, r, T]


def _chol_rl(Quu, reg):
    """Right-looking Cholesky: rank-1 trailing-submatrix updates.

    NEGATIVE RESULT (round 4) — kept as the measured alternative, not used
    by the production kernels, same standing as `_chol_solve_inv` below.
    Hypothesis: the left-looking `_chol` pays ~m^2/2 serial [m, T] column
    FMAs, while this form pays m steps of ONE wide outer-product FMA on the
    shrinking trailing block plus the column-oriented substitutions of
    `_chol_solve_rl` — fewer, wider ops, shorter dependency chains.
    Measured in the PRODUCTION megakernel (v5e, six-robot N=10, B=32768,
    bench.py, with the round-4 matrix-form expansions in both arms):
    57,994 solves/s with _chol_rl/_chol_solve_rl vs 64,272 with the
    left-looking pair — a 10% END-TO-END regression. Same mechanism as the
    explicit-inverse negative (docs/ROOFLINE.md): Mosaic already hides the
    substitution latency behind the kernel's large live set, and the
    shrinking-block form's extra live intermediates (trailing S copies,
    the backward pass's growing Xstack) add register pressure that costs
    more than the chain shortening saves.

    The trailing block stays symmetric, so its first COLUMN is read as its
    first ROW (`S[0]`, a leading-dim index — no sublane gathers): this
    reads the upper triangle where `_chol` read the lower, a rounding-level
    (~1e-7) difference on the fp-asymmetric Quu.

    Returns (cols, invs): cols[i] = column i of L from the diagonal down
    as a [m-i, T] array (cols[i][0] is the diagonal), invs[i] = [1, T]
    diagonal reciprocal."""
    m = Quu.shape[0]
    S = Quu
    cols, invs = [], []
    for i in range(m):
        r0 = S[0]                                   # [m-i, T] row == col
        d2 = r0[0:1] + reg
        inv = 1.0 / jnp.sqrt(d2)
        col = r0 * inv                              # col[0] = d exactly
        cols.append(col)
        invs.append(inv)
        if i + 1 < m:
            sub = col[1:]                           # [m-i-1, T]
            S = S[1:, 1:] - jnp.expand_dims(sub, 1) * jnp.expand_dims(sub, 0)
    return cols, invs


def _chol_solve_rl(cols_invs, RHS):
    """Solve (L L^T) X = RHS with column-oriented substitutions (round 4).

    Companion to `_chol_rl`. Forward pass: right-looking — after computing
    y_i, the remaining rows are updated with ONE wide outer FMA
    ([m-i-1, r, T]) and the block shrinks; the inner-product form paid
    ~m^2/2 separate [r, T] FMAs. Backward pass: the needed L^T row is
    exactly cols[i][1:] (contiguous), contracted against the stack of
    already-computed x's in one wide multiply + leading-dim reduction."""
    cols, invs = cols_invs
    m = len(cols)
    Y = RHS                                         # [m-i, r, T] remaining
    ys = []
    for i in range(m):
        yi = Y[0] * invs[i]
        ys.append(yi)
        if i + 1 < m:
            sub = cols[i][1:]
            Y = Y[1:] - jnp.expand_dims(sub, 1) * jnp.expand_dims(yi, 0)
    xs = [None] * m
    Xstack = None
    for i in reversed(range(m)):
        s = ys[i]
        if Xstack is not None:
            prod = jnp.expand_dims(cols[i][1:], 1) * Xstack
            s = s - jnp.sum(prod, axis=0)
        xi = s * invs[i]
        xs[i] = xi
        Xstack = (jnp.expand_dims(xi, 0) if Xstack is None
                  else jnp.concatenate([jnp.expand_dims(xi, 0), Xstack],
                                       axis=0))
    return jnp.stack(xs, axis=0)                    # [m, r, T]


def _chol_solve_inv(L_inv, RHS):
    """Solve (L L^T) X = RHS via the explicit triangular inverse.

    NEGATIVE RESULT — kept as the measured alternative, not used by the
    production kernels. Hypothesis: `_chol_solve`'s substitutions are 2m
    serial [r, T] rows, so at m = 12 the phase should be bound by its
    dependency chain; building L^-1 (~m^3/6 extra narrow ops as m
    independent column chains) makes both triangular applications
    row-independent wide FMAs. In the simplified fixed-iteration ablation
    harness this measured 16% faster (tools/exp_mega_phases.py
    'inv_solve'), but in the REAL megakernel it is ~5% SLOWER end-to-end
    (60.0k vs 63.2k solves/s, identical convergence statistics) — the
    production kernel's done-gating and larger live set evidently let
    Mosaic hide the substitution latency already, while the inverse's
    ~78 extra live [1, T] values add register pressure. Lesson recorded
    in docs/ROOFLINE.md: ablation-harness wins must be confirmed in the
    production kernel before porting."""
    L, invs = L_inv
    m = len(L)
    Linv = [[None] * m for _ in range(m)]
    for j in range(m):
        Linv[j][j] = invs[j]
        for i in range(j + 1, m):
            acc = L[i][j] * Linv[j][j]
            for k in range(j + 1, i):
                acc = acc + L[i][k] * Linv[k][j]
            Linv[i][j] = -invs[i] * acc
    y = []
    for i in range(m):
        acc = Linv[i][0] * RHS[0]
        for k in range(1, i + 1):
            acc = acc + Linv[i][k] * RHS[k]
        y.append(acc)
    x = [None] * m
    for i in range(m):
        acc = Linv[i][i] * y[i]
        for k in range(i + 1, m):
            acc = acc + Linv[k][i] * y[k]
        x[i] = acc
    return jnp.stack(x, axis=0)          # [m, r, T]


def _make_kernel(N, n, m, reg):
    """Kernel for one stage *chunk*: consumes the incoming value function
    (Vx, Vxx, dV1) and emits the outgoing one, so long horizons are processed
    as a reverse sequence of chunked pallas_calls that each fit VMEM."""

    def kernel(A_ref, B_ref, lx_ref, lu_ref, lxx_ref, luu_ref, lux_ref,
               Vx_in, Vxx_in, dV1_in,
               kff_ref, Kfb_ref, Vx_out, Vxx_out, dV1_ref, Vx_s, Vxx_s):
        Vx_s[...] = Vx_in[0, 0]
        Vxx_s[...] = Vxx_in[0, 0]
        dV1_ref[...] = dV1_in[...]

        # fori_loop over stages (dynamic ref indexing) keeps the compiled
        # kernel size independent of the chunk length — the per-stage
        # small-matrix algebra is unrolled once, not N times
        def stage(t, _):
            kidx = N - 1 - t
            A = A_ref[0, kidx]      # [n, n, T]
            Bm = B_ref[0, kidx]     # [n, m, T]
            lx = lx_ref[0, kidx]    # [n, 1, T]
            lu = lu_ref[0, kidx]    # [m, 1, T]
            lxx = lxx_ref[0, kidx]
            luu = luu_ref[0, kidx]
            lux = lux_ref[0, kidx]
            Vx = Vx_s[...]
            Vxx = Vxx_s[...]

            VA = _mm(Vxx, A)
            Qx = lx + _mtm(A, Vx)
            Qu = lu + _mtm(Bm, Vx)
            Qxx = lxx + _mtm(A, VA)
            Qux = lux + _mtm(Bm, VA)
            Quu = luu + _mtm(Bm, _mm(Vxx, Bm))

            L = _chol(Quu, reg)
            sol = _chol_solve(L, jnp.concatenate([Qu, Qux], axis=1))
            kff = -sol[:, :1]       # [m, 1, T]
            Kfb = -sol[:, 1:]       # [m, n, T]

            kff_ref[0, kidx] = kff
            Kfb_ref[0, kidx] = Kfb
            dV1_ref[...] += jnp.sum(kff * Qu, axis=0)[None]

            # with Quu kff = -Qu: Vx' = Qx + Qux' kff, Vxx' = Qxx + Qux' Kfb.
            # Qux' Kfb = -Qux' Quu^-1 Qux is symmetric by construction
            # (Quu SPD): one product, no symmetrization pass needed.
            Vx_s[...] = Qx + _mtm(Qux, kff)
            Vxx_s[...] = Qxx + _mtm(Qux, Kfb)
            return 0

        jax.lax.fori_loop(0, N, stage, 0)
        Vx_out[0, 0] = Vx_s[...]
        Vxx_out[0, 0] = Vxx_s[...]

    return kernel


def _to_lane(x, tiles):
    """[Bt, N, *dims] -> [tiles, N, *dims, LANES]."""
    xt = jnp.moveaxis(x, 0, -1)                           # [N, *dims, Bt]
    xt = xt.reshape(*xt.shape[:-1], tiles, LANES)         # [N, *dims, tiles, L]
    return jnp.moveaxis(xt, -2, 0)


def _from_lane(x, Bt):
    """[tiles, N, *dims, LANES] -> [Bt, N, *dims]."""
    xt = jnp.moveaxis(x, 0, -2)                           # [N, *dims, tiles, L]
    xt = xt.reshape(*xt.shape[:-2], Bt)
    return jnp.moveaxis(xt, -1, 0)


def riccati_lanes(ins_full, N, n, m, reg=1e-6, interpret=None):
    """Lane-major fused Riccati sweep on pre-transposed inputs.

    ins_full = (A, B, lx, lu, lxx, luu, lux) each [tiles, N, ..., LANES]
    (lx/lu as [.., n, 1, L]/[.., m, 1, L]). Returns lane-major
    (kff [tiles,N,m,1,L], Kfb [tiles,N,m,n,L], dV1 [tiles,1,L])."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    tiles = ins_full[0].shape[0]
    dtype = ins_full[0].dtype

    # Chunk the horizon so each pallas_call's (double-buffered) VMEM working
    # set stays well under the 16 MB budget.
    stage_bytes = (2 * n * n + 2 * n * m + m * m + 2 * n + 3 * m) * LANES * 4
    chunk = max(1, min(N, (4 * 1024 * 1024) // stage_bytes))

    Vx_c = jnp.zeros((tiles, 1, n, 1, LANES), dtype)
    Vxx_c = jnp.zeros((tiles, 1, n, n, LANES), dtype)
    dV1_c = jnp.zeros((tiles, 1, LANES), dtype)
    kff_parts, Kfb_parts = [], []

    starts = list(range(0, N, chunk))
    for s in reversed(starts):
        e = min(s + chunk, N)
        nc = e - s
        ins = [x[:, s:e] for x in ins_full]

        def bspec(*dims):
            nd = len(dims)
            return pl.BlockSpec(
                (1, nc, *dims, LANES),
                lambda i, nd=nd: (i,) + (0,) * (nd + 2),
                memory_space=pltpu.VMEM,
            )

        def vspec(*dims):
            nd = len(dims)
            return pl.BlockSpec(
                (1, 1, *dims, LANES),
                lambda i, nd=nd: (i,) + (0,) * (nd + 2),
                memory_space=pltpu.VMEM,
            )

        dspec = pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

        kff_l, Kfb_l, Vx_c, Vxx_c, dV1_c = pl.pallas_call(
            _make_kernel(nc, n, m, reg),
            grid=(tiles,),
            in_specs=[
                bspec(n, n), bspec(n, m), bspec(n, 1), bspec(m, 1),
                bspec(n, n), bspec(m, m), bspec(m, n),
                vspec(n, 1), vspec(n, n), dspec,
            ],
            out_specs=(
                bspec(m, 1), bspec(m, n), vspec(n, 1), vspec(n, n), dspec,
            ),
            out_shape=(
                jax.ShapeDtypeStruct((tiles, nc, m, 1, LANES), dtype),
                jax.ShapeDtypeStruct((tiles, nc, m, n, LANES), dtype),
                jax.ShapeDtypeStruct((tiles, 1, n, 1, LANES), dtype),
                jax.ShapeDtypeStruct((tiles, 1, n, n, LANES), dtype),
                jax.ShapeDtypeStruct((tiles, 1, LANES), dtype),
            ),
            scratch_shapes=[
                pltpu.VMEM((n, 1, LANES), dtype),
                pltpu.VMEM((n, n, LANES), dtype),
            ],
            interpret=interpret,
        )(*ins, Vx_c, Vxx_c, dV1_c)
        kff_parts.append(kff_l)
        Kfb_parts.append(Kfb_l)

    kff_l = jnp.concatenate(kff_parts[::-1], axis=1)
    Kfb_l = jnp.concatenate(Kfb_parts[::-1], axis=1)
    return kff_l, Kfb_l, dV1_c


@functools.partial(jax.jit, static_argnames=("reg", "interpret"))
def riccati_fused(A, B, lx, lu, lxx, luu, lux, reg=1e-6, interpret=None):
    """Fused batched Riccati sweep (standard-layout wrapper of riccati_lanes).

    A [Bt,N,n,n], B [Bt,N,n,m], lx [Bt,N,n], lu [Bt,N,m], lxx [Bt,N,n,n],
    luu [Bt,N,m,m], lux [Bt,N,m,n]  ->  kff [Bt,N,m], Kfb [Bt,N,m,n],
    dV1 [Bt]. Bt must be a multiple of 128.
    """
    Bt, N, n, _ = A.shape
    m = B.shape[-1]
    assert Bt % LANES == 0, f"batch {Bt} must be a multiple of {LANES}"
    tiles = Bt // LANES
    ins_full = (
        _to_lane(A, tiles),
        _to_lane(B, tiles),
        _to_lane(lx[..., None, :].swapaxes(-1, -2), tiles),  # [Bt,N,n,1]
        _to_lane(lu[..., None, :].swapaxes(-1, -2), tiles),
        _to_lane(lxx, tiles),
        _to_lane(luu, tiles),
        _to_lane(lux, tiles),
    )
    kff_l, Kfb_l, dV1_c = riccati_lanes(ins_full, N, n, m, reg, interpret)
    kff = _from_lane(kff_l, Bt)[..., 0]
    Kfb = _from_lane(Kfb_l, Bt)
    dV1 = _from_lane(dV1_c[:, None], Bt)[:, 0, 0]
    return kff, Kfb, dV1
