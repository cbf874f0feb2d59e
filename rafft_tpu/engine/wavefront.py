"""Anti-diagonal wavefront window-scan (Pallas TPU kernel).

A TPU-native replacement for the per-(lag, step) window slide of the
reference (/root/reference/rafft/rafft.py:36-83).  Key observation: the
cells a window slide ever visits are exactly the cells of the
region-local pair matrix (ip, jp), each belonging to the anti-diagonal
lag = ip + jp, and the reference recurrence depends only on the previous
cell of the SAME diagonal, (ip-1, jp+1).  Sweeping rows ip = 0..m-1 with
a state vector indexed by jp therefore advances EVERY lag's recurrence
simultaneously with one lane-shift per row:

    state_ip[jp] = f(state_{ip-1}[jp+1], cell(ip, jp))

This eliminates the [n_lags, n_steps] window materialisation entirely
(the dominant memory and time cost of the gather-based formulation) and
computes the raw correlation for free: cor[lag] is just the running sum
of pair weights along the same diagonal, so the FFT correlation
(utils.py:115-122 in the reference) collapses into the same sweep for
integral pair weights (the default 3/2/1), bit-identical to the
rounded-FFT values because both are exact small-integer sums.

Per-lag finals are collected without unaligned lane writes (Mosaic
requires lane-slice starts to be 128-multiples): lag L < m finishes at
row L, lane 0, so lane 0 is pushed into a shifting collector each row;
lags >= m-1 finish in the final row's state vector.  The two pieces are
stitched with dynamic rolls at the end.

Semantics are bit-identical to fold_jax._window_scan (same f32 ops in
the same order per lag); `tests/test_wavefront.py` asserts equality
against that reference implementation.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(mmax_ref, rcodes_ref, rpos_ref, mlen_ref, z1_ref, z2_ref,
            cor_ref, mnb_ref, mi_ref, mj_ref, msE_ref, hd1_ref, hd2_ref,
            # scratch
            tot_s, tmp_s, sE_s, cor_s, ms_s, nb_s, mi_s, mj_s, bsE_s,
            hd1_s, hd2_s, bh1_s, bh2_s,
            c_cor, c_nb, c_mi, c_mj, c_sE, c_h1, c_h2,
            *, R, N, min_hp, Wn, PTn, STn):
    """One (k) program: wavefront sweep over all R regions of beam row k.

    Wn/PTn/STn are host constants (pair weights, pair types, stack
    energies) baked into select chains.  z1/z2 are the per-position
    Zobrist-style hash coefficients Z[rpos] (int32 bit patterns of
    uint32): the sweep accumulates, per candidate run, the exact hash
    delta its stem would apply to the parent pair-table hash
    (fold_jax._hash), so combination hashes compose arithmetically and
    the engine never materialises combination pair tables.
    """
    mmax = mmax_ref[pl.program_id(0), 0]
    rcodes = rcodes_ref[0]                       # [R, N] i32
    rpos = rpos_ref[0]                           # [R, N] i32
    mlen = mlen_ref[0].astype(jnp.int32)         # [R, N] (broadcast copies)
    z1row = z1_ref[0]                            # [R, N] i32 = Z1[rpos]
    z2row = z2_ref[0]                            # [R, N] i32 = Z2[rpos]

    lane = jax.lax.broadcasted_iota(jnp.int32, (R, N), 1)
    # constants along the sweep
    c3 = rcodes
    p3 = rpos
    c3p = jnp.where(lane == N - 1, 0,
                    pltpu.roll(rcodes, N - 1, axis=1))   # rcodes[jp+1]
    p3p = jnp.where(lane == N - 1, -9,
                    pltpu.roll(rpos, N - 1, axis=1))     # rpos[jp+1]

    for ref in (tot_s, cor_s, ms_s):
        ref[...] = jnp.zeros((R, N), jnp.float32)
    for ref in (tmp_s, sE_s, nb_s, mi_s, mj_s, bsE_s,
                hd1_s, hd2_s, bh1_s, bh2_s):
        ref[...] = jnp.zeros((R, N), jnp.int32)
    c_cor[...] = jnp.zeros((R, N), jnp.float32)
    for ref in (c_nb, c_mi, c_mj, c_sE, c_h1, c_h2):
        ref[...] = jnp.zeros((R, N), jnp.int32)

    def sel_chain(lin, table, default, out_dtype):
        out = jnp.full(lin.shape, default, out_dtype)
        for v, x in enumerate(np.asarray(table).reshape(-1)):
            if x != 0:
                out = jnp.where(lin == v, out_dtype(x), out)
        return out

    def body(ip, carry):
        c5m, p5m = carry
        sel = (lane == ip)
        c5 = jnp.sum(jnp.where(sel, rcodes, 0), axis=1, keepdims=True)
        p5 = jnp.sum(jnp.where(sel, rpos, 0), axis=1, keepdims=True)
        z1_5 = jnp.sum(jnp.where(sel, z1row, 0), axis=1, keepdims=True)
        z2_5 = jnp.sum(jnp.where(sel, z2row, 0), axis=1, keepdims=True)

        def shift(ref, fill):
            x = pltpu.roll(ref[...], N - 1, axis=1)
            return jnp.where(lane == N - 1, fill, x)

        tot_p = shift(tot_s, jnp.float32(0))
        tmp_p = shift(tmp_s, jnp.int32(0))
        sE_p = shift(sE_s, jnp.int32(0))
        cor_p = shift(cor_s, jnp.float32(0))
        ms_p = shift(ms_s, jnp.float32(0))
        nb_p = shift(nb_s, jnp.int32(0))
        mi_p = shift(mi_s, jnp.int32(0))
        mj_p = shift(mj_s, jnp.int32(0))
        bsE_p = shift(bsE_s, jnp.int32(0))
        hd1_p = shift(hd1_s, jnp.int32(0))
        hd2_p = shift(hd2_s, jnp.int32(0))
        bh1_p = shift(bh1_s, jnp.int32(0))
        bh2_p = shift(bh2_s, jnp.int32(0))

        # cell quantities (all [R, N])
        lag = lane + ip
        m = mlen
        w = sel_chain(c5 * 5 + c3, Wn, jnp.float32(0), jnp.float32)
        contig = (ip > jnp.maximum(lag - m + 1, 0)) \
            & (p5 - p5m == 1) & (p3p - p3 == 1)
        tot = jnp.where(contig, (tot_p + w) * w, w)
        tmp = jnp.where(tot == 0, 0, tmp_p + 1)
        # stack energy between outer pair (ip-1, jp+1) and inner (ip, jp)
        A = sel_chain(c5m * 5 + c3p, PTn, jnp.int32(7), jnp.int32)
        Bt = sel_chain(c3 * 5 + c5, PTn, jnp.int32(7), jnp.int32)
        g = jnp.zeros((R, N), jnp.int32)
        STf = np.asarray(STn)
        for a_ in range(1, 7):
            ga = jnp.zeros((R, N), jnp.int32)
            for b_ in range(1, 7):
                ga = jnp.where(Bt == b_, jnp.int32(int(STf[a_, b_])), ga)
            g = jnp.where(A == a_, ga, g)
        in_run = (tot != 0) & (tot_p != 0) & contig
        sE = jnp.where((tot == 0) | (tot_p == 0), 0,
                       jnp.where(in_run, sE_p + g, sE_p))
        # hash delta of pairing (p5, p3) on an unpaired parent position:
        # Z[p5]*((p3+2)-1) + Z[p3]*((p5+2)-1), accumulated over exactly
        # the cells tmp counts (the stem _combo_pt will build); int32
        # wraparound == uint32 arithmetic mod 2^32
        z1c = z1_5 * (p3 + 1) + z1row * (p5 + 1)
        z2c = z2_5 * (p3 + 1) + z2row * (p5 + 1)
        hd1 = jnp.where(tot == 0, 0, hd1_p + z1c)
        hd2 = jnp.where(tot == 0, 0, hd2_p + z2c)

        w_width = jnp.where(lag < m, lag + 1, 2 * m - lag - 1)
        half = w_width // 2 + (w_width % 2)
        io = ip - jnp.maximum(lag - m + 1, 0)
        in_win = io < half
        uo = in_win & ((p3 - p5) > min_hp)
        upd = uo & (tot >= ms_p)

        ms = jnp.where(upd, tot, ms_p)
        nb = jnp.where(upd, tmp, nb_p)
        mi = jnp.where(upd, ip, mi_p)
        mj = jnp.where(upd, lane, mj_p)
        bsE = jnp.where(upd, sE, bsE_p)
        bh1 = jnp.where(upd, hd1, bh1_p)
        bh2 = jnp.where(upd, hd2, bh2_p)
        cor = cor_p + w

        tot_s[...] = tot
        tmp_s[...] = tmp
        sE_s[...] = sE
        cor_s[...] = cor
        ms_s[...] = ms
        nb_s[...] = nb
        mi_s[...] = mi
        mj_s[...] = mj
        bsE_s[...] = bsE
        hd1_s[...] = hd1
        hd2_s[...] = hd2
        bh1_s[...] = bh1
        bh2_s[...] = bh2

        # push lane 0 (the cell that FINALISES lag == ip) into collectors
        def push(cref, sref, dtype):
            x = pltpu.roll(cref[...], N - 1, axis=1)
            v = jnp.sum(jnp.where(lane == 0, sref[...],
                                  jnp.zeros((R, N), dtype)),
                        axis=1, keepdims=True)
            cref[...] = jnp.where(lane == N - 1, v, x)

        push(c_cor, cor_s, jnp.float32)
        push(c_nb, nb_s, jnp.int32)
        push(c_mi, mi_s, jnp.int32)
        push(c_mj, mj_s, jnp.int32)
        push(c_sE, bsE_s, jnp.int32)
        push(c_h1, bh1_s, jnp.int32)
        push(c_h2, bh2_s, jnp.int32)
        return (c5, p5)

    init = (jnp.zeros((R, 1), jnp.int32), jnp.full((R, 1), -9, jnp.int32))
    jax.lax.fori_loop(0, mmax, body, init)

    # ---- stitch per-lag outputs [R, 2N]
    # collector lane N-1-t holds lag mmax-1-t  =>  lag L at lane N-mmax+L;
    # final state lane jp holds lag mmax-1+jp.
    lag2 = jax.lax.broadcasted_iota(jnp.int32, (R, 2 * N), 1)

    def stitch(out_ref, cref, sref, dtype):
        low = jnp.concatenate(
            [cref[...], jnp.zeros((R, N), dtype)], axis=1)
        low = pltpu.roll(low, jax.lax.rem(mmax + N, 2 * N), axis=1)
        high = jnp.concatenate(
            [sref[...], jnp.zeros((R, N), dtype)], axis=1)
        high = pltpu.roll(high, jax.lax.rem(mmax - 1 + 2 * N, 2 * N),
                          axis=1)
        out = jnp.where(lag2 < mmax - 1, low, high)
        out_ref[0] = jnp.where(lag2 < jnp.maximum(mmax + N - 1, 0), out,
                               jnp.zeros((R, 2 * N), dtype))

    stitch(cor_ref, c_cor, cor_s, jnp.float32)
    stitch(mnb_ref, c_nb, nb_s, jnp.int32)
    stitch(mi_ref, c_mi, mi_s, jnp.int32)
    stitch(mj_ref, c_mj, mj_s, jnp.int32)
    stitch(msE_ref, c_sE, bsE_s, jnp.int32)
    stitch(hd1_ref, c_h1, bh1_s, jnp.int32)
    stitch(hd2_ref, c_h2, bh2_s, jnp.int32)


@partial(jax.jit, static_argnames=("R", "N", "min_hp", "wn", "ptn", "stn",
                                   "interpret"))
def _wavefront_call(rcodes, rpos, mlen, mmax, z1row, z2row, *, R, N, min_hp,
                    wn, ptn, stn, interpret=False):
    K = rcodes.shape[0]
    Wn = np.asarray(wn, np.float32).reshape(5, 5)
    PTn = np.asarray(ptn, np.int64).reshape(5, 5)
    STn = np.asarray(stn, np.int64).reshape(8, 8)
    mlen_b = jnp.broadcast_to(mlen[..., None], (K, R, N)).astype(jnp.int32)
    kern = partial(_kernel, R=R, N=N, min_hp=min_hp, Wn=Wn, PTn=PTn,
                   STn=STn)
    grid = (K,)
    bs_sc = pl.BlockSpec((K, 1), lambda k: (0, 0),
                         memory_space=pltpu.SMEM)
    bs_in = pl.BlockSpec((1, R, N), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM)
    bs_out = pl.BlockSpec((1, R, 2 * N), lambda k: (k, 0, 0),
                          memory_space=pltpu.VMEM)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((K, R, 2 * N), dt)
        for dt in (jnp.float32,) + (jnp.int32,) * 6)
    scratch = ([pltpu.VMEM((R, N), jnp.float32)] * 1
               + [pltpu.VMEM((R, N), jnp.int32)] * 2
               + [pltpu.VMEM((R, N), jnp.float32)] * 2
               + [pltpu.VMEM((R, N), jnp.int32)] * 4
               + [pltpu.VMEM((R, N), jnp.int32)] * 4    # hd1/hd2/bh1/bh2
               + [pltpu.VMEM((R, N), jnp.float32)] * 1
               + [pltpu.VMEM((R, N), jnp.int32)] * 6)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[bs_sc, bs_in, bs_in, bs_in, bs_in, bs_in],
        out_specs=tuple([bs_out] * 7),
        scratch_shapes=scratch,
        out_shape=out_shapes,
        interpret=interpret,
    )(mmax[:, None], rcodes, rpos, mlen_b, z1row, z2row)


def wavefront_tables(cfg, dp, W, rcodes, rpos, mlen, z1row=None, z2row=None,
                     interpret=False):
    """Per-lag window-scan tables, [K, R, 2N] each.

    Returns dict(cor_raw, max_nb, max_i, max_j, best_sE, hd1, hd2);
    cor_raw is the UN-normalised correlation (caller divides by the
    triangle+pad norm); hd1/hd2 are the candidate stems' pair-table hash
    deltas (uint32 bit patterns in int32).  z1row/z2row are Z[rpos]
    coefficient tables (zeros if omitted — hd outputs are then unused).
    Call per batch element (vmap extends the pallas grid).

    interpret=True runs the kernel through the Pallas interpreter so the
    TPU-only path is testable on the CPU suite (tests/test_wavefront.py)."""
    mmax = jnp.max(mlen, axis=-1).astype(jnp.int32)        # [K]
    if z1row is None:
        z1row = jnp.zeros(rpos.shape, jnp.int32)
    if z2row is None:
        z2row = jnp.zeros(rpos.shape, jnp.int32)
    cor, nb, mi, mj, sE, hd1, hd2 = _wavefront_call(
        rcodes, rpos, mlen, mmax, z1row, z2row,
        R=cfg.R, N=cfg.N, min_hp=cfg.min_hp,
        wn=tuple(np.asarray(W, np.float32).reshape(-1).tolist()),
        ptn=tuple(np.asarray(dp.pair_type).reshape(-1).tolist()),
        stn=tuple(np.asarray(dp.stack).reshape(-1).tolist()),
        interpret=interpret)
    return dict(cor_raw=cor, max_nb=nb, max_i=mi, max_j=mj, best_sE=sE,
                hd1=hd1, hd2=hd2)
