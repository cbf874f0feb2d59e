"""In-suite parity test for the Pallas wavefront kernel.

The kernel (rafft_tpu/engine/wavefront.py) is the TPU fast path for the
reference's per-lag window slide (/root/reference/rafft/rafft.py:36-83)
and only dispatches when the backend is a real TPU — so the CPU test
suite would never execute it.  Here it runs through the Pallas
interpreter (pl.pallas_call(..., interpret=True)) and is asserted
bit-identical to the gather-based fold_jax._window_scan/_correlate
formulation on randomized region layouts.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rafft_tpu.engine import fold_jax as FJ
from rafft_tpu.engine.fold_jax import EngineConfig
from rafft_tpu.energy.eval_jax import device_params
from rafft_tpu.engine.lookup import batched_taa
from rafft_tpu.engine.wavefront import wavefront_tables
from rafft_tpu.scan.encode import weight_matrix


CFG = EngineConfig(N=128, K=2, R=4, M=100)
DP = device_params(37.0, max_len=CFG.N)
W = weight_matrix(3.0, 2.0, 1.0)


def _random_regions(rng, n_max=100):
    """Random but engine-valid region layouts: each region is an
    ascending subset of sequence positions (what _regions produces for
    any mix of inner/outer loops), rpos N-padded, rcodes 0-padded."""
    K, R, N = CFG.K, CFG.R, CFG.N
    codes_full = rng.integers(0, 4, size=N)
    rpos = np.full((K, R, N), N, dtype=np.int32)
    rcodes = np.zeros((K, R, N), dtype=np.int32)
    mlen = np.zeros((K, R), dtype=np.int32)
    for k in range(K):
        for r in range(R):
            m = int(rng.integers(0, n_max + 1))
            pos = np.sort(rng.choice(n_max, size=m, replace=False))
            rpos[k, r, :m] = pos
            rcodes[k, r, :m] = codes_full[pos]
            mlen[k, r] = m
    return (jnp.asarray(rcodes), jnp.asarray(rpos), jnp.asarray(mlen))


_ZRNG = np.random.default_rng(0xBEEF)
_Z1 = _ZRNG.integers(1, 2**32 - 1, CFG.N + 1, dtype=np.uint64).astype(np.uint32)
_Z2 = _ZRNG.integers(1, 2**32 - 1, CFG.N + 1, dtype=np.uint64).astype(np.uint32)


def _zrows(rpos):
    rp = np.clip(np.asarray(rpos), 0, CFG.N)
    return (jnp.asarray(_Z1[rp].astype(np.int32)),
            jnp.asarray(_Z2[rp].astype(np.int32)))


def _jax_path(rcodes, rpos, mlen, z1row, z2row):
    cor = FJ._correlate(CFG, W, rcodes, mlen, True)
    lags, lvals = FJ._top_lags(CFG, cor)
    lag_ok = (lvals > FJ.NEG / 2) & (mlen[:, :, None] >= 2)
    ws = FJ._window_scan(CFG, DP, W, rcodes, rpos, mlen, lags, lag_ok,
                         z1row=z1row, z2row=z2row)
    ws = dict(ws, hd1=ws["best_h1"], hd2=ws["best_h2"])
    return cor, lags, lag_ok, ws


def _pallas_path(rcodes, rpos, mlen, z1row, z2row):
    N = CFG.N
    tabs = wavefront_tables(CFG, DP, W, rcodes, rpos, mlen,
                            z1row=z1row, z2row=z2row, interpret=True)
    lag = jnp.arange(2 * N - 1, dtype=jnp.int32)
    m = mlen[..., None]
    norm = (jnp.minimum(lag, jnp.maximum(2 * m - 2 - lag, 0))
            + jnp.float32(1.0))
    valid = lag < 2 * m - 1
    cor = jnp.where(valid, tabs["cor_raw"][..., : 2 * N - 1] / norm, FJ.NEG)
    lags, lvals = FJ._top_lags(CFG, cor)
    lag_ok = (lvals > FJ.NEG / 2) & (mlen[:, :, None] >= 2)
    ws = {k: batched_taa(tabs[k], lags)
          for k in ("max_nb", "max_i", "max_j", "best_sE", "hd1", "hd2")}
    return cor, lags, lag_ok, ws


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_wavefront_matches_window_scan(seed):
    rng = np.random.default_rng(seed)
    rcodes, rpos, mlen = _random_regions(rng)
    z1row, z2row = _zrows(rpos)
    c1, l1, lo1, ws1 = jax.jit(_jax_path)(rcodes, rpos, mlen, z1row, z2row)
    c2, l2, lo2, ws2 = jax.jit(_pallas_path)(rcodes, rpos, mlen, z1row,
                                             z2row)

    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    # window-scan outputs compared at selected, populated lags (the only
    # cells the engine ever consumes downstream)
    mask = np.asarray(lo1) & (np.asarray(ws1["max_nb"]) > 0)
    assert mask.any()
    for key in ("max_nb", "max_i", "max_j", "best_sE", "hd1", "hd2"):
        a, b = np.asarray(ws1[key]), np.asarray(ws2[key])
        np.testing.assert_array_equal(a[mask], b[mask], err_msg=key)

    # hash deltas must equal the brute-force recomputation from the
    # winning stems: sum over the stem's pairs of Z1[p5](p3+1)+Z1[p3](p5+1)
    rposn = np.asarray(rpos)
    i_s = np.asarray(ws1["max_i"])
    j_s = np.asarray(ws1["max_j"])
    run = np.asarray(ws1["max_nb"])
    hd1 = np.asarray(ws1["hd1"]).astype(np.uint32)
    kk, rr, mm = np.nonzero(mask)
    for k, r, m in list(zip(kk, rr, mm))[:50]:
        acc = 0
        for t in range(run[k, r, m]):
            p5 = int(rposn[k, r, i_s[k, r, m] - t])
            p3 = int(rposn[k, r, j_s[k, r, m] + t])
            acc = (acc + int(_Z1[p5]) * (p3 + 1)
                   + int(_Z1[p3]) * (p5 + 1)) & 0xFFFFFFFF
        assert acc == int(hd1[k, r, m]), (k, r, m)


def test_wavefront_empty_and_tiny_regions():
    """Degenerate layouts: empty regions, single positions, a full
    contiguous region — the padding/stitch edge cases."""
    K, R, N = CFG.K, CFG.R, CFG.N
    rpos = np.full((K, R, N), N, dtype=np.int32)
    rcodes = np.zeros((K, R, N), dtype=np.int32)
    mlen = np.zeros((K, R), dtype=np.int32)
    # k0,r0: the whole 0..79 contiguous region (step-0 layout)
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, size=80)
    rpos[0, 0, :80] = np.arange(80)
    rcodes[0, 0, :80] = codes
    mlen[0, 0] = 80
    # k0,r1: single position; k1,r0: two adjacent positions
    rpos[0, 1, 0] = 5
    rcodes[0, 1, 0] = 2
    mlen[0, 1] = 1
    rpos[1, 0, :2] = [10, 11]
    rcodes[1, 0, :2] = [1, 2]
    mlen[1, 0] = 2
    z1row, z2row = _zrows(rpos)
    args = (jnp.asarray(rcodes), jnp.asarray(rpos), jnp.asarray(mlen),
            z1row, z2row)
    c1, l1, lo1, ws1 = jax.jit(_jax_path)(*args)
    c2, l2, lo2, ws2 = jax.jit(_pallas_path)(*args)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    mask = np.asarray(lo1) & (np.asarray(ws1["max_nb"]) > 0)
    for key in ("max_nb", "max_i", "max_j", "best_sE", "hd1", "hd2"):
        a, b = np.asarray(ws1[key]), np.asarray(ws2[key])
        np.testing.assert_array_equal(a[mask], b[mask], err_msg=key)
