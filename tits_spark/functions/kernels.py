"""Numpy ports of the reference's numerical kernels.

These are independent re-implementations (not copies) of the math in
/root/reference/src, replicating semantics the tests pin down:

 - 4-lane Welford moments + pairwise combine for mean/var, including the
   scalar tail (ref:norm.c:75-147) — lane-order-faithful so z-normalized
   series match the C build bit-for-bit on lane-multiple inputs;
 - truncation of series length to a multiple of the SIMD width 4
   (ref:sacf.c:193-196, xcor.c:193-199) — the reference silently drops
   up to 3 trailing points; we replicate, not "fix" (SURVEY.md §7);
 - Bjoernstad-Falck Gaussian kernel with Edelson-Krolik banding:
   h = 0.25 * (mean_dt / tau), band = +-5h, K = exp(-d^2/(2h^2)) /
   sqrt(2*pi*h) (ref:sacf.c:117-148);
 - monotone two-pointer band sweep == np.searchsorted on the sorted
   rescaled time axis (ref:sacf.c:166-179, xcor.c:166-179);
 - Levinson-Durbin ACF->AR per ITU-T G.729 with early termination on
   |E| <= eps (ref:acf24ar.c:48-73);
 - Laguerre iteration + Horner deflation for polynomial roots, real
   roots first, complex pairs (re, |im|) packed from the tail
   (ref:roots.c:74-203);
 - Lomb-Scargle periodogram on the integer frequency grid w_j =
   2*pi*(j+1) with phase rotation tau = atan2(2*Scs, Scc-Sss)/2
   (ref:perio.c:49-86).

Everything here is plain numpy over contiguous arrays — these functions
run inside Arrow-batched pandas UDFs (applyInPandas / cogroup), never
per-row Python.
"""

from __future__ import annotations

import numpy as np

LANES = 4  # AVX2 = 4 doubles (ref:sacf.c:61-65); fixes truncation + Welford lanes
_EPS = float(np.finfo(np.float64).eps)


# ---------------------------------------------------------------- stats / norm

def welford_stats(x: np.ndarray) -> tuple[float, float]:
    """(mean, sample variance) with the reference's exact accumulation:
    4 parallel Welford lanes over x[0::4]..x[3::4] blocks, pairwise
    combine, scalar Welford tail, /(n-1). ref:norm.c:75-147."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    mean = 0.0
    svar = 0.0
    nblk = n // LANES
    if nblk:
        blocks = x[: nblk * LANES].reshape(nblk, LANES)
        m1 = np.zeros(LANES)
        m2 = np.zeros(LANES)
        for i in range(nblk):
            xi = blocks[i]
            dlt = xi - m1
            m1 = m1 + dlt / float(i + 1)
            m2 = m2 + dlt * (xi - m1)
        for i in range(LANES):
            mean += m1[i]
        mean /= float(LANES)
        for i in range(LANES):
            for j in range(i + 1, LANES):
                svar -= 2 * m1[i] * m1[j]
        mtmp = (m1 * m1) * float(LANES - 1)
        for i in range(LANES):
            svar += mtmp[i]
        svar *= float(nblk)
        svar /= float(LANES)
        for i in range(LANES):
            svar += m2[i]
    for i in range(nblk * LANES, n):
        numean = mean + (x[i] - mean) / float(i + 1)
        svar += (x[i] - mean) * (x[i] - numean)
        mean = numean
    svar /= float(n - 1)
    return mean, svar


def znorm(x: np.ndarray) -> np.ndarray:
    """x <- (x - mean) / sdev, reference op order: (x + (-mean)) * (1/sqrt(var)).
    ref:norm.c:151-181."""
    x = np.asarray(x, dtype=np.float64)
    mean, svar = welford_stats(x)
    return (x + (-mean)) * (1.0 / np.sqrt(svar))


def meandiff(t: np.ndarray) -> float:
    """Mean consecutive time step: -sum(t[i] - t[i+1]) / (n-1); NaN for
    n <= 1. ref:sacf.c:82-95."""
    t = np.asarray(t, dtype=np.float64)
    if t.size <= 1:
        return float("nan")
    return float(-np.sum(t[:-1] - t[1:]) / (t.size - 1))


# ----------------------------------------------------------- kernel ACF / XCF

def _kernel_consts(tau_scaled: float) -> tuple[float, float, float]:
    """(h, _xf, _vf): width h = 0.25*tau_scaled, exponent scale
    -1/(2h^2), total scale 1/sqrt(2*pi*h). ref:sacf.c:130-142."""
    h = 0.25 * tau_scaled
    return h, -1.0 / (2.0 * h * h), 1.0 / np.sqrt(2.0 * np.pi * h)


def _band_corr(lag: float, t1, y1, t2, y2, thresh, xf, vf) -> tuple[float, float]:
    """One lag of the Edelson-Krolik banded, Gaussian-weighted sum:
    nsum = sum_{|lag-(t2j-t1i)|<thresh} y1i*y2j*K, dsum = sum K.
    Two-pointer cursor scan (ref:xcor.c:166-179) == searchsorted bands."""
    kti = lag + t1
    starts = np.searchsorted(t2, kti - thresh, side="left")
    ends = np.searchsorted(t2, kti + thresh, side="left")
    cnt = ends - starts
    total = int(cnt.sum())
    if total == 0:
        return 0.0, 0.0
    # ragged ranges: j indices for every (i, j) pair in band
    ii = np.repeat(np.arange(t1.size), cnt)
    jj = np.repeat(starts - np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt) + np.arange(total)
    d = lag - (t2[jj] - t1[ii])
    K = vf * np.exp(xf * d * d)
    return float(np.sum(y1[ii] * y2[jj] * K)), float(np.sum(K))


def _trunc(a: np.ndarray) -> np.ndarray:
    n = a.size - a.size % LANES
    return a[:n]


def sacf(t: np.ndarray, y: np.ndarray, nlags: int, tau: float) -> np.ndarray:
    """Kernel-weighted sample autocorrelation for irregular series,
    lags 1..nlags on the tau grid. ref:sacf.c:185-226."""
    t = _trunc(np.ascontiguousarray(t, dtype=np.float64))
    y = _trunc(np.ascontiguousarray(y, dtype=np.float64))
    if t.size == 0:
        return np.full(nlags, np.nan)
    y = znorm(y)
    rtau = 1.0 / tau
    tmd = meandiff(t)
    ts = t * rtau
    h, xf, vf = _kernel_consts(tmd * rtau)
    thresh = h * 5.0
    out = np.empty(nlags)
    for k in range(1, nlags + 1):
        nsum, dsum = _band_corr(float(k), ts, y, ts, y, thresh, xf, vf)
        out[k - 1] = nsum / dsum if dsum != 0.0 else np.nan
    return out


def xcor(t1, y1, t2, y2, nlags: int, tau: float) -> np.ndarray:
    """Kernel-weighted cross-correlation (Edelson-Krolik), lags
    -nlags..+nlags on the tau grid; kernel width from the *smaller*
    mean time step of the two series. ref:xcor.c:185-238."""
    t1 = _trunc(np.ascontiguousarray(t1, dtype=np.float64))
    y1 = _trunc(np.ascontiguousarray(y1, dtype=np.float64))
    t2 = _trunc(np.ascontiguousarray(t2, dtype=np.float64))
    y2 = _trunc(np.ascontiguousarray(y2, dtype=np.float64))
    if t1.size == 0 or t2.size == 0:
        return np.full(2 * nlags + 1, np.nan)
    y1 = znorm(y1)
    y2 = znorm(y2)
    rtau = 1.0 / tau
    tmd1 = meandiff(t1)
    tmd2 = meandiff(t2)
    s1 = t1 * rtau
    s2 = t2 * rtau
    h, xf, vf = _kernel_consts(min(tmd1, tmd2) * rtau)
    thresh = h * 5.0
    out = np.empty(2 * nlags + 1)
    for i, k in enumerate(range(-nlags, nlags + 1)):
        nsum, dsum = _band_corr(float(k), s1, y1, s2, y2, thresh, xf, vf)
        out[i] = nsum / dsum if dsum != 0.0 else np.nan
    return out


# --------------------------------------------------------------- AR / spectral

def acf2ar(acf: np.ndarray, mo: int | None = None) -> np.ndarray:
    """Levinson-Durbin recursion ACF -> AR(mo) coefficients, assuming
    acf[0-lag] == 1; stops early when |E| <= eps. ref:acf24ar.c:48-73."""
    acf = np.asarray(acf, dtype=np.float64)
    if mo is None:
        mo = acf.size
    ar = np.zeros(mo)
    E = 1.0
    for i in range(mo):
        if not (abs(E) > _EPS):
            break
        k = -acf[i]
        for j in range(1, i + 1):
            k -= ar[j - 1] * acf[i - j]
        k /= E
        an = ar.copy()
        an[i] = k
        for j in range(1, i + 1):
            an[j - 1] = ar[j - 1] + k * ar[i - j]
        ar[: i + 1] = an[: i + 1]
        E *= 1 - k * k
    return ar


def perio(t: np.ndarray, y: np.ndarray, nw: int) -> np.ndarray:
    """Lomb-Scargle periodogram at frequencies w_j = 2*pi*(j+1),
    j = 0..nw-1. ref:perio.c:49-86."""
    t = np.asarray(t, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    out = np.empty(nw)
    for j in range(nw):
        wj = 2.0 * np.pi * float(j + 1)
        theta = wj * t
        c = np.cos(theta)
        s = np.sin(theta)
        xc = float(np.sum(y * c))
        xs = float(np.sum(y * s))
        cc = float(np.sum(c * c))
        ss = float(np.sum(s * s))
        cs = float(np.sum(c * s))
        ph = np.arctan2(2.0 * cs, cc - ss) / 2.0
        cp, sp = np.cos(ph), np.sin(ph)
        ct = cp * xc + sp * xs
        st = cp * xs - sp * xc
        cct, sst, cst = cp * cp, sp * sp, cp * sp
        p = (ct * ct) / (cct * cc + 2.0 * cst * cs + sst * ss)
        p += (st * st) / (cct * ss - 2.0 * cst * cs + sst * cc)
        out[j] = 0.5 * p
    return out


# -------------------------------------------------------------------- roots

def _horner_eval(p: np.ndarray, n: int, at: complex) -> tuple[complex, complex, complex]:
    """Horner evaluation of p (monomial coeffs, degree n) and first two
    derivatives at a complex point; d2 is doubled like the reference.
    ref:roots.c:74-90."""
    d0 = d1 = d2 = 0j
    for i in range(n, 1, -1):
        d0 = p[i] + d0 * at
        d1 = d0 + d1 * at
        d2 = d1 + d2 * at
    d0 = p[1] + d0 * at
    d1 = d0 + d1 * at
    d0 = p[0] + d0 * at
    return d0, d1, 2.0 * d2


def _laguerre(p: np.ndarray, n: int, x: complex) -> complex:
    """Laguerre iteration (max 32 steps) for one root. ref:roots.c:133-159."""
    for _ in range(32):
        d0, d1, d2 = _horner_eval(p, n, x)
        if abs(d0) < _EPS:
            break
        g = d1 / d0
        h = g * g - d2 / d0
        r = np.sqrt((h * n - g * g) * (n - 1))
        den1, den2 = g + r, g - r
        den = den1 if abs(den1) > abs(den2) else den2
        a = n / den
        if abs(a) < _EPS:
            break
        x -= a
    return x


def _deflate_real(p: np.ndarray, n: int, at: float) -> None:
    p[:n] = p[1 : n + 1]
    p[n] = 0.0
    for i in range(n - 1, 0, -1):
        p[i - 1] += p[i] * at


def _deflate(p: np.ndarray, n: int, at: complex) -> int:
    """Factor out (x-at) if real else (x-at)(x-conj(at)); returns degree
    reduction (1 or 2). ref:roots.c:104-131."""
    if abs(at.imag) < _EPS:
        _deflate_real(p, n, at.real)
        return 1
    aa = (at * at.conjugate()).real
    ra = 2.0 * at.real
    p[: n - 1] = p[2 : n + 1]
    p[n] = 0.0
    p[n - 1] = 0.0
    for i in range(n - 2, 0, -1):
        p[i - 1] += p[i] * ra - p[i + 1] * aa
    return 2


def roots(p: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All roots of the real polynomial with monomial coefficients p
    (p[0] + p[1] x + ... + p[n] x^n).

    Returns (real_roots, complex_pairs) where complex_pairs rows are
    (re, |im|) for each conjugate pair — matching the reference's output
    layout of real roots first, pairs packed from the tail.
    ref:roots.c:162-203."""
    p = np.asarray(p, dtype=np.float64)
    n = p.size - 1
    if n == 0 or abs(p[n]) < _EPS:
        raise ValueError("degenerate polynomial (zero leading coefficient)")
    reals: list[float] = []
    pairs: list[tuple[float, float]] = []
    q = p.copy()
    guess = 0j
    while n > 1:
        guess = _laguerre(q, n, guess)
        red = _deflate(q, n, guess)
        if red == 1:
            reals.append(guess.real)
            n -= 1
        else:
            pairs.append((guess.real, abs(guess.imag)))
            n -= 2
    if n == 1:
        reals.append(-q[0] / q[1])
    return np.asarray(reals), np.asarray(pairs).reshape(-1, 2)
