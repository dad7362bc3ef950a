"""Generate golden fixtures from the compiled C reference kernels.

Compiles /root/reference/src kernels (norm sacf xcor acf24ar roots perio)
into a shared lib, runs them via ctypes on deterministic numpy-generated
inputs (the same AR-filter + random-thinning recipe as the reference
tests, ref:test/sacf_01.c..sacf_04.c, xcor_01.c — GSL only supplied the
Gaussians there, so any seeded N(0,1) source is statistically
equivalent), and writes inputs + C outputs to tests/golden/*.json.

Run once:  python tools/gen_golden.py
The repo's pytest suite then compares tits_spark.functions.kernels
against these files without needing a compiler.
"""

from __future__ import annotations

import ctypes
import json
import pathlib
import subprocess
import tempfile

import numpy as np

REF = pathlib.Path("/root/reference/src")
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "golden"

SRCS = ["norm.c", "sacf.c", "xcor.c", "acf24ar.c", "roots.c", "perio.c"]


def build_lib() -> ctypes.CDLL:
    so = pathlib.Path(tempfile.mkdtemp()) / "libtits_ref.so"
    subprocess.run(
        ["gcc", "-O2", "-mavx2", "-shared", "-fPIC", *(str(REF / s) for s in SRCS),
         f"-I{REF}", "-lm", "-o", str(so)],
        check=True, capture_output=True,
    )
    return ctypes.CDLL(str(so))


class DTS(ctypes.Structure):
    _fields_ = [("n", ctypes.c_size_t),
                ("t", ctypes.POINTER(ctypes.c_double)),
                ("y", ctypes.POINTER(ctypes.c_double))]


class STS(ctypes.Structure):  # float twin (ref: sts_t)
    _fields_ = [("n", ctypes.c_size_t),
                ("t", ctypes.POINTER(ctypes.c_float)),
                ("y", ctypes.POINTER(ctypes.c_float))]


def _dts(t: np.ndarray, y: np.ndarray) -> DTS:
    return DTS(t.size,
               t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
               y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))


def _sts(t: np.ndarray, y: np.ndarray) -> STS:
    return STS(t.size,
               t.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
               y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))


def _aligned_copy(x: np.ndarray, align: int = 64, pad: int = 16, dtype=np.float64) -> np.ndarray:
    """32/64-byte-aligned padded copy — the C norm kernel uses aligned
    AVX loads/stores on the caller's buffer (ref:norm.c:168)."""
    x = np.ascontiguousarray(x, dtype=dtype)
    isz = np.dtype(dtype).itemsize
    raw = np.empty(x.size + pad + align // isz, dtype=dtype)
    off = (-raw.ctypes.data % align) // isz
    out = raw[off : off + x.size]
    out[:] = x
    return out


def c_norm(lib, x):
    buf = _aligned_copy(x)
    lib.tits_dnorm(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                   ctypes.c_size_t(buf.size))
    return buf.copy()


def c_sacf(lib, t, y, nlags, tau):
    t = np.ascontiguousarray(t, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    out = np.empty(nlags)
    lib.tits_dsacf(out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                   _dts(t, y), ctypes.c_size_t(nlags), ctypes.c_double(tau))
    return out


def c_xcor(lib, t1, y1, t2, y2, nlags, tau):
    t1 = np.ascontiguousarray(t1, dtype=np.float64)
    y1 = np.ascontiguousarray(y1, dtype=np.float64)
    t2 = np.ascontiguousarray(t2, dtype=np.float64)
    y2 = np.ascontiguousarray(y2, dtype=np.float64)
    out = np.empty(2 * nlags + 1)
    lib.tits_dxcor(out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                   _dts(t1, y1), _dts(t2, y2),
                   ctypes.c_int(nlags), ctypes.c_double(tau))
    return out


def c_acf2ar(lib, acf):
    acf = np.ascontiguousarray(acf, dtype=np.float64)
    ar = np.zeros(acf.size)
    lib.tits_dacf2ar(ar.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                     acf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                     ctypes.c_size_t(acf.size))
    return ar


def c_roots(lib, p):
    p = np.ascontiguousarray(p, dtype=np.float64)
    n = p.size - 1
    r = np.zeros(n)
    lib.tits_droots.restype = ctypes.c_size_t
    nreal = lib.tits_droots(r.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                            p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                            ctypes.c_size_t(n))
    return int(nreal), r


def c_perio(lib, t, y, nw):
    t = np.ascontiguousarray(t, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    out = np.empty(nw)
    lib.tits_dperio(out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                    ctypes.c_size_t(nw), _dts(t, y))
    return out


# ------------------------------------------------ float32 twins (tits_s*)

def _f32(x) -> np.ndarray:
    return np.ascontiguousarray(x, dtype=np.float32)


def c_snorm(lib, x):
    buf = _aligned_copy(x, dtype=np.float32)
    lib.tits_snorm(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                   ctypes.c_size_t(buf.size))
    return buf.copy()


def c_ssacf(lib, t, y, nlags, tau):
    t, y = _f32(t), _f32(y)
    out = np.empty(nlags, dtype=np.float32)
    lib.tits_ssacf(out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                   _sts(t, y), ctypes.c_size_t(nlags), ctypes.c_float(tau))
    return out


def c_sxcor(lib, t1, y1, t2, y2, nlags, tau):
    t1, y1, t2, y2 = _f32(t1), _f32(y1), _f32(t2), _f32(y2)
    out = np.empty(2 * nlags + 1, dtype=np.float32)
    lib.tits_sxcor(out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                   _sts(t1, y1), _sts(t2, y2),
                   ctypes.c_int(nlags), ctypes.c_float(tau))
    return out


def c_sacf2ar(lib, acf):
    acf = _f32(acf)
    ar = np.zeros(acf.size, dtype=np.float32)
    lib.tits_sacf2ar(ar.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                     acf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                     ctypes.c_size_t(acf.size))
    return ar


def c_sroots(lib, p):
    p = _f32(p)
    n = p.size - 1
    r = np.zeros(n, dtype=np.float32)
    lib.tits_sroots.restype = ctypes.c_size_t
    nreal = lib.tits_sroots(r.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                            p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                            ctypes.c_size_t(n))
    return int(nreal), r


# NOTE: no c_sperio — tits_sperio is declared in perio.h:49 but perio.c
# has no float self-include, so the reference never defines it.


def ar_filter(v: np.ndarray, lam: list[float]) -> np.ndarray:
    """The reference tests' in-place forward filter (ref:test/sacf_01.c:9-17)."""
    v = v.copy()
    for i, li in enumerate(lam):
        if i == 0:
            # io[j] += io[j] * 1. doubles the series when lambda[0]=1
            v[: v.size] += v[: v.size] * li
        else:
            v[: v.size - i] += v[i:] * li
    return v


def make_series(seed: int, n: int = 10_000, lam=(1.0, 0.0, 0.4), keep: float | None = None):
    rng = np.random.Generator(np.random.PCG64(seed))
    t = np.arange(n, dtype=np.float64)
    v = rng.standard_normal(n)
    v = ar_filter(v, list(lam))
    if keep is not None:
        m = rng.random(n) < keep
        t, v = t[m], v[m]
    return t, v


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    lib = build_lib()
    gold: dict[str, dict] = {}

    # --- norm: reference inline vectors + random ones (tail paths n%4 != 0)
    for name, vec in {
        "norm_8": [-3, -2, -1, 0, 0, 1, 2, 3],
        "norm_3": [0, 1, 2],
        "norm_rand13": list(np.random.Generator(np.random.PCG64(5)).normal(3, 7, 13)),
        "norm_rand4096": list(np.random.Generator(np.random.PCG64(6)).normal(-1, 2, 4096)),
    }.items():
        x = np.asarray(vec, dtype=np.float64)
        gold[name] = {"x": x.tolist(), "out": c_norm(lib, x).tolist()}

    # --- sacf: regular + irregular AR series (ref test style 1)
    t, v = make_series(101, lam=(1.0, 0.0, 0.4))
    gold["sacf_regular"] = {
        "t": t.tolist(), "y": v.tolist(), "nlags": 10, "tau": 1.0,
        "out": c_sacf(lib, t, v, 10, 1.0).tolist(),
    }
    t, v = make_series(103, lam=(1.0, 0.0, 0.4), keep=0.8)
    gold["sacf_irregular80"] = {
        "t": t.tolist(), "y": v.tolist(), "nlags": 10, "tau": 0.5,
        "out": c_sacf(lib, t, v, 10, 0.5).tolist(),
    }
    t, v = make_series(104, lam=(1.0, -0.2, -0.4, 0.1), keep=0.8)
    gold["sacf_irregular_ar3"] = {
        "t": t.tolist(), "y": v.tolist(), "nlags": 21, "tau": 0.25,
        "out": c_sacf(lib, t, v, 21, 0.25).tolist(),
    }

    # --- xcor: lag-1 shifted, differently thinned copies (ref:test/xcor_01.c)
    rng = np.random.Generator(np.random.PCG64(105))
    n = 10_000
    t = np.arange(n, dtype=np.float64)
    v = ar_filter(rng.standard_normal(n), [1.0, 0.0, 0.4])
    m1 = rng.random(n) < 0.8
    m2 = rng.random(n) < 0.2
    t1, y1 = t[m1], v[m1]
    t2 = t[m2] + 1.0
    y2 = v[m2] + rng.normal(0, 0.1, int(m2.sum()))
    gold["xcor_pair"] = {
        "t1": t1.tolist(), "y1": y1.tolist(), "t2": t2.tolist(), "y2": y2.tolist(),
        "nlags": 10, "tau": 0.25,
        "out": c_xcor(lib, t1, y1, t2, y2, 10, 0.25).tolist(),
    }

    # --- acf2ar: reference inline constants (ref:test/acf24ar_01/03/04.c)
    for name, acf in {
        "acf2ar_10": [0.0075, -0.3214, -0.0445, 0.0641, -0.0006,
                      -0.0299, -0.0027, 0.0750, -0.0579, -0.0706],
        "acf2ar_4": [-0.498186, -0.148115, -0.207297, -0.207337],
        "acf2ar_3": [0.8, 0.4, 0.2],
    }.items():
        gold[name] = {"acf": acf, "out": c_acf2ar(lib, np.asarray(acf)).tolist()}

    # --- roots: reference inline polys (ref:test/roots_01/03/04.c)
    for name, p in {
        "roots_cubic": [140.0, -13.0, -8.0, 1.0],
        "roots_cplx": [-140.0, -36.0, 1.0, 1.0],
        "roots_deg5": [-800.0, 360.0, 32.0, -26.0, -2.0, 1.0],
    }.items():
        nreal, r = c_roots(lib, np.asarray(p))
        gold[name] = {"p": p, "nreal": nreal, "out": r.tolist()}

    # --- perio: sinusoid at integer frequency 3 on irregular t in [0,1)
    rng = np.random.Generator(np.random.PCG64(106))
    tp = np.sort(rng.random(512))
    yp = np.sin(2 * np.pi * 3 * tp) + 0.1 * rng.standard_normal(512)
    gold["perio_sin3"] = {
        "t": tp.tolist(), "y": yp.tolist(), "nw": 8,
        "out": c_perio(lib, tp, yp, 8).tolist(),
    }

    # --- float32 twins (tits_s*): same inputs, single-precision outputs
    for name in ["norm_8", "norm_3", "norm_rand13", "norm_rand4096"]:
        gold[name]["out_f32"] = c_snorm(lib, np.asarray(gold[name]["x"])).tolist()
    for name in ["sacf_regular", "sacf_irregular80", "sacf_irregular_ar3"]:
        g = gold[name]
        g["out_f32"] = c_ssacf(
            lib, np.asarray(g["t"]), np.asarray(g["y"]), g["nlags"], g["tau"]
        ).tolist()
    g = gold["xcor_pair"]
    g["out_f32"] = c_sxcor(
        lib, np.asarray(g["t1"]), np.asarray(g["y1"]),
        np.asarray(g["t2"]), np.asarray(g["y2"]), g["nlags"], g["tau"]
    ).tolist()
    for name in ["acf2ar_10", "acf2ar_4", "acf2ar_3"]:
        gold[name]["out_f32"] = c_sacf2ar(lib, np.asarray(gold[name]["acf"])).tolist()
    for name in ["roots_cubic", "roots_cplx", "roots_deg5"]:
        nreal, r = c_sroots(lib, np.asarray(gold[name]["p"]))
        gold[name]["nreal_f32"] = nreal
        gold[name]["out_f32"] = r.tolist()
    # (no perio_sin3 float golden: the reference declares tits_sperio in
    # perio.h:49 but never defines it — perio.c lacks the self-include)

    for name, obj in gold.items():
        (OUT / f"{name}.json").write_text(json.dumps(obj))
    print(f"wrote {len(gold)} fixtures to {OUT}")


if __name__ == "__main__":
    main()
