"""Native execution for the reference-dialect regex DFA.

The reference's regex pitch is codegen: it renders each pattern's automaton
to C, compiles a ``.so`` and dlopens it (``src/regex_generator.c:1212-1258``,
README "Native RegExps").  Re-deriving that economics here does NOT need
per-pattern codegen: :class:`CompiledRegex` already materializes a powerset
DFA as dense tables, so ONE generic 30-line table-walk kernel (compiled once
per machine, cached in ``/tmp``) executes every pattern — the tables ride in
as numpy arrays.  The kernel implements exactly the scan-loop semantics of
``extractor.c:55-93`` + the maximal-run acceptance of the generated matchers
(run to the first dead transition, then test acceptance at the stop state;
position 0 uses the BOF start state and — exactly like the NFA oracle — is
attempted only once: a failed BOF attempt advances, never retries the same
position with the mid-state closure).

Parity with the pure-Python DFA/NFA walk is asserted by
``tests/test_regex_dfa.py``; availability is best-effort — no compiler (or
``NXR_NO_CC=1``) silently falls back to the Python engines.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_C_SRC = r"""
#include <stdint.h>

/* Scan `cls` (one DFA input-class id per codepoint) left to right with the
   reference's non-overlap semantics: a successful attempt emits and resumes
   at its end, a failed attempt advances one position.  An attempt runs the
   DFA until the first dead transition (or end of text) and accepts iff the
   stop state is accepting (acc_eof at end of text, acc_mid otherwise).
   Returns the number of matches found; (start, end) pairs are written to
   `out` up to `cap` matches.  Empty matches never emit. */
long nxr_scan(const int32_t *cls, long n,
              const int16_t *trans, long ncls,
              const uint8_t *acc_mid, const uint8_t *acc_eof,
              long start_bof, long start_mid,
              int64_t *out, long cap) {
    long m = 0;
    long i = 0;
    long start_state = start_bof;
    while (i < n) {
        long cur = start_state;
        long j = i;
        while (j < n) {
            int16_t nx = trans[cur * ncls + cls[j]];
            if (nx < 0) break;
            cur = nx;
            j++;
        }
        int ok = (j == n) ? acc_eof[cur] : acc_mid[cur];
        if (ok && j > i) {
            if (m < cap) { out[2 * m] = i; out[2 * m + 1] = j; }
            m++;
            i = j;
        } else {
            i++;
        }
        start_state = start_mid;
    }
    return m;
}

/* ASCII fast path: scan raw UTF-8 bytes with an inline byte->class LUT —
   no intermediate class array at all.  Byte positions == codepoint
   positions for ASCII text, so spans come out in both coordinate systems
   at once.  Semantics identical to nxr_scan. */
long nxr_scan8(const uint8_t *txt, long n, const int32_t *lut,
               const int16_t *trans, long ncls,
               const uint8_t *acc_mid, const uint8_t *acc_eof,
               long start_bof, long start_mid,
               int64_t *out, long cap) {
    long m = 0;
    long i = 0;
    long start_state = start_bof;
    while (i < n) {
        long cur = start_state;
        long j = i;
        while (j < n) {
            int16_t nx = trans[cur * ncls + lut[txt[j]]];
            if (nx < 0) break;
            cur = nx;
            j++;
        }
        int ok = (j == n) ? acc_eof[cur] : acc_mid[cur];
        if (ok && j > i) {
            if (m < cap) { out[2 * m] = i; out[2 * m + 1] = j; }
            m++;
            i = j;
        } else {
            i++;
        }
        start_state = start_mid;
    }
    return m;
}
"""

_lib = None
_lib_tried = False


def _load() -> "ctypes.CDLL | None":
    """Compile (once per machine, content-addressed in /tmp) and dlopen the
    generic scan kernel.  Any failure — no gcc, read-only /tmp, opt-out via
    NXR_NO_CC — degrades to None and callers use the Python DFA walk."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if os.environ.get("NXR_NO_CC"):
        return None
    try:
        tag = hashlib.md5(_C_SRC.encode()).hexdigest()[:16]
        so_path = os.path.join(tempfile.gettempdir(), f"nxr_scan_{tag}.so")
        if not os.path.exists(so_path):
            with tempfile.TemporaryDirectory() as td:
                c_path = os.path.join(td, "scan.c")
                tmp_so = os.path.join(td, "scan.so")
                with open(c_path, "w") as f:
                    f.write(_C_SRC)
                subprocess.run(
                    ["gcc", "-O2", "-shared", "-fPIC", "-o", tmp_so, c_path],
                    check=True, capture_output=True, timeout=60,
                )
                # atomic publish: concurrent workers race benignly
                os.replace(tmp_so, so_path)
        lib = ctypes.CDLL(so_path)
        lib.nxr_scan.restype = ctypes.c_long
        lib.nxr_scan.argtypes = [
            ctypes.c_void_p, ctypes.c_long,   # cls, n
            ctypes.c_void_p, ctypes.c_long,   # trans, ncls
            ctypes.c_void_p, ctypes.c_void_p,  # acc_mid, acc_eof
            ctypes.c_long, ctypes.c_long,      # start_bof, start_mid
            ctypes.c_void_p, ctypes.c_long,    # out, cap
        ]
        lib.nxr_scan8.restype = ctypes.c_long
        lib.nxr_scan8.argtypes = [
            ctypes.c_char_p, ctypes.c_long,   # txt, n
            ctypes.c_void_p,                   # lut (256 x int32)
            ctypes.c_void_p, ctypes.c_long,   # trans, ncls
            ctypes.c_void_p, ctypes.c_void_p,  # acc_mid, acc_eof
            ctypes.c_long, ctypes.c_long,      # start_bof, start_mid
            ctypes.c_void_p, ctypes.c_long,    # out, cap
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def scan(cls_arr: np.ndarray, trans: np.ndarray, acc_mid: np.ndarray,
         acc_eof: np.ndarray, start_bof: int, start_mid: int):
    """Run the native scan; returns (starts, ends) int64 arrays.

    ``cls_arr`` int32 class ids; ``trans`` a C-contiguous int16
    ``(n_states, n_classes)`` table; acc arrays uint8."""
    lib = _load()
    n = len(cls_arr)
    if lib is None or n == 0:
        raise RuntimeError("native scanner unavailable")
    cap = max(16, n // 8)
    while True:
        out = np.empty(2 * cap, dtype=np.int64)
        m = lib.nxr_scan(
            cls_arr.ctypes.data, n,
            trans.ctypes.data, trans.shape[1],
            acc_mid.ctypes.data, acc_eof.ctypes.data,
            start_bof, start_mid,
            out.ctypes.data, cap,
        )
        if m <= cap:
            spans = out[: 2 * m].reshape(m, 2)
            return spans[:, 0].copy(), spans[:, 1].copy()
        cap = m  # exact rerun (truncated first pass still counted all)


def scan_ascii(txt: bytes, lut: np.ndarray, trans: np.ndarray,
               acc_mid: np.ndarray, acc_eof: np.ndarray,
               start_bof: int, start_mid: int):
    """ASCII path: the kernel maps bytes→classes inline via ``lut``
    (int32[256]), so no class array is ever materialized — important
    because large fresh-process numpy temporaries hit multi-second
    page-fault storms on some hosts (measured: an 8 M-element gather
    costing 2-4 s in a cold Ray worker, 30 ms warm)."""
    lib = _load()
    n = len(txt)
    if lib is None:
        raise RuntimeError("native scanner unavailable")
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    cap = max(16, n // 32)
    while True:
        out = np.empty(2 * cap, dtype=np.int64)
        m = lib.nxr_scan8(
            txt, n,
            lut.ctypes.data,
            trans.ctypes.data, trans.shape[1],
            acc_mid.ctypes.data, acc_eof.ctypes.data,
            start_bof, start_mid,
            out.ctypes.data, cap,
        )
        if m <= cap:
            spans = out[: 2 * m].reshape(m, 2)
            return spans[:, 0].copy(), spans[:, 1].copy()
        cap = m
