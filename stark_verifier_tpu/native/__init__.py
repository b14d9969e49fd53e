"""ctypes bindings for the native wire parser (built lazily with cc).

The reference's runtime is fully native Rust; here the device compute path is
JAX/XLA and the host runtime keeps a native fast path for proof ingestion --
a two-pass C scanner measured at 0.80 ms/proof (~710 MB/s) on the bundled
proof.bin vs 10.44 ms/proof for the Python byte walker (13x; docs/PERF.md
system-throughput section), which matters when feeding 10^4+ proofs/s to
the device.

Falls back transparently to the Python parser if no C compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "wire_parser.c")
_SO = os.path.join(_HERE, "_wire_parser.so")

_lock = threading.Lock()
_lib = None
_build_error = None

_ERRORS = {
    1: "truncated proof",
    2: "invalid proof element type",
    3: "bad size field",
    6: "too many FRI levels",
    7: "meta buffer too small",
}


def _build() -> str | None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O2", "-shared", "-fPIC", "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except (OSError, subprocess.SubprocessError) as e:  # pragma: no cover
        global _build_error
        _build_error = e
        return None


def get_lib():
    """Load (building if needed) the parser library; None if unavailable."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.svt_scan.restype = ctypes.c_int
        lib.svt_scan.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                 ctypes.POINTER(ctypes.c_int64), ctypes.c_size_t]
        lib.svt_fill.restype = ctypes.c_int
        _lib = lib
        return _lib


def parse_proof_native(proof_bytes: bytes, allow_trailing: bool = True):
    """Parse with the C fast path; returns a wire.ProofArrays.

    Raises wire.WireFormatError on malformed input (same error model as the
    Python parser, including the reference's trailing-bytes tolerance --
    deserializer.rs:142 returns a consumed count that main.rs:204 ignores);
    raises RuntimeError if the native library is unavailable.
    """
    from ..proofio import wire

    lib = get_lib()
    if lib is None:  # pragma: no cover
        raise RuntimeError(f"native parser unavailable: {_build_error}")

    meta = np.zeros(2 + 6 * 66, dtype=np.int64)
    rc = lib.svt_scan(proof_bytes, len(proof_bytes),
                      meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                      meta.size)
    if rc:
        raise wire.WireFormatError(_ERRORS.get(rc, f"error {rc}"))

    n_levels = int(meta[0])
    n_points = int(meta[1])
    lv_meta = meta[2:2 + 6 * n_levels].reshape(n_levels, 6)
    mn, mvs, md, ln, lvs, ld = meta[2 + 6 * n_levels: 2 + 6 * n_levels + 6]
    consumed = int(meta[2 + 6 * n_levels + 6])
    if not allow_trailing and consumed != len(proof_bytes):
        raise wire.WireFormatError(
            f"{len(proof_bytes) - consumed} trailing bytes after proof")

    u8 = np.uint8
    u32 = np.uint32
    merkle_root = np.zeros(32, u8)
    l_merkle_root = np.zeros(32, u8)
    points = np.zeros(n_points * 32, u8)
    main_v = np.zeros(int(mn) * int(mvs), u8)
    main_s = np.zeros_like(main_v)
    main_w = np.zeros(int(mn) * int(md) * 32, u8)
    main_vs = np.zeros(int(mn), u32)
    main_d = np.zeros(int(mn), u32)
    lin_v = np.zeros(int(ln) * int(lvs), u8)
    lin_s = np.zeros_like(lin_v)
    lin_w = np.zeros(int(ln) * int(ld) * 32, u8)
    lin_vs = np.zeros(int(ln), u32)
    lin_d = np.zeros(int(ln), u32)

    root2 = [np.zeros(32, u8) for _ in range(n_levels)]
    col_v, col_s, col_w, col_vs, col_d = [], [], [], [], []
    pol_v, pol_s, pol_w, pol_vs, pol_d = [], [], [], [], []
    for i in range(n_levels):
        cn, cvs, cd, pn, pvs, pd = (int(x) for x in lv_meta[i])
        col_v.append(np.zeros(cn * cvs, u8))
        col_s.append(np.zeros(cn * cvs, u8))
        col_w.append(np.zeros(cn * cd * 32, u8))
        col_vs.append(np.zeros(cn, u32))
        col_d.append(np.zeros(cn, u32))
        pol_v.append(np.zeros(pn * pvs, u8))
        pol_s.append(np.zeros(pn * pvs, u8))
        pol_w.append(np.zeros(pn * pd * 32, u8))
        pol_vs.append(np.zeros(pn, u32))
        pol_d.append(np.zeros(pn, u32))

    def ptr_array(arrs):
        t = ctypes.c_void_p * max(len(arrs), 1)
        return t(*[a.ctypes.data for a in arrs])

    def vp(a):
        return a.ctypes.data_as(ctypes.c_void_p)

    rc = lib.svt_fill(
        proof_bytes, len(proof_bytes),
        vp(merkle_root), vp(l_merkle_root),
        ptr_array(root2),
        ptr_array(col_v), ptr_array(col_s), ptr_array(col_w),
        ptr_array(col_vs), ptr_array(col_d),
        ptr_array(pol_v), ptr_array(pol_s), ptr_array(pol_w),
        ptr_array(pol_vs), ptr_array(pol_d),
        meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        vp(points),
        vp(main_v), vp(main_s), vp(main_w), vp(main_vs), vp(main_d),
        vp(lin_v), vp(lin_s), vp(lin_w), vp(lin_vs), vp(lin_d),
    )
    if rc:
        raise wire.WireFormatError(_ERRORS.get(rc, f"error {rc}"))

    def words(a, shape):
        return a.view("<u4").astype(np.uint32).reshape(shape)

    def group(v, s, w, n, vs, d, vsizes, depths):
        return wire.BranchGroup(
            value_words=words(v, (n, vs // 4)),
            sibling_words=words(s, (n, vs // 4)),
            witness_words=words(w, (n, d, 8)),
            vsizes=vsizes,
            depths=depths,
        )

    levels = []
    for i in range(n_levels):
        cn, cvs, cd, pn, pvs, pd = (int(x) for x in lv_meta[i])
        levels.append(wire.FriLevel(
            root2_words=words(root2[i], (8,)),
            column=group(col_v[i], col_s[i], col_w[i], cn, cvs, cd,
                         col_vs[i], col_d[i]),
            poly=group(pol_v[i], pol_s[i], pol_w[i], pn, pvs, pd,
                       pol_vs[i], pol_d[i]),
        ))

    return wire.ProofArrays(
        merkle_root_words=words(merkle_root, (8,)),
        l_merkle_root_words=words(l_merkle_root, (8,)),
        fri_levels=levels,
        points_words=words(points, (n_points, 8)),
        main=group(main_v, main_s, main_w, int(mn), int(mvs), int(md),
                   main_vs, main_d),
        lincomb=group(lin_v, lin_s, lin_w, int(ln), int(lvs), int(ld),
                      lin_vs, lin_d),
        consumed=consumed,
    )
