"""Native engine loader: builds tampnative.cpp on demand and binds via ctypes.

The native library carries the O(N) sequential parts of the codec (greedy
commit, bit-pack, token decode) at memory speed, complementing the TPU's
O(N*window) parallel search.  If no C++ toolchain is available the Python
engine paths are used instead — ``available()`` reports which.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "tampnative.cpp")
_LIB_PATH = os.path.join(_HERE, "libtampnative.so")

_lock = threading.Lock()
_lib = None
_load_error: str | None = None

# Progress/abort callback signature shared by the streaming handles:
# int cb(void* user, int64_t bytes_in, int64_t bytes_out).
CALLBACK_CFUNC = ctypes.CFUNCTYPE(
    ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64)


def _build() -> None:
    extra = []
    if os.environ.get("TAMP_TPU_SANITIZE"):
        # Reference parity: sanitizer-built extensions in CI (TAMP_SANITIZE).
        # Run python with LD_PRELOAD=libasan.so when using this.
        extra = ["-O1", "-g", "-fsanitize=address,undefined",
                 "-fno-sanitize-recover=all"]
    # Build knobs: TAMP_TRI_MIN_WINDOW=<int> tunes the trigram-chain window
    # threshold; TAMP_TPU_CXXFLAGS passes arbitrary extra flags.
    tri = os.environ.get("TAMP_TRI_MIN_WINDOW")
    if tri and tri.isdigit():
        extra.append(f"-DTAMP_TRI_MIN_WINDOW={tri}")
    extra.extend(os.environ.get("TAMP_TPU_CXXFLAGS", "").split())
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        *extra, "-o", _LIB_PATH + ".tmp", _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
        # -march=native may be unsupported; retry portable.
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", _LIB_PATH + ".tmp", _SRC],
            check=True, capture_output=True, timeout=300,
        )
    os.replace(_LIB_PATH + ".tmp", _LIB_PATH)


def _load():
    global _lib, _load_error
    with _lock:
        if _lib is not None or _load_error is not None:
            return _lib
        try:
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
        except Exception as e:  # toolchain missing, build failure, ...
            _load_error = f"{type(e).__name__}: {e}"
            return None

        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64 = ctypes.c_int64
        i64p = ctypes.POINTER(ctypes.c_int64)
        cint = ctypes.c_int

        lib.tampn_init_dictionary.argtypes = [u8p, i64, cint]
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.tampn_compress.argtypes = [
            u8p, i64, u8p, i32p, u8p, i32p, u8p,
            cint, cint, cint, cint, cint, cint, cint, cint,
            u32p, i64p, cint, u8p, i64, i64p,
        ]
        lib.tampn_compress.restype = cint
        lib.tampn_decompress.argtypes = [u8p, i64, u8p, i64, u8p, i64, i64p]
        lib.tampn_decompress.restype = cint

        vp = ctypes.c_void_p
        lib.tampn_comp_new.argtypes = [cint, cint, cint, cint, u8p, cint, cint]
        lib.tampn_comp_new.restype = vp
        lib.tampn_comp_free.argtypes = [vp]
        lib.tampn_comp_write.argtypes = [vp, u8p, i64, u8p, i64, i64p]
        lib.tampn_comp_write.restype = cint
        lib.tampn_comp_flush.argtypes = [vp, cint, u8p, i64, i64p]
        lib.tampn_comp_flush.restype = cint
        lib.tampn_comp_reset_dictionary.argtypes = [vp, u8p, i64, i64p]
        lib.tampn_comp_reset_dictionary.restype = cint
        lib.tampn_dec_new.argtypes = [u8p, i64]
        lib.tampn_dec_new.restype = vp
        lib.tampn_dec_free.argtypes = [vp]
        lib.tampn_dec_feed.argtypes = [vp, u8p, i64]
        lib.tampn_dec_feed.restype = cint
        lib.tampn_dec_read.argtypes = [vp, u8p, i64, i64p]
        lib.tampn_dec_read.restype = cint
        lib.tampn_comp_set_callback.argtypes = [vp, CALLBACK_CFUNC, vp]
        lib.tampn_comp_set_callback.restype = None
        lib.tampn_dec_set_callback.argtypes = [vp, CALLBACK_CFUNC, vp]
        lib.tampn_dec_set_callback.restype = None
        lib.tampn_opt_v1_plan.argtypes = [u8p, u8p, i32p, i64, cint, cint, u8p, i64p]
        lib.tampn_opt_v1_plan.restype = cint
        lib.tampn_v1_tables.argtypes = [u8p, i64, u8p, cint, cint, cint, cint,
                                        u32p, u8p, i32p, u8p, i32p]
        lib.tampn_v1_tables.restype = cint
        lib.tampn_opt_ext_plan.argtypes = [u8p, u8p, i32p, u32p, i64p, cint,
                                           i64, cint, cint, u8p, u8p, i64p]
        lib.tampn_opt_ext_plan.restype = cint
        lib.tampn_opt_ext_walk.argtypes = [u8p, i64, cint, i64p, cint,
                                           u8p, u8p, i64p]
        lib.tampn_opt_ext_walk.restype = cint
        lib.tampn_ext_prep.argtypes = [
            u8p, i64, cint, i64p, i64, i64p, u32p, u8p, u8p, i64p,
        ]
        lib.tampn_ext_prep.restype = cint
        lib.tampn_ext_tail_bits.argtypes = [
            u8p, i64, i64, u8p, i64, u32p, i64p, cint, u8p, cint, cint,
            cint, ctypes.c_uint32, cint, u8p, i64, i64p,
        ]
        lib.tampn_ext_tail_bits.restype = cint
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_error() -> str | None:
    _load()
    return _load_error


def _u8p(arr):
    if arr is None:
        return None
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i32p(arr):
    if arr is None:
        return None
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _u32p(arr):
    if arr is None:
        return None
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def _i64p_arr(arr):
    if arr is None:
        return None
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def native_compress(
    data: bytes,
    *,
    window: int = 10,
    literal: int = 8,
    extended: bool = True,
    lazy_matching: bool = False,
    dictionary: bytes | None = None,
    tables=None,
    write_header: bool = True,
    avoid_divergence: bool = False,
    khat=None,
    plan=None,
    force_planned: bool = False,
    exact_tables: bool = False,
) -> bytes:
    """One-shot compression via the native committer.

    ``tables`` is an optional MatchTables (from the TPU search) — without it
    the native engine runs its own exact scalar search.

    ``force_planned`` enables the committer's planned-mode semantics (RLE
    ring-end split, one-shot extended search, boundary capping) even when
    ``plan`` is empty — the tokenization the device planner reproduces
    (ops/plan_ext.py).  Without it an empty plan runs the reference-style
    path (byte parity with the reference encoder when no runs are planned).

    ``exact_tables`` (table mode, extended): post-divergence the table
    candidate only seeds the exact chain search, making the output
    byte-equal to the reference greedy encoder at every config — the
    reference-parity mode of the device-search + native-commit pipeline
    (engine.encode_extended ``reference_parity``)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    from ..constants import compute_min_pattern_size
    from ..exceptions import ExcessBitsError

    compute_min_pattern_size(window, literal)  # validates the config ranges
    arr = np.frombuffer(bytes(data), dtype=np.uint8)
    n = arr.shape[0]
    dict_arr = None
    if dictionary is not None:
        dict_arr = np.frombuffer(bytes(dictionary), dtype=np.uint8)
        if dict_arr.shape[0] != (1 << window):
            raise ValueError("Dictionary-window size mismatch.")

    flen = fidx = plen = pidx = None
    if tables is not None:
        minp = compute_min_pattern_size(window, literal)
        maxpat = minp + (131 if extended else 13)
        if min(16, maxpat) == 16:
            flen, fidx = tables.len16, tables.idx16
        else:
            flen, fidx = tables.len15, tables.idx15
        flen = np.ascontiguousarray(flen, dtype=np.uint8)
        fidx = np.ascontiguousarray(fidx, dtype=np.int32)
        if lazy_matching:
            if tables.probe_len is None:
                raise ValueError("lazy commit requires probe tables")
            plen = np.ascontiguousarray(tables.probe_len, dtype=np.uint8)
            pidx = np.ascontiguousarray(tables.probe_idx, dtype=np.int32)

    khat_p = None
    plan_p = None
    n_plan = 0
    if (plan is not None and len(plan)) or force_planned:
        if khat is None:
            raise ValueError("a run plan requires the khat mapping")
        plan_arr = np.ascontiguousarray(
            plan if plan is not None and len(plan) else np.zeros((1, 2)),
            dtype=np.int64).reshape(-1)
        n_plan = plan_arr.shape[0] // 2 if plan is not None and len(plan) else 0
        plan_p = plan_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    if khat is not None:
        khat_arr = np.ascontiguousarray(khat, dtype=np.uint32)
        khat_p = khat_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))

    # Worst case: header(2) + per byte (1 + literal) bits, rounded up.
    cap = 16 + n + ((n * (1 + literal)) >> 3)
    out = np.empty(cap, dtype=np.uint8)
    out_len = ctypes.c_int64(0)
    rc = lib.tampn_compress(
        _u8p(arr), n, _u8p(flen), _i32p(fidx), _u8p(plen), _i32p(pidx),
        _u8p(dict_arr), window, literal, int(extended), int(lazy_matching),
        int(write_header), int(dictionary is not None), int(avoid_divergence),
        int(exact_tables),
        khat_p, plan_p, n_plan,
        _u8p(out), cap, ctypes.byref(out_len),
    )
    if rc == -2:
        raise ExcessBitsError
    if rc != 0:
        raise RuntimeError(f"native compress failed: rc={rc}")
    return out[: out_len.value].tobytes()


def native_decompress(data: bytes, *, dictionary: bytes | None = None) -> bytearray:
    """One-shot decompression via the native decoder (grow-and-retry)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    arr = np.frombuffer(bytes(data), dtype=np.uint8)
    dict_arr = (
        np.frombuffer(bytes(dictionary), dtype=np.uint8) if dictionary is not None else None
    )
    dict_len = 0 if dict_arr is None else dict_arr.shape[0]
    cap = max(4096, 8 * arr.shape[0])
    while True:
        out = np.empty(cap, dtype=np.uint8)
        out_len = ctypes.c_int64(0)
        rc = lib.tampn_decompress(
            _u8p(arr), arr.shape[0], _u8p(dict_arr), dict_len,
            _u8p(out), cap, ctypes.byref(out_len),
        )
        if rc == 0:
            return bytearray(out[: out_len.value].tobytes())
        if rc == 1:
            cap *= 4
            continue
        if rc == -4:
            from ..exceptions import OutOfBoundsError

            raise OutOfBoundsError("window reference outside the window")
        raise ValueError(f"invalid tamp stream (native rc={rc})")


def native_v1_tables(data, window: int, literal: int, cap: int,
                     dictionary: bytes | None = None,
                     ext_dict: bool = False, khat=None, probe: bool = False):
    """Exact per-position match tables (v1 ring model) at chain-search speed.

    Returns (flen uint8, fidx int32): longest match (0 when shorter than the
    minimum pattern) capped at ``cap``, lowest ring slot among ties — the
    same semantics as engine.search_np.match_tables.  ``ext_dict`` seeds the
    default dictionary with the real literal width (extended-format quirk).
    ``probe=True`` additionally returns (plen, pidx): the lazy probe —
    target ``data[t+1:]``, cap 15, ring state before byte t."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    data = np.ascontiguousarray(data, dtype=np.uint8)
    dict_arr = (
        np.frombuffer(bytes(dictionary), dtype=np.uint8)
        if dictionary is not None else None
    )
    n = data.shape[0]
    flen = np.zeros(max(n, 1), dtype=np.uint8)
    fidx = np.zeros(max(n, 1), dtype=np.int32)
    plen = np.zeros(max(n, 1), dtype=np.uint8) if probe else None
    pidx = np.zeros(max(n, 1), dtype=np.int32) if probe else None
    kh = None
    if khat is not None:
        kh = np.ascontiguousarray(khat, dtype=np.uint32)
        assert kh.shape[0] == n + 1
    rc = lib.tampn_v1_tables(
        _u8p(data), n, _u8p(dict_arr), window, literal, cap,
        1 if ext_dict else 0, _u32p(kh), _u8p(flen), _i32p(fidx),
        _u8p(plen), _i32p(pidx),
    )
    if rc != 0:
        raise ValueError(f"table build failed (native rc={rc})")
    if probe:
        return flen[:n], fidx[:n], plen[:n], pidx[:n]
    return flen[:n], fidx[:n]


def native_ext_prep(data, window: int):
    """One-pass planned-mode prep: (plans (n,2) int64, khat uint32[n+1],
    dh uint8, rc uint8) — semantics identical to engine.plan.plan_runs +
    build_model_history(window_bits=window) + pipeline_ext._chunk_counts
    (the NumPy reference; differential-tested), at C speed."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n = data.shape[0]
    plans = np.zeros((n // 9 + 2, 2), np.int64)
    khat = np.zeros(n + 1, np.uint32)
    dh = np.zeros(max(n, 1), np.uint8)
    rc = np.zeros(max(n, 1), np.uint8)
    n_plans = ctypes.c_int64(0)
    dh_len = ctypes.c_int64(0)
    rcode = lib.tampn_ext_prep(
        _u8p(data), n, window, _i64p_arr(plans), plans.shape[0],
        ctypes.byref(n_plans), _u32p(khat), _u8p(dh), _u8p(rc),
        ctypes.byref(dh_len),
    )
    if rcode != 0:
        raise ValueError(f"ext prep failed (native rc={rcode})")
    k = dh_len.value
    return plans[: n_plans.value], khat, dh[:k], rc[:k]


def native_ext_tail_bits(data, t_in: int, dh, khat, plans, *, window: int,
                         literal: int, acc: int, an: int,
                         lazy: bool = False,
                         dictionary: bytes | None = None) -> bytes:
    """Finish a device-committed planned extended stream from input position
    ``t_in``: run the native planned walk (the semantics owner —
    tampnative.cpp step()/emit_* planned branches) over the remaining
    bytes and return the tail BYTES, with the kernel's <=31-bit remainder
    ``(acc, an)`` stitched in front and the final partial byte zero-padded.

    ``dh``: the model-history stream (data[keep]); only its last window of
    bytes is replayed to reconstruct the ring.  ``plans``: (n, 2) int64
    (rle_start, end) pairs from engine.plan.plan_runs."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    data = np.ascontiguousarray(data, dtype=np.uint8)
    dh = np.ascontiguousarray(dh, dtype=np.uint8)
    kh = np.ascontiguousarray(khat, dtype=np.uint32)
    n = data.shape[0]
    assert kh.shape[0] == n + 1
    pl = np.ascontiguousarray(plans, dtype=np.int64).reshape(-1, 2)
    dict_arr = (np.frombuffer(bytes(dictionary), dtype=np.uint8)
                if dictionary is not None else None)
    kwr = int(kh[t_in])
    # remaining model positions < 16 and tail tokens are tiny; +16 covers
    # the remainder byte(s) and rounding
    cap = (n - t_in) * 2 + 64
    out = np.zeros(cap, dtype=np.uint8)
    written = ctypes.c_int64(0)
    rc = lib.tampn_ext_tail_bits(
        _u8p(data), n, t_in, _u8p(dh), kwr, _u32p(kh), _i64p_arr(pl),
        pl.shape[0], _u8p(dict_arr), window, literal, 1 if lazy else 0,
        ctypes.c_uint32(acc), an, _u8p(out), cap, ctypes.byref(written),
    )
    if rc == -2:
        from ..exceptions import ExcessBitsError

        raise ExcessBitsError
    if rc != 0:
        raise ValueError(f"ext tail walk failed (native rc={rc})")
    return out[: written.value].tobytes()


def native_opt_ext_plan(data, flen, fidx, window: int, literal: int,
                        khat=None, runs=None):
    """Optimal extended-format token plan.

    Token family: literals, basic matches, ring-end-capped extended matches,
    plus forced RLE regions (``runs``: (a, b) pairs over long byte runs,
    window-write-modeled by ``khat``).  Returns (sizes uint8, kinds uint8)
    per token: kind 0 = literal, 1 = basic match, 2 = extended match,
    3 = RLE."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    data = np.ascontiguousarray(data, dtype=np.uint8)
    flen = np.ascontiguousarray(flen, dtype=np.uint8)
    fidx = np.ascontiguousarray(fidx, dtype=np.int32)
    n = data.shape[0]
    if n > (200 << 20):  # DP cost is uint32 bits: <= 9 bits/byte must fit
        raise ValueError("optimal parse is limited to 200 MiB per stream; "
                         "use the sharded container for larger inputs")
    kh = None
    if khat is not None:
        kh = np.ascontiguousarray(khat, dtype=np.uint32)
        assert kh.shape[0] == n + 1
    rn = None
    n_runs = 0
    if runs is not None and len(runs):
        rn = np.ascontiguousarray(np.asarray(runs, np.int64).reshape(-1))
        n_runs = rn.shape[0] // 2
    sizes = np.empty(max(n, 1), dtype=np.uint8)
    kinds = np.empty(max(n, 1), dtype=np.uint8)
    n_tokens = ctypes.c_int64(0)
    rc = lib.tampn_opt_ext_plan(
        _u8p(data), _u8p(flen), _i32p(fidx), _u32p(kh), _i64p_arr(rn), n_runs,
        n, window, literal, _u8p(sizes), _u8p(kinds), ctypes.byref(n_tokens),
    )
    if rc == -2:
        from ..exceptions import ExcessBitsError

        raise ExcessBitsError
    if rc != 0:
        raise ValueError(f"optimal plan failed (native rc={rc})")
    return sizes[: n_tokens.value], kinds[: n_tokens.value]


def native_opt_ext_walk(choice, minp: int, runs=None):
    """Expand a device-DP per-position choice plane into the
    (sizes, kinds) token stream of :func:`native_opt_ext_plan` (forced-RLE
    regions expanded by the same 241/240 chunk rule)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    choice = np.ascontiguousarray(choice, dtype=np.uint8)
    n = choice.shape[0]
    rn = None
    n_runs = 0
    if runs is not None and len(runs):
        rn = np.ascontiguousarray(np.asarray(runs, np.int64).reshape(-1))
        n_runs = rn.shape[0] // 2
    sizes = np.empty(max(n, 1), dtype=np.uint8)
    kinds = np.empty(max(n, 1), dtype=np.uint8)
    n_tokens = ctypes.c_int64(0)
    rc = lib.tampn_opt_ext_walk(
        _u8p(choice), n, minp, _i64p_arr(rn), n_runs,
        _u8p(sizes), _u8p(kinds), ctypes.byref(n_tokens))
    if rc != 0:
        raise ValueError(f"optimal choice walk failed (native rc={rc})")
    return sizes[: n_tokens.value], kinds[: n_tokens.value]


def native_opt_v1_plan(data, flen, fidx, window: int, literal: int) -> np.ndarray:
    """Optimal (minimum-bit) v1 token plan from exact match tables.

    Returns per-token sizes (uint8; 1 = literal).  Raises ExcessBitsError
    when some byte fits neither a literal nor any covering match."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    data = np.ascontiguousarray(data, dtype=np.uint8)
    flen = np.ascontiguousarray(flen, dtype=np.uint8)
    fidx = np.ascontiguousarray(fidx, dtype=np.int32)
    n = data.shape[0]
    if n > (200 << 20):  # DP cost is uint32 bits: <= 9 bits/byte must fit
        raise ValueError("optimal parse is limited to 200 MiB per stream; "
                         "use the sharded container for larger inputs")
    sizes = np.empty(max(n, 1), dtype=np.uint8)
    n_tokens = ctypes.c_int64(0)
    rc = lib.tampn_opt_v1_plan(
        _u8p(data), _u8p(flen), _i32p(fidx), n, window, literal,
        _u8p(sizes), ctypes.byref(n_tokens),
    )
    if rc == -2:
        from ..exceptions import ExcessBitsError

        raise ExcessBitsError
    if rc != 0:
        raise ValueError(f"optimal plan failed (native rc={rc})")
    return sizes[: n_tokens.value]


def native_decompress_into(data: bytes, out, *,
                           dictionary: bytes | None = None) -> int:
    """Decode directly into a caller-provided writable buffer.

    ``out`` is a uint8 NumPy array (or any writable buffer); the stream
    must fit — there is no grow-and-retry.  Returns the byte count written.
    This is the zero-copy path the sharded container decoder uses: every
    worker decodes its shard straight into its slice of the final output
    (the reference's closest analogue is decompressing into a user buffer
    via ``tamp_decompressor_decompress``, tamp/_c_src/tamp/decompressor.c).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    arr = np.frombuffer(bytes(data), dtype=np.uint8)
    dict_arr = (
        np.frombuffer(bytes(dictionary), dtype=np.uint8)
        if dictionary is not None else None
    )
    if not isinstance(out, np.ndarray):
        out = np.frombuffer(out, dtype=np.uint8)
    out_len = ctypes.c_int64(0)
    rc = lib.tampn_decompress(
        _u8p(arr), arr.shape[0],
        _u8p(dict_arr), 0 if dict_arr is None else dict_arr.shape[0],
        _u8p(out), out.shape[0], ctypes.byref(out_len),
    )
    if rc == 0:
        return out_len.value
    if rc == 1:
        raise ValueError("decoded stream exceeds the provided buffer")
    if rc == -4:
        from ..exceptions import OutOfBoundsError

        raise OutOfBoundsError("window reference outside the window")
    raise ValueError(f"invalid tamp stream (native rc={rc})")
