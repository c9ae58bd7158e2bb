"""Native streaming codec classes.

File-like incremental compression/decompression over the C++ engine — the
native analogue of :class:`tamp_tpu.Compressor` / ``Decompressor`` (and of
the reference's Cython bindings over its C stream machinery).  Output is
byte-identical to the Python streaming codec (both match the reference
encoder), so the two are interchangeable.
"""

from __future__ import annotations

import ctypes
import io

import numpy as np

from ..constants import compute_min_pattern_size
from ..exceptions import AbortedError, ExcessBitsError, OutOfBoundsError

__all__ = ["NativeCompressor", "NativeDecompressor"]

_ABORT_RC = -100  # trampoline abort code: outside the engine's own statuses


def _make_trampoline(owner, callback):
    """Wrap a Python cb(bytes_in, bytes_out) as a C callback.

    A truthy return (or an exception, stashed on ``owner`` for re-raise)
    aborts the in-flight native call with ``_ABORT_RC``.
    """
    from . import CALLBACK_CFUNC

    def tramp(_user, bytes_in, bytes_out):
        try:
            return _ABORT_RC if callback(bytes_in, bytes_out) else 0
        except BaseException as e:  # propagate through the C frame
            owner._cb_exc = e
            return _ABORT_RC

    return CALLBACK_CFUNC(tramp)


def _raise_abort(owner):
    exc, owner._cb_exc = getattr(owner, "_cb_exc", None), None
    if exc is not None:
        raise exc
    raise AbortedError("progress callback requested abort")


def _lib():
    from . import _load, _load_error

    lib = _load()
    if lib is None:
        from . import load_error

        raise RuntimeError(f"native library unavailable: {load_error()}")
    return lib


def _u8(buf):
    return buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


class NativeCompressor:
    """Incremental Tamp compressor writing to a binary file object."""

    def __init__(
        self,
        f,
        *,
        window: int = 10,
        literal: int = 8,
        dictionary=None,
        dictionary_reset: bool = False,
        lazy_matching: bool = False,
        extended: bool = True,
        append: bool = False,
    ):
        compute_min_pattern_size(window, literal)  # validates the config
        if append and not dictionary_reset:
            raise ValueError("append=True requires dictionary_reset=True")
        if append and dictionary is not None:
            raise ValueError("append=True cannot use a custom dictionary")
        self._close_f = False
        if not hasattr(f, "write"):  # path-like
            f = open(str(f), "wb")
            self._close_f = True
        self.f = f
        self.dictionary_reset = dictionary_reset
        lib = _lib()
        dict_arr = None
        if dictionary is not None:
            dict_arr = np.frombuffer(bytes(dictionary), dtype=np.uint8)
            if dict_arr.shape[0] != (1 << window):
                raise ValueError("Dictionary-window size mismatch.")
        self._h = lib.tampn_comp_new(
            window, literal, int(extended), int(lazy_matching),
            None if dict_arr is None else _u8(dict_arr),
            int(dictionary_reset), int(append),
        )
        self._lib = lib
        self._out = np.empty(1 << 16, dtype=np.uint8)
        self._cb_ref = None
        self._cb_exc = None

    def set_progress_callback(self, callback) -> None:
        """Register ``cb(bytes_in, bytes_out)`` fired every ~256 tokens.

        ``bytes_in``/``bytes_out`` are cumulative input consumed / output
        emitted.  A truthy return aborts the in-flight ``write()``/
        ``flush()`` with :class:`~tamp_tpu.exceptions.AbortedError`; the
        stream stays token-consistent, so the call may be reissued to
        resume.  Pass ``None`` to clear.  (Native observability parity
        with the Python codec's per-token callbacks and the reference's
        tamp_callback_t, tamp/_c_src/tamp/common.h:184-210.)
        """
        from . import CALLBACK_CFUNC

        if callback is None:
            self._cb_ref = None
            self._lib.tampn_comp_set_callback(
                self._h, ctypes.cast(None, CALLBACK_CFUNC), None)
            return
        self._cb_ref = _make_trampoline(self, callback)
        self._lib.tampn_comp_set_callback(self._h, self._cb_ref, None)

    def _call(self, fn, *head, drain_head=None) -> int:
        """Invoke a native stream entry point, draining the output buffer.

        On OUTPUT_FULL (rc=1) the call repeats with ``drain_head`` (for
        write: empty input — re-passing the data would duplicate it).
        """
        written = 0
        args = head
        while True:
            n = ctypes.c_int64(0)
            rc = fn(self._h, *args, _u8(self._out), self._out.shape[0],
                    ctypes.byref(n))
            if n.value:
                self.f.write(self._out[: n.value].tobytes())
                written += n.value
            if rc == 0:
                return written
            if rc == 1:
                if drain_head is not None:
                    args = drain_head
                continue  # output buffer filled; drain again
            if rc == -2:
                raise ExcessBitsError
            if rc == _ABORT_RC:
                _raise_abort(self)
            raise RuntimeError(f"native stream error rc={rc}")

    def write(self, data) -> int:
        data = bytes(data)
        arr = np.frombuffer(data, dtype=np.uint8)
        n = arr.shape[0]
        return self._call(
            self._lib.tampn_comp_write, _u8(arr) if n else None,
            ctypes.c_int64(n),
            drain_head=(None, ctypes.c_int64(0)),
        )

    def flush(self, write_token: bool = True) -> int:
        # After write() returns, pending input is < one look-ahead (~16 B +
        # token state), so flush/reset output always fits one drain buffer
        # and their rc=1 retry path is unreachable through this wrapper.
        return self._call(self._lib.tampn_comp_flush, int(write_token))

    def reset_dictionary(self) -> int:
        if not self.dictionary_reset:
            raise ValueError(
                "Compressor was not initialized with dictionary_reset=True"
            )
        return self._call(self._lib.tampn_comp_reset_dictionary)

    def close(self) -> int:
        if self._h is None:
            return 0
        written = self.flush(write_token=self.dictionary_reset)
        self._lib.tampn_comp_free(self._h)
        self._h = None
        if self._close_f:
            self.f.close()
        return written

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        self.close()

    def __del__(self):
        if getattr(self, "_h", None) is not None:
            self._lib.tampn_comp_free(self._h)
            self._h = None


class NativeDecompressor:
    """Incremental Tamp decompressor reading from a binary file object."""

    def __init__(self, f, *, dictionary=None):
        self._close_f = False
        if isinstance(f, (bytes, bytearray)):
            f = io.BytesIO(f)
        elif not hasattr(f, "read"):  # path-like
            f = open(str(f), "rb")
            self._close_f = True
        self.f = f
        lib = _lib()
        dict_arr = None
        n_dict = 0
        if dictionary is not None:
            dict_arr = np.frombuffer(bytes(dictionary), dtype=np.uint8)
            n_dict = dict_arr.shape[0]
        self._h = lib.tampn_dec_new(
            None if dict_arr is None else _u8(dict_arr), n_dict
        )
        self._lib = lib
        self._eof = False
        self._cb_ref = None
        self._cb_exc = None
        # Eager header read (1 byte + the reserved byte when more_header is
        # set), mirroring the reference Cython binding's construct-time
        # validation (reference tamp/_c_decompressor.pyx:50-61): a missing
        # or undersized dictionary raises here, not mid-stream.
        hdr = self.f.read(1)
        if hdr:
            if hdr[0] & 1:
                hdr += self.f.read(1)
            arr = np.frombuffer(hdr, dtype=np.uint8)
            lib.tampn_dec_feed(self._h, _u8(arr), arr.shape[0])
            out = np.empty(1, dtype=np.uint8)
            n = ctypes.c_int64(0)
            rc = lib.tampn_dec_read(self._h, _u8(out), 0, ctypes.byref(n))
            if rc != 0:
                raise ValueError(
                    "invalid header or dictionary-window size mismatch "
                    f"(native rc={rc})"
                )
        else:
            self._eof = True

    def set_progress_callback(self, callback) -> None:
        """Register ``cb(bytes_in, bytes_out)`` fired every ~1024 tokens.

        Same contract as :meth:`NativeCompressor.set_progress_callback`:
        cumulative counters, truthy return aborts the in-flight ``read()``
        with :class:`~tamp_tpu.exceptions.AbortedError`, state stays
        token-consistent so reading may resume.  Pass ``None`` to clear.
        """
        from . import CALLBACK_CFUNC

        if callback is None:
            self._cb_ref = None
            self._lib.tampn_dec_set_callback(
                self._h, ctypes.cast(None, CALLBACK_CFUNC), None)
            return
        self._cb_ref = _make_trampoline(self, callback)
        self._lib.tampn_dec_set_callback(self._h, self._cb_ref, None)

    def readinto(self, buf) -> int:
        view = memoryview(buf)
        out = np.empty(len(view), dtype=np.uint8)
        filled = 0
        while filled < len(view):
            n = ctypes.c_int64(0)
            rc = self._lib.tampn_dec_read(
                self._h, _u8(out), len(view) - filled, ctypes.byref(n)
            )
            if rc == -4:
                raise OutOfBoundsError("window reference outside the window")
            if rc == _ABORT_RC:
                # bytes decoded before the abort stay delivered in ``buf``
                if n.value:
                    view[filled : filled + n.value] = out[: n.value].tobytes()
                _raise_abort(self)
            if rc != 0:
                raise ValueError(f"invalid tamp stream (native rc={rc})")
            if n.value:
                view[filled : filled + n.value] = out[: n.value].tobytes()
                filled += n.value
                continue
            if self._eof:
                break
            chunk = self.f.read(1 << 16)
            if not chunk:
                self._eof = True
                continue
            arr = np.frombuffer(chunk, dtype=np.uint8)
            self._lib.tampn_dec_feed(self._h, _u8(arr), arr.shape[0])
        return filled

    def read(self, size: int = -1) -> bytearray:
        if size < 0:
            out = bytearray()
            chunk = bytearray(1 << 16)
            while True:
                n = self.readinto(chunk)
                out += chunk[:n]
                if n < len(chunk):
                    return out
        buf = bytearray(size)
        n = self.readinto(buf)
        del buf[n:]
        return buf

    def close(self) -> None:
        if self._h is not None:
            self._lib.tampn_dec_free(self._h)
            self._h = None
        if self._close_f:
            self.f.close()
            self._close_f = False

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        self.close()

    def __del__(self):
        if getattr(self, "_h", None) is not None:
            self._lib.tampn_dec_free(self._h)
            self._h = None
