"""Exception types for tamp-tpu."""


class ExcessBitsError(Exception):
    """Provided data has more bits than the configured ``literal`` bits."""


class AbortedError(Exception):
    """A progress callback requested abort of an in-flight native stream call.

    The stream state stays token-consistent across the abort, so the same
    call may simply be reissued to resume (reference parallel: a nonzero
    tamp_callback_t return propagating out of tamp_compressor_compress_cb,
    tamp/_c_src/tamp/common.h:184-210)."""


class OutOfBoundsError(ValueError):
    """A decoded window reference points outside the valid window (strict mode).

    Raised by the native decoder only — mirroring the reference, whose C
    implementation rejects such streams (TAMP_OOB, decompressor.c:536-544)
    while its pure-Python decoder reads them permissively."""
