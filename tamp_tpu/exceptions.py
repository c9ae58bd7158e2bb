"""Exception types for tamp-tpu."""


class ExcessBitsError(Exception):
    """Provided data has more bits than the configured ``literal`` bits."""


class OutOfBoundsError(ValueError):
    """A decoded window reference points outside the valid window (strict mode).

    Raised by the native decoder only — mirroring the reference, whose C
    implementation rejects such streams (TAMP_OOB, decompressor.c:536-544)
    while its pure-Python decoder reads them permissively."""
