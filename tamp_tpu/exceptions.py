"""Exception types for tamp-tpu."""


class ExcessBitsError(Exception):
    """Provided data has more bits than the configured ``literal`` bits."""


class OutOfBoundsError(Exception):
    """A decoded window reference points outside the valid window (strict mode)."""
