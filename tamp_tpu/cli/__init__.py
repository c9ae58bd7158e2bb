"""Command-line interface for tamp-tpu."""
