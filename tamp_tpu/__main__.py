"""``python -m tamp_tpu`` — CLI entry point (reference: tamp/__main__.py)."""

from tamp_tpu.cli.main import run_app

run_app()
