"""Shared helpers for the benchmark scripts (no heavy imports here —
bench_ijb_scoring is numpy-only and must not drag jax in)."""

import sys


def _flag(name, default, cast=float):
    """Minimal ``--name value`` argv reader (the benchmarks are exit-code
    gates driven by the round scripts; argparse would be ceremony)."""
    if name in sys.argv:
        return cast(sys.argv[sys.argv.index(name) + 1])
    return default
