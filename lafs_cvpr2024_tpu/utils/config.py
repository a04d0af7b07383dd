"""TOML config files for the CLIs.

The reference scatters configuration across two argparse trees, a config
dict, and hard-coded in-body booleans (SURVEY §5). Here every flag is a real
CLI option AND can come from a TOML file: ``--config run.toml`` loads the
file's ``[train]`` table as argparse defaults (explicit CLI flags still win).
"""

from __future__ import annotations

import argparse
import tomllib
from typing import Optional


def apply_toml_defaults(
    parser: argparse.ArgumentParser,
    argv: Optional[list] = None,
    table: str = "train",
):
    """Parse args with optional ``--config file.toml`` defaults.

    TOML keys use underscores or dashes (``batch_size`` / ``batch-size``).
    Unknown keys raise, catching typos early.
    """
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--config", default=None)
    known, rest = pre.parse_known_args(argv)
    if known.config:
        with open(known.config, "rb") as f:
            data = tomllib.load(f)
        section = data.get(table, data)
        valid = {
            a.dest for a in parser._actions  # noqa: SLF001 — argparse has no public API
        }
        defaults = {}
        for k, v in section.items():
            dest = k.replace("-", "_")
            if dest not in valid:
                raise ValueError(f"unknown config key {k!r} in {known.config}")
            defaults[dest] = v
        parser.set_defaults(**defaults)
    parser.add_argument("--config", default=known.config,
                        help="TOML file with flag defaults")
    return parser.parse_args(rest)


def resolve_mlp_impl(choice: str) -> str:
    """'auto' → the LN-fused pallas MLP on TPU backends (measured fastest:
    126.7 vs 129.0 ms SSL step — docs/PERF.md §fused-ln), dense elsewhere
    (the fused kernels fall back to slow interpret mode off-TPU)."""
    if choice != "auto":
        return choice
    import jax

    return "fused_ln" if jax.default_backend() == "tpu" else "dense"
