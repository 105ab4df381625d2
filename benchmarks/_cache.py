"""Persistent compilation cache for benchmark processes.

The fused-kernel programs take minutes to compile (Mosaic + XLA); the r2
benchmark artifacts came back empty because runs were killed mid-compile.
Every benchmark entry point calls enable_cache() first so repeat runs pay
compile once per machine (.jax_cache for CPU, .jax_cache_tpu for TPU --
both gitignored).
"""

import os

import jax


def enable_cache():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    name = ".jax_cache" if jax.default_backend() == "cpu" else \
        ".jax_cache_tpu"
    jax.config.update("jax_compilation_cache_dir", os.path.join(root, name))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
