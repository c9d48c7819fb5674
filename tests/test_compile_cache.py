"""Persistent XLA-executable cache (utils/profiling.py): the config
round-trips and a jitted program writes an on-disk entry that a second
trace can hit. Behind the device relay each unique program costs minutes
to compile, so cache correctness is a measurement-infrastructure
guarantee, not a nicety."""

import os

import jax
import jax.numpy as jnp

from feta_tmlr_tpu.utils.profiling import enable_persistent_compile_cache


def test_cache_enable_and_populate(tmp_path):
    cache_dir = str(tmp_path / "xla_cache")
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_on = jax.config.jax_enable_compilation_cache
    assert enable_persistent_compile_cache(cache_dir, min_compile_secs=0.0)
    try:
        assert jax.config.jax_compilation_cache_dir == cache_dir

        @jax.jit
        def f(x):
            return (x * 2.0 + 1.0).sum()

        assert float(f(jnp.arange(8.0))) == 64.0
        # the executable landed on disk (cpu backend also serializes)
        entries = []
        for root, _, files in os.walk(cache_dir):
            entries += files
        assert entries, "no cache entry written"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min)
        jax.config.update("jax_enable_compilation_cache", prev_on)
