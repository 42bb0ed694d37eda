"""Test harness: CPU backend with 8 virtual devices (sharding tests) + x64.

Mirrors the serial-vs-MPI cross-check strategy of the reference (SURVEY.md §4)
on a virtual mesh: every sharded code path must reproduce the single-device
result to f64 roundoff.

The session environment may pin JAX at a real TPU (axon plugin sets
jax_platforms programmatically at interpreter start); unit tests must run on
CPU regardless, so we override the config *after* importing jax but before any
backend initialization.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
