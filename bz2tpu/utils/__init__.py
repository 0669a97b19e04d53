"""Cross-cutting helpers: JAX environment setup, timing, metrics."""

from bz2tpu.utils.jaxenv import setup_compilation_cache  # noqa: F401
