"""Build shim for the native extension (config lives in pyproject.toml)."""

from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "bz2tpu.native._bz2dec",
            sources=["bz2tpu/native/_bz2dec.c"],
            extra_compile_args=["-O3", "-Wall"],
        )
    ]
)
