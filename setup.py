"""Build script for the native extensions (metadata lives in
pyproject.toml). Build in place with:

    python setup.py build_ext --inplace
"""

from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "evcouplings_tpu.native._fasta",
            sources=["native/fasta_io.c"],
            depends=["native/io_common.h"],
            include_dirs=["native"],
            extra_compile_args=["-O3"],
        ),
        Extension(
            "evcouplings_tpu.native._stockholm",
            sources=["native/stockholm_io.c"],
            depends=["native/io_common.h"],
            include_dirs=["native"],
            extra_compile_args=["-O3"],
        ),
    ],
)
