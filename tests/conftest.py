"""Test configuration: force the 8-device host-CPU backend before any jax
backend initializes (TPU hardware is not required for the test suite; the
sharding tests use a virtual 8-device CPU mesh)."""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["SHOTGUN_TPU_PLATFORM"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def tiny_fasta() -> str:
    return (
        ">genomeA\n"
        "ACGTACGTACGTACGTCCCC\n"
        ">genomeB\n"
        "ACGTACGTACGTACGTGGGG\n"
        ">genomeC\n"
        "TTTTTTTTTTTTTTTTTTTT\n"
    )


@pytest.fixture
def tiny_fastq() -> str:
    return (
        "@read1\n"
        "ACGTACGTACGTACGTCCCC\n"
        "+\n"
        "IIIIIIIIIIIIIIIIIIII\n"
        "@read2\n"
        "TTTTTTTTTTTTTTTTTT\n"
        "+\n"
        "IIIIIIIIIIIIIIIIII\n"
    )
