"""Differential tests against the system bzip2 binary (not just stdlib)."""

import shutil
import subprocess

import pytest

from conftest import make_corpus

BZIP2 = shutil.which("bzip2")
pytestmark = pytest.mark.skipif(BZIP2 is None, reason="no system bzip2")


def _bzip2(args, data):
    return subprocess.run([BZIP2, *args], input=data, capture_output=True, timeout=120)


def test_system_accepts_our_streams(rng):
    from bz2tpu.oracle import compress

    data = make_corpus(rng, "text", 120_000)
    out = compress(data, level=1)
    r = _bzip2(["-dc"], out)
    assert r.returncode == 0 and r.stdout == data


def test_we_accept_system_streams(rng):
    from bz2tpu.runtime.decompressor import decompress

    data = make_corpus(rng, "runs", 120_000)
    r = _bzip2(["-9", "-c"], data)
    assert r.returncode == 0
    assert decompress(r.stdout) == data


def test_system_integrity_check_passes(rng):
    from bz2tpu.oracle import compress

    data = make_corpus(rng, "alternating", 60_000)
    r = _bzip2(["-t"], compress(data, level=1))
    assert r.returncode == 0, r.stderr
