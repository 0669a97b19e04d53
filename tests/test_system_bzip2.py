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


def test_system_accepts_device_intake_streams(rng):
    # The fully-device pipeline's output must decode with the real binary.
    from bz2tpu.runtime.compressor import compress_device_intake

    data = make_corpus(rng, "text", 150_000)
    out = compress_device_intake(data, level=1, parallel=2)
    r = _bzip2(["-dc"], out)
    assert r.returncode == 0 and r.stdout == data


def test_device_decode_accepts_system_streams(rng, tmp_path):
    from bz2tpu.runtime.device_decode import decompress_device

    data = make_corpus(rng, "text", 150_000)
    p = tmp_path / "x"
    p.write_bytes(data)
    r = subprocess.run([BZIP2, "-1", "-c", str(p)], capture_output=True, timeout=120)
    assert r.returncode == 0
    assert decompress_device(r.stdout) == data
