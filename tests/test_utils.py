"""utils: metrics, device info, profiling, distributed no-op."""

import json
import pytest
import time

import jax


def test_run_metrics_json():
    from bz2tpu.utils.metrics import RunMetrics

    m = RunMetrics(op="compress", level=9)
    m.input_bytes, m.output_bytes = 1000, 100
    with m.stage("bwt"):
        time.sleep(0.01)
    m.seconds = 0.5
    d = json.loads(m.to_json())
    assert d["ratio"] == 0.1
    assert d["mb_per_s"] == 0.002
    assert d["stages"]["bwt"] >= 0.01


def test_clock():
    from bz2tpu.utils.metrics import Clock

    c = Clock()
    time.sleep(0.01)
    assert c.elapsed() >= 0.01


def test_device_info():
    from bz2tpu.utils.device import device_info, print_device_banner

    infos = device_info()
    assert len(infos) == len(jax.devices())
    assert all("platform" in i for i in infos)
    import io

    buf = io.StringIO()
    print_device_banner(file=buf)
    assert "device" in buf.getvalue()


def test_device_trace_noop():
    from bz2tpu.utils.profiling import device_trace, fence

    with device_trace(None):
        x = jax.numpy.ones(8) * 2
    fence(x)


def test_distributed_single_process_noop():
    from bz2tpu.parallel.distributed import initialize, is_primary

    initialize()  # no coordinator -> no-op
    assert is_primary()


def test_atomic_output(tmp_path):
    from bz2tpu.utils.atomic import atomic_output

    target = tmp_path / "out.bin"
    with atomic_output(str(target)) as f:
        f.write(b"hello")
        assert not target.exists()  # nothing visible until clean exit
    assert target.read_bytes() == b"hello"
    assert list(tmp_path.iterdir()) == [target]  # temp cleaned up

    with pytest.raises(RuntimeError):
        with atomic_output(str(target)) as f:
            f.write(b"partial")
            raise RuntimeError("boom")
    assert target.read_bytes() == b"hello"  # untouched on failure
    assert list(tmp_path.iterdir()) == [target]


def test_bench_corpus_deterministic():
    import bench

    assert bench.make_text(10_000, 42) == bench.make_text(10_000, 42)
    assert bench.make_text(10_000, 42) != bench.make_text(10_000, 43)


def test_scaling_efficiency():
    from bz2tpu.utils.metrics import scaling_efficiency

    assert scaling_efficiency({1: 2.0, 2: 3.6, 4: 6.4}) == {1: 1.0, 2: 0.9, 4: 0.8}
    assert scaling_efficiency({2: 5.0}) == {}
