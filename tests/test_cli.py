"""CLI tests: benchmark suites and the one-shot compress/decompress file
modes, driven through demo.main (the surface a user types at)."""

import numpy as np
import pytest

from bitar_tpu.cli import demo
from bitar_tpu.parallel import multihost
from bitar_tpu.utils import profiling


@pytest.fixture
def input_file(tmp_path, rng):
    data = (b"cli test payload! " * 400
            + bytes(rng.integers(0, 256, 3000, dtype=np.uint8))
            + b"\x00" * 2000)
    p = tmp_path / "input.bin"
    p.write_bytes(data)
    return p, data


def run_cli(args):
    return demo.main([str(a) for a in args])


def test_cli_sync_suite(input_file, capsys):
    path, _ = input_file
    rc = run_cli(["--file", path, "--mode", "sync", "--codec", "lz4",
                  "--block-size", "1024", "--backend", "host"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "sync verify OK" in out
    assert "ratio=" in out


def test_cli_async_suite(input_file, capsys):
    path, _ = input_file
    rc = run_cli(["--file", path, "--mode", "async", "--codec", "snappy",
                  "--block-size", "1024", "--backend", "host",
                  "--streams", "3"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "async verify OK" in out


def test_cli_compress_decompress_files(input_file, tmp_path, capsys):
    path, data = input_file
    comp_path = tmp_path / "out.btpu"
    rc = run_cli(["--file", path, "--mode", "compress", "--codec", "lz4",
                  "--block-size", "1024", "--backend", "host",
                  "--checksum", "crc32", "--output", comp_path])
    assert rc == 0
    assert comp_path.exists()
    assert comp_path.stat().st_size < len(data)

    out_path = tmp_path / "restored.bin"
    rc = run_cli(["--file", comp_path, "--mode", "decompress",
                  "--block-size", "1024", "--backend", "host",
                  "--output", out_path])
    assert rc == 0
    assert out_path.read_bytes() == data


def test_cli_parquet_ingest(tmp_path, capsys):
    pa = pytest.importorskip("pyarrow")
    import pyarrow.parquet as pq

    table = pa.table({"x": np.arange(20_000), "y": np.arange(20_000) % 7})
    p = tmp_path / "t.parquet"
    pq.write_table(table, p)
    rc = run_cli(["--file", p, "--mode", "sync", "--block-size", "4096",
                  "--backend", "host"])
    assert rc == 0
    assert "sync verify OK" in capsys.readouterr().out


def test_cli_rejects_missing_file(tmp_path):
    with pytest.raises(FileNotFoundError):
        run_cli(["--file", tmp_path / "nope.bin", "--mode", "sync",
                 "--backend", "host"])


def test_multihost_single_process():
    topo = multihost.initialize()
    assert topo["process_count"] == 1
    start, stop = multihost.partition_blocks(100)
    assert (start, stop) == (0, 100)
    spans = multihost.process_spans(100, process_count=4)
    assert spans.tolist() == [[0, 25], [25, 50], [50, 75], [75, 100]]
    # uneven split covers everything without overlap
    spans = multihost.process_spans(10, process_count=3)
    assert spans[-1].tolist()[1] == 10
    assert all(spans[i][1] == spans[i + 1][0] for i in range(2))


def test_profiling_noop_and_annotation():
    with profiling.device_trace(None) as d:
        assert d is None
    with profiling.annotate("unit-test-region"):
        pass
