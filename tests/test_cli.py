"""CLI smoke tests (in-process; CPU platform via conftest)."""

import numpy as np

from vit_fpga_tpu.cli import main


def test_cli_help_on_unknown():
    assert main([]) == 2
    assert main(["nope"]) == 2


def test_cli_parity(capsys):
    assert main(["parity", "n_ins=16"]) == 0
    out = capsys.readouterr().out
    assert "bit-exact=True" in out
    assert "f32 device vs oracle" in out


def test_cli_demo(capsys):
    assert main(["demo", "n_ins=16"]) == 0
    out = capsys.readouterr().out
    assert "forward:" in out and "train:" in out and "pipeline:" in out
    assert "FIFO=[0, 1, 2, 3]" in out


def test_cli_calibrate(capsys):
    from vit_fpga_tpu.cli import main
    rc = main(["calibrate", "model=vit_ti16", "image=32",
               "dtype=float32"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "softmax mode:" in out


def test_cli_serve_int8(capsys):
    """cli serve dtype=int8 runs the quantized engine end-to-end."""
    from vit_fpga_tpu import cli
    rc = cli.main(["serve", "model=vit_ti16", "image=32", "batch=4",
                   "images=8", "dtype=int8"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "dtype=int8" in out


def test_bench_sigterm_emits_partial_artifact(monkeypatch, capsys):
    """A harness-timeout SIGTERM mid-extras still emits the headline JSON.

    bench.py's 7 configs cold-compile in ~15-25 min through the tunnel; if
    the driver's timeout fires during the extras loop, the artifact must
    carry the headline + completed extras rather than nothing.
    """
    import json
    import os
    import signal
    import sys

    import pytest

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    calls = []

    def fake_run(opts):
        calls.append(1)
        if len(calls) == 1:  # headline
            return {"metric": "m", "value": 1.0,
                    "unit": "images/sec/chip", "vs_baseline": 0.5}
        if len(calls) == 3:  # mid-extras: simulate the driver's timeout
            os.kill(os.getpid(), signal.SIGTERM)
        return {"metric": f"extra{len(calls)}", "value": 2.0}

    monkeypatch.setattr(bench, "run", fake_run)
    prev = signal.getsignal(signal.SIGTERM)
    try:
        with pytest.raises(SystemExit) as ei:
            bench.main([])
        assert ei.value.code == 0
    finally:
        signal.signal(signal.SIGTERM, prev)

    line = capsys.readouterr().out.strip().splitlines()[-1]
    data = json.loads(line)
    assert data["unit"] == "images/sec/chip"
    assert data["extras"]["truncated"].startswith("SIGTERM")
    # The first extra completed before the signal; later ones are absent.
    assert "int8_throughput" in data["extras"]
    assert "train" not in data["extras"]


def test_bench_extras_cover_all_driver_configs(monkeypatch, capsys):
    """The driver artifact must record every headline surface: int8
    dynamic/static throughput, bf16/int8/int8-static b1 latency, train
    (VERDICT r4 #1 put mode=train in the driver extras — keep it there)."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    seen = []

    def fake_run(opts):
        seen.append(1)
        if len(seen) == 1:
            return {"metric": "m", "value": 1.0,
                    "unit": "images/sec/chip", "vs_baseline": 0.5}
        return {"metric": f"extra{len(seen)}", "value": 2.0}

    monkeypatch.setattr(bench, "run", fake_run)
    bench.main([])
    data = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(data["extras"]) == {
        "int8_throughput", "int8_static_throughput", "bf16_latency",
        "int8_latency", "int8_static_latency", "train"}
