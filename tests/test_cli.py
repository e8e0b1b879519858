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
