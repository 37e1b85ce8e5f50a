"""CLI argument validation (reference tests/test_scripts.py:206-285
error semantics) plus an end-to-end CLI run."""

import json
import sqlite3
import subprocess
import sys

import pytest

from gdal2mbtiles_spark.cli import (color_arg, colorize_band_arg,
                                    parse_args, png8_arg)


class TestArgValidation:
    def test_color_arg(self):
        import argparse
        assert color_arg("0:#ff00ff") == (0.0, (255, 0, 255, 255))
        assert color_arg("255:red") == (255.0, (255, 0, 0, 255))
        with pytest.raises(argparse.ArgumentTypeError,
                           match="must be in format"):
            color_arg("nocolon")
        with pytest.raises(argparse.ArgumentTypeError,
                           match="not a valid number"):
            color_arg("x:red")
        with pytest.raises(argparse.ArgumentTypeError,
                           match="not a valid HTML color"):
            color_arg("0:notacolor")

    def test_colorize_band_arg(self):
        import argparse
        assert colorize_band_arg("2") == 2
        with pytest.raises(argparse.ArgumentTypeError):
            colorize_band_arg("x")
        with pytest.raises(argparse.ArgumentTypeError,
                           match="must be 1 or greater"):
            colorize_band_arg("0")

    def test_png8_arg(self):
        import argparse
        assert png8_arg("256") == 256
        assert png8_arg(None) is None
        with pytest.raises(argparse.ArgumentTypeError):
            png8_arg("x")
        with pytest.raises(ValueError, match="between 2 and 256"):
            png8_arg("1")

    def test_color_coloring_pairing(self, capsys):
        # --color without --coloring
        with pytest.raises(SystemExit):
            parse_args(["in.json", "--color", "0:red"])
        assert "must provide --coloring" in capsys.readouterr().err
        # --coloring without --color
        with pytest.raises(SystemExit):
            parse_args(["in.json", "--coloring", "exact"])
        assert ("must provide at least one --color"
                in capsys.readouterr().err)

    def test_defaults(self):
        args = parse_args(["input.json"])
        assert args.OUTPUT == "input.mbtiles"
        assert args.name == "input.json"
        assert args.layer_type == "overlay"
        assert args.fill_borders is True
        args = parse_args(["input.json", "--no-fill-borders"])
        assert args.fill_borders is False


class TestCliEndToEnd:
    def test_synthetic_world_to_mbtiles(self, tmp_path):
        desc = tmp_path / "world.json"
        desc.write_text(json.dumps(
            {"kind": "synthetic", "xsize": 512, "ysize": 512}))
        out = tmp_path / "world.mbtiles"
        res = subprocess.run(
            [sys.executable, "-m", "gdal2mbtiles_spark.cli",
             str(desc), str(out), "--cores", "4",
             "--min-resolution", "0", "--name", "world"],
            capture_output=True, text=True, cwd="/root/repo",
            timeout=300)
        assert res.returncode == 0, res.stderr[-2000:]
        c = sqlite3.connect(out)
        counts = dict(c.execute(
            "SELECT zoom_level, count(*) FROM tiles GROUP BY 1"))
        assert counts == {0: 1, 1: 4}
        md = dict(c.execute("SELECT name, value FROM metadata"))
        assert md["name"] == "world"
        assert md["x-minzoom"] == "0" and md["x-maxzoom"] == "1"
