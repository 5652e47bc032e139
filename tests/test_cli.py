"""CLI + JSON config + PPM pipeline (reference CLI smoke test analogue;
.github/workflows/linux-build.yml CLI smoke run of examples/simple_volume.json).
"""

import json
import os

import numpy as np
import pytest

from dvren_tpu.cli import main
from dvren_tpu.core.status import DvrenError
from dvren_tpu.core.plan import InterpMode, OobPolicy, SamplingMode
from dvren_tpu.io.config import parse_config_file
from dvren_tpu.io.ppm import read_ppm, write_ppm

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parse_example_config():
    cfg = parse_config_file(os.path.join(REPO, "examples/simple_volume.json"))
    assert cfg.plan.width == 4 and cfg.plan.height == 4
    assert cfg.plan.sampling.dt == pytest.approx(0.1)
    assert cfg.plan.sampling.max_steps == 16
    assert cfg.plan.sampling.mode == SamplingMode.FIXED
    assert cfg.grid.resolution == (2, 2, 2)
    assert len(np.asarray(cfg.grid.sigma)) == 8
    assert cfg.grid.interp == InterpMode.LINEAR
    assert cfg.grid.oob == OobPolicy.ZERO
    assert cfg.options.use_fused_path
    assert cfg.output_path == "simple.ppm"


def test_color_defaults_to_grayscale_density(tmp_path):
    config = {
        "render": {"width": 2, "height": 2, "t_far": 1.0, "dt": 0.25,
                   "max_steps": 4},
        "volume": {"size": [2, 2, 2],
                   "density": [0.1] * 8},
    }
    p = tmp_path / "c.json"
    p.write_text(json.dumps(config))
    cfg = parse_config_file(p)
    color = np.asarray(cfg.grid.color).reshape(-1, 3)
    np.testing.assert_allclose(color, 0.1)


def test_cli_end_to_end(tmp_path, capsys):
    out = tmp_path / "out.ppm"
    rc = main([os.path.join(REPO, "examples/simple_volume.json"), str(out)])
    assert rc == 0
    captured = capsys.readouterr()
    assert "Forward stats: rays=16" in captured.out
    assert "Workspace bytes total=" in captured.out
    img = read_ppm(out)
    assert img.shape == (4, 4, 3)
    assert img.max() > 0  # something rendered


def test_cli_procedural_volume(tmp_path, capsys):
    out = tmp_path / "smoke.ppm"
    rc = main([os.path.join(REPO, "examples/smoke_volume.json"), str(out)])
    assert rc == 0
    img = read_ppm(out)
    assert img.shape == (64, 64, 3)
    assert img.std() > 0.01  # structured content


def test_cli_missing_config(capsys):
    rc = main(["/nonexistent/config.json"])
    assert rc == 1
    assert "error:" in capsys.readouterr().err


def test_cli_usage(capsys):
    assert main([]) == 2


def test_ppm_roundtrip(tmp_path):
    img = np.random.default_rng(0).uniform(0, 1, (5, 7, 3)).astype(np.float32)
    p = tmp_path / "x.ppm"
    write_ppm(p, img)
    back = read_ppm(p)
    assert back.shape == (5, 7, 3)
    assert np.abs(back - np.clip(img, 0, 1)).max() <= 0.5 / 255 + 1e-6


def test_bad_config_raises():
    with pytest.raises(DvrenError):
        parse_config_file("/nonexistent.json")


def test_cli_use_window_option_matches_default(tmp_path, capsys):
    base = json.load(open(os.path.join(REPO, "examples/simple_volume.json")))
    base.setdefault("render", {}).setdefault("options", {})[
        "use_window"] = True
    cfg_path = tmp_path / "win.json"
    cfg_path.write_text(json.dumps(base))
    out_win = tmp_path / "win.ppm"
    assert main([str(cfg_path), str(out_win)]) == 0
    out_ref = tmp_path / "ref.ppm"
    assert main([os.path.join(REPO, "examples/simple_volume.json"),
                 str(out_ref)]) == 0
    np.testing.assert_array_equal(read_ppm(out_win), read_ppm(out_ref))
