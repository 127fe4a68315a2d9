"""Driver/CLI tests: option parsing parity and plotfile-driven rendering."""

import numpy as np
import pytest

import amrvolumerenderer_tpu as avr
from amrvolumerenderer_tpu.driver import (
    main,
    parse_options,
    run_options,
    RunOptions,
)
from amrvolumerenderer_tpu.plotfile import write_plotfile
from amrvolumerenderer_tpu.scene import LevelBox, LevelGeometry


@pytest.fixture
def plotfile(tmp_path):
    n = 16
    coords = np.arange(n) / (n - 1)
    field = (
        coords[:, None, None] ** 2
        + coords[None, :, None] ** 2
        + coords[None, None, :] ** 2
    )
    boxes = [LevelBox(field, np.zeros(3, dtype=int))]
    geom = LevelGeometry(np.zeros(3), np.full(3, 1.0 / n))
    path = str(tmp_path / "plt00000")
    write_plotfile(path, [boxes], [geom], var_names=["density"])
    return path


def test_parse_options_full():
    opts = parse_options(
        [
            "--width", "256", "--height", "128", "--antialiasing", "4",
            "--box-transparency", "0.5", "--no-visibility-graph",
            "--variable", "density", "--min-level", "1", "--max-level", "2",
            "--log-scale", "--up-vector", "0", "0", "1",
            "--output", "out.png", "--print-camera", "plt000",
        ]
    )
    assert opts.parameters.width == 256
    assert opts.parameters.height == 128
    assert opts.parameters.antialiasing == 4
    assert opts.parameters.box_transparency == 0.5
    assert not opts.parameters.use_visibility_graph
    assert opts.variable_name == "density"
    assert opts.min_level == 1 and opts.max_level == 2
    assert opts.log_scale_input
    np.testing.assert_allclose(opts.parameters.camera_up, [0, 0, 1])
    assert opts.output_filename == "out.png"
    assert opts.parameters.print_camera
    assert opts.plotfile_path == "plt000"


def test_parse_options_errors():
    with pytest.raises(RuntimeError, match="unknown option"):
        parse_options(["--bogus", "plt0"])
    with pytest.raises(RuntimeError, match="plotfile path is required"):
        parse_options(["--width", "10"])
    with pytest.raises(RuntimeError, match="multiple plot files"):
        parse_options(["a", "b"])
    with pytest.raises(RuntimeError, match="min level must not exceed"):
        parse_options(["--min-level", "3", "--max-level", "1", "p"])
    with pytest.raises(RuntimeError, match="missing value"):
        parse_options(["p", "--width"])


def test_parse_sampling_flag():
    opts = parse_options(["--sampling", "trilinear", "plt0"])
    assert opts.parameters.sampling == "trilinear"
    with pytest.raises(RuntimeError, match="sampling must be one of"):
        parse_options(["--sampling", "cubic", "plt0"])


def test_cli_trilinear_render(tmp_path, plotfile):
    """--sampling trilinear drives the ghost-ring slicemarch path
    end-to-end from the CLI."""
    out = str(tmp_path / "tri.ppm")
    assert main(
        ["--width", "32", "--height", "32", "--sampling", "trilinear",
         "--render-method", "slicemarch", "--output", out, plotfile]
    ) == 0
    from amrvolumerenderer_tpu.io import load_ppm

    data, w, h = load_ppm(out)
    assert (w, h) == (32, 32)
    assert data.max() > 0.1


def test_main_help(capsys):
    assert main(["--help"]) == 0
    out = capsys.readouterr().out
    assert "Usage: volume_renderer" in out


def test_main_bad_option(capsys):
    assert main(["--nope"]) == 1
    err = capsys.readouterr().err
    assert "Error parsing options" in err


def test_run_options_renders_plotfile(tmp_path, plotfile):
    out = str(tmp_path / "render.ppm")
    options = RunOptions(plotfile_path=plotfile, output_filename=out)
    options.parameters.width = 32
    options.parameters.height = 32
    assert run_options(options, verbose=False) == 0
    from amrvolumerenderer_tpu.io import load_ppm

    data, w, h = load_ppm(out)
    assert (w, h) == (32, 32)
    assert data.max() > 0.1


def test_python_render_kwargs(tmp_path, plotfile):
    out = str(tmp_path / "py.ppm")
    code = avr.render(
        plotfile, width=32, height=32, output=out,
        camera_eye=(3.0, 2.0, 3.0), camera_look_at=(0.5, 0.5, 0.5),
    )
    assert code == 0
    from amrvolumerenderer_tpu.io import load_ppm

    data, _, _ = load_ppm(out)
    assert data.max() > 0.1


def test_python_render_camera_requires_eye_and_lookat(plotfile):
    with pytest.raises(ValueError, match="camera_eye and camera_look_at"):
        avr.render(plotfile, camera_fov_y=30.0)


def test_compute_histogram_dict(plotfile):
    result = avr.compute_histogram(plotfile, bins=32)
    assert len(result["counts"]) == 32
    assert result["samples"] == 16**3
    assert result["normalized_range"] == [0.0, 1.0]
    assert result["processed_range"] is not None
    assert result["original_range"] is not None


def test_scalar_range_override(tmp_path, plotfile):
    out = str(tmp_path / "sr.ppm")
    assert avr.render(
        plotfile, width=24, height=24, output=out, scalar_range=(0.5, 2.0)
    ) == 0


def test_color_map_kwarg(tmp_path, plotfile):
    out = str(tmp_path / "cm.ppm")
    assert avr.render(
        plotfile, width=24, height=24, output=out,
        color_map=[(0.0, 0, 0, 1, 0.1), (3.0, 1, 0, 0, 0.8)],
    ) == 0


def test_cli_end_to_end_png_with_aa(tmp_path, plotfile, capsys):
    out = str(tmp_path / "cli.png")
    code = main([
        "--width", "32", "--height", "32", "--antialiasing", "4",
        "--output", out, "--print-camera", plotfile,
    ])
    assert code == 0
    captured = capsys.readouterr().out
    assert "Camera parameters (automatic):" in captured
    assert "Render: per-box rendering took" in captured
    assert "Render: visibility graph computation took" in captured
    assert "Render: compositing took" in captured
    assert "Saved volume composited image to" in captured
    from amrvolumerenderer_tpu.io import load_png

    data, w, h = load_png(out)
    assert (w, h) == (32, 32)
    assert data.max() > 0.1


def test_cli_multilevel_plotfile(tmp_path):
    """Write a 2-level plotfile, render levels selectively via the CLI."""
    rng = np.random.default_rng(8)
    coarse = [LevelBox(rng.random((8, 8, 8)), np.zeros(3, dtype=int))]
    fine = [LevelBox(rng.random((8, 8, 8)), np.array([4, 4, 4]))]
    geoms = [
        LevelGeometry(np.zeros(3), np.full(3, 1.0 / 8)),
        LevelGeometry(np.zeros(3), np.full(3, 1.0 / 16)),
    ]
    path = str(tmp_path / "plt2l")
    write_plotfile(path, [coarse, fine], geoms, ref_ratios=[2])

    out = str(tmp_path / "ml.ppm")
    assert main(["--width", "24", "--height", "24", "--max-level", "0",
                 "--output", out, path]) == 0
    assert main(["--width", "24", "--height", "24", "--min-level", "1",
                 "--output", out, path]) == 0
    assert main(["--width", "24", "--height", "24", "--log-scale",
                 "--box-transparency", "0.3", "--output", out, path]) == 0


def test_run_options_validation_errors(tmp_path, plotfile):
    from amrvolumerenderer_tpu.types import CameraParameters, color_map_from_tuples

    base = dict(plotfile_path=plotfile, output_filename=str(tmp_path / "x.ppm"))

    opts = RunOptions(**base)
    opts.output_filename = ""
    with pytest.raises(ValueError, match="output filename"):
        run_options(opts, verbose=False)

    opts = RunOptions(**base)
    opts.scalar_range = (2.0, 1.0)
    with pytest.raises(ValueError, match="min < max"):
        run_options(opts, verbose=False)

    opts = RunOptions(**base)
    opts.camera = CameraParameters(eye=(0, 0, 1), look_at=(0, 0, 0),
                                   up=(0, 0, 1))  # up parallel to view
    with pytest.raises(ValueError, match="parallel"):
        run_options(opts, verbose=False)

    opts = RunOptions(**base)
    opts.camera = CameraParameters(eye=(0, 0, 1), look_at=(0, 0, 0),
                                   up=(0, 1, 0), fov_y_degrees=200.0)
    with pytest.raises(ValueError, match="fov"):
        run_options(opts, verbose=False)

    opts = RunOptions(**base)
    opts.camera = CameraParameters(eye=(0, 0, 1), look_at=(0, 0, 0),
                                   up=(0, 1, 0), near_plane=-1.0)
    with pytest.raises(ValueError, match="near plane"):
        run_options(opts, verbose=False)

    opts = RunOptions(**base)
    opts.camera = CameraParameters(eye=(0, 0, 1), look_at=(0, 0, 0),
                                   up=(0, 1, 0), near_plane=1.0, far_plane=0.5)
    with pytest.raises(ValueError, match="far plane"):
        run_options(opts, verbose=False)

    opts = RunOptions(**base)
    opts.plotfile_path = "/nonexistent/plt"
    with pytest.raises(RuntimeError, match="does not exist"):
        run_options(opts, verbose=False)

    opts = RunOptions(**base)
    opts.min_level = 3
    opts.max_level = 1
    with pytest.raises(RuntimeError, match="min level must not exceed"):
        run_options(opts, verbose=False)


def test_log_scale_colormap_requires_positive_values(tmp_path, plotfile):
    from amrvolumerenderer_tpu.types import color_map_from_tuples

    opts = RunOptions(
        plotfile_path=plotfile, output_filename=str(tmp_path / "x.ppm"),
        log_scale_input=True,
        color_map=color_map_from_tuples(
            [(-1.0, 0, 0, 0, 0.1), (1.0, 1, 1, 1, 0.5)]
        ),
    )
    with pytest.raises(ValueError, match="positive when log"):
        run_options(opts, verbose=False)


def test_cli_trace_dir(tmp_path, plotfile):
    """--trace-dir captures a profiler trace around the render."""
    from amrvolumerenderer_tpu.driver import main

    trace = tmp_path / "trace"
    out = tmp_path / "t.ppm"
    assert main([
        "--width", "16", "--height", "16", "--trace-dir", str(trace),
        "--output", str(out), plotfile,
    ]) == 0
    assert out.exists()
    assert any(trace.rglob("*"))


def test_cli_trace_dir_requires_value(plotfile):
    from amrvolumerenderer_tpu.driver import parse_options

    with pytest.raises(RuntimeError):
        parse_options(["--trace-dir"])


def test_render_kwargs_sampling_classification(tmp_path, plotfile):
    """Module-level render() exposes the beyond-reference sampling and
    classification kwargs alongside the exact reference surface."""
    import amrvolumerenderer_tpu as avr

    import os

    out = str(tmp_path / "mod.ppm")
    assert avr.render(plotfile, width=16, height=16, output=out,
                      sampling="trilinear", classification="pre") == 0
    assert os.path.exists(out)
    with pytest.raises(ValueError):
        avr.render(plotfile, width=16, height=16, output=out,
                   classification="pre")  # nearest + pre rejected


class TestDistributedEntry:
    """Multi-host entry point (main.cpp:19-36 mpirun surface): env-gated
    jax.distributed.initialize; virtually validated (single host here)."""

    def test_disabled_by_default(self, monkeypatch):
        from amrvolumerenderer_tpu.driver import maybe_initialize_distributed

        monkeypatch.delenv("AVR_DISTRIBUTED", raising=False)
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        assert maybe_initialize_distributed(verbose=False) is False

    def test_explicit_coordinator_spec(self, monkeypatch):
        import jax

        from amrvolumerenderer_tpu.driver import maybe_initialize_distributed

        calls = {}

        def fake_initialize(**kwargs):
            calls.update(kwargs)

        monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
        monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
        monkeypatch.setenv("JAX_PROCESS_ID", "2")
        assert maybe_initialize_distributed(verbose=False) is True
        assert calls == dict(
            coordinator_address="10.0.0.1:1234", num_processes=4,
            process_id=2,
        )

    def test_pod_autodetect(self, monkeypatch):
        import jax

        from amrvolumerenderer_tpu.driver import maybe_initialize_distributed

        called = []
        monkeypatch.setattr(
            jax.distributed, "initialize", lambda **kw: called.append(kw)
        )
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.setenv("AVR_DISTRIBUTED", "1")
        assert maybe_initialize_distributed(verbose=False) is True
        assert called == [{}]


class TestOrbitCLI:
    """--orbit-frames: batched orbit animation from the product CLI."""

    def test_parse_orbit_flags(self):
        opts = parse_options(
            ["--orbit-frames", "12", "--orbit-degrees", "180", "plt"]
        )
        assert opts.orbit_frames == 12
        assert opts.orbit_degrees == 180.0

    def test_parse_orbit_validation(self):
        with pytest.raises(RuntimeError):
            parse_options(["--orbit-frames", "0", "plt"])
        with pytest.raises(ValueError):
            parse_options(["--orbit-frames", "plt"])  # non-integer value
        with pytest.raises(RuntimeError):
            parse_options(["--orbit-degrees", "nan", "plt"])

    def test_orbit_renders_frames(self, tmp_path, plotfile):
        out = str(tmp_path / "orbit.ppm")
        options = RunOptions(plotfile_path=plotfile, output_filename=out)
        options.parameters.width = 32
        options.parameters.height = 32
        options.orbit_frames = 4
        assert run_options(options, verbose=False) == 0
        from amrvolumerenderer_tpu.io import load_ppm

        frames = []
        for i in range(4):
            data, w, h = load_ppm(str(tmp_path / f"orbit_{i:04d}.ppm"))
            assert (w, h) == (32, 32)
            frames.append(data)
        assert frames[0].max() > 0.1
        # the camera moves: successive frames must differ
        assert any(
            not np.array_equal(frames[0], frames[k]) for k in (1, 2, 3)
        )

    def test_orbit_frame0_matches_single_render(self, tmp_path, plotfile):
        """Frame 0 of an orbit is the base camera exactly, so it must be
        byte-identical to a single render on the same kernel family."""
        out_single = str(tmp_path / "single.ppm")
        options = RunOptions(
            plotfile_path=plotfile, output_filename=out_single
        )
        options.parameters.width = 32
        options.parameters.height = 32
        options.parameters.render_method = "slicemarch"
        assert run_options(options, verbose=False) == 0

        out_orbit = str(tmp_path / "orbit.ppm")
        options2 = RunOptions(
            plotfile_path=plotfile, output_filename=out_orbit
        )
        options2.parameters.width = 32
        options2.parameters.height = 32
        options2.orbit_frames = 3
        assert run_options(options2, verbose=False) == 0

        single = open(out_single, "rb").read()
        frame0 = open(str(tmp_path / "orbit_0000.ppm"), "rb").read()
        assert single == frame0

    def test_orbit_rejects_raymarch(self, tmp_path, plotfile):
        options = RunOptions(
            plotfile_path=plotfile,
            output_filename=str(tmp_path / "o.ppm"),
        )
        options.parameters.render_method = "raymarch"
        options.orbit_frames = 2
        with pytest.raises(ValueError, match="fast kernel family"):
            run_options(options, verbose=False)

    def test_orbit_multidevice_matches_single(self, tmp_path, plotfile):
        """devices=8 orbit frames are pixel-identical to single-device."""
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs the virtual 8-device mesh")
        base = RunOptions(
            plotfile_path=plotfile,
            output_filename=str(tmp_path / "one.ppm"),
        )
        base.parameters.width = 32
        base.parameters.height = 32
        base.orbit_frames = 2
        assert run_options(base, verbose=False) == 0

        multi = RunOptions(
            plotfile_path=plotfile,
            output_filename=str(tmp_path / "multi.ppm"),
        )
        multi.parameters.width = 32
        multi.parameters.height = 32
        multi.parameters.devices = 8
        multi.orbit_frames = 2
        assert run_options(multi, verbose=False) == 0
        for i in range(2):
            a = open(str(tmp_path / f"one_{i:04d}.ppm"), "rb").read()
            b = open(str(tmp_path / f"multi_{i:04d}.ppm"), "rb").read()
            assert a == b, f"frame {i} differs across device counts"

    def test_python_render_orbit_kwarg(self, tmp_path, plotfile):
        code = avr.render(
            plotfile, width=32, height=32,
            output=str(tmp_path / "anim.ppm"),
            orbit_frames=2, orbit_degrees=180.0,
        )
        assert code == 0
        assert (tmp_path / "anim_0000.ppm").exists()
        assert (tmp_path / "anim_0001.ppm").exists()
        with pytest.raises(ValueError):
            avr.render(plotfile, output=str(tmp_path / "x.ppm"),
                       orbit_frames=-3)
