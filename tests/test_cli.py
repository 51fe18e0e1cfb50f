"""CLI smoke tests: the exe-level surface of the reference
(render_command.ml:16-47 flag stack, ppm.ml:17-54 Stdlib.Arg flags,
ply_describe.ml:10-95 output) driven end-to-end at tiny sizes on CPU.
"""
import os

import numpy as np

from pathtracer_tpu import cli
from pathtracer_tpu.io import ply


def test_shirley_cli(tmp_path, capsys):
    out = os.path.join(tmp_path, "s.png")
    cli.run_shirley(["-d", "64,32", "--samples-per-pixel", "1",
                     "-o", out, "--no-progress"])
    stdout = capsys.readouterr().out
    assert "dim = 64 x 32;" in stdout
    assert "#spheres = 531" in stdout
    assert "build time =" in stdout
    assert "rendered in:" in stdout
    assert os.path.getsize(out) > 100


def test_shirley_cli_interpreter_ab(tmp_path, capsys):
    """--interpreter (the reference's --no-simd analog) must render the
    same scene through the plain-XLA path."""
    out = os.path.join(tmp_path, "i.png")
    cli.run_shirley(["-d", "48,24", "-o", out, "--no-progress",
                     "--interpreter"])
    assert os.path.getsize(out) > 100


def test_cornell_cli_and_checkpoint(tmp_path, capsys):
    out = os.path.join(tmp_path, "c.png")
    ckpt = os.path.join(tmp_path, "c.npz")
    cli.run_cornell(["-width", "48", "-height", "48", "-iterations", "1",
                     "-photon-count", "500", "-o", out, "-no-progress",
                     "-checkpoint", ckpt])
    stdout = capsys.readouterr().out
    assert "render time =" in stdout
    assert os.path.getsize(out) > 100
    ck = np.load(ckpt)
    assert int(ck["next_iteration"]) == 1
    assert ck["img_sum"].shape == (48, 48, 3)


def test_ganesha_cli_stop_after_bvh(capsys):
    cli.run_ganesha(["-ganesha-ply", "scenes/test_ganesha.ply",
                     "-stop-after-bvh", "-no-progress"])
    stdout = capsys.readouterr().out
    assert "#triangles =" in stdout
    assert "tree depth =" in stdout
    assert "build time =" in stdout
    assert "leaf lengths =" in stdout
    assert "((size" in stdout            # histogram in reference format
    assert "Stop after bvh build" in stdout


def test_ply_describe_cli(tmp_path, capsys):
    path = os.path.join(tmp_path, "m.ply")
    rs = np.random.RandomState(0)
    verts = rs.uniform(-1, 1, (16, 3))
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    ply.write_mesh(path, verts, faces)
    cli.run_ply_describe([path])
    stdout = capsys.readouterr().out
    assert "format =" in stdout
    assert "element vertex (count 16)" in stdout
    assert "property" in stdout


def test_shard_photon_map_flag_mapping():
    """-shard-photon-map: absent -> off, bare -> host mode, ring -> ring."""
    import argparse

    from pathtracer_tpu.cli import _shard_mode, add_ppm_args

    p = argparse.ArgumentParser()
    add_ppm_args(p)
    assert _shard_mode(p.parse_args([])) is False
    assert _shard_mode(p.parse_args(["-shard-photon-map"])) is True
    assert _shard_mode(p.parse_args(["-shard-photon-map", "ring"])) == "ring"
