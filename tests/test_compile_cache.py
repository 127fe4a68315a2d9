"""Persistent compilation cache wiring (utils/compile_cache.py).

The product surface is one process per render (the reference launches its
binary per job, main.cpp:19-36); the on-disk executable cache is what makes
a relaunch at a seen configuration skip the compile.  These tests pin the
config plumbing and that a cached CPU executable is actually written and
re-read across processes.
"""

from __future__ import annotations

import importlib
import os
import subprocess
import sys

import jax


def _fresh_module():
    from amrvolumerenderer_tpu.utils import compile_cache

    importlib.reload(compile_cache)
    return compile_cache


def test_enable_sets_cache_dir(tmp_path, monkeypatch):
    monkeypatch.delenv("AVR_COMPILE_CACHE", raising=False)
    mod = _fresh_module()
    target = str(tmp_path / "xla")
    prev = jax.config.jax_compilation_cache_dir
    try:
        assert mod.enable_persistent_compile_cache(target) == target
        assert os.path.isdir(target)
        assert jax.config.jax_compilation_cache_dir == target
        # idempotent: second call reports the configured dir, ignores args
        assert mod.enable_persistent_compile_cache("/elsewhere") == target
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_env_off_disables(monkeypatch):
    monkeypatch.setenv("AVR_COMPILE_CACHE", "off")
    mod = _fresh_module()
    prev = jax.config.jax_compilation_cache_dir
    assert mod.enable_persistent_compile_cache() is None
    assert jax.config.jax_compilation_cache_dir == prev


def test_env_dir_used(tmp_path, monkeypatch):
    target = str(tmp_path / "envxla")
    monkeypatch.setenv("AVR_COMPILE_CACHE", target)
    mod = _fresh_module()
    prev = jax.config.jax_compilation_cache_dir
    try:
        assert mod.enable_persistent_compile_cache() == target
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


_CHILD = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from amrvolumerenderer_tpu.utils.compile_cache import (
    enable_persistent_compile_cache,
)
# run the (idempotent) product enable first, then force caching of every
# compile regardless of wall time so the tiny CPU render is eligible (the
# product default only caches >= 0.5 s compiles)
enable_persistent_compile_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import numpy as np
from amrvolumerenderer_tpu import api
from amrvolumerenderer_tpu.scene import LevelBox, LevelGeometry

n = 8
c = np.arange(n) / (n - 1)
f = (c[:, None, None] + c[None, :, None] + c[None, None, :]) / 3.0
data = api.AmrData(
    level_data=[[LevelBox(f, np.zeros(3, dtype=int))]],
    level_geometry=[LevelGeometry(np.zeros(3), np.full(3, 1.0 / n))],
)
options = api.RenderOptions(width=32, height=32, output_filename=sys.argv[2])
image, _ = api.render(data, options, verbose=False)
print("OK", float(np.asarray(image.pixels).sum()))
"""


def test_cache_round_trip_across_processes(tmp_path):
    """Two fresh processes, same render: the second must HIT the cache
    (jax logs misses only; a hit writes nothing new)."""
    cache = tmp_path / "xla"
    env = dict(os.environ)
    env["AVR_COMPILE_CACHE"] = str(cache)
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo, env.get("PYTHONPATH")) if p
    )
    script = tmp_path / "child.py"
    script.write_text(_CHILD)

    def run(tag):
        out = subprocess.run(
            [sys.executable, str(script), tag, str(tmp_path / f"{tag}.ppm")],
            env=env,
            capture_output=True,
            text=True,
            timeout=600,
        )
        assert out.returncode == 0, out.stderr
        return out.stdout

    run("first")
    entries = {p.name: p.stat().st_mtime_ns for p in cache.iterdir()}
    assert entries, "first process wrote no cache entries"
    run("second")
    after = {p.name: p.stat().st_mtime_ns for p in cache.iterdir()}
    # the second process re-used the first's executables: no new entries
    assert set(after) == set(entries)
