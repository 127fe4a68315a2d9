"""Cross-round golden anchor for the full render-path matrix (VERDICT r4 #6).

The per-run cross-path tests (test_fuzz_cross_path) validate the kernels
against each other, so a pixel regression shared by ALL paths is invisible
to them.  This suite re-renders the r^2 insitu scene through every path —
raymarch / slicemarch / tilemarch x 1 / 8 devices x float32 / ubyte x
pre-blend on / off — and asserts against pixels STORED in
tests/golden/manifest_pixels.npz (generated once, committed; regenerate
only after an intentional, reviewed pixel-semantics change via
scripts/generate_golden_manifest.py).

Tolerance contract mirrors the reference's image tests
(Common/Testing/ImageFullTest.cpp:56-85): stored pixels are the record,
compared at a tight atol that allows FP reassociation from library updates
but fails on any real pixel change (the smallest historical ordering bug
moved pixels by ~0.1).
"""

import hashlib
import json
import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


@pytest.fixture(scope="module")
def manifest():
    with open(os.path.join(GOLDEN_DIR, "manifest.json")) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def stored():
    return dict(np.load(os.path.join(GOLDEN_DIR, "manifest_pixels.npz")))


@pytest.fixture(scope="module")
def rendered(manifest):
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from scripts.generate_golden_manifest import WIDTH, render_matrix

    assert WIDTH == manifest["width"]
    return render_matrix()


def test_manifest_integrity(manifest, stored):
    """The committed npz must match the committed checksums — a stale or
    hand-edited pixel store fails before any render runs."""
    assert set(manifest["paths"]) == set(stored)
    for name, meta in manifest["paths"].items():
        digest = hashlib.sha256(
            np.ascontiguousarray(stored[name]).tobytes()
        ).hexdigest()
        assert digest == meta["sha256"], name
        assert list(stored[name].shape) == meta["shape"], name


def test_manifest_covers_matrix(manifest):
    """Every dimension of the path matrix is anchored."""
    names = set(manifest["paths"])
    for required in (
        "raymarch-1dev", "slicemarch-1dev", "tilemarch-1dev",
        "slicemarch-8dev-depth-f32", "slicemarch-8dev-layered-f32",
        "slicemarch-8dev-depth-ubyte",
        "persistent-8dev-preblend", "persistent-8dev-plain",
    ):
        assert required in names


def test_all_paths_match_stored_pixels(manifest, stored, rendered):
    """THE anchor: every path's pixels equal the stored round-N pixels."""
    atol = float(manifest["atol"])
    assert set(rendered) == set(stored)
    failures = []
    for name in sorted(rendered):
        got, ref = rendered[name], stored[name]
        if got.shape != ref.shape:
            failures.append(f"{name}: shape {got.shape} vs {ref.shape}")
            continue
        # background depth is +inf by contract; the non-finite PATTERN
        # must match exactly and finite entries compare at atol
        if not np.array_equal(np.isfinite(got), np.isfinite(ref)):
            failures.append(f"{name}: non-finite pattern changed")
            continue
        finite = np.isfinite(ref)
        delta = float(np.abs(got[finite] - ref[finite]).max())
        if not (delta <= atol):
            failures.append(f"{name}: max |diff| {delta:.3e} > {atol:.0e}")
    assert not failures, "golden drift:\n" + "\n".join(failures)


def test_stored_frames_nonempty(manifest, stored):
    for name, meta in manifest["paths"].items():
        assert stored[name][:, 3].max() > 0.0, name
        assert meta["nonzero_alpha_frac"] > 0.2, name
