"""Plotfile reader/writer and convexify tests."""

import os

import numpy as np
import pytest

from amrvolumerenderer_tpu.amr import IndexBox, box_subtract, convexify
from amrvolumerenderer_tpu.plotfile import read_plotfile_header, write_plotfile
from amrvolumerenderer_tpu.scene import LevelBox, LevelGeometry


def test_box_subtract_no_overlap():
    box = IndexBox((0, 0, 0), (7, 7, 7))
    cut = IndexBox((10, 10, 10), (12, 12, 12))
    assert box_subtract(box, cut) == [box]


def test_box_subtract_center_hole():
    box = IndexBox((0, 0, 0), (7, 7, 7))
    cut = IndexBox((2, 2, 2), (5, 5, 5))
    pieces = box_subtract(box, cut)
    # complement is covered exactly once
    total = sum(np.prod(p.shape()) for p in pieces)
    assert total == 8**3 - 4**3
    for p in pieces:
        assert not p.intersect(cut).valid()


def test_box_subtract_full_cover():
    box = IndexBox((2, 2, 2), (5, 5, 5))
    cut = IndexBox((0, 0, 0), (7, 7, 7))
    assert box_subtract(box, cut) == []


def test_convexify_two_levels():
    coarse = LevelBox(np.arange(8**3, dtype=np.float64).reshape(8, 8, 8),
                      np.array([0, 0, 0]))
    fine = LevelBox(np.ones((8, 8, 8)), np.array([4, 4, 4]))  # covers coarse (2:6)^3
    out = convexify([[coarse], [fine]], [(2, 2, 2)])
    assert len(out[1]) == 1
    total = sum(np.prod(b.data.shape) for b in out[0])
    assert total == 8**3 - 4**3
    # cropped data matches the original field
    for b in out[0]:
        lo = b.lo
        np.testing.assert_array_equal(
            b.data,
            coarse.data[
                lo[0] : lo[0] + b.data.shape[0],
                lo[1] : lo[1] + b.data.shape[1],
                lo[2] : lo[2] + b.data.shape[2],
            ],
        )


def test_convexify_single_level_is_identity():
    box = LevelBox(np.ones((4, 4, 4)), np.zeros(3, dtype=int))
    out = convexify([[box]], [])
    assert len(out) == 1 and len(out[0]) == 1
    np.testing.assert_array_equal(out[0][0].data, box.data)


def test_plotfile_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    boxes = [
        LevelBox(rng.random((8, 8, 8)), np.array([0, 0, 0])),
        LevelBox(rng.random((8, 8, 8)), np.array([8, 0, 0])),
    ]
    geom = LevelGeometry(prob_lo=np.zeros(3), cell_size=np.full(3, 1.0 / 16))
    path = str(tmp_path / "plt00000")
    write_plotfile(path, [boxes], [geom], var_names=["density"])

    pf = read_plotfile_header(path)
    assert pf.var_names == ["density"]
    assert pf.finest_level == 0
    np.testing.assert_allclose(pf.cell_sizes[0], geom.cell_size)
    back = pf.get_level_boxes(0, "density")
    assert len(back) == 2
    for orig, rb in zip(boxes, back):
        np.testing.assert_allclose(rb.data, orig.data.astype(np.float32), atol=1e-7)
        np.testing.assert_array_equal(rb.lo, orig.lo)


def test_plotfile_multilevel_multivar(tmp_path):
    rng = np.random.default_rng(5)
    coarse = [LevelBox(rng.random((8, 8, 8, 2)), np.array([0, 0, 0]))]
    fine = [LevelBox(rng.random((8, 8, 8, 2)), np.array([4, 4, 4]))]
    geoms = [
        LevelGeometry(np.zeros(3), np.full(3, 1.0 / 8)),
        LevelGeometry(np.zeros(3), np.full(3, 1.0 / 16)),
    ]
    path = str(tmp_path / "plt00010")
    write_plotfile(
        path, [coarse, fine], geoms, var_names=["density", "temperature"],
        ref_ratios=[2],
    )
    pf = read_plotfile_header(path)
    assert pf.finest_level == 1
    assert pf.ref_ratios == [2]
    temp = pf.get_level_boxes(1, "temperature")
    np.testing.assert_allclose(
        temp[0].data, fine[0].data[..., 1].astype(np.float32), atol=1e-7
    )


def test_plotfile_missing_variable(tmp_path):
    boxes = [LevelBox(np.ones((4, 4, 4)), np.zeros(3, dtype=int))]
    geom = LevelGeometry(np.zeros(3), np.full(3, 0.25))
    path = str(tmp_path / "plt0")
    write_plotfile(path, [boxes], [geom])
    pf = read_plotfile_header(path)
    with pytest.raises(ValueError, match="not found"):
        pf.get_level_boxes(0, "pressure")


def test_convexify_three_levels():
    """Chained chopping: level 0 against level 1, level 1 against level 2."""
    l0 = LevelBox(np.ones((8, 8, 8)), np.zeros(3, dtype=int))
    l1 = LevelBox(np.full((8, 8, 8), 2.0), np.array([4, 4, 4]))  # covers l0 (2:6)^3
    l2 = LevelBox(np.full((8, 8, 8), 3.0), np.array([12, 12, 12]))  # coarsened to l1 index space: (6,6,6)-(9,9,9)
    out = convexify([[l0], [l1], [l2]], [(2, 2, 2), (2, 2, 2)])
    # finest level intact
    assert len(out[2]) == 1
    # level 1 loses the region covered by level 2 (4^3 cells in l1 space)
    l1_cells = sum(np.prod(b.data.shape) for b in out[1])
    assert l1_cells == 8**3 - 4**3
    # level 0 loses the region covered by level 1 (4^3 cells in l0 space)
    l0_cells = sum(np.prod(b.data.shape) for b in out[0])
    assert l0_cells == 8**3 - 4**3
    # every produced box carries its source level's data value
    for level, expect in ((0, 1.0), (1, 2.0), (2, 3.0)):
        for b in out[level]:
            assert np.all(b.data == expect)


def test_box_subtract_property_random(rng):
    """Property test: subtraction pieces are disjoint, inside the box, and
    together with the cut cover exactly the original cells (the amrex::Box
    algebra contract)."""
    for _ in range(50):
        lo = rng.integers(-4, 4, 3)
        hi = lo + rng.integers(1, 8, 3)
        clo = rng.integers(-6, 6, 3)
        chi = clo + rng.integers(1, 10, 3)
        box = IndexBox(tuple(lo), tuple(hi))
        cut = IndexBox(tuple(clo), tuple(chi))
        pieces = box_subtract(box, cut)

        def cells(b):
            return {
                (x, y, z)
                for x in range(b.lo[0], b.hi[0] + 1)
                for y in range(b.lo[1], b.hi[1] + 1)
                for z in range(b.lo[2], b.hi[2] + 1)
            }

        box_cells = cells(box)
        cut_cells = cells(cut)
        got = set()
        for p in pieces:
            pc = cells(p)
            assert not (pc & got), "pieces overlap"
            assert pc <= box_cells, "piece escapes the box"
            assert not (pc & cut_cells), "piece overlaps the cut"
            got |= pc
        assert got == box_cells - cut_cells


def test_convexify_property_random(rng):
    """Convexified levels tile space: every coarse cell under fine coverage
    is removed exactly once, data values are preserved per cell."""
    for trial in range(10):
        n = 8
        coarse_data = rng.random((n, n, n))
        coarse = LevelBox(coarse_data, np.zeros(3, dtype=int))
        # 1-2 random fine boxes in the 2x refined index space
        fines = []
        for _ in range(int(rng.integers(1, 3))):
            lo = rng.integers(0, 2 * n - 4, 3)
            shape = rng.integers(2, 6, 3)
            hi = np.minimum(lo + shape, 2 * n)
            fines.append(
                LevelBox(rng.random(tuple(hi - lo)), lo.astype(int))
            )
        out = convexify([[coarse], fines], [(2, 2, 2)])

        covered = np.zeros((n, n, n), dtype=int)
        for b in out[0]:
            lo = b.lo
            s = b.data.shape
            covered[lo[0]:lo[0]+s[0], lo[1]:lo[1]+s[1], lo[2]:lo[2]+s[2]] += 1
            np.testing.assert_array_equal(
                b.data,
                coarse_data[lo[0]:lo[0]+s[0], lo[1]:lo[1]+s[1],
                            lo[2]:lo[2]+s[2]],
            )
        # fine footprint in coarse cells
        fine_mask = np.zeros((n, n, n), dtype=bool)
        for f in fines:
            l0 = f.lo // 2
            h0 = (f.lo + np.asarray(f.data.shape) - 1) // 2
            fine_mask[l0[0]:h0[0]+1, l0[1]:h0[1]+1, l0[2]:h0[2]+1] = True
        np.testing.assert_array_equal(covered, (~fine_mask).astype(int))


class TestMalformedInputs:
    """Untrusted-input hardening: every corruption mode must raise a
    clean, descriptive ValueError/RuntimeError/OSError — never a bare
    StopIteration/AssertionError, and never an attempted huge
    allocation.  (The reference validates its inputs exhaustively and
    fail-fasts, VolumeRenderer.cpp:1341-1462.)"""

    @pytest.fixture
    def valid(self, tmp_path):
        from amrvolumerenderer_tpu.plotfile import write_plotfile
        from amrvolumerenderer_tpu.scene import LevelBox, LevelGeometry

        base = str(tmp_path / "plt_ok")
        n = 8
        f = np.arange(n ** 3, dtype=np.float64).reshape(n, n, n)
        write_plotfile(
            base, [[LevelBox(f, np.zeros(3, dtype=int))]],
            [LevelGeometry(np.zeros(3), np.full(3, 1.0 / n))],
            var_names=["density"],
        )
        return base

    def _clone(self, valid, tmp_path, tag):
        import shutil

        dst = str(tmp_path / tag)
        shutil.copytree(valid, dst)
        return dst

    def _expect_clean(self, path):
        from amrvolumerenderer_tpu.plotfile import read_plotfile_header

        with pytest.raises((ValueError, RuntimeError, OSError)):
            pf = read_plotfile_header(path)
            pf.get_level_boxes(0, "density")

    def test_truncated_header(self, valid, tmp_path):
        d = self._clone(valid, tmp_path, "trunc_hdr")
        p = os.path.join(d, "Header")
        data = open(p, "rb").read()
        open(p, "wb").write(data[: len(data) // 3])
        self._expect_clean(d)

    def test_garbage_header(self, valid, tmp_path):
        d = self._clone(valid, tmp_path, "garbage_hdr")
        open(os.path.join(d, "Header"), "w").write("not a plotfile\n42\n")
        self._expect_clean(d)

    def test_truncated_fab(self, valid, tmp_path):
        import glob

        d = self._clone(valid, tmp_path, "trunc_fab")
        for fab in glob.glob(d + "/Level_0/*_D_*"):
            data = open(fab, "rb").read()
            open(fab, "wb").write(data[: len(data) // 2])
        self._expect_clean(d)

    def test_huge_declared_dims(self, valid, tmp_path):
        """A header declaring absurd box dims must fail on the payload
        size check, not attempt an exabyte allocation."""
        d = self._clone(valid, tmp_path, "huge_dims")
        p = os.path.join(d, "Level_0", "Cell_H")
        text = open(p).read()
        open(p, "w").write(text.replace("7", "999999"))
        self._expect_clean(d)

    def test_missing_fab_file(self, valid, tmp_path):
        import glob

        d = self._clone(valid, tmp_path, "missing_fab")
        for fab in glob.glob(d + "/Level_0/*_D_*"):
            os.remove(fab)
        self._expect_clean(d)

    def test_garbage_fab_header(self, valid, tmp_path):
        import glob

        d = self._clone(valid, tmp_path, "garbage_fab")
        for fab in glob.glob(d + "/Level_0/*_D_*"):
            data = open(fab, "rb").read()
            open(fab, "wb").write(b"garbage" + data[7:])
        self._expect_clean(d)

    def test_box_fab_count_mismatch(self, valid, tmp_path):
        d = self._clone(valid, tmp_path, "count_mismatch")
        p = os.path.join(d, "Level_0", "Cell_H")
        text = open(p).read()
        open(p, "w").write(
            text + "FabOnDisk: Cell_D_00001 0\n"
        )
        self._expect_clean(d)
