"""Visibility ordering tests (VisibilityOrdering.cpp semantics)."""

import os

import numpy as np

from amrvolumerenderer_tpu.types import CameraParameters
from amrvolumerenderer_tpu.visibility import build_visibility_order


def axis_camera(eye, look_at=(0.0, 0.0, 0.0)):
    return CameraParameters(
        eye=eye, look_at=look_at, up=(0.0, 1.0, 0.0),
        fov_y_degrees=45.0, near_plane=0.1, far_plane=100.0,
    )


def test_two_boxes_along_view_axis():
    """Camera at +z looking -z: the box nearer the camera must be visited
    after the farther one along the adjacency edge (back-to-front order),
    so the *far* box's owner comes first."""
    box_min = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    box_max = np.array([[1.0, 1.0, 1.0], [1.0, 1.0, 2.0]])
    owners = np.array([0, 1])
    cam = axis_camera((0.5, 0.5, 5.0), (0.5, 0.5, 0.5))
    order = build_visibility_order(cam, 1.0, box_min, box_max, owners, 2)
    # viewDir = -z; box 1 (z in [1,2]) is nearer the camera; box 0 is farther.
    # Edge direction: a.max==b.min on z with dir<0 -> edge far->near;
    # topo pops far first.
    assert list(order) == [0, 1]
    # flipping the camera flips the order
    cam2 = axis_camera((0.5, 0.5, -4.0), (0.5, 0.5, 0.5))
    order2 = build_visibility_order(cam2, 1.0, box_min, box_max, owners, 2)
    assert list(order2) == [1, 0]


def test_disabled_graph_returns_identity():
    order = build_visibility_order(
        axis_camera((0, 0, 5)), 1.0, np.zeros((0, 3)), np.zeros((0, 3)),
        np.zeros(0, dtype=int), 4, use_visibility_graph=False,
    )
    assert list(order) == [0, 1, 2, 3]


def test_no_boxes_returns_identity():
    order = build_visibility_order(
        axis_camera((0, 0, 5)), 1.0, np.zeros((0, 3)), np.zeros((0, 3)),
        np.zeros(0, dtype=int), 3,
    )
    assert list(order) == [0, 1, 2]


def test_unvisited_ranks_appended():
    # only rank 2 owns a box; ranks 0, 1, 3 appended in default order
    box_min = np.array([[0.0, 0.0, 0.0]])
    box_max = np.array([[1.0, 1.0, 1.0]])
    order = build_visibility_order(
        axis_camera((0.5, 0.5, 5.0), (0.5, 0.5, 0.5)), 1.0, box_min, box_max,
        np.array([2]), 4,
    )
    assert list(order) == [2, 0, 1, 3]


def test_grid_ordering_is_permutation():
    # 3x3x3 grid of unit boxes, each its own rank
    mins, maxs, owners = [], [], []
    rank = 0
    for i in range(3):
        for j in range(3):
            for k in range(3):
                mins.append([i, j, k])
                maxs.append([i + 1, j + 1, k + 1])
                owners.append(rank)
                rank += 1
    cam = axis_camera((10.0, 8.0, 12.0), (1.5, 1.5, 1.5))
    order = build_visibility_order(
        cam, 1.0, np.array(mins, float), np.array(maxs, float),
        np.array(owners), 27,
    )
    assert sorted(order) == list(range(27))
    # the nearest corner box to the camera must be blended last-ish: its
    # owner appears after the farthest corner's owner
    near_owner = 2 * 9 + 2 * 3 + 2  # box (2,2,2)
    far_owner = 0  # box (0,0,0)
    order_list = list(order)
    assert order_list.index(far_owner) < order_list.index(near_owner)


def test_dot_export(tmp_path):
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        box_min = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        box_max = np.array([[1.0, 1.0, 1.0], [1.0, 1.0, 2.0]])
        build_visibility_order(
            axis_camera((0.5, 0.5, 5.0), (0.5, 0.5, 0.5)), 1.0,
            box_min, box_max, np.array([0, 1]), 2,
            write_visibility_graph=True,
        )
        dots = [f for f in os.listdir(".") if f.endswith(".dot")]
        assert dots
        text = open(dots[0]).read()
        assert "digraph VisibilityGraph" in text
        assert "box0" in text and "box1" in text
        assert "->" in text
    finally:
        os.chdir(cwd)


def test_cycle_breaking_produces_order():
    """Four boxes arranged in a pinwheel around the view axis create a
    visibility cycle; the splitter must resolve it and still emit a valid
    permutation."""
    # classic 2D pinwheel extruded in z, camera looking down -z at an angle
    boxes = [
        ([0.0, 0.0, 0.0], [2.0, 1.0, 1.0]),
        ([2.0, 0.0, 0.0], [3.0, 2.0, 1.0]),
        ([1.0, 2.0, 0.0], [3.0, 3.0, 1.0]),
        ([0.0, 1.0, 0.0], [1.0, 3.0, 1.0]),
    ]
    box_min = np.array([b[0] for b in boxes])
    box_max = np.array([b[1] for b in boxes])
    owners = np.arange(4)
    cam = CameraParameters(
        eye=(1.5, 1.5, 6.0), look_at=(1.4, 1.6, 0.0), up=(0.0, 1.0, 0.0),
        fov_y_degrees=45.0, near_plane=0.1, far_plane=100.0,
    )
    order = build_visibility_order(cam, 1.0, box_min, box_max, owners, 4)
    assert sorted(order) == [0, 1, 2, 3]
