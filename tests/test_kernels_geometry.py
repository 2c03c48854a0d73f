"""Kernel-parity layer: the reference's unit tests re-expressed in pytest.

Sources (semantics only, no code copied):
poly_ops.rs:180-257, poly_area.rs tests, poly_perimeter.rs tests,
is_clockwise_order.rs, bounding_box.rs:217-219, geometry.rs:305-412.
"""

import numpy as np
import pytest

from whitebox_tools_ray.kernels import geometry as g


TRI = ([0.0, 5.0, 5.0, 0.0], [0.0, 0.0, 5.0, 0.0])  # the reference's test "rectangle" (a closed triangle)
SQ = ([0.0, 5.0, 5.0, 0.0, 0.0], [0.0, 0.0, 5.0, 5.0, 0.0])


class TestPointInPoly:
    # poly_ops.rs:184-196
    def test_inside_outside(self):
        xs, ys = TRI
        assert g.point_in_poly(2.0, 2.0, xs, ys)
        assert not g.point_in_poly(12.0, 12.0, xs, ys)

    # poly_ops.rs:198-211 — boundary is outside
    def test_winding_number_boundary(self):
        xs, ys = TRI
        assert g.winding_number(5.0, 2.0, np.array(xs), np.array(ys)) == 0
        assert g.winding_number(4.0, 2.0, np.array(xs), np.array(ys)) == 1
        assert g.winding_number(6.0, 2.0, np.array(xs), np.array(ys)) == 0

    def test_vectorized_matches_scalar(self):
        xs, ys = TRI
        rng = np.random.RandomState(0)
        px = rng.uniform(-2, 8, 500)
        py = rng.uniform(-2, 8, 500)
        vec = g.points_in_poly(px, py, xs, ys)
        ref = np.array([g.point_in_poly(x, y, xs, ys) for x, y in zip(px, py)])
        assert np.array_equal(vec, ref)

    def test_vectorized_boundary_cases(self):
        # The reference's own boundary cases (poly_ops.rs:198-211): right-edge
        # point outside, interior point inside, exterior point outside. Other
        # boundary points (bottom edge / corners) follow whatever the winding
        # arithmetic yields — parity = match the algorithm, so the vectorized
        # kernel is checked against the scalar port for those.
        xs, ys = SQ
        px = np.array([5.0, 4.0, 6.0, 0.0, 2.5, 2.5])
        py = np.array([2.0, 2.0, 2.0, 0.0, 0.0, 5.0])
        out = g.points_in_poly(px, py, xs, ys)
        assert out.tolist()[:3] == [False, True, False]
        ref = [g.point_in_poly(x, y, xs, ys) for x, y in zip(px, py)]
        assert out.tolist() == ref


class TestPolyInPoly:
    # poly_ops.rs:213-231
    def test_poly_in_poly(self):
        x1, y1 = np.array(TRI[0]), np.array(TRI[1])
        x2 = np.array([-1.0, 6.0, 6.0, -1.0])
        y2 = np.array([-1.0, -1.0, 6.0, -1.0])
        inside = all(g.point_in_poly(px, py, x2, y2) for px, py in zip(x1, y1))
        assert inside
        inside_rev = all(g.point_in_poly(px, py, x1, y1) for px, py in zip(x2, y2))
        assert not inside_rev


class TestConvex:
    # poly_ops.rs:233-257
    def test_square_convex(self):
        assert g.poly_is_convex(np.array(SQ[0]), np.array(SQ[1]))

    def test_notch_not_convex(self):
        xs = np.array([0.0, 5.0, 5.0, 2.5, 0.0, 0.0])
        ys = np.array([0.0, 0.0, 5.0, 3.0, 5.0, 0.0])
        assert not g.poly_is_convex(xs, ys)


class TestAreaPerimeter:
    # poly_area.rs tests
    def test_closed_area(self):
        assert g.polygon_area(SQ[0], SQ[1]) == 25.0

    def test_open_area(self):
        assert g.polygon_area([0.0, 5.0, 5.0, 0.0], [0.0, 0.0, 5.0, 5.0]) == 25.0

    # poly_perimeter.rs tests
    def test_closed_perimeter(self):
        assert g.polygon_perimeter(SQ[0], SQ[1]) == 20.0

    def test_open_perimeter(self):
        assert g.polygon_perimeter([0.0, 5.0, 5.0, 0.0], [0.0, 0.0, 5.0, 5.0]) == 20.0


class TestOrientation:
    def test_clockwise(self):
        # y-up frame: (0,0)→(0,5)→(5,5)→(5,0) is clockwise
        xs = np.array([0.0, 0.0, 5.0, 5.0, 0.0])
        ys = np.array([0.0, 5.0, 5.0, 0.0, 0.0])
        assert g.is_clockwise_order(xs, ys)
        assert not g.is_clockwise_order(xs[::-1], ys[::-1])

    def test_is_hole_ring(self):
        # counter-clockwise ring (unclosed) = hole
        xs = np.array([0.0, 5.0, 5.0, 0.0])
        ys = np.array([0.0, 0.0, 5.0, 5.0])
        assert g.is_hole_ring(xs, ys)
        assert not g.is_hole_ring(xs[::-1], ys[::-1])

    def test_is_hole_concave(self):
        # concave CCW ring
        xs = np.array([0.0, 5.0, 5.0, 2.5, 0.0])
        ys = np.array([0.0, 0.0, 5.0, 3.0, 5.0])
        assert g.is_hole_ring(xs, ys)
        assert not g.is_hole_ring(xs[::-1], ys[::-1])


class TestBBox:
    # bounding_box.rs:217-219 — strict inequalities
    def test_boundary_excluded(self):
        assert g.point_in_box(2.0, 2.0, 0.0, 5.0, 0.0, 5.0)
        assert not g.point_in_box(5.0, 2.0, 0.0, 5.0, 0.0, 5.0)
        assert not g.point_in_box(0.0, 2.0, 0.0, 5.0, 0.0, 5.0)
        assert not g.point_in_box(2.0, 0.0, 0.0, 5.0, 0.0, 5.0)

    def test_vectorized(self):
        x = np.array([2.0, 5.0, -1.0])
        y = np.array([2.0, 2.0, 2.0])
        out = g.points_in_box(x, y, 0.0, 5.0, 0.0, 5.0)
        assert out.tolist() == [True, False, False]


class TestHull:
    def test_square_hull(self):
        xs = np.array([0.0, 5.0, 5.0, 0.0, 2.5])
        ys = np.array([0.0, 0.0, 5.0, 5.0, 2.5])
        idx = g.convex_hull(xs, ys)
        assert set(idx.tolist()) == {0, 1, 2, 3}

    def test_mbb(self):
        xs = np.array([0.0, 5.0, 5.0, 0.0])
        ys = np.array([0.0, 0.0, 5.0, 5.0])
        corners, area = g.minimum_bounding_box(xs, ys)
        assert area == pytest.approx(25.0)

    def test_rotated_mbb(self):
        # diamond: mbb area = 2 (rotated square side sqrt(2))
        xs = np.array([0.0, 1.0, 0.0, -1.0])
        ys = np.array([1.0, 0.0, -1.0, 0.0])
        _, area = g.minimum_bounding_box(xs, ys)
        assert area == pytest.approx(2.0)

    def test_welzl(self):
        xs = np.array([0.0, 2.0, 1.0, 1.0])
        ys = np.array([0.0, 0.0, 1.0, -1.0])
        cx, cy, r = g.smallest_enclosing_circle(xs, ys)
        assert cx == pytest.approx(1.0)
        assert cy == pytest.approx(0.0)
        assert r == pytest.approx(1.0)

    def test_interior_point(self):
        xs = np.array(SQ[0])
        ys = np.array(SQ[1])
        px, py = g.interior_point(xs, ys)
        assert g.point_in_poly(px, py, xs, ys)
