"""PIS (Passenger Interaction System) behavior classifiers on decoded joints.

Reference: utils/sbp_pis_utils.py:105-148.

* HandleGrip: is the right-wrist joint on the grip side of a 2-point handle
  ROI line (horizontal line-intersection test).
* FallingDown: is the nose <-> shoulder-center gradient inside the upright
  band [neg_max, pos_min] (outside band = falling).
"""

from __future__ import annotations


class HandleGrip:
    """handle_roi: ((x1, y1), (x2, y2)) -- two points on the image."""

    def __init__(self, handle_roi):
        self.handle_roi = handle_roi

    def get_handle_grip_result(self, point) -> bool:
        """point: (x, y) wrist joint.  True = handle grip."""
        (ax, ay), (bx, by) = self.handle_roi
        gradient = (ay - by) / (ax - bx)
        y_intercept = ay - gradient * ax
        intersection_x = int((point[1] - y_intercept) / gradient)
        return point[0] > intersection_x


class FallingDown:
    """neg_max / pos_min bound the upright nose-to-shoulder gradient band."""

    def __init__(self, neg_max: float, pos_min: float):
        self.neg_max = neg_max
        self.pos_min = pos_min

    def get_falling_down_result(self, point1, point2) -> bool:
        """point1/point2: (x, y) joints (nose, shoulder-center).
        True = normal (upright), False-side gradients = falling."""
        gradient = (point1[1] - point2[1]) / (point1[0] - point2[0] + 1e-6)
        return gradient < self.neg_max or self.pos_min < gradient
