"""Straight NumPy statements of the reference formulas, used as golden
oracles for the vectorized device ops.  Written loop-style on purpose: the
point is that these read like the published algorithm (windowed Gaussian
stamping from HigherHRNet-style target generators, greedy peak NMS from SPM),
so an element-wise match of the fast kernels against them is meaningful.
"""

from __future__ import annotations

import math

import numpy as np


def gaussian_window(sigma: float) -> np.ndarray:
    size = 6 * sigma + 3
    x = np.arange(0, size, 1, float)
    y = x[:, np.newaxis]
    c = 3 * sigma + 1
    return np.exp(-((x - c) ** 2 + (y - c) ** 2) / (2 * sigma ** 2))


def _stamp(hms, ch, x, y, sigma, g, h, w):
    ul = int(np.round(x - 3 * sigma - 1)), int(np.round(y - 3 * sigma - 1))
    br = int(np.round(x + 3 * sigma + 2)), int(np.round(y + 3 * sigma + 2))
    c, d = max(0, -ul[0]), min(br[0], w) - ul[0]
    a, b = max(0, -ul[1]), min(br[1], h) - ul[1]
    cc, dd = max(0, ul[0]), min(br[0], w)
    aa, bb = max(0, ul[1]), min(br[1], h)
    hms[ch, aa:bb, cc:dd] = np.maximum(hms[ch, aa:bb, cc:dd], g[a:b, c:d])


def sbp_heatmaps_np(joints: np.ndarray, output_res, num_joints: int,
                    sigma: float) -> np.ndarray:
    """Single-person per-keypoint heatmaps; skip x<0 or y<0; int+clip center."""
    h, w = output_res
    g = gaussian_window(sigma)
    hms = np.zeros((num_joints, h, w), np.float32)
    for idx, (x, y) in enumerate(joints):
        if x < 0 or y < 0:
            continue
        x = np.clip(int(x), 0, w - 1)
        y = np.clip(int(y), 0, h - 1)
        _stamp(hms, idx, x, y, sigma, g, h, w)
    return hms


def spm_heatmaps_np(joints: np.ndarray, output_res: int, num_joints: int,
                    sigma: float) -> np.ndarray:
    """Multi-person heatmaps; skip x<=0 and y<=0; no clipping of center."""
    h = w = output_res
    g = gaussian_window(sigma)
    hms = np.zeros((num_joints, h, w), np.float32)
    for person in joints:
        for idx, (x, y) in enumerate(person):
            if x <= 0 and y <= 0:
                continue
            _stamp(hms, idx, x, y, sigma, g, h, w)
    return hms


def spm_masks_np(joints: np.ndarray, output_res: int, sigma: float) -> np.ndarray:
    size = int((6 * sigma + 2) / 2)
    masks = np.zeros((len(joints), output_res, output_res), np.float32)
    for i, person in enumerate(joints):
        for (x, y) in person:
            if x <= 0 and y <= 0:
                continue
            xmin, ymin = max(0, x - size), max(0, y - size)
            xmax = min(output_res, x + size + 1)
            ymax = min(output_res, y + size + 1)
            masks[i, ymin:ymax, xmin:xmax] = 1.0
    return masks


def spm_displacements_np(joints: np.ndarray, masks: np.ndarray,
                         output_res: int, num_joints: int) -> np.ndarray:
    xs = np.tile(np.arange(output_res), (output_res, 1))
    ys = xs.T
    z = math.sqrt(2 * output_res ** 2)
    disp = np.zeros((num_joints * 2, output_res, output_res), np.float32)
    for i, person in enumerate(joints):
        mask = masks[i]
        for j, (x, y) in enumerate(person):
            if x <= 0 and y <= 0:
                continue
            disp[2 * j] += mask * (x - xs) / z
            disp[2 * j + 1] += mask * (y - ys) / z
    return disp


def decode_sbp_np(heatmaps: np.ndarray, conf_threshold: float) -> np.ndarray:
    """Per-channel thresholded argmax, (-1,-1,-1) when nothing survives."""
    k = heatmaps.shape[0]
    joints = np.full((k, 3), -1.0, np.float32)
    for idx in range(k):
        hm = heatmaps[idx]
        yy, xx = np.where(hm > conf_threshold)
        if yy.size == 0:
            continue
        conf = hm[yy, xx]
        best = int(np.argmax(conf))
        joints[idx] = [xx[best], yy[best], conf[best]]
    return joints


def spm_nms_np(heatmap: np.ndarray, conf_threshold: float,
               dist_threshold: float) -> np.ndarray:
    """Greedy peak NMS: best-first pick, drop candidates within the radius."""
    yy, xx = np.where(heatmap > conf_threshold)
    conf = heatmap[yy, xx]
    order = np.argsort(-conf, kind="stable")
    cand = list(zip(conf[order], yy[order], xx[order]))
    picked = []
    while cand:
        c0, y0, x0 = cand[0]
        picked.append([x0, y0, c0])
        cand = [(c, y, x) for (c, y, x) in cand[1:]
                if math.sqrt((x - x0) ** 2 + (y - y0) ** 2) > dist_threshold]
    return np.array(picked, np.float32).reshape(-1, 3)


def spm_keypoints_np(roots: np.ndarray, disp: np.ndarray,
                     dist_threshold: float) -> np.ndarray:
    two_k, out_sz, _ = disp.shape
    k = two_k // 2
    z = math.sqrt(out_sz ** 2 + out_sz ** 2)
    res = []
    for (x, y, conf) in roots:
        row = []
        for j in range(k):
            kx = disp[2 * j][int(y), int(x)] * z + x
            ky = disp[2 * j + 1][int(y), int(x)] * z + y
            d = math.sqrt((x - kx) ** 2 + (y - ky) ** 2)
            row.append([0.0, 0.0, 0.0] if d < dist_threshold
                       else [kx, ky, conf])
        res.append(row)
    return np.array(res, np.float32).reshape(-1, k, 3)


def sbp_loss_np(logits_nchw: np.ndarray, target_nchw: np.ndarray) -> float:
    pred = 1.0 / (1.0 + np.exp(-logits_nchw.astype(np.float64)))
    t = target_nchw.astype(np.float64)
    k = t.shape[1]
    pos = t > 0
    loss_pos = 5.0 * np.sum((np.where(pos, pred, 0) - t) ** 2) / (k * 2)
    loss_neg = 1.0 * np.sum(np.where(pos, 0, pred) ** 2) / (k * 2)
    return (loss_pos + loss_neg) / t.shape[0]


def spm_loss_np(logits_nchw: np.ndarray, target_nchw: np.ndarray) -> float:
    x = logits_nchw.astype(np.float64)
    t = target_nchw.astype(np.float64)
    pred_root = 1.0 / (1.0 + np.exp(-x[:, :1]))
    pred_disp = np.tanh(x[:, 1:])
    true_root = t[:, :1]
    true_disp = t[:, 1:]
    mask = (true_root > 0).astype(np.float64)
    loss_root = np.sum((pred_root * mask - true_root) ** 2)
    diff = pred_disp * mask - true_disp
    sl1 = np.where(np.abs(diff) < 1, 0.5 * diff ** 2, np.abs(diff) - 0.5)
    loss_disp = 0.1 * np.sum(sl1)
    return (loss_root + loss_disp) / t.shape[0]
