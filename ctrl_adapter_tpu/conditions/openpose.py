"""TPU-native OpenPose body-pose extraction — the openpose condition frontend.

The reference wires controlnet_aux's ``OpenposeDetector`` (`model/ctrl_helper.py:
122-126`, applied at `:201-203`) with body-only detection (the default
``include_hand=False, include_face=False``). The annotator network is the CMU
two-branch body model (``body_pose_model.pth``): a VGG19-derived feature stem
(conv1_1..conv4_4_CPM -> 128 channels at stride 8) followed by six refinement
stages, each with a PAF branch (L1, 38 channels = 19 limb vector fields) and a
heatmap branch (L2, 19 channels = 18 keypoints + background), later stages
consuming ``concat(paf, heatmap, features)`` through 7x7 convs.

Split of labor, TPU-first: the CNN runs as one jitted flax NHWC program; the
part-affinity-field decoding (peak NMS, 10-point line-integral limb scoring,
greedy subset assembly) and skeleton rasterization are host-side numpy/cv2 —
they are data-dependent, tiny, and per-image, exactly what should *not* be
traced. Matches pytorch-openpose ``Body``/``draw_bodypose`` semantics at the
single default scale (boxsize 368, stride 8, thresholds 0.1/0.05).
"""

from __future__ import annotations

import math
from typing import Dict, List, Mapping, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# network
# ---------------------------------------------------------------------------

_STEM = (  # (name, out_channels, pool_before)
    ("conv1_1", 64, False), ("conv1_2", 64, False),
    ("conv2_1", 128, True), ("conv2_2", 128, False),
    ("conv3_1", 256, True), ("conv3_2", 256, False), ("conv3_3", 256, False),
    ("conv3_4", 256, False),
    ("conv4_1", 512, True), ("conv4_2", 512, False),
    ("conv4_3_CPM", 256, False), ("conv4_4_CPM", 128, False),
)


class BodyPoseNet(nn.Module):
    """(b, H, W, 3) BGR in [-0.5, 0.5] (pixel/256 - 0.5, the caffe-era scaling)
    -> (paf (b, H/8, W/8, 38), heatmap (b, H/8, W/8, 19))."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = x.astype(self.dtype)
        for name, ch, pool in _STEM:
            if pool:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = jax.nn.relu(nn.Conv(ch, (3, 3), padding=1, name=name,
                                    dtype=self.dtype)(x))
        feat = x

        def stage1(branch: str, out_ch: int, h: jnp.ndarray) -> jnp.ndarray:
            for i in range(1, 4):
                h = jax.nn.relu(nn.Conv(
                    128, (3, 3), padding=1, name=f"conv5_{i}_CPM_{branch}",
                    dtype=self.dtype)(h))
            h = jax.nn.relu(nn.Conv(512, (1, 1), name=f"conv5_4_CPM_{branch}",
                                    dtype=self.dtype)(h))
            return nn.Conv(out_ch, (1, 1), name=f"conv5_5_CPM_{branch}",
                           dtype=self.dtype)(h)

        def refine(branch: str, stage: int, out_ch: int,
                   h: jnp.ndarray) -> jnp.ndarray:
            for i in range(1, 6):
                h = jax.nn.relu(nn.Conv(
                    128, (7, 7), padding=3,
                    name=f"Mconv{i}_stage{stage}_{branch}", dtype=self.dtype)(h))
            h = jax.nn.relu(nn.Conv(
                128, (1, 1), name=f"Mconv6_stage{stage}_{branch}",
                dtype=self.dtype)(h))
            return nn.Conv(out_ch, (1, 1), name=f"Mconv7_stage{stage}_{branch}",
                           dtype=self.dtype)(h)

        paf = stage1("L1", 38, feat)
        heat = stage1("L2", 19, feat)
        for stage in range(2, 7):
            h = jnp.concatenate([paf, heat, feat], axis=-1)
            paf = refine("L1", stage, 38, h)
            heat = refine("L2", stage, 19, h)
        return paf.astype(jnp.float32), heat.astype(jnp.float32)


def convert_openpose_state_dict(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """``body_pose_model.pth`` -> flax params. Accepts both the raw caffe-export
    layout (``conv1_1.weight``) and the pytorch-openpose module layout
    (``model0.conv1_1.weight``) — layer names are globally unique either way."""
    params: Dict = {}
    for key, v in state_dict.items():
        v = np.asarray(v, np.float32)
        parts = key.split(".")
        name = parts[-2]  # the caffe layer name
        leaf = "kernel" if parts[-1] == "weight" else "bias"
        if leaf == "kernel":
            v = v.transpose(2, 3, 1, 0)
        params.setdefault(name, {})[leaf] = v
    return params


# ---------------------------------------------------------------------------
# PAF decoding (host-side numpy; pytorch-openpose Body semantics)
# ---------------------------------------------------------------------------

# limb k connects keypoints limbSeq[k] (1-indexed); its vector field lives in
# paf channels mapIdx[k] - 19
LIMB_SEQ = [[2, 3], [2, 6], [3, 4], [4, 5], [6, 7], [7, 8], [2, 9], [9, 10],
            [10, 11], [2, 12], [12, 13], [13, 14], [2, 1], [1, 15], [15, 17],
            [1, 16], [16, 18], [3, 17], [6, 18]]
MAP_IDX = [[31, 32], [39, 40], [33, 34], [35, 36], [41, 42], [43, 44], [19, 20],
           [21, 22], [23, 24], [25, 26], [27, 28], [29, 30], [47, 48], [49, 50],
           [53, 54], [51, 52], [55, 56], [37, 38], [45, 46]]
COLORS = [[255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0], [170, 255, 0],
          [85, 255, 0], [0, 255, 0], [0, 255, 85], [0, 255, 170], [0, 255, 255],
          [0, 170, 255], [0, 85, 255], [0, 0, 255], [85, 0, 255], [170, 0, 255],
          [255, 0, 255], [255, 0, 170], [255, 0, 85]]


def find_peaks(heatmap: np.ndarray, thre1: float = 0.1) -> List[List[Tuple]]:
    """Per-part peak NMS: Gaussian blur sigma 3, keep pixels exceeding all four
    neighbors and the threshold. Returns, per part, a list of
    (x, y, score, peak_id) with globally increasing peak ids."""
    import cv2

    all_peaks = []
    peak_counter = 0
    for part in range(18):
        m = cv2.GaussianBlur(heatmap[:, :, part], (0, 0), 3.0)
        # pytorch-openpose compares against zero-padded shifted maps, so peaks on
        # the image border stay eligible (they compete against 0, not get excluded).
        up = np.zeros_like(m)
        up[1:, :] = m[:-1, :]
        down = np.zeros_like(m)
        down[:-1, :] = m[1:, :]
        left = np.zeros_like(m)
        left[:, 1:] = m[:, :-1]
        right = np.zeros_like(m)
        right[:, :-1] = m[:, 1:]
        peaks_binary = ((m >= up) & (m >= down) & (m >= left) & (m >= right)
                        & (m > thre1))
        ys, xs = np.nonzero(peaks_binary)
        peaks = [(int(x), int(y), float(heatmap[y, x, part]), peak_counter + i)
                 for i, (x, y) in enumerate(zip(xs, ys))]
        peak_counter += len(peaks)
        all_peaks.append(peaks)
    return all_peaks


def score_connections(paf: np.ndarray, all_peaks, ori_h: int,
                      thre2: float = 0.05) -> List[np.ndarray]:
    """For each limb, score every candidate (peakA, peakB) pair by the mean dot
    product of the PAF along 10 sampled midpoints plus a distance prior, then
    greedily keep compatible pairs. Returns per-limb arrays
    (idA, idB, score, iA, iB)."""
    connection_all = []
    for k, (ia, ib) in enumerate(LIMB_SEQ):
        score_mid = paf[:, :, [i - 19 for i in MAP_IDX[k]]]
        candA, candB = all_peaks[ia - 1], all_peaks[ib - 1]
        if not candA or not candB:
            connection_all.append(np.zeros((0, 5)))
            continue
        candidates = []
        for i, a in enumerate(candA):
            for j, b in enumerate(candB):
                vec = np.array([b[0] - a[0], b[1] - a[1]], np.float32)
                norm = max(math.sqrt(float(vec @ vec)), 1e-8)
                vecn = vec / norm
                xs = np.linspace(a[0], b[0], 10)
                ys = np.linspace(a[1], b[1], 10)
                pts = score_mid[np.round(ys).astype(int).clip(0, paf.shape[0] - 1),
                                np.round(xs).astype(int).clip(0, paf.shape[1] - 1)]
                score_midpts = pts @ vecn
                prior = float(score_midpts.mean()) + min(
                    0.5 * ori_h / norm - 1, 0)
                if (np.count_nonzero(score_midpts > thre2) > 0.8 * len(score_midpts)
                        and prior > 0):
                    candidates.append((i, j, prior, prior + a[2] + b[2]))
        candidates.sort(key=lambda c: c[2], reverse=True)
        connection = np.zeros((0, 5))
        used_a, used_b = set(), set()
        for i, j, s, _ in candidates:
            if i not in used_a and j not in used_b:
                connection = np.vstack(
                    [connection, [candA[i][3], candB[j][3], s, i, j]])
                used_a.add(i)
                used_b.add(j)
                if len(connection) >= min(len(candA), len(candB)):
                    break
        connection_all.append(connection)
    return connection_all


def assemble_subsets(all_peaks, connection_all) -> Tuple[np.ndarray, np.ndarray]:
    """Merge limb connections into per-person keypoint subsets (the classic
    20-column rows: 18 part peak-ids, total score, part count)."""
    candidate = np.array(
        [p for peaks in all_peaks for p in peaks], np.float32).reshape(-1, 4)
    subset = -1 * np.ones((0, 20))
    for k in range(len(MAP_IDX)):
        if connection_all[k].shape[0] == 0:
            continue
        partAs = connection_all[k][:, 0]
        partBs = connection_all[k][:, 1]
        indexA, indexB = np.array(LIMB_SEQ[k]) - 1
        for i in range(connection_all[k].shape[0]):
            found = 0
            subset_idx = [-1, -1]
            for j in range(len(subset)):
                if subset[j][indexA] == partAs[i] or subset[j][indexB] == partBs[i]:
                    subset_idx[found] = j
                    found += 1
            if found == 1:
                j = subset_idx[0]
                if subset[j][indexB] != partBs[i]:
                    subset[j][indexB] = partBs[i]
                    subset[j][-1] += 1
                    subset[j][-2] += (candidate[int(partBs[i]), 2]
                                      + connection_all[k][i][2])
            elif found == 2:
                j1, j2 = subset_idx
                membership = ((subset[j1] >= 0).astype(int)
                              + (subset[j2] >= 0).astype(int))[:-2]
                if np.count_nonzero(membership == 2) == 0:  # disjoint -> merge
                    subset[j1][:-2] += subset[j2][:-2] + 1
                    subset[j1][-2:] += subset[j2][-2:]
                    subset[j1][-2] += connection_all[k][i][2]
                    subset = np.delete(subset, j2, 0)
                else:
                    subset[j1][indexB] = partBs[i]
                    subset[j1][-1] += 1
                    subset[j1][-2] += (candidate[int(partBs[i]), 2]
                                      + connection_all[k][i][2])
            elif not found and k < 17:
                row = -1 * np.ones(20)
                row[indexA] = partAs[i]
                row[indexB] = partBs[i]
                row[-1] = 2
                row[-2] = (candidate[connection_all[k][i, :2].astype(int), 2].sum()
                           + connection_all[k][i][2])
                subset = np.vstack([subset, row])
    # prune implausible people
    keep = [i for i in range(len(subset))
            if subset[i][-1] >= 4 and subset[i][-2] / subset[i][-1] >= 0.4]
    return candidate, subset[keep]


def draw_bodypose(h: int, w: int, candidate: np.ndarray,
                  subset: np.ndarray) -> np.ndarray:
    """Rasterize the skeleton on a black canvas: 17 limb ellipses (width 4,
    alpha 0.6) + 18 joint circles (radius 4)."""
    import cv2

    canvas = np.zeros((h, w, 3), np.uint8)
    for k in range(17):
        for person in subset:
            ids = person[np.array(LIMB_SEQ[k]) - 1]
            if -1 in ids:
                continue
            ys = candidate[ids.astype(int), 1]
            xs = candidate[ids.astype(int), 0]
            m_x, m_y = xs.mean(), ys.mean()
            length = math.hypot(xs[0] - xs[1], ys[0] - ys[1])
            angle = math.degrees(math.atan2(ys[0] - ys[1], xs[0] - xs[1]))
            cur = canvas.copy()
            poly = cv2.ellipse2Poly((int(m_x), int(m_y)), (int(length / 2), 4),
                                    int(angle), 0, 360, 1)
            cv2.fillConvexPoly(cur, poly, COLORS[k])
            canvas = cv2.addWeighted(canvas, 0.4, cur, 0.6, 0)
    for part in range(18):
        for person in subset:
            idx = int(person[part])
            if idx == -1:
                continue
            x, y = candidate[idx][0:2]
            cv2.circle(canvas, (int(x), int(y)), 4, COLORS[part], thickness=-1)
    return canvas


class OpenposeDetector:
    """controlnet_aux ``OpenposeDetector`` (body-only) on the flax network.

    Input uint8 RGB images; output the rendered pose skeleton on black, same
    size. Single-scale inference at boxsize 368, stride 8 (the annotator's
    ``scale_search=[0.5]`` default)."""

    BOXSIZE, STRIDE, PAD_VALUE = 368, 8, 128

    def __init__(self, model_path: str, dtype=None):
        import torch

        self.model = BodyPoseNet(dtype=dtype or jnp.float32)
        sd = torch.load(model_path, map_location="cpu", weights_only=True)
        self.params = {"params": convert_openpose_state_dict(
            {k: np.asarray(v) for k, v in sd.items()})}
        self._apply = jax.jit(self.model.apply)

    def _forward(self, bgr: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        import cv2

        h, w = bgr.shape[:2]
        scale = 0.5 * self.BOXSIZE / h
        scaled = cv2.resize(bgr, (0, 0), fx=scale, fy=scale,
                            interpolation=cv2.INTER_CUBIC)
        sh, sw = scaled.shape[:2]
        ph, pw = (-sh) % self.STRIDE, (-sw) % self.STRIDE
        padded = np.pad(scaled, ((0, ph), (0, pw), (0, 0)), mode="constant",
                        constant_values=self.PAD_VALUE)
        x = jnp.asarray(padded[None], jnp.float32) / 256.0 - 0.5
        paf, heat = self._apply(self.params, x)
        paf, heat = np.asarray(paf)[0], np.asarray(heat)[0]

        def up(m: np.ndarray) -> np.ndarray:
            m = cv2.resize(m, (0, 0), fx=self.STRIDE, fy=self.STRIDE,
                           interpolation=cv2.INTER_CUBIC)
            return cv2.resize(m[:sh, :sw], (w, h),
                              interpolation=cv2.INTER_CUBIC)

        return up(paf), up(heat)

    def detect_poses(self, rgb: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        bgr = rgb[:, :, ::-1].copy()
        paf, heat = self._forward(bgr)
        all_peaks = find_peaks(heat)
        connections = score_connections(paf, all_peaks, rgb.shape[0])
        return assemble_subsets(all_peaks, connections)

    def __call__(self, images: List[np.ndarray]) -> List[np.ndarray]:
        out = []
        for img in images:
            candidate, subset = self.detect_poses(img)
            out.append(draw_bodypose(img.shape[0], img.shape[1],
                                     candidate, subset))
        return out
