"""Host-side image/video utilities.

Parity targets: reference `utils/utils.py:65-199` (gif writers, center_crop_and_resize,
image_to_tensor normalize to [-1,1]) and the 512x512 resize/center-crop transforms of
`model/ctrl_helper.py:60-70`.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import numpy as np


def center_crop_and_resize(image: np.ndarray, size: Tuple[int, int] = (512, 512)) -> np.ndarray:
    """torchvision-equivalent Resize(short side)+CenterCrop path
    (`ctrl_helper.py:60-70`, `utils/utils.py:139-174`). uint8 (h, w, 3) in/out."""
    import cv2

    h, w = image.shape[:2]
    th, tw = size
    scale = max(th / h, tw / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    interp = cv2.INTER_AREA if scale < 1 else cv2.INTER_CUBIC
    image = cv2.resize(image, (nw, nh), interpolation=interp)
    top = (nh - th) // 2
    left = (nw - tw) // 2
    return image[top: top + th, left: left + tw]


def image_to_unit(image: np.ndarray) -> np.ndarray:
    """uint8 RGB -> float32 [0, 1] (ControlNet condition input convention)."""
    return image.astype(np.float32) / 255.0


def image_to_tensor(image: np.ndarray) -> np.ndarray:
    """uint8 RGB -> float32 [-1, 1] (VAE input convention, `utils/utils.py:177-199`)."""
    return image.astype(np.float32) / 127.5 - 1.0


def unit_to_uint8(image: np.ndarray) -> np.ndarray:
    return np.clip(np.asarray(image) * 255.0 + 0.5, 0, 255).astype(np.uint8)


def save_gif(frames: Sequence[np.ndarray], path: str, fps: int = 8) -> None:
    """Write frames ([0,1] float or uint8) as a looping gif (`utils/utils.py:65-116`)."""
    import imageio

    frames = [f if f.dtype == np.uint8 else unit_to_uint8(f) for f in frames]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imageio.mimsave(path, frames, duration=1000.0 / fps, loop=0)


def save_concat_gif(frame_lists: List[Sequence[np.ndarray]], path: str, fps: int = 8) -> None:
    """Side-by-side concat gif (condition | generated), `utils/utils.py:92-116`."""
    concat = [
        np.concatenate([fl[i] if fl[i].dtype == np.uint8 else unit_to_uint8(fl[i])
                        for fl in frame_lists], axis=1)
        for i in range(len(frame_lists[0]))
    ]
    save_gif(concat, path, fps)


def save_png(image: np.ndarray, path: str) -> None:
    import imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imageio.imwrite(path, image if image.dtype == np.uint8 else unit_to_uint8(image))


def load_video_frames(
    path: str, n_frames: int, target_fps: int = 16, size: Tuple[int, int] = (512, 512)
) -> List[np.ndarray]:
    """mp4 -> n center-cropped RGB frames sampled at target_fps with fallback to
    uniform spacing (`utils/data_loader.py:95-131`, decord replaced by cv2)."""
    import cv2

    cap = cv2.VideoCapture(path)
    native_fps = cap.get(cv2.CAP_PROP_FPS) or target_fps
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    stride = max(1, int(round(native_fps / target_fps)))
    idxs = list(range(0, total, stride))[:n_frames]
    if len(idxs) < n_frames:  # fallback: uniform resample over the whole clip
        idxs = np.linspace(0, max(total - 1, 0), n_frames).astype(int).tolist()
    frames = []
    for idx in idxs:
        cap.set(cv2.CAP_PROP_POS_FRAMES, idx)
        ok, frame = cap.read()
        if not ok:
            frame = np.zeros((size[0], size[1], 3), np.uint8) if not frames else None
            if frame is None:
                frames.append(frames[-1])
                continue
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        frames.append(center_crop_and_resize(frame, size))
    cap.release()
    return frames


def load_image(path: str, size: Tuple[int, int] = (512, 512)) -> np.ndarray:
    import imageio

    img = np.asarray(imageio.imread(path))
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    if img.shape[2] == 4:
        img = img[:, :, :3]
    return center_crop_and_resize(img, size)
