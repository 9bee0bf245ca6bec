"""Host-side training data pipeline: video/image loading + condition extraction.

Parity target: reference `utils/data_loader.py` (``VideoLoader``/``ImageLoader``) —
mp4 frame sampling at target fps with fallbacks (`:95-131`), CSV prompt metadata
(`:55-64,236-244`), retry-with-resample on per-item errors (`:144-160,274-290`) — and
the per-step condition extraction of `model/ctrl_helper.py:148-228`.

TPU design: everything here is numpy on the host; batches stream to the device via
``shard_batch``. Text/image embeddings are produced once per item by pluggable encoder
callables (kept out of the device step, unlike the reference's on-GPU collate,
`train.py:770-865`) so the jitted train step is pure tensor compute.
"""

from __future__ import annotations

import csv
import os
import queue
import random
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from ..conditions.extractors import ConditionExtractor
from ..utils.image import image_to_tensor, image_to_unit, load_image, load_video_frames


def read_prompts_csv(path: str) -> Dict[str, str]:
    """CSV with (name, caption)-style columns (`utils/data_loader.py:55-64`)."""
    prompts: Dict[str, str] = {}
    with open(path, newline="") as f:
        reader = csv.reader(f)
        rows = list(reader)
    # tolerate a header row
    start = 1 if rows and not os.path.splitext(rows[0][0])[1] else 0
    for row in rows[start:]:
        if len(row) >= 2:
            prompts[os.path.splitext(row[0])[0]] = row[1]
    return prompts


class VideoDataset:
    """mp4 folder + caption csv -> training items (frames, caption, conditions)."""

    def __init__(
        self,
        data_path: str,
        prompt_path: str,
        n_sample_frames: int = 16,
        output_fps: int = 16,
        size: int = 512,
        control_types: Sequence[str] = ("depth",),
        extractor: Optional[ConditionExtractor] = None,
        max_retries: int = 8,
    ):
        self.files = sorted(
            os.path.join(data_path, f) for f in os.listdir(data_path)
            if f.lower().endswith((".mp4", ".avi", ".mov", ".webm"))
        )
        if not self.files:
            raise FileNotFoundError(f"no videos under {data_path}")
        self.prompts = read_prompts_csv(prompt_path)
        self.n_sample_frames = n_sample_frames
        self.output_fps = output_fps
        self.size = size
        self.control_types = list(control_types)
        self.extractor = extractor or ConditionExtractor()
        self.max_retries = max_retries

    def __len__(self):
        return len(self.files)

    def _load(self, idx: int, control_types: Sequence[str]) -> Dict[str, np.ndarray]:
        path = self.files[idx]
        name = os.path.splitext(os.path.basename(path))[0]
        frames_u8 = load_video_frames(
            path, self.n_sample_frames, self.output_fps, (self.size, self.size)
        )
        item = {
            "frames": np.stack([image_to_tensor(f) for f in frames_u8]),  # (f,h,w,3)
            "caption": self.prompts.get(name, ""),
            "first_frame": image_to_tensor(frames_u8[0]),
        }
        conds = []
        for ctype in control_types:
            maps = self.extractor.extract(ctype, frames_u8)
            conds.append(np.stack([image_to_unit(m) for m in maps]))  # (f,h,w,3) [0,1]
        item["conditions"] = np.stack(conds)  # (E, f, h, w, 3)
        return item

    def get(self, idx: int, control_types: Optional[Sequence[str]] = None):
        """Infinite retry-with-resample on per-item failures
        (`utils/data_loader.py:144-160`)."""
        control_types = list(control_types or self.control_types)
        for attempt in range(self.max_retries):
            try:
                return self._load(idx, control_types)
            except Exception:
                idx = random.randrange(len(self.files))
        raise RuntimeError(f"dataset failed {self.max_retries} consecutive loads")


class ImageDataset:
    """Image folder + caption csv (SDXL training, `utils/data_loader.py:236-312`)."""

    def __init__(
        self,
        data_path: str,
        prompt_path: str,
        size: int = 1024,
        control_size: int = 512,
        control_types: Sequence[str] = ("depth",),
        extractor: Optional[ConditionExtractor] = None,
        max_retries: int = 8,
    ):
        self.files = sorted(
            os.path.join(data_path, f) for f in os.listdir(data_path)
            if f.lower().endswith((".jpg", ".jpeg", ".png", ".webp"))
        )
        if not self.files:
            raise FileNotFoundError(f"no images under {data_path}")
        self.prompts = read_prompts_csv(prompt_path)
        self.size = size
        self.control_size = control_size
        self.control_types = list(control_types)
        self.extractor = extractor or ConditionExtractor()
        self.max_retries = max_retries

    def __len__(self):
        return len(self.files)

    def get(self, idx: int, control_types: Optional[Sequence[str]] = None):
        control_types = list(control_types or self.control_types)
        for attempt in range(self.max_retries):
            try:
                path = self.files[idx]
                name = os.path.splitext(os.path.basename(path))[0]
                img = load_image(path, (self.size, self.size))
                ctrl_img = load_image(path, (self.control_size, self.control_size))
                item = {
                    "frames": image_to_tensor(img)[None],  # (1, h, w, 3)
                    "caption": self.prompts.get(name, ""),
                    "first_frame": image_to_tensor(img),
                }
                conds = []
                for ctype in control_types:
                    maps = self.extractor.extract(ctype, [ctrl_img])
                    conds.append(np.stack([image_to_unit(m) for m in maps]))
                item["conditions"] = np.stack(conds)  # (E, 1, h, w, 3)
                return item
            except Exception:
                idx = random.randrange(len(self.files))
        raise RuntimeError(f"dataset failed {self.max_retries} consecutive loads")


def collate(
    items: List[Dict[str, np.ndarray]],
    encode_text: Optional[Callable[[List[str]], np.ndarray]] = None,
    keep_raw: bool = False,
) -> Dict[str, np.ndarray]:
    """Stack host items into a device-ready batch.

    frames: (b, f, h, w, 3); controlnet_cond: (E, b*f, h, w, 3) matching the
    expert-major layout of `train.py:1128-1130`. ``keep_raw`` additionally passes
    the captions and first frames through (for a ``post_collate`` encoder stage).
    """
    frames = np.stack([it["frames"] for it in items])
    conds = np.stack([it["conditions"] for it in items])  # (b, E, f, h, w, 3)
    b, e, f = conds.shape[:3]
    conds = conds.transpose(1, 0, 2, 3, 4, 5).reshape(e, b * f, *conds.shape[3:])
    batch = {"frames": frames, "controlnet_cond": conds}
    if encode_text is not None:
        batch["controlnet_text_emb"] = encode_text([it["caption"] for it in items])
    if keep_raw:
        batch["captions"] = [it["caption"] for it in items]
        batch["first_frames"] = np.stack([it["first_frame"] for it in items])
    return batch


class Prefetcher:
    """Async host-side batch pipeline: worker threads decode/extract while the device
    runs the previous step (SURVEY §7 hard-part 5 — the reference extracts conditions
    synchronously inside each train step, `train.py:1107-1124`, which would starve a
    TPU). Yields collated batches; the queue depth bounds host memory."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        encode_text: Optional[Callable[[List[str]], np.ndarray]] = None,
        num_workers: int = 1,
        queue_depth: int = 2,
        seed: int = 0,
        control_types_chooser: Optional[Callable[[random.Random], Sequence[str]]] = None,
        post_collate: Optional[Callable[[Dict], Dict]] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.encode_text = encode_text
        self.control_types_chooser = control_types_chooser
        self.post_collate = post_collate
        self._q: queue.Queue = queue.Queue(maxsize=queue_depth)
        self._stop = threading.Event()
        self._rng = random.Random(seed)
        self._threads = [
            threading.Thread(target=self._worker, args=(w,), daemon=True)
            for w in range(max(1, num_workers))
        ]
        for t in self._threads:
            t.start()

    def _worker(self, worker_id: int) -> None:
        rng = random.Random((worker_id + 1) * 7919 + self._rng.randint(0, 1 << 30))
        while not self._stop.is_set():
            # mixed-control-types training picks ONE condition per batch
            # (`train.py:1110-1124` semantics); all items in the batch share it.
            ctypes = (self.control_types_chooser(rng)
                      if self.control_types_chooser else None)
            items = [
                (self.dataset.get(rng.randrange(len(self.dataset)))
                 if ctypes is None else
                 self.dataset.get(rng.randrange(len(self.dataset)), ctypes))
                for _ in range(self.batch_size)
            ]
            batch = collate(items, self.encode_text,
                            keep_raw=self.post_collate is not None)
            if ctypes is not None:
                batch["control_types"] = list(ctypes)
            if self.post_collate is not None:
                batch = self.post_collate(batch)
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        while not self._stop.is_set():
            yield self._q.get()

    def next(self) -> Dict[str, np.ndarray]:
        return self._q.get()

    def close(self) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=2.0)
