"""Metric storage and writers.

Behavioral reference: detectron2 EventStorage + the reference's writers
(`core/utils/my_writer.py:17-290` — MyCommonMetricPrinter with ETA,
MyJSONWriter, MyTensorboardXWriter), re-implemented minimal and dependency-
free (tensorboard optional)."""

from __future__ import annotations

import datetime
import json
import logging
import os
import time
from collections import defaultdict, deque

logger = logging.getLogger(__name__)


class EventStorage:
    """Scalar accumulator with median smoothing, keyed by iteration."""

    def __init__(self, start_iter: int = 0, window: int = 20):
        self.iter = start_iter
        self._window = window
        self._history: dict = defaultdict(lambda: deque(maxlen=window))
        self._latest: dict = {}
        self._images: list = []
        self._histograms: list = []

    def put_scalar(self, name: str, value) -> None:
        v = float(value)
        self._history[name].append(v)
        self._latest[name] = (v, self.iter)

    def put_scalars(self, **kwargs) -> None:
        for k, v in kwargs.items():
            self.put_scalar(k, v)

    def put_image(self, name: str, img) -> None:
        """Queue an HWC uint8 RGB image for the next TB write (detectron2
        EventStorage.put_image; ref engine.py:381 tbx_writer.add_image)."""
        self._images.append((name, img, self.iter))

    def pop_images(self) -> list:
        out, self._images = self._images, []
        return out

    def put_histogram(self, name: str, values, bins: int = 30) -> None:
        """Queue a histogram for the next TB write (d2 EventStorage
        .put_histogram; flushed by the reference tb writer,
        `my_writer.py:102-105`)."""
        import numpy as np

        self._histograms.append((name, np.asarray(values).ravel(), bins, self.iter))

    def pop_histograms(self) -> list:
        out, self._histograms = self._histograms, []
        return out

    def latest(self) -> dict:
        return dict(self._latest)

    def median(self, name: str) -> float:
        h = sorted(self._history[name])
        return h[len(h) // 2] if h else float("nan")

    def smoothed(self) -> dict:
        return {k: self.median(k) for k in self._history}


class JSONWriter:
    """Appends one json line of latest scalars per write (metrics.json)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a")

    def write(self, storage: EventStorage) -> None:
        rec = {"iteration": storage.iter}
        rec.update({k: v for k, (v, _) in storage.latest().items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()


class MetricPrinter:
    """Console printer with ETA (MyCommonMetricPrinter equivalent)."""

    def __init__(self, max_iter: int):
        self.max_iter = max_iter
        self._t0 = time.perf_counter()
        self._start_iter = None

    def write(self, storage: EventStorage) -> None:
        if self._start_iter is None:
            self._start_iter = storage.iter
        done = max(storage.iter - self._start_iter, 1)
        per_iter = (time.perf_counter() - self._t0) / done
        eta = datetime.timedelta(seconds=int(per_iter * (self.max_iter - storage.iter)))
        s = storage.smoothed()
        losses = "  ".join(f"{k}: {v:.4g}" for k, v in sorted(s.items()) if "loss" in k)
        lr = s.get("lr", float("nan"))
        logger.info(
            "iter %d/%d  eta: %s  lr: %.3g  %s", storage.iter, self.max_iter, eta, lr, losses
        )

    def close(self) -> None:
        pass


class TensorboardWriter:
    """Optional tensorboard writer; no-op when tensorboard is unavailable."""

    def __init__(self, logdir: str):
        self._writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(logdir)
        except Exception as e:  # tensorboard not installed
            logger.info("tensorboard unavailable (%s); skipping tb writer", e)

    def write(self, storage: EventStorage) -> None:
        if self._writer is None:
            storage.pop_images()  # drop queued images; keep memory bounded
            storage.pop_histograms()
            return
        for k, (v, it) in storage.latest().items():
            self._writer.add_scalar(k, v, it)
        for name, img, it in storage.pop_images():
            self._writer.add_image(name, img, it, dataformats="HWC")
        for name, values, bins, it in storage.pop_histograms():
            self._writer.add_histogram(name, values, it, bins=bins)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
