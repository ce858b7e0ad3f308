"""Epoch callbacks for :meth:`Trainer.fit`.

* :class:`EpochVisualizer` — the reference's ``Display`` callback
  (`/root/reference/train_model/res34.py:633-660`) predicts one validation
  image per epoch and shows input/true/pred with matplotlib; here the triptych
  is written as a PNG (headless-friendly).
* :class:`EarlyStopping` — the reference *intended* early stopping on val_PA
  with patience but left the logic commented out (`res34.py:610-623`);
  implemented here as an opt-in callback with the same monitored metric.

A callback is ``cb(trainer, epoch, metrics) -> bool``; returning True stops
training.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


class EpochVisualizer:
    def __init__(self, image_u8: np.ndarray, label_u8: np.ndarray, out_dir: str):
        """``image_u8`` (H, W, 3), ``label_u8`` (H, W) in {0, 255}."""
        self.image = image_u8
        self.label = label_u8
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, trainer, epoch: int, metrics: Dict[str, float]) -> bool:
        import jax.numpy as jnp

        from building_detection_tpu.core import module as M

        from building_detection_tpu.ops import tiling as T

        x = T.normalize(jnp.asarray(self.image[None]))
        probs, _ = M.apply(trainer.model_fn, trainer.params, trainer.state, x)
        pred = (np.asarray(probs)[0].argmax(-1) * 255).astype(np.uint8)

        h, w = self.label.shape
        canvas = np.zeros((h, w * 3 + 16, 3), np.uint8)
        canvas[:, :w] = self.image
        canvas[:, w + 8 : 2 * w + 8] = self.label[..., None]
        canvas[:, 2 * w + 16 :] = pred[..., None]
        from building_detection_tpu.utils import io as uio

        uio.imwrite(
            os.path.join(self.out_dir, f"epoch_{epoch + 1}_display.png"), canvas
        )
        return False


class EarlyStopping:
    def __init__(self, monitor: str = "val_PA", patience: int = 12, mode: str = "max"):
        self.monitor = monitor
        self.patience = patience
        self.mode = mode
        self.best: Optional[float] = None
        self.bad_epochs = 0
        self.stopped_epoch: Optional[int] = None

    def __call__(self, trainer, epoch: int, metrics: Dict[str, float]) -> bool:
        value = metrics.get(self.monitor)
        if value is None:
            return False
        improved = (
            self.best is None
            or (self.mode == "max" and value >= self.best)
            or (self.mode == "min" and value <= self.best)
        )
        if improved:
            self.best = value
            self.bad_epochs = 0
            return False
        self.bad_epochs += 1
        if self.bad_epochs >= self.patience:
            self.stopped_epoch = epoch + 1
            print(f"Epoch {self.stopped_epoch}: early stopping ({self.monitor})")
            return True
        return False
