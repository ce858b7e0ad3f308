"""Data augmentation: on-device batched transforms + the file-based builder.

Rebuild of ``Data_Enhance`` (`/root/reference/data_enhancement.py:39-150`):
per image, with the reference's probabilities (`data_enhancement.py:73-98`):

* p=0.8 flip up-down, p=0.8 flip left-right (saved as ``_1``/``_2``);
* p=0.8 random scale 0.6-2.0x with gray-128 padding (shrink) or center crop
  (grow), label re-binarised at 125, plus a nested random flip (``_3``);
* p=0.3 channel swap ("color transform", ``_4``).

Two forms:

1. :func:`augment_batch` — a jit-able (images, labels, rng) -> batch
   transform for on-the-fly training augmentation (all VPU work, no host
   feeder), using fixed-size outputs (scale implemented as zoom-in/out with
   pad/crop to the original size);
2. :class:`DatasetBuilder` — the reference-faithful offline builder that
   writes augmented copies + a 9:1 train/val split to disk
   (`data_enhancement.py:153-203`).
"""
from __future__ import annotations

import os
import shutil
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from building_detection_tpu.core.config import AugmentConfig


# ---------------------------------------------------------------------------
# On-device augmentation (training-time path)
# ---------------------------------------------------------------------------
def _scale_one(
    img: jax.Array, lab: jax.Array, scale: jax.Array, cfg: AugmentConfig
) -> Tuple[jax.Array, jax.Array]:
    """Random-scale with pad/crop back to the input size, shapes static.

    Mirrors ``random_scale_resize`` (`data_enhancement.py:102-131`): shrink
    pads with gray 128 (image) / 0 (label); grow center-crops.  Implemented
    as a single BILINEAR resample of the source grid (the reference resizes
    bilinearly via cv2; see docs/QUIRKS.md — half-pixel conventions differ
    from cv2's two-step resize+pad/crop by <1px, statistically equivalent,
    pinned by ``tests/test_data.py::TestScaleEquivalence``) so shapes stay
    static under jit.  Labels are re-binarised at ``label_threshold`` after
    interpolation, as the reference does after its resize
    (`data_enhancement.py:134`).
    """
    h, w = img.shape[0], img.shape[1]
    yy = (jnp.arange(h) - (h - 1) / 2.0) / scale + (h - 1) / 2.0
    xx = (jnp.arange(w) - (w - 1) / 2.0) / scale + (w - 1) / 2.0
    y0 = jnp.floor(yy)
    x0 = jnp.floor(xx)
    fy = (yy - y0).astype(jnp.float32)
    fx = (xx - x0).astype(jnp.float32)
    y0c = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1c = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    x0c = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1c = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)

    def bilinear(src):
        f = src.astype(jnp.float32)
        a = f[y0c][:, x0c]
        b = f[y0c][:, x1c]
        c = f[y1c][:, x0c]
        d = f[y1c][:, x1c]
        wy = fy[:, None] if src.ndim == 2 else fy[:, None, None]
        wx = fx[None, :] if src.ndim == 2 else fx[None, :, None]
        top = a * (1 - wx) + b * wx
        bot = c * (1 - wx) + d * wx
        return jnp.round(top * (1 - wy) + bot * wy)

    sampled_img = bilinear(img).astype(jnp.uint8)
    sampled_lab = bilinear(lab).astype(jnp.uint8)
    inside = (
        (yy >= 0)[:, None] & (yy <= h - 1)[:, None] & (xx >= 0)[None, :] & (xx <= w - 1)[None, :]
    )
    out_img = jnp.where(inside[..., None], sampled_img, jnp.uint8(cfg.pad_value))
    out_lab = jnp.where(inside, sampled_lab, jnp.uint8(0))
    out_lab = jnp.where(out_lab > cfg.label_threshold, jnp.uint8(255), jnp.uint8(0))
    return out_img, out_lab


def augment_batch(
    images: jax.Array,
    labels: jax.Array,
    rng: jax.Array,
    cfg: AugmentConfig = AugmentConfig(),
) -> Tuple[jax.Array, jax.Array]:
    """(N,H,W,3) u8, (N,H,W) u8 -> augmented, same shapes; jit-able.

    Applies the reference's transform menu stochastically per sample with its
    probabilities.  (The offline builder *adds* augmented copies; the on-line
    path transforms in place, the standard TPU training formulation.)
    """
    n = images.shape[0]
    k_ud, k_lr, k_sc, k_scale, k_col = jax.random.split(rng, 5)
    do_ud = jax.random.uniform(k_ud, (n,)) < cfg.p_flip_ud
    do_lr = jax.random.uniform(k_lr, (n,)) < cfg.p_flip_lr
    do_sc = jax.random.uniform(k_sc, (n,)) < cfg.p_scale
    do_col = jax.random.uniform(k_col, (n,)) < cfg.p_color
    lo, hi = cfg.scale_range
    scales = jax.random.uniform(k_scale, (n,), minval=lo, maxval=hi)

    def one(img, lab, ud, lr, sc, scale, col):
        img = jnp.where(ud, img[::-1], img)
        lab = jnp.where(ud, lab[::-1], lab)
        img = jnp.where(lr, img[:, ::-1], img)
        lab = jnp.where(lr, lab[:, ::-1], lab)
        s_img, s_lab = _scale_one(img, lab, scale, cfg)
        img = jnp.where(sc, s_img, img)
        lab = jnp.where(sc, s_lab, lab)
        img = jnp.where(col, img[..., ::-1], img)  # RGB<->BGR swap
        return img, lab

    return jax.vmap(one)(images, labels, do_ud, do_lr, do_sc, scales, do_col)


# ---------------------------------------------------------------------------
# Offline dataset builder (reference-faithful, file in / file out)
# ---------------------------------------------------------------------------
class DatasetBuilder:
    """``Data_Enhance``: write augmented copies and split 9:1.

    Unlike the reference, paths are constructor arguments, augmentation is
    seedable, and the train/val split actually writes to four distinct
    directories (the reference's split writes train and val to the same
    folders, `data_enhancement.py:167-170`).
    """

    def __init__(
        self,
        read_img_path: str,
        read_lab_path: str,
        save_img_path: str,
        save_lab_path: str,
        cfg: AugmentConfig = AugmentConfig(),
        seed: Optional[int] = None,
    ):
        from building_detection_tpu.utils import io as uio

        self._uio = uio
        for p in (read_img_path, read_lab_path):
            if not os.path.exists(p):
                raise FileNotFoundError(p)
        self.read_img_path = read_img_path
        self.read_lab_path = read_lab_path
        self.save_img_path = save_img_path
        self.save_lab_path = save_lab_path
        os.makedirs(save_img_path, exist_ok=True)
        os.makedirs(save_lab_path, exist_ok=True)
        self.cfg = cfg
        self.rng = np.random.RandomState(seed)

    def _save(self, img: np.ndarray, lab: np.ndarray, stem: str) -> None:
        self._uio.imwrite(
            os.path.join(self.save_img_path, stem + ".png"), img.astype(np.uint8)
        )
        self._uio.imwrite(
            os.path.join(self.save_lab_path, stem + ".png"), lab.astype(np.uint8)
        )

    def _random_scale(self, img: np.ndarray, lab: np.ndarray, scale: float):
        """`data_enhancement.py:102-131` with the (w,h) resize-arg swap fixed
        (a no-op on the square 512 tiles the reference processes)."""
        from PIL import Image

        h, w = img.shape[:2]
        nh, nw = int(h * scale), int(w * scale)
        image = np.asarray(Image.fromarray(img).resize((nw, nh), Image.BILINEAR))
        label = np.asarray(
            Image.fromarray(lab).resize((nw, nh), Image.BILINEAR)
        )
        label = np.where(label > self.cfg.label_threshold, 255, 0).astype(np.uint8)
        if scale < 1:
            x, y = (w - nw) // 2, (h - nh) // 2
            new_img = np.full((h, w, 3), self.cfg.pad_value, np.uint8)
            new_lab = np.zeros_like(lab)
            new_img[y : y + nh, x : x + nw] = image
            new_lab[y : y + nh, x : x + nw] = label
        else:
            x = max((nw - w) // 2 - 1, 0)
            y = max((nh - h) // 2 - 1, 0)
            new_img = image[y : y + h, x : x + w]
            new_lab = label[y : y + h, x : x + w]
        r = self.rng.rand()
        if 0.7 > r >= 0.4:
            new_img, new_lab = new_img[::-1], new_lab[::-1]
        elif r >= 0.7:
            new_img, new_lab = new_img[:, ::-1], new_lab[:, ::-1]
        return new_img, new_lab

    def run(self) -> int:
        """Augment every image; returns number of files written
        (`data_enhancement.py:62-100`)."""
        cfg = self.cfg
        written = 0
        for name in sorted(os.listdir(self.read_img_path)):
            stem = name.rsplit(".", 1)[0]
            img = self._uio.imread_rgb(os.path.join(self.read_img_path, name))
            lab = self._uio.imread_gray(os.path.join(self.read_lab_path, name))
            self._save(img, lab, stem)
            written += 1
            if self.rng.rand() < cfg.p_flip_ud:
                self._save(img[::-1], lab[::-1], stem + "_1")
                written += 1
            if self.rng.rand() < cfg.p_flip_lr:
                self._save(img[:, ::-1], lab[:, ::-1], stem + "_2")
                written += 1
            if self.rng.rand() < cfg.p_scale:
                lo, hi = cfg.scale_range
                scale = self.rng.randint(int(lo * 10), int(hi * 10) + 1) / 10
                im3, lb3 = self._random_scale(img, lab, scale)
                self._save(im3, lb3, stem + "_3")
                written += 1
            if self.rng.rand() < cfg.p_color:
                self._save(img[..., ::-1], lab, stem + "_4")
                written += 1
        return written

    def run_copy_paste(
        self,
        donor_range: Tuple[float, float] = (0.075, 0.20),
        max_samples: Optional[int] = None,
    ) -> int:
        """Instance-transplant ("随机copy") augmentation — the step the
        reference DESCRIBES but never implements
        (`/root/reference/data_enhancement.py:17-21`): classify images by
        building coverage — above 20% untouched; (7.5%, 20%] are donors
        ("优样本"); at or below 7.5% are recipients ("劣样本") — then for
        each recipient pick a random donor, random-scale both
        (`random_scale_resize` semantics), and copy the donor's building
        pixels (image and label) into the recipient.  Writes ``{stem}_5``
        files into the save directories; returns how many were written.

        Opt-in (`cli/augment.py --copy-paste`) since the reference's actual
        behaviour omits it; thresholds are the comment's own numbers.
        """
        lo_cov, hi_cov = donor_range
        cfg = self.cfg
        entries = []  # (name, coverage)
        for name in sorted(os.listdir(self.read_img_path)):
            lab = self._uio.imread_gray(os.path.join(self.read_lab_path, name))
            entries.append((name, float(np.mean(lab > 0))))
        donors = [n for n, cov in entries if lo_cov < cov <= hi_cov]
        recipients = [n for n, cov in entries if cov <= lo_cov]
        if not donors or not recipients:
            return 0
        written = 0
        for name in recipients:
            if max_samples is not None and written >= max_samples:
                break
            donor = donors[self.rng.randint(len(donors))]
            d_img = self._uio.imread_rgb(os.path.join(self.read_img_path, donor))
            d_lab = self._uio.imread_gray(os.path.join(self.read_lab_path, donor))
            r_img = self._uio.imread_rgb(os.path.join(self.read_img_path, name))
            r_lab = self._uio.imread_gray(os.path.join(self.read_lab_path, name))
            if d_img.shape != r_img.shape:
                continue  # transplant needs matching canvases
            lo, hi = cfg.scale_range
            d_img, d_lab = self._random_scale(
                d_img, d_lab, self.rng.randint(int(lo * 10), int(hi * 10) + 1) / 10
            )
            r_img, r_lab = self._random_scale(
                r_img, r_lab, self.rng.randint(int(lo * 10), int(hi * 10) + 1) / 10
            )
            mask = d_lab > 0
            out_img = r_img.copy()
            out_img[mask] = d_img[mask]
            out_lab = np.where(mask, np.uint8(255), r_lab)
            stem = name.rsplit(".", 1)[0]
            self._save(out_img, out_lab, stem + "_5")
            written += 1
        return written

    def split_train_val(
        self,
        train_img: str,
        train_lab: str,
        val_img: str,
        val_lab: str,
        split_rate: Optional[float] = None,
    ) -> Tuple[int, int]:
        """Sequential 9:1 split by filename (`data_enhancement.py:153-203`)."""
        rate = split_rate if split_rate is not None else self.cfg.split_rate
        imgs = sorted(os.listdir(self.save_img_path))
        labs = sorted(os.listdir(self.save_lab_path))
        if len(imgs) != len(labs):
            raise ValueError("image/label counts differ")
        for a, b in zip(imgs, labs):
            if a != b:
                raise ValueError(f"name mismatch: {a} vs {b}")
        for d in (train_img, train_lab, val_img, val_lab):
            os.makedirs(d, exist_ok=True)
        split = int(len(imgs) * rate)
        for name in imgs[:split]:
            shutil.copy(os.path.join(self.save_img_path, name), train_img)
            shutil.copy(os.path.join(self.save_lab_path, name), train_lab)
        for name in imgs[split:]:
            shutil.copy(os.path.join(self.save_img_path, name), val_img)
            shutil.copy(os.path.join(self.save_lab_path, name), val_lab)
        return split, len(imgs) - split
