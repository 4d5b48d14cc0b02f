"""Discriminator warm-up finite-state machine (reference: training/loss.py
:381-492 `_update_phase`): sliding loss windows, half-window mean
comparison, patience counters; on trigger, flips StyleGAN-T / PatchGAN on
and (PatchGAN) turns off the reconstruction+quantization losses.

Host-side by design — the reference runs it on rank 0 and broadcasts; with
jit the loss flags are *static* compile-time switches, so a trigger simply
recompiles the step (bounded: at most two flips per run). The reference's
'freeze32' set_train_mode call at the PatchGAN flip targets a mode its own
generator never defines (generator.py:1100-1124) — we map it to
'train_the_second_half_decoder', the documented stage-3 intent.
"""

from __future__ import annotations

from collections import deque
from typing import Optional

import numpy as np


class WarmupFSM:
    WINDOW = 100  # two half-windows of 50 (loss.py:201)

    def __init__(
        self,
        loss,  # TotalLoss — flags are mutated in place
        pixel_thresh: float = 0.1,
        pixel_diff_thresh: float = 0.01,
        pixel_patience: int = 10,
        d_thresh: float = 0.1,
        d_diff_thresh: float = 0.05,
        d_patience: int = 10,
    ):
        self.loss = loss
        self.pixel_window = deque(maxlen=self.WINDOW)
        self.d_window = deque(maxlen=self.WINDOW)
        self.pixel_thresh = pixel_thresh
        self.pixel_diff_thresh = pixel_diff_thresh
        self.pixel_patience = pixel_patience
        self.d_thresh = d_thresh
        self.d_diff_thresh = d_diff_thresh
        self.d_patience = d_patience
        self.pixel_cn = 0
        self.d_cn = 0
        self.freeze_triggered = False
        self.off_done = False

    @property
    def active(self) -> bool:
        return (
            (self.loss.use_stylegan_t_disc_warmup and not self.loss.stylegan_t_on)
            or (self.loss.use_patchgan_disc_warmup and not self.loss.patchgan_on)
        )

    @staticmethod
    def _stable(window: deque, diff_thresh: float) -> Optional[float]:
        """Returns |mean(late) - mean(early)| when the window is full."""
        if len(window) < window.maxlen:
            return None
        vals = list(window)
        half = len(vals) // 2
        return abs(float(np.mean(vals[half:])) - float(np.mean(vals[:half])))

    def update(self, pixel_loss_now: float, d_loss_now: float, cur_kimg: float) -> bool:
        """Feed per-step scalars; returns True if flags changed (step must
        be re-jitted)."""
        changed = False
        self.d_window.append(float(d_loss_now))

        if self.loss.use_stylegan_t_disc_warmup and not self.loss.stylegan_t_on:
            self.pixel_window.append(float(pixel_loss_now))
            if float(np.mean(self.pixel_window)) < self.pixel_thresh:
                diff = self._stable(self.pixel_window, self.pixel_diff_thresh)
                if diff is not None:
                    if diff < self.pixel_diff_thresh:
                        self.pixel_cn += 1
                    elif self.pixel_cn > 0:
                        self.pixel_cn = 0
                    # keep late half (loss.py:431)
                    vals = list(self.pixel_window)
                    self.pixel_window = deque(vals[len(vals) // 2 :], maxlen=self.WINDOW)
                    if self.pixel_cn >= self.pixel_patience:
                        self.loss.stylegan_t_on = True
                        print(f"[WARM-UP-StyleGAN-T] enabled @ {cur_kimg:.0f} kimg")
                        changed = True

        if self.loss.use_patchgan_disc_warmup and not self.loss.patchgan_on:
            if float(np.mean(self.d_window or [np.inf])) < self.d_thresh:
                diff = self._stable(self.d_window, self.d_diff_thresh)
                if diff is not None:
                    if diff < self.d_diff_thresh:
                        self.d_cn += 1
                    elif self.d_cn > 0:
                        self.d_cn = 0
                    vals = list(self.d_window)
                    self.d_window = deque(vals[len(vals) // 2 :], maxlen=self.WINDOW)
                    if self.d_cn >= self.d_patience:
                        self.loss.patchgan_on = True
                        self.freeze_triggered = True
                        print(f"[WARM-UP-PatchGAN] enabled @ {cur_kimg:.0f} kimg")
                        changed = True

        if self.loss.patchgan_on and not self.off_done and self.loss.use_patchgan_disc_warmup:
            self._off_reconstruction_losses()
            self.off_done = True
            changed = True
        return changed

    def _off_reconstruction_losses(self):
        """(loss.py:362-379)."""
        l = self.loss
        l.perceptual_loss_on = False
        l.ssim_loss_on = False
        l.multiscale_pixel_loss_on = False
        l.pixel_loss_on = False
        l.perceptual_loss_weight = 0.0
        l.ssim_loss_weight = 0.0
        l.multiscale_pixel_loss_weights = [0.0] * len(l.multiscale_pixel_loss_weights)
        l.l1_pixel_loss_weight = 0.0
        l.l2_pixel_loss_weight = 0.0
        l.kl_loss_weight = 0.0
        l.vq_loss_weight = 0.0
        l.vf_loss_weight = 0.0
        print("[Reconstruction & Quantization Losses] off")
