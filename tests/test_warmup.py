"""Warm-up FSM behavior (reference loss.py:381-492 semantics)."""

import numpy as np


class FakeLoss:
    use_stylegan_t_disc_warmup = True
    use_patchgan_disc_warmup = True
    stylegan_t_on = False
    patchgan_on = False
    perceptual_loss_on = True
    ssim_loss_on = False
    multiscale_pixel_loss_on = True
    pixel_loss_on = True
    perceptual_loss_weight = 10.0
    ssim_loss_weight = 0.0
    multiscale_pixel_loss_weights = [0.1] * 5
    l1_pixel_loss_weight = 1.0
    l2_pixel_loss_weight = 0.0
    kl_loss_weight = 1e-6
    vq_loss_weight = 1.0
    vf_loss_weight = 5.0


def test_stylegan_t_warmup_triggers_on_stable_low_pixel_loss():
    from vfm_vae_tpu.train.warmup import WarmupFSM

    loss = FakeLoss()
    fsm = WarmupFSM(loss, pixel_patience=3)
    assert fsm.active
    # constant low pixel loss -> stable windows -> trigger after patience
    changed = False
    for step in range(2000):
        changed = fsm.update(pixel_loss_now=0.05, d_loss_now=10.0, cur_kimg=step)
        if loss.stylegan_t_on:
            break
    assert loss.stylegan_t_on
    assert changed


def test_patchgan_warmup_kills_recon_losses():
    from vfm_vae_tpu.train.warmup import WarmupFSM

    loss = FakeLoss()
    loss.stylegan_t_on = True
    loss.use_stylegan_t_disc_warmup = False
    fsm = WarmupFSM(loss, d_patience=3)
    for step in range(2000):
        fsm.update(pixel_loss_now=0.05, d_loss_now=0.01, cur_kimg=step)
        if loss.patchgan_on:
            break
    assert loss.patchgan_on
    assert not loss.pixel_loss_on and loss.l1_pixel_loss_weight == 0.0
    assert loss.vf_loss_weight == 0.0
    assert fsm.freeze_triggered


def test_high_loss_never_triggers():
    from vfm_vae_tpu.train.warmup import WarmupFSM

    loss = FakeLoss()
    fsm = WarmupFSM(loss)
    for step in range(500):
        fsm.update(pixel_loss_now=5.0, d_loss_now=10.0, cur_kimg=step)
    assert not loss.stylegan_t_on and not loss.patchgan_on
