"""Evaluation metrics: Procrustes alignment, PCK/AUC/EPE, texture metrics.

References: utils/train_utils.py:267-290 (align_w_scale), utils/fh_utils.py:
719-815 (EvalUtil), train_hrnet.py:148-161 & compute_texture_metric.py
(masked PSNR/SSIM/L1/L2).  Implemented batched in JAX so FreiHAND evaluation
runs fully on-device (the reference loops per-sample in numpy/scipy,
train_hrnet.py:227-232).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hifihr_tpu.losses.ssim import ssim as ssim_metric


def align_w_scale(mtx1: jnp.ndarray, mtx2: jnp.ndarray, return_trafo: bool = False):
    """Procrustes-align mtx2 to mtx1 (both (N, 3)); returns aligned mtx2.

    Batched usage: jax.vmap(align_w_scale)((B,N,3),(B,N,3)).
    """
    t1 = jnp.mean(mtx1, axis=0)
    t2 = jnp.mean(mtx2, axis=0)
    x1 = mtx1 - t1
    x2 = mtx2 - t2
    n1 = jnp.sqrt(jnp.sum(x1**2))
    n2 = jnp.sqrt(jnp.sum(x2**2))
    x1 = x1 / n1
    x2 = x2 / n2
    # orthogonal procrustes
    u, w, vt = jnp.linalg.svd(x2.T @ x1)
    r = (u @ vt).T
    s = jnp.sum(w) * n1 / n2
    if return_trafo:
        return r, s, n1, t1, t2
    return jnp.dot(mtx2 - t2, r.T) * s + t1


def pa_mpjpe(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Procrustes-aligned mean per-joint error, metres. (B, N, 3) each."""
    aligned = jax.vmap(align_w_scale)(gt, pred)
    return jnp.mean(jnp.linalg.norm(aligned - gt, axis=-1))


class EvalUtil:
    """Accumulates per-joint 3D errors; yields EPE mean/median, PCK AUC."""

    def __init__(self, num_kp: int = 21):
        self.errors = [[] for _ in range(num_kp)]

    def feed(self, kp_gt, kp_pred, vis=None):
        kp_gt = np.asarray(kp_gt)
        kp_pred = np.asarray(kp_pred)
        if kp_gt.ndim == 3:  # batched
            for g, p in zip(kp_gt, kp_pred):
                self.feed(g, p)
            return
        dist = np.linalg.norm(kp_gt - kp_pred, axis=-1)
        for i, d in enumerate(dist):
            if vis is None or vis[i]:
                self.errors[i].append(float(d))

    def _pck(self, kp_id: int, threshold: float) -> float:
        e = np.asarray(self.errors[kp_id])
        return float(np.mean(e <= threshold)) if e.size else np.nan

    def get_measures(self, val_min=0.0, val_max=0.05, steps=100):
        """Returns (epe_mean, epe_median, auc, pck_curve, thresholds)."""
        epe_all = np.concatenate([np.asarray(e) for e in self.errors if len(e)])
        thresholds = np.linspace(val_min, val_max, steps)
        pck_curve = []
        aucs = []
        norm = np.trapezoid(np.ones_like(thresholds), thresholds)
        for kp in range(len(self.errors)):
            if not self.errors[kp]:
                continue
            pck = np.asarray([self._pck(kp, t) for t in thresholds])
            pck_curve.append(pck)
            aucs.append(np.trapezoid(pck, thresholds) / norm)
        pck_curve = np.mean(np.stack(pck_curve), 0) if pck_curve else np.zeros_like(thresholds)
        return (
            float(np.mean(epe_all)),
            float(np.median(epe_all)),
            float(np.mean(aucs)) if aucs else np.nan,
            pck_curve,
            thresholds,
        )


_LPIPS = None


def _get_lpips():
    global _LPIPS
    if _LPIPS is None:
        from hifihr_tpu.losses.lpips import LPIPS

        _LPIPS = LPIPS()
    return _LPIPS


def texture_metrics(re_img, re_sil, real_img, gt_mask=None, with_lpips=True) -> dict:
    """Masked PSNR / SSIM / L1 / L2 / LPIPS between render and real image.

    re_img, real_img: (B, H, W, 3); re_sil: (B, H, W, 1) in {0, 255} or {0,1}.
    (reference train_hrnet.py:148-161 + loss_fn_alex at :563.)  LPIPS is the
    AlexNet port; without converted weights it runs random-init features and
    the returned key is suffixed accordingly.
    """
    # loaders may deliver u8 images/masks (small H2D transfers)
    if real_img.dtype == jnp.uint8:
        real_img = real_img.astype(jnp.float32) / 255.0
    if gt_mask is not None and gt_mask.dtype == jnp.uint8:
        gt_mask = gt_mask.astype(jnp.float32)
    sil = (re_sil > 0).astype(re_img.dtype)
    pred = re_img * sil
    gt = real_img * (gt_mask[..., None] if gt_mask is not None else sil)
    mse = jnp.mean((pred - gt) ** 2)
    out = {
        "psnr": -10.0 * jnp.log10(jnp.maximum(mse, 1e-12)),
        "ssim": ssim_metric(pred, gt),
        "l1": jnp.mean(jnp.abs(pred - gt)),
        "l2": mse,
    }
    # AlexNet's stride-4 conv1 + pools need >= 64 px inputs
    if with_lpips and re_img.shape[1] >= 64:
        lp = _get_lpips()
        key = "lpips" if lp.pretrained else "lpips_randinit"
        out[key] = jnp.mean(lp(pred * 2.0 - 1.0, gt * 2.0 - 1.0))
    return out
